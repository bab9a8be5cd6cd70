"""Host-side asynchronous prefetch of time windows into device memory.

The reference blocks on GCS download + ``open_mfdataset`` before computing
(SURVEY §2.6); here a background thread pipeline loads and decodes the next
time window while the device computes the current one, and ships arrays to
HBM with ``jax.device_put`` double-buffering.
"""

from __future__ import annotations

import queue
import threading

import jax
import numpy as np

__all__ = ["WindowPrefetcher", "prefetch_to_device"]


class WindowPrefetcher:
    """Double-buffered loader: ``loader(window)`` runs in a worker thread for
    the next window while the caller consumes the current one.

    Parameters
    ----------
    loader : callable(window_spec) -> pytree of numpy arrays
    windows : iterable of window specs (e.g. (start, end) date tuples)
    device_put : if True, arrays are placed on the default device as they
        arrive, so compute kicks off without a host round-trip.
    depth : number of windows to keep in flight.
    """

    def __init__(self, loader, windows, device_put=True, depth=2):
        self.loader = loader
        self.windows = list(windows)
        self.device_put = device_put
        self.queue = queue.Queue(maxsize=depth)
        self.error = None
        self.thread = threading.Thread(target=self._work, daemon=True)
        self.thread.start()

    def _work(self):
        try:
            for spec in self.windows:
                data = self.loader(spec)
                if self.device_put:
                    data = jax.tree.map(
                        lambda a: jax.device_put(np.asarray(a))
                        if isinstance(a, np.ndarray)
                        else a,
                        data,
                    )
                self.queue.put((spec, data))
        except Exception as exc:  # surfaced on the consumer side
            self.error = exc
        finally:
            self.queue.put(None)

    def __iter__(self):
        while True:
            item = self.queue.get()
            if item is None:
                if self.error is not None:
                    raise self.error
                return
            yield item


def prefetch_to_device(arrays_iter, depth=2):
    """Generator: device_put the next item while the current one is consumed."""

    def identity(a):
        return a

    return iter(WindowPrefetcher(identity, list(arrays_iter), depth=depth))
