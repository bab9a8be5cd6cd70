"""Disk-spilled host arrays: bound host RSS at GOES CONUS scale.

The reference bounds host memory by checkpointing to netCDF mid-run and
re-opening later (``dcc_detect_goes.py:191-213``).  At CONUS-day scale
(2500x1500x288 ~ 1.08 Gpix) even that pattern leaves several 4+ GB volumes
resident at once (three input fields, two flow fields, three label volumes).
This module keeps those volumes as ``.npy``-backed ``np.memmap`` arrays and
drops their resident pages (``madvise(MADV_DONTNEED)``) once a consumer is
done with a region, so peak RSS tracks the per-stage *working set* (a few
time-chunks) instead of the sum of every live volume.

``np.memmap`` subclasses ``np.ndarray``, so spilled arrays flow through the
whole pipeline (chunked convolve, fused detect drivers, watershed, schema)
unchanged; only the allocation site and the trim calls are new.

Usage::

    from tobac_flow_tpu.utils.blockstore import spill_empty, trim_pages
    bt = spill_empty((288, 1500, 2500), np.float32, "bt")
    for t in range(288):
        bt[t] = make_frame(t)
    trim_pages(bt)          # writes back + drops resident pages
"""

from __future__ import annotations

import atexit
import mmap as _mmap_mod
import os
import uuid
from pathlib import Path

import numpy as np

__all__ = [
    "spill_empty",
    "spill_like",
    "as_spilled",
    "trim_pages",
    "release",
    "is_spilled",
    "spill_dir",
]

_SPILL_FILES: set[str] = set()


def spill_dir() -> Path:
    d = Path(os.environ.get("TFT_SPILL_DIR", "/tmp/tft_spill"))
    d.mkdir(parents=True, exist_ok=True)
    return d


def _cleanup():
    for f in list(_SPILL_FILES):
        try:
            os.unlink(f)
        except OSError:
            pass
        _SPILL_FILES.discard(f)


atexit.register(_cleanup)


def spill_empty(shape, dtype, tag: str = "arr") -> np.memmap:
    """An uninitialised array backed by a fresh ``.npy`` file in the spill
    directory (sparse until written; deleted at interpreter exit)."""
    path = spill_dir() / f"{tag}-{uuid.uuid4().hex[:12]}.npy"
    arr = np.lib.format.open_memmap(
        path, mode="w+", dtype=np.dtype(dtype), shape=tuple(int(s) for s in shape)
    )
    _SPILL_FILES.add(str(path))
    return arr


def spill_like(a, tag: str = "arr", dtype=None) -> np.memmap:
    return spill_empty(a.shape, dtype or a.dtype, tag)


def as_spilled(a, tag: str = "arr") -> np.memmap:
    """Copy ``a`` into a spill array chunk-wise (bounded transient RSS) and
    drop the result's resident pages before returning."""
    a = np.asarray(a)
    out = spill_empty(a.shape, a.dtype, tag)
    step = max(1, int((256 << 20) // max(a[0:1].nbytes, 1))) if a.ndim else 1
    if a.ndim == 0:
        out[...] = a
    else:
        for s in range(0, a.shape[0], step):
            out[s : s + step] = a[s : s + step]
    trim_pages(out)
    return out


def _base_mmap(a):
    """The underlying ``np.memmap`` of an array or view chain, if any."""
    seen = 0
    while a is not None and seen < 16:
        if isinstance(a, np.memmap):
            return a
        a = getattr(a, "base", None)
        seen += 1
    return None


def is_spilled(a) -> bool:
    return _base_mmap(a) is not None


def trim_pages(*arrays) -> None:
    """Write back and drop the resident pages of file-backed arrays.

    Safe no-op for plain ndarrays / non-file-backed inputs.  After the call
    the data is still fully readable (pages fault back in from the file);
    only the process's resident footprint shrinks.
    """
    for a in arrays:
        m = _base_mmap(a)
        if m is None:
            continue
        raw = getattr(m, "_mmap", None)
        if raw is None:
            continue
        try:
            m.flush()  # msync dirty pages so DONTNEED cannot lose them
            raw.madvise(_mmap_mod.MADV_DONTNEED)
        except (AttributeError, OSError, ValueError):
            pass


def release(a) -> None:
    """Delete the backing file of a spilled array (the array must no longer
    be used afterwards)."""
    m = _base_mmap(a)
    if m is None:
        return
    fname = getattr(m, "filename", None)
    if fname and str(fname) in _SPILL_FILES:
        try:
            os.unlink(fname)
        except OSError:
            pass
        _SPILL_FILES.discard(str(fname))
