"""Persistent compiled-program cache: a ``jax.jit`` drop-in that survives
process restarts.

Motivation: on this rig the XLA computation compiles REMOTELY at first
dispatch (axon tunnel), and the remote helper keeps no cross-process cache —
``JAX_COMPILATION_CACHE_DIR`` only memoises the local (near-instant)
lowering, so every fresh CLI run re-pays 5-70 s per program, ~500-700 s
across the detection chain (measured cold-vs-warm at the 288-frame e2e
shape).  ``jax.experimental.serialize_executable`` round-trips the loaded
executable through bytes, and deserialised executables dispatch in
milliseconds — so we key serialized executables by (program identity,
argument avals, static values, package-source digest) on disk and reload
them instead of recompiling.

The reference has no analogue (OpenCV kernels are ahead-of-time C++); this
is the TPU-native equivalent of shipping compiled kernels with the library.

Usage::

    @persistent_jit(static_argnames=("taps",), donate_argnums=(2,))
    def program(a, b, state, taps): ...

Enabled only where it pays and is safe: single-device non-CPU backends
(the remote-TPU tunnel), or when ``TFT_PROGRAM_CACHE=1`` forces it.  Tests
(virtual CPU mesh) and sharded entry points keep plain ``jax.jit``.
Any failure (serialization unsupported, stale blob, version skew) falls
back to the plain jit path for that call.
"""

from __future__ import annotations

import functools
import hashlib
import inspect
import os
import pickle
import tempfile
import threading
from pathlib import Path

import jax
import numpy as np

__all__ = ["persistent_jit", "program_cache_dir", "package_source_digest"]

_LOCK = threading.Lock()
_SOURCE_DIGEST = None
_ENABLED = None


def program_cache_dir() -> Path:
    return Path(
        os.environ.get(
            "TFT_PROGRAM_CACHE_DIR",
            os.path.join(
                os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
                "tft_programs",
            ),
        )
    )


# Host-orchestration layers that can never be inlined into a traced program:
# editing these must NOT invalidate compiled executables (a full repo digest
# made every IO/CLI/schema edit re-pay 10-25 remote compiles, 20-400 s each —
# the round-3 "six stages slower than CPU" artefact was largely that bill).
# Compute-layer files (ops/, models/, parallel/, detect/, segment/, core/,
# utils/, pipeline.py, ...) stay in the digest because traced functions
# freely inline helpers across those modules.
_DIGEST_EXCLUDE = ("cli/", "data/", "schema/", "track/", "validate/",
                   "plotting.py", "decorators.py")


def package_source_digest() -> str:
    """Digest over the package's compute-layer .py files: any edit that
    could change a traced program invalidates all cached executables
    (per-file hashing would under-invalidate since programs inline helpers
    from other modules); host-only layers are excluded (see
    ``_DIGEST_EXCLUDE``)."""
    global _SOURCE_DIGEST
    with _LOCK:
        if _SOURCE_DIGEST is None:
            root = Path(__file__).parent.parent
            h = hashlib.sha256()
            for p in sorted(root.rglob("*.py")):
                rel = p.relative_to(root).as_posix()
                if rel.startswith(_DIGEST_EXCLUDE):
                    continue
                h.update(p.name.encode())
                h.update(p.read_bytes())
            _SOURCE_DIGEST = h.hexdigest()[:16]
    return _SOURCE_DIGEST


def _cache_enabled() -> bool:
    global _ENABLED
    if _ENABLED is None:
        flag = os.environ.get("TFT_PROGRAM_CACHE", "").strip()
        if flag in ("0", "off", "false"):
            _ENABLED = False
        elif flag in ("1", "on", "true"):
            _ENABLED = True
        else:
            try:
                devs = jax.devices()
                _ENABLED = (
                    len(devs) == 1 and devs[0].platform.lower() != "cpu"
                )
            except Exception:
                _ENABLED = False
    return _ENABLED


def _aval_token(x):
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        return f"{np.dtype(x.dtype).str}{tuple(x.shape)}"
    if isinstance(x, (tuple, list)):
        # pytree containers of arrays (e.g. the watershed's packed state)
        # key by element avals — repr() of a device array would BLOCK on and
        # download the whole value over the link at every call
        inner = ",".join(_aval_token(v) for v in x)
        return f"{type(x).__name__}({inner})"
    # python scalars become weakly-typed avals keyed by type
    return f"py:{type(x).__name__}:{x!r}"


class _PersistentJit:
    def __init__(self, fn, static_argnames=(), donate_argnums=()):
        self._fn = fn
        self._static = tuple(
            (static_argnames,)
            if isinstance(static_argnames, str)
            else tuple(static_argnames)
        )
        self._jit = jax.jit(
            fn,
            static_argnames=self._static or None,
            donate_argnums=donate_argnums or None,
        )
        self._sig = inspect.signature(fn)
        self._mem = {}
        self._broken = set()  # keys where serialize/compile-path failed
        functools.update_wrapper(self, fn)

    # expose the plain jit for callers that need .lower etc.
    @property
    def jitted(self):
        return self._jit

    def _log(self, msg, key):
        if os.environ.get("TFT_PROGRAM_CACHE_LOG"):
            print(
                f"[program_cache] {self._fn.__qualname__} {msg} {key[:8]}",
                flush=True,
            )

    def clear_cache(self):
        """Drop in-memory executables (jax.jit API compatibility)."""
        self._mem.clear()
        self._broken.clear()
        self._jit.clear_cache()

    def _key(self, args, kwargs):
        bound = self._sig.bind(*args, **kwargs)
        bound.apply_defaults()
        parts = [
            self._fn.__module__,
            self._fn.__qualname__,
            jax.__version__,
            package_source_digest(),
        ]
        for name, val in bound.arguments.items():
            if name in self._static:
                parts.append(f"S:{name}={val!r}")
            else:
                parts.append(f"D:{name}={_aval_token(val)}")
        raw = "|".join(parts)
        return hashlib.sha256(raw.encode()).hexdigest()[:32]

    def _dynamic_args(self, args, kwargs):
        bound = self._sig.bind(*args, **kwargs)
        bound.apply_defaults()
        return [v for k, v in bound.arguments.items() if k not in self._static]

    def __call__(self, *args, **kwargs):
        if not _cache_enabled():
            return self._jit(*args, **kwargs)
        try:
            key = self._key(args, kwargs)
        except Exception:
            return self._jit(*args, **kwargs)
        if key in self._broken:
            return self._jit(*args, **kwargs)
        exe = self._mem.get(key)
        if exe is None:
            exe = self._load(key)
            if exe is not None:
                self._log("disk hit", key)
        if exe is None:
            self._log("miss (compiling)", key)
            exe = self._compile_and_save(key, args, kwargs)
        if exe is None:
            self._log("BROKEN (plain jit fallback)", key)
            self._broken.add(key)
            return self._jit(*args, **kwargs)
        self._mem[key] = exe
        try:
            return exe(*self._dynamic_args(args, kwargs))
        except Exception:
            # stale/incompatible executable: drop it and recompile plainly
            self._mem.pop(key, None)
            self._broken.add(key)
            try:
                (program_cache_dir() / f"{key}.exe").unlink()
            except OSError:
                pass
            return self._jit(*args, **kwargs)

    def _load(self, key):
        path = program_cache_dir() / f"{key}.exe"
        try:
            with open(path, "rb") as fh:
                blob, in_tree, out_tree = pickle.load(fh)
            from jax.experimental import serialize_executable as se

            return se.deserialize_and_load(blob, in_tree, out_tree)
        except Exception:
            return None

    def _compile_and_save(self, key, args, kwargs):
        try:
            compiled = self._jit.lower(*args, **kwargs).compile()
        except Exception:
            return None
        try:
            from jax.experimental import serialize_executable as se

            blob, in_tree, out_tree = se.serialize(compiled)
            d = program_cache_dir()
            d.mkdir(parents=True, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
            with os.fdopen(fd, "wb") as fh:
                pickle.dump((blob, in_tree, out_tree), fh)
            os.replace(tmp, d / f"{key}.exe")
        except Exception:
            pass  # executable still usable in-process
        return compiled


def persistent_jit(fn=None, *, static_argnames=(), donate_argnums=()):
    """``jax.jit`` drop-in with a cross-process serialized-executable cache.

    Only ``static_argnames`` and ``donate_argnums`` of the jit API are
    supported — the package's programs use exactly those."""
    if fn is None:
        return functools.partial(
            persistent_jit,
            static_argnames=static_argnames,
            donate_argnums=donate_argnums,
        )
    return _PersistentJit(
        fn, static_argnames=static_argnames, donate_argnums=donate_argnums
    )
