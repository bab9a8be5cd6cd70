"""Profile the device CCL's per-piece cost on the TPU.

The bench shows ~2 Mpix/s for the full device CCL while the mask converges
in ~3 sweeps — so the cost is inside one sweep.  Times, separately jitted:
neighbour-shift min, one segmented scan per axis, a whole sweep, and the
full label_components_device, plus the host round trip (readback + scipy +
upload) for the crossover policy.

Usage:  python tools/ccl_probe.py            (TPU)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def timed(fn, *args, n=3):
    fn(*args)  # warm-up/compile
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        # force a readback of one scalar to defeat async dispatch
        np.asarray(r).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from tobac_flow_tpu.ops import ccl

    T, H, W = 24, 1024, 1536
    bt = np.asarray(bench.make_scene_device(T, H, W))
    mask_np = np.clip((260.0 - bt) / 10.0, 0.0, 1.0) >= 1.0
    m = jnp.asarray(mask_np)
    npix = T * H * W / 1e6

    offs = ccl._plane_offsets(ccl.DEFAULT_STRUCTURE)
    big = jnp.int32(H * W + 2)
    pix = (
        jax.lax.broadcasted_iota(jnp.int32, (T, H, W), 1) * W
        + jax.lax.broadcasted_iota(jnp.int32, (T, H, W), 2)
        + 1
    )
    labels0 = jnp.where(m, pix, big)

    @jax.jit
    def shifts_only(labels):
        best = labels
        for oy, ox in offs:
            best = jnp.minimum(best, ccl._shift2d(labels, oy, ox, big))
        return jnp.where(m, best, big)

    @jax.jit
    def scan_x(labels):
        return ccl._segmented_min(labels, m, axis=-1)

    @jax.jit
    def scan_y(labels):
        return ccl._segmented_min(labels, m, axis=-2)

    @jax.jit
    def one_sweep(labels):
        best = shifts_only(labels)
        best = ccl._segmented_min(best, m, axis=-1)
        best = ccl._segmented_min(best, m, axis=-2)
        return jnp.where(m, best, big)

    out = {
        "shifts_ms": round(timed(shifts_only, labels0) * 1e3, 1),
        "scan_x_ms": round(timed(scan_x, labels0) * 1e3, 1),
        "scan_y_ms": round(timed(scan_y, labels0) * 1e3, 1),
        "sweep_ms": round(timed(one_sweep, labels0) * 1e3, 1),
        "full_device_s": round(timed(ccl.flat_label, m), 3),
    }

    # host round trip for device-resident input (the crossover policy)
    def host_roundtrip(mdev):
        mask_h = np.asarray(mdev)
        lab = ccl.flat_label(mask_h)
        return jnp.asarray(lab)

    out["host_roundtrip_s"] = round(timed(host_roundtrip, m), 3)
    out["scipy_host_s"] = round(timed(lambda: ccl.flat_label(mask_np)), 3)
    out["mpix"] = round(npix, 1)
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
