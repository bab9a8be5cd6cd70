"""Per-stage profile of the bench workload's watershed: fields-stage time,
adaptive radius, coarse/fine round counts and per-chunk times.

Usage (TPU): python tools/profile_ws.py [t h w]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from tobac_flow_tpu.pipeline import _fields_stage
    from tobac_flow_tpu.ops import watershed as ws

    args = [int(a) for a in sys.argv[1:4]] or [bench.T, bench.H, bench.W]
    t, h, w = args
    bt = jax.block_until_ready(bench.make_scene_device(t, h, w))
    markers_np, n_markers = bench.make_markers(np.asarray(bt))
    print(f"scene {t}x{h}x{w}, {n_markers} markers")

    def sync(x):
        jax.block_until_ready(x)
        # axon block_until_ready can be a no-op; force a scalar readback
        float(jnp.sum(x[0] if isinstance(x, tuple) else x).astype(jnp.float32))

    # fields stage
    out = _fields_stage(bt, 5.0)  # warm-up/compile
    sync(out[2])
    start = time.perf_counter()
    out = _fields_stage(bt, 5.0)
    sync(out[2])
    t_fields = time.perf_counter() - start
    fwd, bwd, growth, field, edges = out
    print(f"fields stage: {t_fields:.3f}s")

    markers_j = jnp.asarray(markers_np)
    mask_j = field > 0.05
    frac = float(mask_j.mean())
    print(f"mask fraction: {frac:.4f}")

    # replicate the watershed dispatch with instrumentation
    fwd_int = jnp.round(fwd).astype(jnp.int32)
    bwd_int = jnp.round(bwd).astype(jnp.int32)
    mag = jnp.maximum(jnp.abs(fwd_int), jnp.abs(bwd_int))
    mag = jnp.where(mask_j[..., None], mag, 0)
    total = jnp.maximum(mask_j.sum() * 2, 1)
    exceed = jnp.stack([(mag > k).sum() for k in range(21)])
    band_stats = np.stack(
        [np.asarray(exceed), np.broadcast_to(int(total), (21,))]
    )
    radius = ws._band_radius_from_stats(band_stats)
    print(f"band radius: {radius}")

    field_j = jnp.where(jnp.isnan(edges), jnp.inf, edges)
    structure = ws.connectivity_structure(1)
    taps = ws._structure_taps_3d(structure)
    meta_max = np.int32(np.iinfo(np.int32).max)
    seeded = markers_j != 0
    state = (
        jnp.where(seeded, -jnp.inf, jnp.inf).astype(jnp.float32),
        jnp.where(seeded, -jnp.inf, jnp.inf).astype(jnp.float32),
        jnp.where(seeded, markers_j + 2, meta_max).astype(jnp.int32),
    )

    max_iters = t + h + w + 32
    chunk = 16

    # coarse pass timing (mirror of ops.watershed multigrid section)
    factor = 4
    cf = ws._coarsen(field_j, factor, "max")
    cmask = ws._coarsen(mask_j.astype(jnp.int32), factor, "max").astype(bool)
    cmark = ws._coarsen(markers_j, factor, "max")
    neg = ws._coarsen(markers_j, factor, "min")
    cmark = jnp.where((cmark == 0) & (neg < 0), neg, cmark)
    cfwd = (ws._coarsen(fwd_int[..., 0], factor, "mean") / factor).astype(jnp.int32)
    cfwy = (ws._coarsen(fwd_int[..., 1], factor, "mean") / factor).astype(jnp.int32)
    cbwx = (ws._coarsen(bwd_int[..., 0], factor, "mean") / factor).astype(jnp.int32)
    cbwy = (ws._coarsen(bwd_int[..., 1], factor, "mean") / factor).astype(jnp.int32)
    cfwd_i = jnp.stack([cfwd, cfwy], axis=-1)
    cbwd_i = jnp.stack([cbwx, cbwy], axis=-1)
    cseeded = cmark != 0
    cstate = (
        jnp.where(cseeded, -jnp.inf, jnp.inf).astype(jnp.float32),
        jnp.where(cseeded, -jnp.inf, jnp.inf).astype(jnp.float32),
        jnp.where(cseeded, cmark + 2, meta_max).astype(jnp.int32),
    )
    cradius = max(radius // factor, 1)
    cdone, cmax = 0, (max_iters // 2) + 8
    t0 = time.perf_counter()
    while cdone < cmax:
        n = min(chunk, cmax - cdone)
        s = time.perf_counter()
        cstate, used = ws._watershed_sweeps(
            cf, cmark, cmask, cfwd_i, cbwd_i, cstate, taps, cradius, n, grace=2
        )
        used = int(used)
        print(f"  coarse chunk: used={used} {time.perf_counter()-s:.3f}s")
        cdone += used
        if used < n:
            break
    print(f"coarse total: {cdone} rounds {time.perf_counter()-t0:.3f}s")

    up_claim = ws._upsample_nearest(cstate[0], factor, h, w)
    up_meta = ws._upsample_nearest(cstate[2], factor, h, w)
    yi = jax.lax.broadcasted_iota(jnp.int32, (t, h, w), 1)
    xi = jax.lax.broadcasted_iota(jnp.int32, (t, h, w), 2)
    in_cov = (yi < (h // factor) * factor) & (xi < (w // factor) * factor)
    up_label = (up_meta & ((1 << 23) - 1)) - 2
    adopt = mask_j & ~seeded & (up_meta != meta_max) & (up_label >= 1) & in_cov
    adopted_claim = jnp.maximum(up_claim, field_j)
    state = (
        jnp.where(adopt, adopted_claim, state[0]),
        jnp.where(adopt, adopted_claim, state[1]),
        jnp.where(adopt, up_meta, state[2]),
    )

    done = 0
    t0 = time.perf_counter()
    while done < max_iters:
        n = min(chunk, max_iters - done)
        s = time.perf_counter()
        state, used = ws._watershed_sweeps(
            field_j, markers_j, mask_j, fwd_int, bwd_int, state, taps, radius,
            n, grace=2,
        )
        used = int(used)
        print(f"  fine chunk: used={used} {time.perf_counter()-s:.3f}s")
        done += used
        if used < n:
            break
    print(f"fine total: {done} rounds {time.perf_counter()-t0:.3f}s")


if __name__ == "__main__":
    main()
