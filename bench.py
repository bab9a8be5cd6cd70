"""Benchmark harness: flow + semi-Lagrangian detection fields + watershed.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N}

The workload is the BASELINE.json synthetic config scaled to a GOES-like
frame (advecting growing storm; same compute path as dcc_detect:
create_flow -> growth rate -> uphill-Sobel edge field -> flow watershed).
Runs on whatever jax.devices() provides (the real TPU chip under axon).

The CPU baseline is the reference's compute path reconstructed with the same
libraries the reference uses (cv2 Farneback + cv2.remap warps + a serial
heap watershed, cf. /root/reference/tobac_flow/flow.py,convolve.py,
_watershed.pyx); it is measured once on a scaled-down config and cached in
bench_cpu_baseline.json as a per-pixel rate.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

# persistent XLA compilation cache: first bench run pays compile once per
# program shape, later rounds reuse it
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

REPO = Path(__file__).parent
BASELINE_FILE = REPO / "bench_cpu_baseline.json"

# benchmark workload (TPU): GOES-like tile (sized to single-chip HBM)
T, H, W = 24, 1024, 1536
# CPU baseline workload (same spatial size, fewer frames, rate extrapolates)
T_CPU = 6


def make_scene(t, h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    bt = np.empty((t, h, w), np.float32)
    for i in range(t):
        cx = w * 0.25 + 3.0 * i
        cy = h * 0.4 + 1.5 * i
        r = h / 12 + i * 2
        core = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r * r))
        bt[i] = 290.0 - (30.0 + 3.0 * i) * core
    bt += rng.normal(0, 0.3, bt.shape).astype(np.float32)
    return bt


def tpu_pipeline(bt, dt_minutes=5.0):
    """The measured TPU path: fused device-resident flow + growth + edges +
    watershed (tobac_flow_tpu.pipeline.fused_flow_watershed); only scalar
    summaries cross the host boundary."""
    import jax.numpy as jnp

    from tobac_flow_tpu.pipeline import fused_flow_watershed

    fwd, growth, edges, labels = fused_flow_watershed(bt, dt_minutes)
    return float(jnp.nansum(growth)), int((labels != 0).sum())


def make_scene_device(t, h, w):
    """Synthetic scene generated on device (no host upload)."""
    import jax
    import jax.numpy as jnp

    yy = jax.lax.broadcasted_iota(jnp.float32, (t, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (t, h, w), 2)
    ti = jax.lax.broadcasted_iota(jnp.float32, (t, h, w), 0)
    cx = w * 0.25 + 3.0 * ti
    cy = h * 0.4 + 1.5 * ti
    r = h / 12 + ti * 2
    core = jnp.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r * r))
    bt = 290.0 - (30.0 + 3.0 * ti) * core
    noise = jax.random.normal(jax.random.PRNGKey(0), (t, h, w)) * 0.3
    return bt + noise


def cpu_reference_pipeline(bt, dt_minutes=5.0):
    """Reference-equivalent CPU path (cv2 + serial heap watershed)."""
    import cv2

    t, h, w = bt.shape
    fwd = np.zeros((t, h, w, 2), np.float32)
    bwd = np.zeros((t, h, w, 2), np.float32)
    for i in range(t - 1):
        pair = bt[i : i + 2]
        vmin, vmax = np.nanmin(pair), np.nanmax(pair)
        a = ((pair[0] - vmin) * (255.0 / max(vmax - vmin, 1e-6))).astype(np.uint8)
        b = ((pair[1] - vmin) * (255.0 / max(vmax - vmin, 1e-6))).astype(np.uint8)
        fwd[i] = cv2.calcOpticalFlowFarneback(a, b, None, 0.5, 5, 13, 10, 5, 1.1, 0)
        bwd[i + 1] = cv2.calcOpticalFlowFarneback(b, a, None, 0.5, 5, 13, 10, 5, 1.1, 0)
    fwd[-1] = -bwd[-1]
    bwd[0] = -fwd[0]
    np.clip(fwd, -20, 20, out=fwd)
    np.clip(bwd, -20, 20, out=bwd)

    def remap(img, flow):
        locs = flow.copy()
        locs[..., 0] += np.arange(w)
        locs[..., 1] += np.arange(h)[:, None]
        return cv2.remap(
            img, locs, None, cv2.INTER_LINEAR, None, cv2.BORDER_CONSTANT, np.nan
        )

    # temporal diff in the moving frame
    growth = np.empty_like(bt)
    for i in range(t):
        prev = remap(bt[i - 1], bwd[i]) if i > 0 else np.full((h, w), np.nan)
        nxt = remap(bt[i + 1], fwd[i]) if i < t - 1 else np.full((h, w), np.nan)
        fo = np.isfinite(nxt)
        bo = np.isfinite(prev)
        d = (
            np.where(fo, nxt - bt[i], 0) + np.where(bo, bt[i] - prev, 0)
        ) / np.maximum(fo.astype(int) + bo.astype(int), 1)
        growth[i] = -d / dt_minutes

    # 27-tap uphill sobel edges
    field = np.clip((260.0 - bt) / 10.0, 0.0, 1.0)
    base = np.multiply.outer(
        np.array([1, 2, 1]), np.multiply.outer(np.array([1, 2, 1]), np.array([-1, 0, 1]))
    )
    wx, wy, wt = base, base.transpose(0, 2, 1), base.transpose(2, 0, 1)
    edges = np.zeros_like(field)
    for i in range(t):
        gx = np.zeros((h, w))
        gy = np.zeros((h, w))
        gt = np.zeros((h, w))
        for pi, dt_ in enumerate((-1, 0, 1)):
            if 0 <= i + dt_ < t:
                if dt_ == -1:
                    plane_img = remap(field[i - 1], bwd[i])
                elif dt_ == 1:
                    plane_img = remap(field[i + 1], fwd[i])
                else:
                    plane_img = field[i]
            else:
                plane_img = np.full((h, w), np.nan)
            for oy in (-1, 0, 1):
                for ox in (-1, 0, 1):
                    tap = np.roll(np.roll(plane_img, oy, 0), ox, 1)
                    rect = np.fmax(tap - field[i], 0)
                    rect[~np.isfinite(rect)] = 0
                    gx += wx[pi, oy + 1, ox + 1] * rect
                    gy += wy[pi, oy + 1, ox + 1] * rect
                    gt += wt[pi, oy + 1, ox + 1] * rect
        edges[i] = np.sqrt(gx**2 + gy**2 + gt**2)
    edges[edges > 0] += 1
    edges = edges - field

    from tobac_flow_tpu.native import flow_watershed_host

    markers = np.where(field >= 1.0, 1, 0).astype(np.int32)
    mask = (field > 0.05).astype(np.int8)
    labels = flow_watershed_host(fwd, bwd, edges.astype(np.float32), markers, mask=mask)
    return growth, labels


def measure_cpu_baseline():
    bt = make_scene(T_CPU, H, W)
    start = time.perf_counter()
    cpu_reference_pipeline(bt)
    elapsed = time.perf_counter() - start
    rate = T_CPU * H * W / elapsed / 1e6
    data = {
        "mpix_per_s": rate,
        "config": {"t": T_CPU, "h": H, "w": W},
        "elapsed_s": elapsed,
    }
    BASELINE_FILE.write_text(json.dumps(data, indent=2))
    return rate


def main():
    if "--cpu-baseline" in sys.argv:
        rate = measure_cpu_baseline()
        print(json.dumps({"cpu_mpix_per_s": rate}))
        return

    if BASELINE_FILE.exists():
        cpu_rate = json.loads(BASELINE_FILE.read_text())["mpix_per_s"]
    else:
        cpu_rate = measure_cpu_baseline()

    import jax

    bt = jax.block_until_ready(make_scene_device(T, H, W))
    # full same-shape warm-up run pays all compilation outside the timed region
    tpu_pipeline(bt)
    start = time.perf_counter()
    tpu_pipeline(bt)
    elapsed = time.perf_counter() - start
    rate = T * H * W / elapsed / 1e6

    print(
        json.dumps(
            {
                "metric": "flow+watershed synthetic GOES tile (detect compute path)",
                "value": round(rate, 2),
                "unit": "Mpix/s",
                "vs_baseline": round(rate / cpu_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
