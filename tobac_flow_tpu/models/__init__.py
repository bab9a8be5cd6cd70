"""Optical-flow model registry and the batched flow driver.

Mirrors the reference model registry (``tobac_flow/utils/flow_utils.py:37-77``,
8 selectable dense-flow models).  Seven are implemented TPU-native: Farneback
(pipeline default), DIS, DualTVL1, DeepFlow, PCA, SimpleFlow and
SparseToDense; DenseRLOF raises NotImplementedError exactly as the reference
does (it needs multi-channel input).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tobac_flow_tpu.models.farneback import FarnebackParams, farneback_pair
from tobac_flow_tpu.models.variational import variational_refine
from tobac_flow_tpu.utils.program_cache import persistent_jit

# flow fields stay device-resident (no readback, downstream ops consume them
# in place) when all four per-direction component arrays fit this budget;
# above it (GOES full disk x day) they return as host arrays and later
# stages stream chunks
FLOW_RESIDENCY_BUDGET_BYTES = 4 << 30

# HBM gate for the pair-batched Farneback program: its temp footprint is
# ~200 bytes per pair-pixel (measured: 23.6 GB at 32 pairs x 1500x2500 —
# an OOM on the 16 GB chip; 2.5 GB at 32 x 512x768).  Capping pair-pixels
# per program keeps the batch at 32 for GOES-tile frames and drops it to
# ~10 at CONUS frame size.
FLOW_PAIR_PX_BUDGET = 40_000_000

__all__ = [
    "select_of_model",
    "batch_flow",
    "FLOW_MODELS",
    "farneback_pair",
    "variational_refine",
]

# model name -> (pair_fn(prev, nxt) -> flow) factory; None means recognised but
# not yet implemented on TPU.
_FARNEBACK = FarnebackParams()
_FAST_FARNEBACK = FarnebackParams(num_levels=5, winsize=9, num_iters=5)

def _dis_factory():
    from tobac_flow_tpu.models.dis import DISParams, dis_pair

    return functools.partial(dis_pair, params=DISParams())


def _tvl1_factory():
    from tobac_flow_tpu.models.tvl1 import TVL1Params, tvl1_pair

    return functools.partial(tvl1_pair, params=TVL1Params())


def _deepflow_factory():
    from tobac_flow_tpu.models.deepflow import DeepFlowParams, deepflow_pair

    return functools.partial(deepflow_pair, params=DeepFlowParams())


def _pcaflow_factory():
    from tobac_flow_tpu.models.pcaflow import PCAFlowParams, pcaflow_pair

    return functools.partial(pcaflow_pair, params=PCAFlowParams())


def _simpleflow_factory():
    from tobac_flow_tpu.models.simpleflow import SimpleFlowParams, simpleflow_pair

    return functools.partial(simpleflow_pair, params=SimpleFlowParams())


def _sparse_to_dense_factory():
    from tobac_flow_tpu.models.sparse_to_dense import (
        SparseToDenseParams,
        sparse_to_dense_pair,
    )

    return functools.partial(sparse_to_dense_pair, params=SparseToDenseParams())


FLOW_MODELS = {
    "Farneback": lambda: functools.partial(farneback_pair, params=_FARNEBACK),
    "DIS": _dis_factory,
    "DualTVL1": _tvl1_factory,
    "DeepFlow": _deepflow_factory,
    "PCA": _pcaflow_factory,
    "SimpleFlow": _simpleflow_factory,
    "SparseToDense": _sparse_to_dense_factory,
    "DenseRLOF": "not_implemented",
}


def select_of_model(model: str):
    """Return the pair-flow callable for a named model (registry parity with
    ``utils/flow_utils.py:37-77``)."""
    if model not in FLOW_MODELS:
        raise ValueError(
            "'model' parameter must be one of: "
            + ", ".join(repr(k) for k in FLOW_MODELS)
        )
    entry = FLOW_MODELS[model]
    if entry == "not_implemented":
        raise NotImplementedError(
            "DenseRLOF requires multi-channel input which is currently not implemented"
        )
    return entry()


def _normalise_pair(prev, nxt, method: str):
    """Jointly normalise a frame pair to the 0..255 working range with the
    reference's NaN semantics (``to_8bit``, normalisation_utils.py:10-33):
    NaN holes first inherit the other frame's values, remaining non-finite
    values become 127, and values are quantised to integer levels."""
    stack = jnp.stack([prev, nxt], axis=0)
    if method == "linear":
        vmin = jnp.nanmin(stack)
        vmax = jnp.nanmax(stack)
        norm = jnp.clip(
            (stack - vmin) * jnp.where(vmax > vmin, 1.0 / (vmax - vmin), 0.0),
            0.0,
            1.0,
        )
    elif method == "z_score":
        mean = jnp.nanmean(stack)
        std = jnp.nanstd(stack)
        norm = jnp.clip(((stack - mean) / std + 3.0) / 6.0, 0.0, 1.0)
    elif method == "log":
        vmin = jnp.nanmin(stack)
        shifted = jnp.log(stack - vmin + 1.0)
        smax = jnp.nanmax(shifted)
        norm = jnp.clip(shifted * jnp.where(smax > 0, 1.0 / smax, 0.0), 0.0, 1.0)
    elif method == "inverse_log":
        vmax = jnp.nanmax(stack)
        shifted = jnp.log(vmax - stack + 1.0)
        smax = jnp.nanmax(shifted)
        norm = jnp.clip(shifted * jnp.where(smax > 0, 1.0 / smax, 0.0), 0.0, 1.0)
    else:
        raise NotImplementedError(
            f"normalisation method {method!r} is not available in the jitted "
            "flow path; use one of linear/z_score/log/inverse_log"
        )
    scaled = norm * 255.0
    finite = jnp.isfinite(scaled)
    filled = jnp.where(finite, scaled, 127.0)
    a = jnp.where(finite[0], filled[0], jnp.where(finite[1], filled[1], 127.0))
    b = jnp.where(finite[1], filled[1], jnp.where(finite[0], filled[0], 127.0))
    return jnp.round(a), jnp.round(b)


@persistent_jit(
    static_argnames=(
        "model",
        "vr_steps",
        "smoothing_passes",
        "interp_method",
        "normalisation_method",
    ),
)
def _chunk_flow(
    prev, nxt, model, vr_steps, smoothing_passes, interp_method, normalisation_method
):
    """Forward and backward flow for a chunk of frame pairs (C, H, W)."""
    pair_fn = select_of_model(model)

    def one(p, n):
        p8, n8 = _normalise_pair(p, n, normalisation_method)
        fwd = pair_fn(p8, n8)
        bwd = pair_fn(n8, p8)
        if vr_steps > 0:
            fwd = variational_refine(p8, n8, fwd, steps=vr_steps)
            bwd = variational_refine(n8, p8, bwd, steps=vr_steps)
        if smoothing_passes > 0:
            from tobac_flow_tpu.core.flow import smooth_flow_step

            for _ in range(smoothing_passes):
                fwd, bwd = smooth_flow_step(fwd, bwd, method=interp_method)
        return fwd, bwd

    return jax.vmap(one)(prev, nxt)


def batch_flow(
    data,
    model: str = "Farneback",
    vr_steps: int = 0,
    smoothing_passes: int = 0,
    interp_method: str = "linear",
    normalisation_method: str = "linear",
    chunk: int = 8,
    **normalisation_kwargs,
):
    """Forward/backward flow for every adjacent frame pair of (T, H, W) data.

    Pairs are processed in fixed-size device chunks (one compiled program,
    re-used across chunks); boundary frames get the negated opposite flow
    (reference ``flow.py:425-426``).
    """
    if normalisation_kwargs:
        raise NotImplementedError(
            "extra normalisation kwargs are not supported in the jitted path"
        )
    data = np.asarray(data, dtype=np.float32)
    t = data.shape[0]
    if t < 2:
        raise ValueError("Need at least two frames to compute flow")
    n_pairs = t - 1
    from tobac_flow_tpu.utils.device_cache import device_put_cached

    # one cached upload of the whole stack; pairs slice device-side (the
    # previous per-chunk host uploads + per-chunk readbacks cost gigabytes
    # of link traffic on a GOES day).  Below the residency budget the flow
    # fields STAY on device — every downstream op consumes them there, so
    # the readback disappears entirely.
    dev = device_put_cached(data)
    device_resident = 4 * data.nbytes <= FLOW_RESIDENCY_BUDGET_BYTES
    if t > 2 * chunk:
        chunk = max(chunk, 32)  # long windows: fewer, fatter dispatches
    frame_px = int(np.prod(data.shape[1:]))
    chunk = max(1, min(chunk, FLOW_PAIR_PX_BUDGET // max(frame_px, 1)))
    chunk = min(chunk, n_pairs)

    if not device_resident:
        # host-streamed: each chunk reads back immediately so neither HBM nor
        # host RAM ever holds all pair flows at once; above the spill
        # threshold the outputs are disk-backed with per-chunk page trims
        # (GOES CONUS day: 2 x 17 GB of f32 flow)
        from tobac_flow_tpu.utils.blockstore import spill_empty, trim_pages

        out_shape = (t,) + data.shape[1:] + (2,)
        out_bytes = int(np.prod(out_shape)) * 4
        if out_bytes > (2 << 30):
            fwd_out = spill_empty(out_shape, np.float32, "fwd_flow")
            bwd_out = spill_empty(out_shape, np.float32, "bwd_flow")
        else:
            fwd_out = np.empty(out_shape, np.float32)
            bwd_out = np.empty(out_shape, np.float32)
    f_parts = []
    b_parts = []
    for start in range(0, n_pairs, chunk):
        stop = min(start + chunk, n_pairs)
        c = stop - start
        prev = dev[start:stop]
        nxt = dev[start + 1 : stop + 1]
        if c < chunk:  # pad the tail to the compiled chunk shape
            pad = chunk - c
            prev = jnp.concatenate([prev, jnp.repeat(prev[-1:], pad, axis=0)])
            nxt = jnp.concatenate([nxt, jnp.repeat(nxt[-1:], pad, axis=0)])
        f, b = _chunk_flow(
            prev,
            nxt,
            model,
            int(vr_steps),
            int(smoothing_passes),
            interp_method,
            normalisation_method,
        )
        if device_resident:
            f_parts.append(f[:c])
            b_parts.append(b[:c])
        else:
            # fwd[i] = pair flow i -> i+1 for i < n_pairs;
            # bwd[i] = pair flow i -> i-1, i.e. pair (i-1)'s backward
            fwd_out[start:stop] = np.asarray(f[:c])
            bwd_out[start + 1 : stop + 1] = np.asarray(b[:c])
            if start == 0:
                bwd_out[0] = -np.asarray(f[0])
            if stop == n_pairs:
                fwd_out[t - 1] = -np.asarray(b[c - 1])
            trim_pages(fwd_out, bwd_out)

    if device_resident:
        f_pairs = jnp.concatenate(f_parts, axis=0)  # pair i: frame i -> i+1
        b_pairs = jnp.concatenate(b_parts, axis=0)
        fwd = jnp.concatenate([f_pairs, -b_pairs[-1:]], axis=0)
        bwd = jnp.concatenate([-f_pairs[:1], b_pairs], axis=0)
        return fwd, bwd
    return fwd_out, bwd_out
