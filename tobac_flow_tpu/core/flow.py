"""The Flow object: container of forward/backward optical-flow fields that
exposes every semi-Lagrangian operation of the pipeline.

API parity: reference ``tobac_flow/flow.py`` (``create_flow`` lines 23-65,
``Flow`` lines 68-355, ``calculate_flow`` lines 362-428, ``smooth_flow_step``
lines 530-568, ``combine_flow`` lines 571-603).  The flow estimation itself is
a TPU-native pyramidal model (``tobac_flow_tpu.models``), not OpenCV.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tobac_flow_tpu.core.abstracts import AbstractFlow
from tobac_flow_tpu.ops.convolve import DEFAULT_STRUCTURE, convolve
from tobac_flow_tpu.ops.sobel import sobel

__all__ = [
    "Flow",
    "create_flow",
    "calculate_flow",
    "smooth_flow_step",
    "combine_flow",
    "flow_magnitude",
]


def create_flow(
    data,
    model: str = "Farneback",
    vr_steps: int = 0,
    smoothing_passes: int = 0,
    interp_method: str = "linear",
    max_value: float = 20,
) -> "Flow":
    """Estimate forward+backward optical flow for a (t, y, x) sequence and
    wrap it in a Flow object; vectors are clipped to ±max_value px
    (reference ``flow.py:23-65``)."""
    forward_flow, backward_flow = calculate_flow(
        data,
        model=model,
        vr_steps=vr_steps,
        smoothing_passes=smoothing_passes,
        interp_method=interp_method,
    )
    if isinstance(forward_flow, np.ndarray):
        # in place: a fresh clipped copy of a spilled (disk-backed) CONUS-day
        # flow volume would materialise ~17 GB of host RAM
        if forward_flow.flags.writeable:
            np.clip(forward_flow, -max_value, max_value, out=forward_flow)
            np.clip(backward_flow, -max_value, max_value, out=backward_flow)
            from tobac_flow_tpu.utils.blockstore import trim_pages

            trim_pages(forward_flow, backward_flow)
        else:
            forward_flow = np.clip(forward_flow, -max_value, max_value)
            backward_flow = np.clip(backward_flow, -max_value, max_value)
    else:
        # device-resident flows (models.FLOW_RESIDENCY_BUDGET_BYTES): clip
        # on device — np.clip would silently read the field back to host
        import jax.numpy as jnp

        forward_flow = jnp.clip(forward_flow, -max_value, max_value)
        backward_flow = jnp.clip(backward_flow, -max_value, max_value)
    return Flow(forward_flow, backward_flow)


def calculate_flow(
    data,
    model: str = "Farneback",
    vr_steps: int = 0,
    smoothing_passes: int = 0,
    interp_method: str = "linear",
    normalisation_method: str = "linear",
    **normalisation_kwargs,
):
    """Forward/backward dense flow for every frame pair of a (t, y, x) stack.

    Frame pairs are jointly normalised then quantised to 256 levels (parity
    with the reference's uint8 path, ``flow.py:411-414``); boundary frames
    inherit the negated opposite flow (``flow.py:425-426``).  All frame pairs
    are estimated in one batched, jitted TPU program.
    """
    from tobac_flow_tpu.models import batch_flow

    data = np.asarray(getattr(data, "values", data), dtype=np.float32)
    return batch_flow(
        data,
        model=model,
        vr_steps=vr_steps,
        smoothing_passes=smoothing_passes,
        interp_method=interp_method,
        normalisation_method=normalisation_method,
        **normalisation_kwargs,
    )


def calculate_flow_frame(
    prev_frame,
    next_frame,
    model: str = "Farneback",
    vr_steps: int = 0,
    smoothing_steps: int = 0,
    interp_method: str = "linear",
):
    """Forward and backward flow between one pair of (already normalised,
    0..255-scale) frames (reference ``flow.py:499-527``)."""
    import jax.numpy as jnp

    from tobac_flow_tpu.models import select_of_model
    from tobac_flow_tpu.models.variational import variational_refine

    pair_fn = select_of_model(model)
    prev_j = jnp.asarray(np.asarray(prev_frame, dtype=np.float32))
    next_j = jnp.asarray(np.asarray(next_frame, dtype=np.float32))
    fwd = pair_fn(prev_j, next_j)
    bwd = pair_fn(next_j, prev_j)
    if vr_steps > 0:
        fwd = variational_refine(prev_j, next_j, fwd, steps=vr_steps)
        bwd = variational_refine(next_j, prev_j, bwd, steps=vr_steps)
    for _ in range(smoothing_steps):
        fwd, bwd = smooth_flow_step(fwd, bwd, method=interp_method)
    return np.asarray(fwd), np.asarray(bwd)


def calculate_flow_2(
    a,
    b,
    model: str = "Farneback",
    vr_steps: int = 0,
    smoothing_passes: int = 0,
    normalisation_method: str = "linear",
    **normalisation_kwargs,
):
    """Forward/backward flow between two co-timed field stacks — each frame
    of ``a`` is paired with the same frame of ``b`` (reference
    ``flow.py:431-496``; used for flow-residual QC)."""
    from tobac_flow_tpu.models import batch_flow

    a = np.asarray(getattr(a, "values", a), dtype=np.float32)
    b = np.asarray(getattr(b, "values", b), dtype=np.float32)
    fwd = np.full(a.shape + (2,), np.nan, dtype=np.float32)
    bwd = np.full(a.shape + (2,), np.nan, dtype=np.float32)
    for i in range(a.shape[0] - 1):
        f, bk = batch_flow(
            np.stack([a[i], b[i]]),
            model=model,
            vr_steps=vr_steps,
            smoothing_passes=smoothing_passes,
            normalisation_method=normalisation_method,
            **normalisation_kwargs,
        )
        fwd[i] = f[0]
        bwd[i + 1] = bk[1]
    fwd[-1] = -bwd[-1]
    bwd[0] = -fwd[0]
    return fwd, bwd


class Flow(AbstractFlow):
    """Semi-Lagrangian operations driven by dense optical flow fields."""

    # opt-in for the fused detection programs (detect/fused.py); parity
    # subclasses carrying their own op stacks must set this False
    fused_detect = True

    def __init__(self, forward_flow, backward_flow) -> None:
        if forward_flow.shape != backward_flow.shape:
            raise ValueError(
                "Forward and backward flow vector arrays must have the same shape"
            )
        if forward_flow.shape[-1] != 2:
            raise ValueError(
                "Flow vectors must have a size of 2 in the trailing dimension"
            )
        self.shape = forward_flow.shape[:-1]
        self.forward_flow = forward_flow
        self.backward_flow = backward_flow

    @property
    def flow(self):
        return self.forward_flow, self.backward_flow

    def __getitem__(self, items) -> "Flow":
        return Flow(self.forward_flow[items], self.backward_flow[items])

    def convolve(
        self,
        data,
        structure=DEFAULT_STRUCTURE,
        method="linear",
        fill_value=np.nan,
        dtype=np.float32,
        func=None,
    ):
        """Flow-warped convolution of data (reference ``flow.py:105-157``)."""
        assert (
            data.shape == self.shape
        ), "Data input must have the same shape as the Flow object"
        return convolve(
            data,
            self.forward_flow,
            self.backward_flow,
            structure=structure,
            method=method,
            dtype=dtype,
            fill_value=fill_value,
            func=func,
        )

    def diff(self, data, method="linear", dtype=np.float32):
        """Semi-Lagrangian central difference along t: NaN-aware mean of the
        forward and backward one-sided differences (``flow.py:159-191``)."""
        diff_struct = np.zeros((3, 3, 3))
        diff_struct[:, 1, 1] = 1
        return self.convolve(
            data, structure=diff_struct, func=_diff_func, method=method, dtype=dtype
        )

    def sobel(
        self, data, method="linear", dtype=None, fill_value=np.nan, direction=None
    ):
        """Semi-Lagrangian Sobel edge magnitude (``flow.py:193-234``)."""
        return sobel(
            data,
            self.forward_flow,
            self.backward_flow,
            method=method,
            dtype=dtype,
            fill_value=fill_value,
            direction=direction,
        )

    def watershed(
        self, field, markers, mask=None, connectivity=1, return_device=False
    ):
        """Flow-aware watershed segmentation (``flow.py:236-278``).

        ``return_device=True`` leaves the label volume on device — the fused
        detect chain feeds it straight into the post-watershed program with
        no host round trip."""
        from tobac_flow_tpu.ops.watershed import watershed

        return watershed(
            self.forward_flow,
            self.backward_flow,
            field,
            markers,
            mask=mask,
            connectivity=connectivity,
            return_device=return_device,
        )

    def label(
        self,
        data,
        structure=DEFAULT_STRUCTURE,
        dtype=np.int32,
        overlap=0,
        absolute_overlap=1,
        subsegment_shrink=0,
        peak_min_distance=5,
    ):
        """Label 3d connected objects in the moving frame (``flow.py:280-333``)."""
        from tobac_flow_tpu.segment.label import flow_label

        return flow_label(
            self,
            data,
            structure=structure,
            dtype=dtype,
            overlap=overlap,
            absolute_overlap=absolute_overlap,
            subsegment_shrink=subsegment_shrink,
            peak_min_distance=peak_min_distance,
        )

    def link_overlap(
        self,
        data,
        structure=DEFAULT_STRUCTURE,
        dtype=np.int32,
        overlap=0,
        absolute_overlap=1,
    ):
        """Link existing labels into contiguous objects (``flow.py:335-355``)."""
        from tobac_flow_tpu.segment.label import flow_link_overlap

        return flow_link_overlap(
            self,
            data,
            structure=structure,
            dtype=dtype,
            overlap=overlap,
            absolute_overlap=absolute_overlap,
        )


def _diff_func(x):
    """NaN-aware mean of forward/backward one-sided temporal differences
    (reference ``flow.py:182-186``): nansum([x2-x1, x1-x0]) / max(#finite, 1)."""
    fwd = x[2] - x[1]
    bwd = x[1] - x[0]
    total = jnp.where(jnp.isnan(fwd), 0.0, fwd) + jnp.where(jnp.isnan(bwd), 0.0, bwd)
    count = jnp.isfinite(x[2]).astype(jnp.float32) + jnp.isfinite(x[0]).astype(
        jnp.float32
    )
    return total / jnp.maximum(count, 1.0)


def smooth_flow_step(forward_flow, backward_flow, method="linear"):
    """One smoothing pass: average each flow field with the negated,
    correspondingly-warped opposite field (reference ``flow.py:530-568``).

    The warp uses the banded-shift gather (``ops/banded.py``) for the
    nearest/linear/cubic interpolants — this sits on the CLI-default flow
    path (smoothing_passes=1), where an XLA general gather would dominate the
    whole flow program.  Lanczos falls back to the exact gather path.
    """

    def _smooth(primary, opposite):
        if method == "lanczos":
            from tobac_flow_tpu.ops.warp import warp_flow

            warped = jnp.stack(
                [
                    -warp_flow(opposite[..., 0], primary, method=method),
                    -warp_flow(opposite[..., 1], primary, method=method),
                ],
                axis=-1,
            )
        else:
            from tobac_flow_tpu.ops.banded import warp_banded_multi

            both = warp_banded_multi(
                jnp.moveaxis(jnp.asarray(opposite, dtype=jnp.float32), -1, 0),
                primary,
                radius=20,
                method=method,
            )
            warped = -jnp.moveaxis(both, 0, -1)
        stacked = jnp.stack([jnp.asarray(primary, dtype=jnp.float32), warped], axis=0)
        cnt = jnp.sum(jnp.isfinite(stacked), axis=0)
        tot = jnp.nansum(stacked, axis=0)
        return jnp.where(cnt > 0, tot / jnp.maximum(cnt, 1), jnp.nan)

    return _smooth(forward_flow, backward_flow), _smooth(backward_flow, forward_flow)


def combine_flow(*flows) -> Flow:
    """Magnitude-weighted merge of several Flow objects (``flow.py:571-603``)."""

    def _merge(fields):
        mags = [
            np.sqrt(f[..., 0] ** 2 + f[..., 1] ** 2)[..., np.newaxis] for f in fields
        ]
        return sum(f * m for f, m in zip(fields, mags)) / sum(mags)

    return Flow(
        _merge([f.forward_flow for f in flows]),
        _merge([f.backward_flow for f in flows]),
    )


def get_forward_warp(da, flow):
    """Each frame warped one step forward along the flow
    (reference ``flow.py:606-609``)."""
    forward_struct = np.zeros([3, 3, 3], dtype=bool)
    forward_struct[2, 1, 1] = True
    data = np.asarray(getattr(da, "values", da))
    return np.asarray(flow.convolve(data, structure=forward_struct))[0]


def flow_diff_mse_estimate(da, flow, cold_threshold=273.0):
    """(all-sky MSE, cold-pixel MSE) of the forward-warp residual
    (reference ``flow.py:612-617``)."""
    from tobac_flow_tpu.utils.stats import mse

    data = np.asarray(getattr(da, "values", da))
    warp = get_forward_warp(data, flow)
    wh = data < cold_threshold
    return mse(warp, data), mse(warp[wh], data[wh])


def get_flow_residual(da, flow, model="Farneback", vr_steps=1, smoothing_passes=1):
    """Residual flow between the data and its forward warp
    (reference ``flow.py:620-629``)."""
    data = np.asarray(getattr(da, "values", da))
    warp = get_forward_warp(data, flow)
    from tobac_flow_tpu.models import batch_flow

    # pairwise flow between each frame and its warped counterpart
    residual = np.full(data.shape + (2,), np.nan, dtype=np.float32)
    stacked = np.stack([data, warp], axis=1)  # (T, 2, H, W)
    for i in range(data.shape[0]):
        f, _ = batch_flow(
            stacked[i], model=model, vr_steps=vr_steps,
            smoothing_passes=smoothing_passes,
        )
        residual[i] = f[0]
    return residual


def flow_residual_mse_estimate(
    da, flow, model="Farneback", vr_steps=1, smoothing_passes=1, margin=20,
    cold_threshold=273.0,
):
    """(all-sky, cold) MSE of the residual-flow magnitude inside the margin
    (reference ``flow.py:646-657``)."""
    from tobac_flow_tpu.utils.stats import mse

    data = np.asarray(getattr(da, "values", da))
    res = get_flow_residual(da, flow, model, vr_steps, smoothing_passes)
    mag = np.sqrt(res[..., 0] ** 2 + res[..., 1] ** 2)[:, margin:-margin, margin:-margin]
    wh_cold = data[:, margin:-margin, margin:-margin] < cold_threshold
    return (
        mse(mag, np.zeros_like(mag)),
        mse(mag[wh_cold], np.zeros_like(mag[wh_cold])),
    )


def flow_magnitude(flow, direction="forward"):
    """Per-pixel magnitude of the forward or backward flow (``flow.py:632-643``)."""
    if direction == "forward":
        f = flow.forward_flow
    elif direction == "backward":
        f = flow.backward_flow
    else:
        raise ValueError("Direction must be one of 'forward', 'backward'")
    return np.sqrt(f[..., 0] ** 2 + f[..., 1] ** 2)
