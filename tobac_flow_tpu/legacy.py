"""Legacy flow-engine compatibility layer.

The reference keeps an older pure-numpy semi-Lagrangian stack in
``tobac_flow/legacy_flow.py``: nearest-neighbour flow convolution via
ravelled integer indices (111-183), a flow Sobel (281-450), the iterative
pointer-convergence "network" watershed (451-731) and a min-label-propagation
``flow_label`` (732-835).  Those iterative data-parallel formulations are the
algorithmic ancestors of this framework's device kernels, so the legacy API
here simply adapts the old call signatures onto the modern ops — the
network-watershed and label-propagation behaviour is what
``ops/watershed``/``ops/ccl`` implement natively.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "FlowFunc",
    "Flow_Func",
    "flow_convolve_nearest",
    "flow_sobel",
    "flow_network_watershed",
    "flow_label",
]


class FlowFunc:
    """The legacy engine's callable flow container with parabolic
    interpolation in t (reference ``legacy_flow.py:9-35``):

        dx(t) = t(t+1)/2 · dx_forward + t(t−1)/2 · dx_backward

    so dx(1) = forward, dx(−1) = backward and dx(0) = 0, with a smooth
    quadratic in between (the legacy stack samples fractional timesteps of
    the motion field through this)."""

    def __init__(self, flow_x_for, flow_x_back, flow_y_for, flow_y_back):
        self.flow_x_for = np.asarray(flow_x_for)
        self.flow_x_back = np.asarray(flow_x_back)
        self.flow_y_for = np.asarray(flow_y_for)
        self.flow_y_back = np.asarray(flow_y_back)
        self.shape = self.flow_x_for.shape

    def __getitem__(self, items):
        return FlowFunc(
            self.flow_x_for[items],
            self.flow_x_back[items],
            self.flow_y_for[items],
            self.flow_y_back[items],
        )

    def __call__(self, t):
        a = 0.5 * t * (t + 1)
        b = 0.5 * t * (t - 1)
        return (
            a * self.flow_x_for + b * self.flow_x_back,
            a * self.flow_y_for + b * self.flow_y_back,
        )

    @classmethod
    def from_flow(cls, flow):
        """Build from a modern Flow object (forward/backward (t,y,x,2))."""
        return cls(
            flow.forward_flow[..., 0],
            flow.backward_flow[..., 0],
            flow.forward_flow[..., 1],
            flow.backward_flow[..., 1],
        )


Flow_Func = FlowFunc  # reference-spelling alias


def _flow_obj(forward_flow, backward_flow):
    from tobac_flow_tpu.core.flow import Flow

    return Flow(np.asarray(forward_flow), np.asarray(backward_flow))


def flow_convolve_nearest(
    data, forward_flow, backward_flow, structure=None, fill_value=0, dtype=np.int32
):
    """Nearest-neighbour flow convolution (legacy ``legacy_flow.py:111-183``)."""
    from tobac_flow_tpu.ops.convolve import DEFAULT_STRUCTURE, convolve

    return convolve(
        data,
        np.asarray(forward_flow),
        np.asarray(backward_flow),
        structure=DEFAULT_STRUCTURE if structure is None else structure,
        method="nearest",
        dtype=dtype,
        fill_value=fill_value,
    )


def flow_sobel(data, forward_flow, backward_flow, direction=None, **kwargs):
    """Flow-warped Sobel magnitude (legacy ``legacy_flow.py:281-450``)."""
    from tobac_flow_tpu.ops.sobel import sobel

    return sobel(
        data, np.asarray(forward_flow), np.asarray(backward_flow),
        direction=direction, **kwargs,
    )


def flow_network_watershed(
    field, markers, forward_flow, backward_flow, mask=None, structure=None,
    max_iter=100, **kwargs
):
    """Iterative pointer-network watershed (legacy ``legacy_flow.py:451-731``):
    each pixel repeatedly adopts the label of its lowest flow-warped
    neighbour until a fixed point — exactly the Jacobi flood the modern
    device watershed runs."""
    from tobac_flow_tpu.ops.watershed import watershed

    return watershed(
        np.asarray(forward_flow),
        np.asarray(backward_flow),
        field,
        markers,
        mask=mask,
        connectivity=1 if structure is None else structure,
        max_iters=max_iter * 4,
    )


def flow_label(mask, forward_flow, backward_flow, structure=None, **kwargs):
    """Min-label-propagation flow labelling (legacy ``legacy_flow.py:732-835``)."""
    from tobac_flow_tpu.ops.convolve import DEFAULT_STRUCTURE
    from tobac_flow_tpu.segment.label import flow_label as _flow_label

    return _flow_label(
        _flow_obj(forward_flow, backward_flow),
        mask,
        structure=DEFAULT_STRUCTURE if structure is None else structure,
        **kwargs,
    )
