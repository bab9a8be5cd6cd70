"""Reference-semantics CPU op stack for parity studies.

``CpuFlow`` is a drop-in for :class:`tobac_flow_tpu.core.flow.Flow` whose
primitives are built the way the reference builds them — cv2.remap warps
(``tobac_flow/convolve.py:8-86``), scipy per-frame connected components
(``utils/label_utils.py:143-180``) and the serial heap watershed (our
from-scratch C++ oracle, ``native/watershed.cc``, equivalent to
``_watershed.pyx``).  Running the *identical* detection science code
(``detect/detection.py``) over CpuFlow vs the TPU Flow isolates exactly the
op-stack differences and is the end-to-end parity evidence PARITY.md
reports.
"""

from __future__ import annotations

import numpy as np

from tobac_flow_tpu.core.flow import Flow
from tobac_flow_tpu.ops.convolve import DEFAULT_STRUCTURE, structure_taps

_CV2_INTERP = None


def _cv2():
    import cv2

    global _CV2_INTERP
    if _CV2_INTERP is None:
        _CV2_INTERP = {
            "nearest": cv2.INTER_NEAREST,
            "linear": cv2.INTER_LINEAR,
            "cubic": cv2.INTER_CUBIC,
            "lanczos": cv2.INTER_LANCZOS4,
        }
    return cv2


def cpu_warp_plane(img, flow, offsets, method="linear", fill_value=np.nan):
    """cv2.remap the frame to flow-displaced integer-offset locations
    (reference ``convolve.py:8-86``)."""
    cv2 = _cv2()
    h, w = img.shape
    base_x = np.arange(w, dtype=np.float32) + flow[..., 0]
    base_y = np.arange(h, dtype=np.float32)[:, None] + flow[..., 1]
    outs = []
    for ox, oy in offsets:
        outs.append(
            cv2.remap(
                img.astype(np.float32),
                base_x + ox,
                base_y + oy,
                _CV2_INTERP[method],
                None,
                cv2.BORDER_CONSTANT,
                fill_value,
            )
        )
    return np.stack(outs, axis=0)


def cpu_shift_plane(img, offsets, fill_value=np.nan):
    h, w = img.shape
    outs = []
    for ox, oy in offsets:
        padded = np.pad(
            img.astype(np.float32),
            ((abs(oy), abs(oy)), (abs(ox), abs(ox))),
            constant_values=fill_value,
        )
        outs.append(padded[abs(oy) + oy : abs(oy) + oy + h, abs(ox) + ox : abs(ox) + ox + w])
    return np.stack(outs, axis=0)


def cpu_convolve(
    data,
    forward_flow,
    backward_flow,
    structure=None,
    method="linear",
    dtype=np.float32,
    fill_value=np.nan,
    func=None,
):
    """Host flow-warped convolution with the reference's tap ordering."""
    if structure is None:
        structure = DEFAULT_STRUCTURE
    back_taps, same_taps, fwd_taps = structure_taps(structure)
    data = np.asarray(data, dtype=np.float32)
    t, h, w = data.shape
    n_taps = len(back_taps) + len(same_taps) + len(fwd_taps)
    stacked = np.empty((n_taps, t, h, w), np.float32)
    fill_frame = np.full((h, w), fill_value, np.float32)
    for i in range(t):
        parts = []
        if back_taps:
            if i > 0:
                parts.append(
                    cpu_warp_plane(
                        data[i - 1], backward_flow[i], back_taps, method, fill_value
                    )
                )
            else:
                parts.append(np.stack([fill_frame] * len(back_taps)))
        if same_taps:
            parts.append(cpu_shift_plane(data[i], same_taps, fill_value))
        if fwd_taps:
            if i < t - 1:
                parts.append(
                    cpu_warp_plane(
                        data[i + 1], forward_flow[i], fwd_taps, method, fill_value
                    )
                )
            else:
                parts.append(np.stack([fill_frame] * len(fwd_taps)))
        stacked[:, i] = np.concatenate(parts, axis=0)
    if func is None:
        return stacked.astype(dtype)
    res = np.asarray(func(stacked))
    res = np.where(np.isnan(data), fill_value, res)
    return res.astype(dtype)


def _diff_func(x):
    fwd = x[2] - x[1]
    bwd = x[1] - x[0]
    total = np.where(np.isnan(fwd), 0.0, fwd) + np.where(np.isnan(bwd), 0.0, bwd)
    count = np.isfinite(x[2]).astype(np.float32) + np.isfinite(x[0]).astype(np.float32)
    return total / np.maximum(count, 1.0)


_SOBEL = np.multiply.outer(
    np.array([1, 2, 1]), np.multiply.outer(np.array([1, 2, 1]), np.array([-1, 0, 1]))
)
_W_T = _SOBEL.ravel().astype(np.float32)
_W_Y = _SOBEL.transpose([1, 2, 0]).ravel().astype(np.float32)
_W_X = _SOBEL.transpose([2, 0, 1]).ravel().astype(np.float32)


def _sobel_reduce(x, direction):
    d = x - x[13]
    if direction == "uphill":
        d = np.fmax(d, 0.0)
    elif direction == "downhill":
        d = np.fmin(d, 0.0)
    d = np.where(np.isnan(d), 0.0, d)
    shape = (-1,) + (1,) * (d.ndim - 1)
    gt = np.sum(d * _W_T.reshape(shape), axis=0)
    gy = np.sum(d * _W_Y.reshape(shape), axis=0)
    gx = np.sum(d * _W_X.reshape(shape), axis=0)
    return np.sqrt(gt * gt + gy * gy + gx * gx)


def cpu_flat_label(mask, structure=DEFAULT_STRUCTURE):
    """scipy per-frame CCL with zeroed temporal connectivity."""
    from scipy import ndimage as ndi

    s = np.asarray(structure).copy()
    s[0] = 0
    s[2] = 0
    return ndi.label(np.asarray(mask) != 0, structure=s)[0].astype(np.int32)


class CpuFlow(Flow):
    """Flow with reference-built primitives (cv2 + scipy + serial heap)."""

    # the science layer must call THESE op methods, never the fused device
    # programs keyed off the base class (detect/fused.supports_fused)
    fused_detect = False

    def convolve(
        self,
        data,
        structure=DEFAULT_STRUCTURE,
        method="linear",
        fill_value=np.nan,
        dtype=np.float32,
        func=None,
    ):
        data = np.asarray(getattr(data, "values", data))
        return cpu_convolve(
            data,
            np.asarray(self.forward_flow),
            np.asarray(self.backward_flow),
            structure=structure,
            method=method,
            dtype=dtype,
            fill_value=fill_value,
            func=func,
        )

    def diff(self, data, method="linear", dtype=np.float32):
        diff_struct = np.zeros((3, 3, 3))
        diff_struct[:, 1, 1] = 1
        return self.convolve(
            data, structure=diff_struct, func=_diff_func, method=method, dtype=dtype
        )

    def sobel(
        self, data, method="linear", dtype=None, fill_value=np.nan, direction=None
    ):
        data = np.asarray(getattr(data, "values", data))
        return self.convolve(
            data,
            structure=np.ones((3, 3, 3), bool),
            method=method,
            fill_value=fill_value,
            dtype=dtype or np.float32,
            func=lambda x: _sobel_reduce(x, direction),
        )

    def watershed(self, field, markers, mask=None, connectivity=1):
        from tobac_flow_tpu.native import flow_watershed_host

        field = np.asarray(getattr(field, "values", field), dtype=np.float32)
        markers = np.asarray(getattr(markers, "values", markers)).astype(np.int32)
        if mask is None:
            mask_i = np.ones(field.shape, np.int8)
        else:
            mask_i = np.asarray(getattr(mask, "values", mask)).astype(np.int8)
        return flow_watershed_host(
            np.asarray(self.forward_flow),
            np.asarray(self.backward_flow),
            np.where(np.isnan(field), np.inf, field).astype(np.float32),
            markers,
            mask=mask_i,
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
        mask = np.asarray(getattr(data, "values", data)) != 0
        if subsegment_shrink != 0:
            from tobac_flow_tpu.segment.subsegment import subsegment_labels

            flat = subsegment_labels(
                mask, shrink_factor=subsegment_shrink,
                peak_min_distance=peak_min_distance,
            )
        else:
            flat = cpu_flat_label(mask, structure)
        return self._link(flat, structure, dtype, overlap, absolute_overlap)

    def link_overlap(
        self,
        data,
        structure=DEFAULT_STRUCTURE,
        dtype=np.int32,
        overlap=0,
        absolute_overlap=1,
    ):
        flat = np.asarray(getattr(data, "values", data))
        return self._link(flat, structure, dtype, overlap, absolute_overlap)

    def _link(self, flat, structure, dtype, overlap, absolute_overlap):
        """Overlap-graph linking with cv2-warped neighbour labels (reference
        ``label.py:84-175``); reuses the package's vectorised edge logic."""
        import scipy.sparse as sparse
        import scipy.sparse.csgraph as csgraph

        from tobac_flow_tpu.segment.label import _overlap_edges

        n_labels = int(flat.max())
        if n_labels == 0:
            return np.zeros(flat.shape, dtype=dtype)
        structure = np.asarray(structure)
        label_struct = structure * np.array([1, 0, 1])[:, None, None]
        warped = cpu_convolve(
            flat.astype(np.float32),
            np.asarray(self.forward_flow),
            np.asarray(self.backward_flow),
            structure=label_struct,
            method="nearest",
            dtype=np.int32,
            fill_value=0,
        )
        back_labels, forward_labels = warped[0], warped[1]
        sizes = np.bincount(flat.ravel(), minlength=n_labels + 1).astype(np.int64)
        edges = np.concatenate(
            [
                _overlap_edges(flat, forward_labels, sizes, overlap, absolute_overlap),
                _overlap_edges(flat, back_labels, sizes, overlap, absolute_overlap),
            ],
            axis=0,
        )
        graph = sparse.coo_matrix(
            (np.ones(len(edges), np.int8), (edges[:, 0], edges[:, 1])),
            shape=(n_labels + 1, n_labels + 1),
        )
        comp = csgraph.connected_components(graph, directed=False)[1]
        n_comp = int(comp.max()) + 1
        first = np.full(n_comp, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(first, comp[1:], np.arange(1, n_labels + 1))
        active = first != np.iinfo(np.int64).max
        new_id = np.zeros(n_comp, np.int64)
        new_id[active] = np.argsort(np.argsort(first[active], kind="stable")) + 1
        lut = np.zeros(n_labels + 1, dtype=dtype)
        lut[1:] = new_id[comp[1:]]
        return lut[flat]
