"""DCC detection science layer.

Behavioural parity with reference ``tobac_flow/detection.py``: growth-rate
estimation in the moving frame, curvature/peak filters, core detection
(``detect_cores``, reference lines 372-482 with identical default
thresholds), anvil marker detection and watershed-based anvil segmentation
(lines 500-687).  Dense (t, y, x) work runs on device through the fused op
layer; the ragged per-label bookkeeping runs on host.
"""

from __future__ import annotations

import warnings

import jax.numpy as jnp
import numpy as np

from tobac_flow_tpu.decorators import configure_dataarray
from tobac_flow_tpu.detect.analysis import (
    filter_labels_by_length_and_multimask_legacy,
    find_object_lengths,
    mask_labels,
)
from tobac_flow_tpu.ops import morphology as morph
from tobac_flow_tpu.utils.datetime_utils import get_time_diff_from_coord
from tobac_flow_tpu.utils.labels import (
    labeled_comprehension,
    make_step_labels,
    remap_labels,
    slice_labels,
)
from tobac_flow_tpu.utils.normalisation import linearise_field

__all__ = [
    "filtered_tdiff",
    "get_curvature_filter",
    "get_peak_filter",
    "get_growth_rate",
    "get_combined_filters",
    "detect_cores",
    "get_anvil_markers",
    "detect_anvils",
    "relabel_anvils",
    "get_watershed_mask",
    "get_combined_edge_field",
    "nan_gaussian_filter",
    "detect_growth_markers",
    "detect_growth_markers_multichannel",
    "edge_watershed",
]

nan_gaussian_filter = morph.nan_gaussian_filter


def _vals(a):
    return np.asarray(getattr(a, "values", a))


def _t_struct():
    s = np.zeros((3, 3, 3))
    s[:, 1, 1] = 1
    return s


def _s_struct_2d():
    """Spatial-only connectivity-1 structure (temporal planes zeroed)."""
    grid = np.abs(np.indices((3, 3, 3)) - 1).sum(axis=0)
    s = grid <= 1
    s[0] = 0
    s[2] = 0
    return s


def _nanmean0(x):
    return jnp.nanmean(x, axis=0)


def _any0(x):
    return jnp.any(x, axis=0).astype(jnp.int32)


def filtered_tdiff(flow, raw_diff):
    """Temporal moving mean of a time-derivative in the moving frame
    (reference ``detection.py:33-60``)."""
    return flow.convolve(_vals(raw_diff), structure=_t_struct(), func=_nanmean0)


def get_curvature_filter(field, sigma=2, threshold=0, direction="negative"):
    """Mask where the smoothed field's x and y curvature share the requested
    sign (reference ``detection.py:64-94``)."""
    field = _vals(field)
    smoothed = np.asarray(morph.gaussian_filter(field, (0, sigma, sigma)))
    x_diff = np.zeros(field.shape)
    x_diff[:, :, 1:-1] = np.diff(smoothed, n=2, axis=2)
    y_diff = np.zeros(field.shape)
    y_diff[:, 1:-1] = np.diff(smoothed, n=2, axis=1)

    if direction == "negative":
        cond = np.logical_and(x_diff < -threshold, y_diff < -threshold)
    elif direction == "positive":
        cond = np.logical_and(x_diff > threshold, y_diff > threshold)
    else:
        raise ValueError("Direction must be either positive or negative")
    s = _s_struct_2d()
    return np.asarray(
        morph.binary_opening(morph.binary_fill_holes(cond, structure=s), structure=s)
    )


def get_peak_filter(field, sigma=2, min_distance=10, direction="negative"):
    """Mask of regions within 5 px of local extrema of the smoothed field
    (reference ``detection.py:149-168``; the EDT<5 construction is a
    radius-5 disk dilation of the peak mask)."""
    field = _vals(field)
    smoothed = np.asarray(morph.gaussian_filter(field, (0, sigma, sigma)))
    if direction == "negative":
        pass
    elif direction == "positive":
        smoothed = -smoothed
    else:
        raise ValueError("Direction must be either positive or negative")
    out = np.zeros(field.shape, dtype=np.int32)
    yy, xx = np.mgrid[-4:5, -4:5]
    disk = (yy**2 + xx**2) < 25  # EDT < 5
    for i in range(field.shape[0]):
        peaks = np.asarray(morph.peak_local_max_mask(smoothed[i], min_distance=10))
        out[i] = np.asarray(morph.binary_dilation(peaks, structure=disk))
    return out


def get_growth_rate(flow, field, method: str = "linear"):
    """Growth/cooling rate: semi-Lagrangian diff per minute, spatially
    smoothed along the flow (reference ``detection.py:171-200``)."""
    dt = get_time_diff_from_coord(field.t)[:, np.newaxis, np.newaxis]
    growth = np.asarray(flow.diff(_vals(field), method=method)) / dt
    return flow.convolve(
        growth, structure=_s_struct_2d(), func=_nanmean0, method=method
    )


def get_combined_filters(flow, bt, wvd, swd, use_wvd=True):
    """Combined cloud-top filter from BT, WVD and SWD fields
    (reference ``detection.py:301-354``)."""
    t_struct = _t_struct().astype(bool)
    s_struct = _s_struct_2d()

    bt_curv = get_curvature_filter(bt, direction="positive")
    bt_peak = get_peak_filter(bt, sigma=0.5, direction="positive")
    bt_filter = flow.convolve(
        np.logical_or(bt_curv, bt_peak).astype(int),
        structure=t_struct,
        method="nearest",
        fill_value=0,
        dtype=np.int32,
        func=_any0,
    )

    if use_wvd:
        wvd_curv = get_curvature_filter(wvd, direction="negative")
        wvd_peak = get_peak_filter(wvd, sigma=0.5, direction="negative")
        wvd_filter = flow.convolve(
            np.logical_or(wvd_curv, wvd_peak).astype(int),
            structure=t_struct,
            method="nearest",
            fill_value=0,
            dtype=np.int32,
            func=_any0,
        )
        combined = np.logical_or(np.asarray(bt_filter), np.asarray(wvd_filter))
    else:
        combined = np.asarray(bt_filter) != 0
    combined = np.asarray(
        morph.binary_opening(
            morph.binary_fill_holes(combined, structure=s_struct), structure=s_struct
        )
    )
    swd_filter = 1 - linearise_field(_vals(swd), 2.5, 7.5)
    return combined.astype(float) * swd_filter


@configure_dataarray(
    name="core_label",
    drop_attrs=[
        "standard_name",
        "units",
        "valid_range",
        "_FillValue",
        "missing_value",
        "cell_methods",
        "units_metadata",
    ],
    long_name="Labels of detected core regions",
    units="",
    cell_measures="area: area",
)
def detect_cores(
    flow,
    bt,
    wvd,
    swd,
    wvd_threshold=0.25,
    bt_threshold=0.5,
    overlap=0.5,
    absolute_overlap=4,
    subsegment_shrink=0.0,
    min_length=3,
    use_wvd=True,
):
    """Detect growing convective cores from BT/WVD/SWD channels
    (reference ``detection.py:372-482``, identical defaults).

    On the package's device Flow the dense front-end (combined filters +
    growth rates + marker thresholds) runs as one fused XLA program
    (``detect.fused``) — bit-identical to the op-by-op form below, which
    remains the path for alternative op stacks (parity oracles)."""
    from tobac_flow_tpu.detect import fused as _fused

    if _fused.supports_fused(flow):
        combined_markers, bt_area, wvd_area = _fused.fused_core_markers(
            flow, bt, wvd, swd,
            use_wvd=use_wvd,
            wvd_threshold=wvd_threshold,
            bt_threshold=bt_threshold,
        )
        if use_wvd:
            print("WVD growth above threshold: area =", wvd_area)
        print("BT growth above threshold: area =", bt_area)
        print("Detected markers: area =", np.sum(combined_markers))
    else:
        combined_filter = get_combined_filters(flow, bt, wvd, swd, use_wvd=use_wvd)

        s_struct = _s_struct_2d().copy()
        s_struct[0] = 0
        s_struct[2] = 0

        bt_growth = np.asarray(get_growth_rate(flow, -bt, method="cubic"))
        bt_markers = (bt_growth * combined_filter) > bt_threshold

        if use_wvd:
            wvd_growth = np.asarray(get_growth_rate(flow, wvd, method="cubic"))
            wvd_markers = (wvd_growth * combined_filter) > wvd_threshold
            combined_markers = np.asarray(
                morph.binary_opening(
                    np.logical_or(wvd_markers, bt_markers), structure=s_struct
                )
            )
            print("WVD growth above threshold: area =", np.sum(wvd_markers))
        else:
            combined_markers = np.asarray(
                morph.binary_opening(bt_markers, structure=s_struct)
            )

        print("BT growth above threshold: area =", np.sum(bt_markers))
        print("Detected markers: area =", np.sum(combined_markers))

    core_labels = flow.label(
        combined_markers,
        overlap=overlap,
        absolute_overlap=absolute_overlap,
        subsegment_shrink=subsegment_shrink,
    )
    print("Initial core count:", np.max(core_labels))

    core_label_lengths = find_object_lengths(core_labels)
    print(
        "Core labels meeting length threshold:", np.sum(core_label_lengths > min_length)
    )
    core_label_wvd_mask = mask_labels(core_labels, _vals(wvd) > -5)
    print("Core labels meeting WVD threshold:", np.sum(core_label_wvd_mask))

    combined_mask = np.logical_and(core_label_lengths > min_length, core_label_wvd_mask)
    core_labels = remap_labels(core_labels, combined_mask)

    # cooling-rate filter: max mean-BT drop over min_length steps per core
    core_step_labels = slice_labels(core_labels)
    mode = lambda x: np.bincount(x.astype(np.int64)).argmax()
    core_step_core_index = labeled_comprehension(
        core_labels, core_step_labels, mode, default=0, dtype=np.int64
    )
    core_step_bt_mean = labeled_comprehension(
        _vals(bt), core_step_labels, np.nanmean, default=np.nan
    )
    t_coord = np.asarray(getattr(bt.t, "values", bt.t))
    core_step_t = labeled_comprehension(
        t_coord[:, np.newaxis, np.newaxis],
        core_step_labels,
        np.nanmin,
        default=np.datetime64("1970-01-01", "ns"),
        dtype=t_coord.dtype,
    )

    def bt_diff_func(step_bt, pos):
        step_t = core_step_t[pos]
        order = np.argsort(step_t)
        sb = step_bt[order]
        st = step_t[order]
        if sb.size <= min_length:
            return 0
        dt_min = (
            (st[min_length:] - st[:-min_length]).astype("timedelta64[s]").astype(int)
            / 60
        )
        diffs = (sb[:-min_length] - sb[min_length:]) / dt_min
        return np.nanmax(diffs) if diffs.size else 0

    core_bt_diff_mean = labeled_comprehension(
        core_step_bt_mean,
        core_step_core_index,
        bt_diff_func,
        default=0,
        dtype=np.float64,
        pass_positions=True,
    )
    wh_valid = core_bt_diff_mean >= 0.5
    print("Core labels meeting cooling rate threshold:", np.sum(wh_valid))
    return remap_labels(core_labels, wh_valid)


@configure_dataarray(
    name="anvil_marker_label",
    drop_attrs=[
        "standard_name",
        "units",
        "valid_range",
        "_FillValue",
        "missing_value",
        "cell_methods",
        "units_metadata",
    ],
    long_name="labels for anvil markers",
    units="",
    cell_measures="area: area",
)
def get_anvil_markers(
    flow,
    field,
    threshold=-5,
    overlap=0.5,
    absolute_overlap=5,
    subsegment_shrink=0,
    min_length=3,
):
    """Anvil seed markers from a thresholded field (reference
    ``detection.py:500-520``)."""
    from tobac_flow_tpu.detect import fused as _fused

    s_struct = _s_struct_2d()
    if _fused.supports_fused(flow):
        mask = _fused.fused_anvil_marker_mask(field, threshold)
    else:
        mask = np.asarray(
            morph.binary_opening(_vals(field) >= threshold, structure=s_struct)
        )
    marker_labels = flow.label(
        mask,
        overlap=overlap,
        absolute_overlap=absolute_overlap,
        subsegment_shrink=subsegment_shrink,
    )
    lengths = find_object_lengths(marker_labels)
    return remap_labels(marker_labels, lengths > min_length)


def get_watershed_mask(field, erode_distance: int = 1):
    """Mask where field <= 0, eroded while keeping NaN regions masked
    (reference ``detection.py:590-617``)."""
    field = _vals(field)
    wh_nan = np.isnan(field)
    mask = np.logical_or(field <= 0, wh_nan)
    mask = np.array(
        morph.binary_erosion(
            mask,
            structure=np.ones((3, 3, 3)),
            iterations=erode_distance,
            border_value=1,
        )
    )
    mask[wh_nan] = True
    return mask


def get_combined_edge_field(flow, field, **kwargs):
    """Uphill-Sobel edge field minus the field, NaN -> inf (reference
    ``detection.py:620-642``)."""
    field = _vals(field)
    edges = np.array(flow.sobel(field, direction="uphill", method="cubic"))
    edges[edges > 0] += 1
    edges = edges - field
    edges[np.isnan(field)] = np.inf
    return edges


@configure_dataarray(
    name="anvil_label",
    drop_attrs=[
        "standard_name",
        "units",
        "valid_range",
        "_FillValue",
        "missing_value",
        "cell_methods",
        "units_metadata",
    ],
    long_name="Labels of detected anvil regions",
    units="",
    cell_measures="area: area",
)
def detect_anvils(
    flow,
    field,
    markers=None,
    upper_threshold=-5,
    lower_threshold=-15,
    erode_distance=1,
    min_length=3,
):
    """Watershed anvil segmentation seeded by markers (reference
    ``detection.py:538-587``).

    On the device Flow with explicit markers, the dense prep (linearise,
    marker erosion, watershed mask, uphill-Sobel edges) and the post pass run
    as fused device programs feeding the watershed without host round trips
    (``detect.fused``)."""
    from tobac_flow_tpu.detect import fused as _fused

    s_struct = _s_struct_2d()
    conn = np.abs(np.indices((3, 3, 3)) - 1).sum(axis=0) <= 1
    if _fused.supports_fused(flow) and markers is not None:
        markers = _vals(markers)
        edges, eroded_markers = _fused.fused_anvil_pre_watershed(
            flow, field, markers, lower_threshold, upper_threshold, erode_distance
        )
        raw_labels = flow.watershed(
            edges, eroded_markers, mask=None, connectivity=conn,
            return_device=True,
        )
        del edges, eroded_markers
        anvil_labels = _fused.fused_anvil_post_watershed(raw_labels, markers)
    else:
        field = linearise_field(_vals(field), lower_threshold, upper_threshold)
        if markers is None:
            markers = field >= 1
        markers = _vals(markers)
        eroded_markers = markers * np.asarray(
            morph.binary_erosion(markers != 0, structure=s_struct)
        ).astype(int)
        mask = get_watershed_mask(field, erode_distance=erode_distance)
        eroded_markers[mask] = -1
        edges = get_combined_edge_field(flow, field)
        anvil_labels = flow.watershed(
            edges, eroded_markers, mask=None, connectivity=conn
        )

        anvil_labels[anvil_labels < 0] = 0
        anvil_labels *= np.asarray(
            morph.binary_opening(anvil_labels != 0, structure=s_struct)
        ).astype(int)

        wh_markers = markers > 0
        anvil_labels[wh_markers] = markers[wh_markers]

    lengths = find_object_lengths(anvil_labels)
    marker_overlap = mask_labels(anvil_labels, markers != 0)
    return remap_labels(anvil_labels, np.logical_and(lengths > min_length, marker_overlap))


@configure_dataarray(
    name="anvil_label",
    drop_attrs=[
        "standard_name",
        "units",
        "valid_range",
        "_FillValue",
        "missing_value",
        "cell_methods",
        "units_metadata",
    ],
    long_name="Labels of detected anvil regions",
    units="",
    cell_measures="area: area",
)
def relabel_anvils(
    flow,
    anvil_labels,
    markers=None,
    overlap=0.5,
    absolute_overlap=5,
    min_length=3,
):
    """Split anvils to per-step labels and re-link them along the flow
    (reference ``detection.py:660-687``)."""
    anvil_labels = flow.link_overlap(
        make_step_labels(_vals(anvil_labels)),
        overlap=overlap,
        absolute_overlap=absolute_overlap,
    )
    lengths = find_object_lengths(anvil_labels)
    if markers is not None:
        marker_overlap = mask_labels(anvil_labels, _vals(markers) != 0)
        keep = np.logical_and(lengths > min_length, marker_overlap)
    else:
        keep = lengths > min_length
    return remap_labels(anvil_labels, keep)


# ----------------------------------------------------------------------------
# legacy detection path (reference detection.py:98-125, 203-298) — kept for
# API completeness with the old dcc_detect script
# ----------------------------------------------------------------------------


def detect_growth_markers(flow, wvd):
    wvd_diff_raw = np.asarray(flow.diff(_vals(wvd))) / get_time_diff_from_coord(wvd.t)[
        :, np.newaxis, np.newaxis
    ]
    wvd_diff_smoothed = np.asarray(filtered_tdiff(flow, wvd_diff_raw))
    s2 = np.zeros((1, 3, 3), bool)
    s2[0, 1, :] = True
    s2[0, :, 1] = True
    wvd_diff_filtered = np.asarray(
        morph.grey_opening(wvd_diff_smoothed, footprint=s2)
    ) * get_curvature_filter(wvd)
    from tobac_flow_tpu.detect.analysis import (
        filter_labels_by_length,
        filter_labels_by_mask,
    )

    marker_labels = flow.label(
        np.asarray(morph.binary_opening(wvd_diff_filtered >= 0.25, structure=s2))
    )
    marker_labels = filter_labels_by_length(marker_labels, 3)
    marker_labels = filter_labels_by_mask(marker_labels, wvd_diff_filtered >= 0.5)
    marker_labels = filter_labels_by_mask(marker_labels, _vals(wvd) >= -5)
    return wvd_diff_smoothed, marker_labels


def detect_growth_markers_multichannel(
    flow,
    wvd,
    bt,
    t_sigma=1,
    overlap=0.5,
    subsegment_shrink=0,
    min_length=4,
    lower_threshold=0.25,
    upper_threshold=0.5,
):
    wvd_diff_smoothed = np.asarray(
        filtered_tdiff(
            flow,
            np.asarray(flow.diff(_vals(wvd)))
            / get_time_diff_from_coord(wvd.t)[:, np.newaxis, np.newaxis],
        )
    )
    bt_diff_smoothed = np.asarray(
        filtered_tdiff(
            flow,
            np.asarray(flow.diff(_vals(bt)))
            / get_time_diff_from_coord(bt.t)[:, np.newaxis, np.newaxis],
        )
    )
    markers = np.logical_or(
        (wvd_diff_smoothed * get_curvature_filter(wvd)) >= lower_threshold,
        (bt_diff_smoothed * get_curvature_filter(bt, direction="positive"))
        <= -lower_threshold,
    )
    s2 = np.zeros((1, 3, 3), bool)
    s2[0, 1, :] = True
    s2[0, :, 1] = True
    markers = flow.label(
        np.asarray(morph.binary_opening(markers, structure=s2)),
        overlap=overlap,
        subsegment_shrink=subsegment_shrink,
    )
    if np.count_nonzero(markers) > 0:
        markers = filter_labels_by_length_and_multimask_legacy(
            markers,
            [
                wvd_diff_smoothed >= upper_threshold,
                bt_diff_smoothed <= -upper_threshold,
                _vals(wvd) > -5,
            ],
            min_length,
        )
    else:
        warnings.warn("No regions detected in labeled array", RuntimeWarning)
    return wvd_diff_smoothed, bt_diff_smoothed, markers


def edge_watershed(
    flow,
    field,
    markers,
    upper_threshold,
    lower_threshold,
    erode_distance=5,
    verbose=False,
):
    """Legacy edge-based watershed (reference ``detection.py:257-298``)."""
    field = np.clip(_vals(field), lower_threshold, upper_threshold)
    markers = _vals(markers)
    field[markers != 0] = upper_threshold
    s = np.ones((1, 3, 3))
    mask = np.asarray(
        morph.binary_erosion(
            field == lower_threshold,
            structure=s,
            iterations=erode_distance,
            border_value=1,
        )
    )
    edges = np.asarray(flow.sobel(field, method="nearest"))
    out = flow.watershed(edges, markers, mask=mask)
    s2 = _s_struct_2d()
    out = out * np.asarray(morph.binary_opening(out != 0, structure=s2))
    return out
