"""Flow-aware labelling: connected-component tracking in the moving frame.

Parity target: reference ``tobac_flow/label.py`` (``flow_label`` lines 84-175,
``flow_link_overlap`` lines 249-321).  The pipeline is

1. per-frame connected components (device CCL, ``ops/ccl.py``),
2. warp the label raster one step forward/backward along the flow
   (nearest-neighbour ``convolve`` with the t±1 centre taps),
3. link label pairs whose warped overlap passes the absolute (strictly
   greater) and proportional (>= overlap × min area) thresholds,
4. resolve the undirected overlap graph to connected components and renumber
   by each group's smallest member label.

Steps 1-2 run on device.  Step 3 is a vectorised pair-histogram (numpy
bincount over fused (label, warped-label) keys) instead of the reference's
per-label Python BFS (``label.py:145-175``) — identical link decisions, no
serial graph walk.  Step 4 uses scipy's connected_components.
"""

from __future__ import annotations

import warnings

import numpy as np
import scipy.sparse as sparse
import scipy.sparse.csgraph as csgraph

from tobac_flow_tpu.ops.ccl import flat_label
from tobac_flow_tpu.ops.convolve import DEFAULT_STRUCTURE, convolve

__all__ = ["flow_label", "flow_link_overlap", "link_labels_by_overlap"]


def _warped_neighbour_labels(flow, flat_labels, structure, dtype):
    """Warp the label raster to the previous/next timestep positions
    (reference ``label.py:133-137``): returns (back_labels, forward_labels)."""
    structure = np.asarray(structure)
    label_struct = structure * np.array([1, 0, 1])[:, np.newaxis, np.newaxis]
    # the temporal planes must carry exactly the centre tap each
    if np.count_nonzero(label_struct[0]) != 1 or np.count_nonzero(label_struct[2]) != 1:
        raise ValueError(
            "structure must have exactly the centre tap in its temporal planes"
        )
    warped = convolve(
        flat_labels,
        flow.forward_flow,
        flow.backward_flow,
        structure=label_struct,
        method="nearest",
        dtype=dtype,
        fill_value=0,
    )
    return np.asarray(warped[0]), np.asarray(warped[1])


def _overlap_edges(flat_labels, warped_labels, sizes, overlap, absolute_overlap):
    """Label pairs (a, b) whose overlap count passes both thresholds.

    For each label a, counts how often label b appears in ``warped_labels``
    within a's footprint; passes iff count > absolute_overlap and
    count >= overlap * min(|a|, |b|) (reference ``label_utils.py:352-376``).
    """
    a = flat_labels.ravel()
    b = warped_labels.ravel()
    wh = (a > 0) & (b > 0)
    if not np.any(wh):
        return np.empty((0, 2), dtype=np.int64)
    a = a[wh].astype(np.int64)
    b = b[wh].astype(np.int64)
    n = sizes.size  # sizes[v] = pixel count of label v; index 0 unused
    keys = a * n + b
    uniq, counts = np.unique(keys, return_counts=True)
    ua = uniq // n
    ub = uniq % n
    min_size = np.minimum(sizes[ua], sizes[ub])
    ok = (counts > absolute_overlap) & (counts >= overlap * min_size)
    return np.stack([ua[ok], ub[ok]], axis=-1)


def link_labels_by_overlap(
    flow,
    flat_labels,
    structure=DEFAULT_STRUCTURE,
    dtype=np.int32,
    overlap: float = 0.0,
    absolute_overlap: int = 0,
):
    """Merge per-frame labels into tracked objects via warped overlap.

    Returns a relabelled array where linked groups share one id, numbered by
    each group's smallest original label (matching the reference BFS
    processing order, ``label.py:145-175``).
    """
    flat_labels = np.asarray(flat_labels)
    n_labels = int(flat_labels.max())
    if n_labels == 0:
        return np.zeros(flat_labels.shape, dtype=dtype)

    back_labels, forward_labels = _warped_neighbour_labels(
        flow, flat_labels, structure, dtype
    )

    sizes = np.bincount(flat_labels.ravel(), minlength=n_labels + 1).astype(np.int64)
    edges = np.concatenate(
        [
            _overlap_edges(flat_labels, forward_labels, sizes, overlap, absolute_overlap),
            _overlap_edges(flat_labels, back_labels, sizes, overlap, absolute_overlap),
        ],
        axis=0,
    )

    graph = sparse.coo_matrix(
        (np.ones(len(edges), dtype=np.int8), (edges[:, 0], edges[:, 1])),
        shape=(n_labels + 1, n_labels + 1),
    )
    _, comp = csgraph.connected_components(graph, directed=False)

    # renumber groups by their smallest member label — the order the
    # reference BFS discovers them in (label.py:145-170); label 0 excluded
    n_comp = int(comp.max()) + 1
    first_member = np.full(n_comp, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(first_member, comp[1:], np.arange(1, n_labels + 1))
    active = first_member != np.iinfo(np.int64).max
    new_id = np.zeros(n_comp, dtype=np.int64)
    ranks = np.argsort(np.argsort(first_member[active], kind="stable"))
    new_id[active] = ranks + 1

    lut = np.zeros(n_labels + 1, dtype=dtype)
    lut[1:] = new_id[comp[1:]]
    return lut[flat_labels]


def flow_label(
    flow,
    mask,
    structure=DEFAULT_STRUCTURE,
    dtype=np.int32,
    overlap: float = 0.0,
    absolute_overlap: int = 0,
    subsegment_shrink: float = 0.0,
    peak_min_distance: int = 10,
):
    """Label 3d connected objects in a semi-Lagrangian reference frame
    (reference ``label.py:84-175``)."""
    mask = np.asarray(getattr(mask, "values", mask))
    if subsegment_shrink == 0:
        flat_labels = flat_label(mask != 0, structure=structure).astype(dtype)
    else:
        from tobac_flow_tpu.segment.subsegment import subsegment_labels

        flat_labels = subsegment_labels(
            mask != 0,
            shrink_factor=subsegment_shrink,
            peak_min_distance=peak_min_distance,
        )

    new_labels = link_labels_by_overlap(
        flow,
        flat_labels,
        structure=structure,
        dtype=dtype,
        overlap=overlap,
        absolute_overlap=absolute_overlap,
    )

    if not np.all((new_labels != 0) == (mask != 0)):
        warnings.warn("Not all regions present in labeled array", RuntimeWarning)
    return new_labels


def flow_link_overlap(
    flow,
    flat_labels,
    structure=DEFAULT_STRUCTURE,
    dtype=np.int32,
    overlap: float = 0.0,
    absolute_overlap: int = 0,
):
    """Link an existing label raster into contiguous objects
    (reference ``label.py:249-321``)."""
    flat_labels = np.asarray(getattr(flat_labels, "values", flat_labels))
    new_labels = link_labels_by_overlap(
        flow,
        flat_labels,
        structure=structure,
        dtype=dtype,
        overlap=overlap,
        absolute_overlap=absolute_overlap,
    )
    if not np.all(new_labels.astype(bool) == flat_labels.astype(bool)):
        warnings.warn("Not all regions present in labeled array", RuntimeWarning)
    return new_labels
