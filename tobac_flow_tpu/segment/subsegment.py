"""Morphological subsegmentation of labelled regions.

Parity target: reference ``tobac_flow/label.py:13-80`` (``subsegment_labels``):
each per-frame region is approximated as a circle, shrunk by
``shrink_factor`` × its approximate radius (normalised distance transform),
missed small objects are recovered from distance-transform maxima, and the
region is split between the shrunk markers by per-frame watershed on the
negated distance field.
"""

from __future__ import annotations

import numpy as np

from tobac_flow_tpu.ops.ccl import flat_label
from tobac_flow_tpu.ops.morphology import distance_transform_edt, peak_local_max_mask
from tobac_flow_tpu.ops.watershed import watershed

__all__ = ["subsegment_labels"]


def subsegment_labels(input_mask, shrink_factor: float = 0.1, peak_min_distance: int = 5):
    """Split each per-frame region into morphological sub-labels."""
    input_mask = np.asarray(getattr(input_mask, "values", input_mask)) != 0
    labels = flat_label(input_mask)

    # distance to the region edge, normalised by each region's circular radius
    dist = distance_transform_edt(labels, sampling=(1e9, 1, 1))
    counts = np.bincount(labels.ravel())
    radius = np.sqrt(np.maximum(counts, 1) / np.pi)
    dist_norm = dist / radius[labels]

    shrunk = dist_norm > shrink_factor

    # recover over-shrunk objects from local maxima of the distance field.
    # skimage's peak_local_max returns isolated peak *points*; keeping whole
    # plateaus would bridge separate shrunk markers through flat ridges, so
    # reduce each connected plateau to its first (row-major) pixel.
    maxima = np.zeros_like(shrunk)
    for i in range(maxima.shape[0]):
        maxima[i] = np.asarray(
            peak_local_max_mask(
                dist_norm[i], min_distance=peak_min_distance, threshold_abs=1e-8
            )
        )
    plateau = np.asarray(flat_label(maxima))
    flat = plateau.ravel()
    uniq, first = np.unique(flat, return_index=True)
    points = np.zeros(flat.shape, dtype=bool)
    points[first[uniq != 0]] = True
    maxima = points.reshape(maxima.shape)

    markers = flat_label(np.logical_or(shrunk, maxima))
    markers = np.where(labels == 0, -1, markers).astype(np.int32)

    # per-frame watershed of -distance seeded by the shrunk markers
    zero_flow = np.zeros(labels.shape + (2,), dtype=np.float32)
    structure = np.zeros((3, 3, 3), dtype=bool)
    structure[1, 1, :] = True
    structure[1, :, 1] = True
    out = watershed(
        zero_flow,
        zero_flow,
        (-dist_norm).astype(np.float32),
        markers,
        mask=labels != 0,
        connectivity=structure,
    )
    out[out < 0] = 0
    return out.astype(np.int32)
