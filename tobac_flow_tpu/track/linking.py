"""Cross-file label linking: stitch object tracks across overlapping
detection files.

Parity target: reference ``tobac_flow/linking.py`` — per-file-pair overlap
counting over the shared time window with atol=5 / rtol=0.5 thresholds
(33-141), global sparse-graph resolution with connected components
(``process_linking_output`` 155-221), and per-file relabelling (224-396).
The per-pair overlap count here is a vectorised (label_a, label_b) pair
histogram instead of a per-label comprehension — identical link decisions.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sparse
import scipy.sparse.csgraph as csgraph

from tobac_flow_tpu.data.ncdataset import DataArray, Dataset, open_dataset
from tobac_flow_tpu.utils.labels import remap_labels

__all__ = [
    "find_overlap_between_labels",
    "find_overlap_between_files",
    "process_linking_output",
    "relabel_file",
    "link_labels",
]


def link_labels(labels_a, labels_b, atol=0, rtol=0.0):
    """Transitive overlap closure between two co-located label arrays
    (reference ``linking.py:403-494`` recursive_linker/link_labels): returns
    (groups_a, groups_b) where linked labels share a group id."""
    a = np.asarray(getattr(labels_a, "values", labels_a)).ravel().astype(np.int64)
    b = np.asarray(getattr(labels_b, "values", labels_b)).ravel().astype(np.int64)
    max_a = int(a.max()) if a.size else 0
    max_b = int(b.max()) if b.size else 0
    wh = (a > 0) & (b > 0)
    edges = np.empty((0, 2), np.int64)
    if np.any(wh):
        keys = a[wh] * (max_b + 1) + b[wh]
        uniq, counts = np.unique(keys, return_counts=True)
        ua = uniq // (max_b + 1)
        ub = uniq % (max_b + 1)
        a_counts = np.bincount(a, minlength=max_a + 1)
        b_counts = np.bincount(b, minlength=max_b + 1)
        frac = np.maximum(
            counts / np.maximum(a_counts[ua], 1), counts / np.maximum(b_counts[ub], 1)
        )
        ok = (counts >= max(atol, 1)) & (frac >= rtol)
        edges = np.stack([ua[ok], ub[ok] + max_a], axis=-1)
    n = max_a + max_b + 1
    graph = sparse.coo_matrix(
        (np.ones(len(edges)), (edges[:, 0], edges[:, 1])), shape=(n, n)
    )
    comp = csgraph.connected_components(graph, directed=False)[1]
    return comp[1 : max_a + 1], comp[max_a + 1 :]


def find_overlap_between_labels(
    cur_labels, cur_times, next_labels, next_times, atol=5, rtol=0.5
):
    """Linked (a, b) label pairs over the shared interior time window.

    A pair links when its overlap count is >= atol and >= rtol × the smaller
    of (a's pixels in the window / b's pixels in the window)
    (reference ``linking.py:33-46``: count/a_size or count/b_size >= rtol).
    Returns (max_a, max_b, x, y).
    """
    cur_labels = np.asarray(getattr(cur_labels, "values", cur_labels))
    next_labels = np.asarray(getattr(next_labels, "values", next_labels))
    cur_times = np.asarray(getattr(cur_times, "values", cur_times))
    next_times = np.asarray(getattr(next_times, "values", next_times))

    max_a = int(cur_labels.max())
    max_b = int(next_labels.max())

    shared, cur_idx, next_idx = np.intersect1d(
        cur_times, next_times, return_indices=True
    )
    if shared.size <= 2:
        return max_a, max_b, np.empty(0, np.int64), np.empty(0, np.int64)
    cur_idx = cur_idx[1:-1]
    next_idx = next_idx[1:-1]

    a = cur_labels[cur_idx].ravel().astype(np.int64)
    b = next_labels[next_idx].ravel().astype(np.int64)
    wh = (a > 0) & (b > 0)
    a, b = a[wh], b[wh]
    if not a.size:
        return max_a, max_b, np.empty(0, np.int64), np.empty(0, np.int64)

    a_counts = np.bincount(cur_labels[cur_idx].ravel(), minlength=max_a + 1)
    b_counts = np.bincount(next_labels[next_idx].ravel(), minlength=max_b + 1)

    keys = a * (max_b + 1) + b
    uniq, counts = np.unique(keys, return_counts=True)
    ua = uniq // (max_b + 1)
    ub = uniq % (max_b + 1)
    frac = np.maximum(
        counts / np.maximum(a_counts[ua], 1), counts / np.maximum(b_counts[ub], 1)
    )
    ok = (counts >= atol) & (frac >= rtol)
    return max_a, max_b, ua[ok], ub[ok]


def find_overlap_between_files(filename_1, filename_2, atol=5, rtol=0.5):
    """Core and anvil overlap edges between two consecutive detection files
    (reference ``linking.py:143-152``)."""
    ds_1 = open_dataset(filename_1)
    ds_2 = open_dataset(filename_2)
    result = dict(filename_1=str(filename_1), filename_2=str(filename_2))
    result["core"] = find_overlap_between_labels(
        ds_1["core_label"], ds_1.coords["t"], ds_2["core_label"], ds_2.coords["t"],
        atol=atol, rtol=rtol,
    )
    result["anvil"] = find_overlap_between_labels(
        ds_1["thick_anvil_label"], ds_1.coords["t"],
        ds_2["thick_anvil_label"], ds_2.coords["t"],
        atol=atol, rtol=rtol,
    )
    return result


def _resolve(results, key):
    """Global connected components over per-file label spaces."""
    # cumulative label offset of each file
    starts = np.cumsum([0] + [r[key][0] for r in results]).astype(np.int64)
    total = int(starts[-1] + results[-1][key][1])
    xs = [r[key][2] + start for r, start in zip(results, starts)]
    ys = [r[key][3] + start for r, start in zip(results, starts[1:])]
    x = np.concatenate(xs) if xs else np.empty(0, np.int64)
    y = np.concatenate(ys) if ys else np.empty(0, np.int64)
    graph = sparse.coo_matrix(
        (np.ones(x.size), (x, y)), shape=(total + 1, total + 1)
    )
    comp = csgraph.connected_components(graph, directed=False)[1]
    # renumber components contiguously in order of first appearance,
    # skipping node 0 (background)
    seen = {}
    new = np.zeros(comp.size, dtype=np.int64)
    next_id = 1
    for node in range(1, comp.size):
        c = comp[node]
        if c not in seen:
            seen[c] = next_id
            next_id += 1
        new[node] = seen[c]
    return starts, new


def process_linking_output(overlap_results):
    """Resolve the global overlap graph into per-file relabel maps
    (reference ``linking.py:164-221``). Returns a links Dataset with
    filename-indexed start offsets and global core/anvil label maps."""
    filenames = [r["filename_1"] for r in overlap_results] + [
        overlap_results[-1]["filename_2"]
    ]
    core_starts, core_labels = _resolve(overlap_results, "core")
    anvil_starts, anvil_labels = _resolve(overlap_results, "anvil")

    ds = Dataset(coords={"filename": np.asarray(filenames, dtype=object)})
    ds["previous_filename"] = DataArray(
        np.asarray([""] + filenames[:-1], dtype=object), dims=("filename",)
    )
    ds["next_filename"] = DataArray(
        np.asarray(filenames[1:] + [""], dtype=object), dims=("filename",)
    )
    ds["core_start"] = DataArray(core_starts.astype(np.int64), dims=("filename",))
    ds["anvil_start"] = DataArray(anvil_starts.astype(np.int64), dims=("filename",))
    ds["core_labels"] = DataArray(core_labels[1:].astype(np.int32), dims=("core",))
    ds["anvil_labels"] = DataArray(anvil_labels[1:].astype(np.int32), dims=("anvil",))
    return ds


def _label_map_for_file(links_ds, file_index, key):
    starts = np.asarray(links_ds[f"{key}_start"].values)
    labels = np.asarray(links_ds[f"{key}_labels"].values)
    start = starts[file_index]
    stop = starts[file_index + 1] if file_index + 1 < starts.size else labels.size
    return labels[start:stop]


def relabel_file(filename, links_ds, save_path=None):
    """Apply the global label maps to one detection file
    (reference ``linking.py:224-396``): core/anvil rasters are remapped to
    the globally-linked ids; label coords follow."""
    filenames = [str(f) for f in np.asarray(links_ds.coords["filename"])]
    file_index = filenames.index(str(filename))
    ds = open_dataset(filename)

    core_map = _label_map_for_file(links_ds, file_index, "core")
    anvil_map = _label_map_for_file(links_ds, file_index, "anvil")

    for var, mapping in [
        ("core_label", core_map),
        ("thick_anvil_label", anvil_map),
        ("thin_anvil_label", anvil_map),
    ]:
        if var in ds.data_vars:
            vals = np.asarray(ds[var].values)
            ds[var].values[...] = remap_labels(
                vals, locations=np.arange(1, mapping.size + 1), new_labels=mapping
            )
    for dim, mapping in [("core", core_map), ("anvil", anvil_map)]:
        if dim in ds.coords:
            old = ds.coords[dim]
            valid = (old >= 1) & (old <= mapping.size)
            ds.coords[dim] = np.where(valid, mapping[np.maximum(old, 1) - 1], old)
    if "core_anvil_index" in ds.data_vars:
        idx = np.asarray(ds["core_anvil_index"].values)
        valid = (idx >= 1) & (idx <= anvil_map.size)
        ds["core_anvil_index"].values[...] = np.where(
            valid, anvil_map[np.maximum(idx, 1) - 1], 0
        )
    if save_path is not None:
        ds.to_netcdf(save_path)
    return ds
