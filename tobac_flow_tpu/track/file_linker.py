"""Streaming cross-file linkers.

Parity target: reference ``tobac_flow/linking.py`` classes —

* ``File_Linker`` (651-1105): a streaming two-file linker.  Only the current
  and next datasets are ever resident; each step relabels the next file's
  labels above a running max-label state, links the pair over the shared
  interior time window, transfers overlap-window pixels both ways (minus
  "stub" labels), then finalises and writes the current file before
  advancing.  Memory is bounded by two files regardless of run length.
* ``Label_Linker`` (1107-1575): a global label map held as one array per
  label family, updated per file pair with min-label pointers and resolved
  by pointer convergence (``map = map[map]``, capped at
  ``max_convergence_iterations`` — reference ``linking.py:1111``), with a
  second streaming pass that relabels and writes each file.

The pair-overlap primitive is this package's vectorised
(label_a, label_b)-histogram (``track/linking.py``) instead of the
reference's per-step-label recursive closure — identical link decisions.
"""

from __future__ import annotations

from datetime import datetime
from pathlib import Path

import numpy as np
import scipy.sparse as sparse
import scipy.sparse.csgraph as csgraph

from tobac_flow_tpu.data.ncdataset import open_dataset
from tobac_flow_tpu.schema.dataset import (
    add_label_coords,
    add_step_labels,
    flag_edge_labels,
    flag_nan_adjacent_labels,
    link_step_labels,
)
from tobac_flow_tpu.track.linking import find_overlap_between_labels
from tobac_flow_tpu.utils.datetime_utils import (
    get_dates_from_filename,
    trim_file_start_and_end,
)

__all__ = ["FileLinker", "LabelLinker"]

_KEEP_VARS = (
    "goes_imager_projection",
    "lat",
    "lon",
    "area",
    "BT",
    "bt",
    "WVD",
    "wvd",
    "SWD",
    "swd",
    "core_label",
    "thick_anvil_label",
    "thin_anvil_label",
)


def _v(x):
    return np.asarray(getattr(x, "values", x))


def _save(ds, path) -> None:
    """Atomic-ish compressed netCDF write (reference linking.py:1023-1033)."""
    path = Path(path)
    temp = path.with_suffix(".temp.nc")
    ds.to_netcdf(temp, compress=True, complevel=5)
    import os

    os.replace(temp, path)
    print(datetime.now(), "Saving to %s" % path, flush=True)


def _pair_link_groups(cur_labels, cur_times, next_labels, next_times, atol, rtol):
    """Transitive link groups between two label stacks over the shared
    interior time window: list of (sorted current labels, sorted next labels)
    per connected group that has at least one cross-file edge (the group
    structure the reference builds in ``link_dcc_cores``,
    ``linking.py:498-648``)."""
    max_a, max_b, x, y = find_overlap_between_labels(
        cur_labels, cur_times, next_labels, next_times, atol=atol, rtol=rtol
    )
    if not x.size:
        return []
    n = max_a + max_b + 1
    graph = sparse.coo_matrix(
        (np.ones(x.size), (x, y + max_a)), shape=(n, n)
    )
    comp = csgraph.connected_components(graph, directed=False)[1]
    groups: dict[int, tuple[list, list]] = {}
    for a in np.unique(x):
        groups.setdefault(comp[a], ([], []))[0].append(int(a))
    for b in np.unique(y):
        groups.setdefault(comp[b + max_a], ([], []))[1].append(int(b))
    return [
        (sorted(g[0]), sorted(g[1])) for _, g in sorted(groups.items())
    ]


def _shared_time_indices(cur_times, next_times):
    shared, ci, ni = np.intersect1d(
        _v(cur_times), _v(next_times), return_indices=True
    )
    return shared, ci, ni


class FileLinker:
    """Stream consecutive detection files, linking labels across each pair
    with bounded (two-file) memory (reference ``File_Linker``,
    ``linking.py:651-1105``)."""

    def __init__(
        self,
        files,
        output_path=None,
        atol=5,
        rtol=0.5,
        output_file_suffix=None,
        output_func=None,
    ):
        self.files = [Path(f) for f in files]
        for f in self.files:
            if not f.exists():
                raise ValueError(f"File {f} does not exist")
        self.output_path = Path(output_path) if output_path is not None else None
        if self.output_path is not None:
            self.output_path.mkdir(parents=True, exist_ok=True)
        self.atol = atol
        self.rtol = rtol
        suffix = output_file_suffix or "_linked"
        if not suffix.startswith("_"):
            suffix = "_" + suffix
        self.file_suffix = suffix
        self.output_func = output_func

        # running max-label state (reference linking.py:684-688)
        self.current_max_core_label = 0
        self.current_max_anvil_label = 0
        self.current_max_core_step_label = 0
        self.current_max_thick_anvil_step_label = 0
        self.current_max_thin_anvil_step_label = 0

        self._queue = list(self.files)
        self.current_filename = self._queue.pop(0)
        self.current_ds = open_dataset(self.current_filename)
        self.outputs: list[Path] = []
        # bounded-memory diagnostic: never exceeds 2 resident datasets
        self.open_datasets = 1
        self.max_open_datasets = 1

    # -- streaming loop ---------------------------------------------------

    def process_files(self) -> list[Path]:
        while self._queue:
            self.process_next_file()
        self.start_date, self.end_date = get_dates_from_filename(
            self.current_filename
        )
        self.output_current_ds()
        return self.outputs

    def process_next_file(self) -> None:
        self.next_filename = self._queue.pop(0)
        self.start_date, self.end_date = get_dates_from_filename(
            self.current_filename
        )
        self.next_ds = open_dataset(self.next_filename)
        self.open_datasets += 1
        self.max_open_datasets = max(self.max_open_datasets, self.open_datasets)
        self.relabel_next_ds()

        shared, _, _ = _shared_time_indices(
            self.current_ds.coords["t"], self.next_ds.coords["t"]
        )
        if shared.size > 2:
            self.relabel_cores()
            self.relabel_anvils()
        else:
            # no linkable overlap: roll the running maxes forward from the
            # current file's own window (reference linking.py:706-728)
            trimmed = trim_file_start_and_end(
                self.current_ds, self.start_date, self.end_date
            )
            self.current_max_core_label = max(
                int(_v(trimmed["core_label"]).max()), self.current_max_core_label
            )
            self.current_max_anvil_label = max(
                int(_v(trimmed["thick_anvil_label"]).max()),
                int(_v(trimmed["thin_anvil_label"]).max()),
                self.current_max_anvil_label,
            )

        self.output_current_ds()
        self.current_ds = self.next_ds
        self.current_filename = self.next_filename
        self.open_datasets -= 1

    # -- pair linking -----------------------------------------------------

    def relabel_next_ds(self) -> None:
        """Offset every label in next_ds above the running maxima
        (reference linking.py:1076-1105)."""
        max_core = max(
            self.current_max_core_label, int(_v(self.current_ds["core_label"]).max())
        )
        max_anvil = max(
            self.current_max_anvil_label,
            int(_v(self.current_ds["thick_anvil_label"]).max()),
            int(_v(self.current_ds["thin_anvil_label"]).max()),
        )
        for var, off in [
            ("core_label", max_core),
            ("thick_anvil_label", max_anvil),
            ("thin_anvil_label", max_anvil),
        ]:
            vals = self.next_ds[var].values
            vals[vals != 0] += off

    def _label_map(self, groups, unique_labels, previous_max):
        """Contiguous linked label map (reference generate_label_map,
        ``linking.py:838-871``): each group adopts its lowest current-file
        label; surviving labels above previous_max renumber contiguously."""
        max_label = int(unique_labels.max()) if unique_labels.size else 0
        label_map = np.zeros(max_label + 1, dtype=np.int64)
        label_map[unique_labels] = unique_labels
        for cur_group, next_group in groups:
            new_label = cur_group[0]
            for lbl in cur_group[1:]:
                label_map[lbl] = new_label
            for lbl in next_group:
                label_map[lbl] = new_label
        unique_mapped = np.unique(label_map)
        remapper = np.zeros(max_label + 1, dtype=np.int64)
        existing = unique_mapped[unique_mapped <= previous_max]
        remapper[existing] = existing
        new = unique_mapped[unique_mapped > previous_max]
        remapper[new] = np.arange(new.size) + previous_max + 1
        return remapper[label_map]

    def _relabel_family(self, variables, previous_max):
        """Link one label family across the pair and remap both datasets."""
        cur_t = self.current_ds.coords["t"]
        next_t = self.next_ds.coords["t"]
        # group over the primary raster (core_label / thick_anvil_label)
        groups = _pair_link_groups(
            self.current_ds[variables[0]],
            cur_t,
            self.next_ds[variables[0]],
            next_t,
            self.atol,
            self.rtol,
        )
        uniq = set()
        for ds in (self.current_ds, self.next_ds):
            for var in variables:
                uniq |= set(np.unique(_v(ds[var])).tolist())
        uniq -= {0}
        unique_labels = np.asarray(sorted(uniq), dtype=np.int64)
        if not unique_labels.size:
            return previous_max
        label_map = self._label_map(groups, unique_labels, previous_max)
        new_max = previous_max
        for ds in (self.current_ds, self.next_ds):
            for var in variables:
                vals = ds[var].values
                vals[...] = label_map[vals]
            if ds is self.current_ds:
                for var in variables:
                    new_max = max(new_max, int(ds[var].values.max()))
        return new_max

    def relabel_cores(self) -> None:
        self.current_max_core_label = self._relabel_family(
            ("core_label",), self.current_max_core_label
        )
        self.combine_labels("core_label")

    def relabel_anvils(self) -> None:
        self.current_max_anvil_label = self._relabel_family(
            ("thick_anvil_label", "thin_anvil_label"), self.current_max_anvil_label
        )
        self.combine_labels("thick_anvil_label")
        self.combine_labels("thin_anvil_label")

    def combine_labels(self, var: str) -> None:
        """Transfer labels between the overlap-interior windows of the pair
        (reference combine_labels, ``linking.py:1022-1074``): each side fills
        its zero pixels from the other's labels, excluding "stubs" — labels
        that enter the window at the wrong end."""
        shared, ci, ni = _shared_time_indices(
            self.current_ds.coords["t"], self.next_ds.coords["t"]
        )
        cur = self.current_ds[var].values
        nxt = self.next_ds[var].values

        cur_interior = cur[ci[1:-1]]
        next_interior = nxt[ni[1:-1]]

        # next -> current: next labels in the interior that don't start at
        # the first shared frame, or that already exist in current
        combine = (
            (set(np.unique(next_interior)) - set(np.unique(nxt[ni[0]])))
            | set(np.unique(cur[ci[:-1]]))
        ) - {0}
        wh = np.isin(next_interior, list(combine)) & (cur_interior == 0)
        cur[ci[1:-1]] += next_interior * wh

        # current -> next: current labels that don't reach the last shared
        # frame, or that already exist in next
        cur_interior = cur[ci[1:-1]]
        combine = (
            (set(np.unique(cur_interior)) - set(np.unique(cur[ci[-1]])))
            | set(np.unique(nxt[ni[1:]]))
        ) - {0}
        wh = np.isin(cur_interior, list(combine)) & (next_interior == 0)
        nxt[ni[1:-1]] += cur_interior * wh

    # -- per-file output ----------------------------------------------------

    def output_current_ds(self) -> None:
        """Finalise and write the current file (reference output_current_ds,
        ``linking.py:738-830``): keep the raster variables, re-derive label
        coords and flags, trim to the file's own window, add step labels
        offset by the running step maxima, and save."""
        ds = self.current_ds
        drop = [v for v in list(ds.data_vars) if v not in _KEEP_VARS]
        if drop:
            ds = ds.drop_vars(drop)
        ds = add_label_coords(ds)
        flag_edge_labels(ds, self.start_date, self.end_date)
        bt_name = "BT" if "BT" in ds.data_vars else ("bt" if "bt" in ds.data_vars else None)
        if bt_name is not None:
            flag_nan_adjacent_labels(ds, ds[bt_name])
        ds = trim_file_start_and_end(ds, self.start_date, self.end_date)
        ds = add_label_coords(ds)

        add_step_labels(ds)
        for var, attr in [
            ("core_step_label", "current_max_core_step_label"),
            ("thick_anvil_step_label", "current_max_thick_anvil_step_label"),
            ("thin_anvil_step_label", "current_max_thin_anvil_step_label"),
        ]:
            vals = ds[var].values
            vals[vals != 0] += getattr(self, attr)
        ds = add_label_coords(ds)
        for coord, attr in [
            ("core_step", "current_max_core_step_label"),
            ("thick_anvil_step", "current_max_thick_anvil_step_label"),
            ("thin_anvil_step", "current_max_thin_anvil_step_label"),
        ]:
            if coord in ds.coords and len(_v(ds.coords[coord])):
                setattr(self, attr, int(_v(ds.coords[coord]).max()))
        link_step_labels(ds)

        if self.output_func is not None:
            self.output_func(ds)

        parent = (
            self.output_path
            if self.output_path is not None
            else self.current_filename.parent
        )
        new_filename = parent / (
            self.current_filename.stem + self.file_suffix + ".nc"
        )
        _save(ds, new_filename)
        self.outputs.append(new_filename)
        self.current_ds = ds


class LabelLinker:
    """Global label maps resolved by pointer convergence, two files resident
    at a time (reference ``Label_Linker``, ``linking.py:1107-1575``)."""

    def __init__(
        self,
        files,
        max_convergence_iterations: int = 10,
        output_path=None,
        output_file_suffix: str = "",
        atol: int = 1,
        rtol: float = 0.0,
    ):
        self.files = [Path(f) for f in files]
        for f in self.files:
            if not f.exists():
                raise ValueError(f"File {f} does not exist")
        self.output_path = Path(output_path) if output_path is not None else None
        if self.output_path is not None:
            self.output_path.mkdir(parents=True, exist_ok=True)
        self.file_suffix = output_file_suffix or "_linked"
        if not self.file_suffix.startswith("_"):
            self.file_suffix = "_" + self.file_suffix
        self.atol = atol
        self.rtol = rtol
        self.max_convergence_iterations = max_convergence_iterations

        self.next_ds = open_dataset(self.files[0])
        self.open_datasets = 1
        self.max_open_datasets = 1

        self.next_min_core = 0
        self.max_core = int(_v(self.next_ds["core_label"]).max())
        self.next_min_core_map = {str(self.files[0]): 0}
        self.core_label_map = np.arange(self.max_core + 1, dtype=np.int64)

        self.next_min_anvil = 0
        self.max_anvil = int(
            max(
                _v(self.next_ds["thick_anvil_label"]).max(),
                _v(self.next_ds["thin_anvil_label"]).max(),
            )
        )
        self.next_min_anvil_map = {str(self.files[0]): 0}
        self.anvil_label_map = np.arange(self.max_anvil + 1, dtype=np.int64)

    # -- pass 1: build the label maps --------------------------------------

    def link_all(self) -> None:
        print(self.files[0], flush=True)
        for file in self.files[1:]:
            self.link_next_file(file)
        self.next_ds = None
        self.open_datasets -= 1
        print(datetime.now(), "Linking complete", flush=True)
        print(
            "Total cores relabelled:",
            int(np.sum(self.core_label_map != np.arange(self.core_label_map.size))),
            flush=True,
        )
        print(
            "Total anvils relabelled:",
            int(np.sum(self.anvil_label_map != np.arange(self.anvil_label_map.size))),
            flush=True,
        )

    def link_next_file(self, file) -> None:
        self.read_new_file(file)
        shared = np.intersect1d(
            _v(self.current_ds.coords["t"]), _v(self.next_ds.coords["t"])
        )
        if shared.size > 2:
            self.update_core_label_map()
            self.update_anvil_label_map()
        else:
            import warnings

            warnings.warn("No overlap between files")
        self.current_ds = None
        self.open_datasets -= 1

    def read_new_file(self, file) -> None:
        print(file, flush=True)
        self.current_ds, self.next_ds = self.next_ds, open_dataset(file)
        self.open_datasets += 1
        self.max_open_datasets = max(self.max_open_datasets, self.open_datasets)

        self.current_min_core, self.next_min_core = (
            self.next_min_core,
            self.next_min_core + self.max_core,
        )
        self.max_core = int(_v(self.next_ds["core_label"]).max())
        self.next_min_core_map[str(file)] = self.next_min_core
        self.core_label_map = np.concatenate(
            [
                self.core_label_map,
                np.arange(
                    self.next_min_core + 1,
                    self.next_min_core + self.max_core + 1,
                    dtype=np.int64,
                ),
            ]
        )

        self.current_min_anvil, self.next_min_anvil = (
            self.next_min_anvil,
            self.next_min_anvil + self.max_anvil,
        )
        self.max_anvil = int(
            max(
                _v(self.next_ds["thick_anvil_label"]).max(),
                _v(self.next_ds["thin_anvil_label"]).max(),
            )
        )
        self.next_min_anvil_map[str(file)] = self.next_min_anvil
        self.anvil_label_map = np.concatenate(
            [
                self.anvil_label_map,
                np.arange(
                    self.next_min_anvil + 1,
                    self.next_min_anvil + self.max_anvil + 1,
                    dtype=np.int64,
                ),
            ]
        )

    def _converge(self, label_map, what: str):
        """Pointer convergence, capped (reference linking.py:1257-1269)."""
        for n_converge in range(self.max_convergence_iterations + 1):
            if np.any(label_map[label_map] != label_map):
                label_map = label_map[label_map]
            else:
                if n_converge > 0:
                    print(
                        f"Iterations required for {what} labels to converge:",
                        n_converge,
                        flush=True,
                    )
                break
        else:
            raise ValueError(f"{what} label map failed to converge")
        return label_map

    def _update_map(self, label_map, var, cur_min, next_min, what):
        groups = _pair_link_groups(
            self.current_ds[var],
            self.current_ds.coords["t"],
            self.next_ds[var],
            self.next_ds.coords["t"],
            self.atol,
            self.rtol,
        )
        for cur_group, next_group in groups:
            first = cur_group[0] + cur_min
            new_label = min(first, label_map[first])
            for lbl in cur_group[1:]:
                label_map[lbl + cur_min] = new_label
            for lbl in next_group:
                label_map[lbl + next_min] = new_label
        return self._converge(label_map, what)

    def update_core_label_map(self) -> None:
        self.core_label_map = self._update_map(
            self.core_label_map,
            "core_label",
            self.current_min_core,
            self.next_min_core,
            "core",
        )

    def update_anvil_label_map(self) -> None:
        self.anvil_label_map = self._update_map(
            self.anvil_label_map,
            "thick_anvil_label",
            self.current_min_anvil,
            self.next_min_anvil,
            "anvil",
        )

    # -- pass 2: relabel + write every file ---------------------------------

    def relabel_cores(self, ds, min_core_map, inplace=False):
        """Map a file's core raster through the global map slice
        (reference linking.py:1311-1328)."""
        max_core = int(_v(ds["core_label"]).max())
        sl = self.core_label_map[min_core_map : min_core_map + max_core + 1]
        vals = ds["core_label"].values
        wh = vals != 0
        if inplace:
            vals[wh] = sl[vals[wh]]
            return None
        new = np.zeros_like(vals)
        new[wh] = sl[vals[wh]]
        return new

    def relabel_anvils(self, ds, min_anvil_map, inplace=False):
        max_anvil = int(
            max(
                _v(ds["thick_anvil_label"]).max(), _v(ds["thin_anvil_label"]).max()
            )
        )
        sl = self.anvil_label_map[min_anvil_map : min_anvil_map + max_anvil + 1]
        outs = []
        for var in ("thick_anvil_label", "thin_anvil_label"):
            vals = ds[var].values
            wh = vals != 0
            if inplace:
                vals[wh] = sl[vals[wh]]
            else:
                new = np.zeros_like(vals)
                new[wh] = sl[vals[wh]]
                outs.append(new)
        return tuple(outs) if not inplace else None

    def merge_labels(self, ds, filename, join="start") -> None:
        """Fill zero pixels of ``ds``'s overlap window from a neighbouring
        file's (remapped) labels, excluding stubs (reference
        linking.py:1355-1428)."""
        join_i = -1 if join == "start" else 0
        merge_ds = open_dataset(filename)
        self.open_datasets += 1
        self.max_open_datasets = max(self.max_open_datasets, self.open_datasets)
        shared, di, mi = _shared_time_indices(
            ds.coords["t"], merge_ds.coords["t"]
        )
        if shared.size > 2:
            remapped_cores = self.relabel_cores(
                merge_ds, self.next_min_core_map[str(filename)], inplace=False
            )
            remapped_thick, remapped_thin = self.relabel_anvils(
                merge_ds, self.next_min_anvil_map[str(filename)], inplace=False
            )
            for var, remapped in [
                ("core_label", remapped_cores),
                ("thick_anvil_label", remapped_thick),
                ("thin_anvil_label", remapped_thin),
            ]:
                vals = ds[var].values
                interior = remapped[mi[1:-1]]
                combine = (
                    set(np.unique(interior))
                    - (
                        set(np.unique(remapped[mi[join_i]]))
                        - set(np.unique(vals[di]))
                    )
                ) - {0}
                wh = np.isin(interior, list(combine)) & (vals[di[1:-1]] == 0)
                vals[di[1:-1]] += interior * wh
        self.open_datasets -= 1

    def output_files(self) -> list[Path]:
        outputs = []
        for i, file in enumerate(self.files):
            outputs.append(
                self.output_a_file(
                    file,
                    self.files[i - 1] if i > 0 else None,
                    self.files[i + 1] if i < len(self.files) - 1 else None,
                )
            )
        return outputs

    def output_a_file(self, file, prev_file, next_file) -> Path:
        print(datetime.now(), "Processing output for:", file, flush=True)
        ds = open_dataset(file)
        self.open_datasets += 1
        self.max_open_datasets = max(self.max_open_datasets, self.open_datasets)
        self.relabel_cores(ds, self.next_min_core_map[str(file)], inplace=True)
        self.relabel_anvils(ds, self.next_min_anvil_map[str(file)], inplace=True)
        if prev_file is not None:
            self.merge_labels(ds, prev_file, join="start")
        if next_file is not None:
            self.merge_labels(ds, next_file, join="end")

        drop = [v for v in list(ds.data_vars) if v not in _KEEP_VARS]
        if drop:
            ds = ds.drop_vars(drop)
        ds = add_label_coords(ds)
        start_date, end_date = get_dates_from_filename(file)
        flag_edge_labels(ds, start_date, end_date)
        bt_name = "BT" if "BT" in ds.data_vars else ("bt" if "bt" in ds.data_vars else None)
        if bt_name is not None:
            flag_nan_adjacent_labels(ds, ds[bt_name])
        ds = trim_file_start_and_end(ds, start_date, end_date)
        ds = add_label_coords(ds)

        parent = self.output_path if self.output_path is not None else Path(file).parent
        out = parent / (Path(file).stem + self.file_suffix + ".nc")
        _save(ds, out)
        self.open_datasets -= 1
        return out
