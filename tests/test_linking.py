"""Cross-file linking tests: two overlapping detection windows of the same
moving storm must link into one global object."""

import numpy as np
import pytest

from tobac_flow_tpu.data.ncdataset import open_dataset
from tobac_flow_tpu.track.linking import (
    find_overlap_between_files,
    find_overlap_between_labels,
    process_linking_output,
    relabel_file,
)


def test_find_overlap_between_labels_basic():
    times_a = np.datetime64("2020-01-01", "ns") + np.arange(6) * np.timedelta64(300, "s")
    times_b = times_a + 4 * np.timedelta64(300, "s")  # frames 4..9, overlap 4,5
    a = np.zeros((6, 10, 10), np.int32)
    b = np.zeros((6, 10, 10), np.int32)
    a[:, 2:6, 2:6] = 1  # object present in all frames of file A
    b[:2, 2:6, 2:6] = 2  # same object in B's first two frames (the overlap)
    # overlap window is interior only (first/last shared frames dropped) ->
    # need >2 shared frames for any link
    max_a, max_b, x, y = find_overlap_between_labels(a, times_a, b, times_b)
    assert (max_a, max_b) == (1, 2)
    assert x.size == 0  # only 2 shared frames -> interior empty

    times_b = times_a + 2 * np.timedelta64(300, "s")  # overlap frames 2..5
    b = np.zeros((6, 10, 10), np.int32)
    b[:4, 2:6, 2:6] = 2
    max_a, max_b, x, y = find_overlap_between_labels(a, times_a, b, times_b)
    assert list(zip(x, y)) == [(1, 2)]


def _detect_window(tmp_path, name, t0_index, t, seed=0):
    """Run the synthetic detect CLI over a sub-window of a longer scene."""
    from tobac_flow_tpu.cli.common import DetectionOptions, run_detection, save_dataset
    from tobac_flow_tpu.cli.dcc_detect_synthetic import make_scene
    from tobac_flow_tpu.data.ncdataset import Dataset

    bt, wvd, swd = make_scene(24, 96, 128, seed)
    sl = slice(t0_index, t0_index + t)
    bt, wvd, swd = bt[sl], wvd[sl], swd[sl]
    ds = Dataset(coords={"t": bt.coords["t"], "y": bt.coords["y"], "x": bt.coords["x"]})
    opts = DetectionOptions(save_label_props=False, save_field_props=False)
    ds = run_detection(bt, wvd, swd, ds, opts=opts)
    path = tmp_path / name
    save_dataset(ds, path)
    return path


@pytest.fixture(scope="module")
def linked_files(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("linking")
    f1 = _detect_window(tmp_path, "detected_dccs_SYN_S20200601_000000_W1.nc", 0, 16)
    f2 = _detect_window(tmp_path, "detected_dccs_SYN_S20200601_001000_W2.nc", 8, 16)
    return tmp_path, f1, f2


def test_link_two_windows(linked_files):
    tmp_path, f1, f2 = linked_files
    result = find_overlap_between_files(f1, f2)
    max_a, max_b, x, y = result["core"]
    # the same storm core must link across the files
    assert x.size >= 1 or max_a == 0
    links = process_linking_output([result])
    core_labels = links["core_labels"].values
    # linked cores share one global id
    if x.size:
        assert core_labels[x[0] - 1] == core_labels[links["core_start"].values[1] + y[0] - 1]

    out1 = relabel_file(f1, links, save_path=tmp_path / "relabel_1.nc")
    out2 = relabel_file(f2, links, save_path=tmp_path / "relabel_2.nc")
    if x.size:
        # the raster labels agree in the overlap window
        t1 = out1.coords["t"]
        t2 = out2.coords["t"]
        shared = np.intersect1d(t1, t2)
        i1 = np.searchsorted(t1, shared)
        i2 = np.searchsorted(t2, shared)
        a = out1["core_label"].values[i1]
        b = out2["core_label"].values[i2]
        both = (a != 0) & (b != 0)
        assert both.sum() > 0
        assert (a[both] == b[both]).mean() > 0.95


def test_linking_cli_chain(linked_files):
    """Drive the CLI wrappers: linking_parallel then relabel_linked_files."""
    from tobac_flow_tpu.cli import linking_parallel, relabel_linked_files

    tmp_path, f1, f2 = linked_files
    out_dir = tmp_path / "cli_out"
    links_path = linking_parallel.main(["-sd", str(out_dir), str(f1), str(f2)])
    assert links_path.exists()
    links = open_dataset(str(links_path))
    assert "core_labels" in links

    outputs = relabel_linked_files.main(
        ["-links", str(links_path), "-sd", str(out_dir), str(f1), str(f2)]
    )
    assert len(outputs) == 2
    for out in outputs:
        assert out.name.startswith("relabeled_")
        ds = open_dataset(str(out))
        assert "core_label" in ds


def test_file_linker_streams_and_relabels(linked_files):
    from tobac_flow_tpu.track.file_linker import FileLinker, LabelLinker

    tmp_path, f1, f2 = linked_files
    out_dir = tmp_path / "filelinker_out"
    linker = FileLinker([f1, f2], out_dir)
    links, outputs = linker.process_files()
    assert len(outputs) == 2
    for out in outputs:
        assert out.exists()
        assert out.name.startswith("linked_")

    # LabelLinker resolves the same overlaps into the same global map
    ll = LabelLinker(linker.overlap_results)
    cmap = ll.label_map("core")
    np.testing.assert_array_equal(cmap, links["core_labels"].values)
    amap = ll.label_map("anvil")
    assert amap.ndim == 1
