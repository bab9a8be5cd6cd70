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


def _window_name(own_start_frame, own_end_frame):
    """GOES-style _S/_E filename tokens for the owned frame range."""
    from datetime import datetime, timedelta

    base = datetime(2020, 6, 1)

    def tok(frame):
        dt = base + timedelta(seconds=300 * frame)
        return f"{dt.year}{dt.timetuple().tm_yday:03d}{dt:%H%M%S}"

    return f"detected_dccs_SYN_S{tok(own_start_frame)}_E{tok(own_end_frame)}.nc"


@pytest.fixture(scope="module")
def four_windows(tmp_path_factory):
    """Four overlapping detection windows of one 36-frame scene — the last
    pair has a time gap (no shared frames)."""
    tmp_path = tmp_path_factory.mktemp("linking4")
    layout = [  # (first frame, n frames, owned range)
        (0, 12, (0, 9)),
        (6, 12, (9, 15)),
        (12, 12, (15, 21)),
        (26, 10, (26, 36)),  # gap: previous window ends at frame 23
    ]
    files = []
    for t0, nt, (s, e) in layout:
        files.append(
            _detect_window_scene36(tmp_path, _window_name(s, e), t0, nt)
        )
    return tmp_path, files


def _long_lived_scene(t, h, w, seed=0):
    """A storm cooling at a steady 1.6 K/min for the whole scene, so every
    detection window finds the same core (make_scene's life-cycle storm only
    cools detectably for a few frames)."""
    from tobac_flow_tpu.data.ncdataset import DataArray

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    bt = np.empty((t, h, w), np.float32)
    wvd = np.empty((t, h, w), np.float32)
    swd = np.empty((t, h, w), np.float32)
    for i in range(t):
        cx, cy = 0.2 * w + 2.0 * i, 0.4 * h + 0.5 * i
        radius = h / 10
        core = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * radius**2))
        depth = min(20.0 + 8.0 * i, 300.0)
        bt[i] = 290.0 - depth * core + rng.normal(0, 0.3, (h, w))
        wvd[i] = -15.0 + 17.0 * core + rng.normal(0, 0.2, (h, w))
        swd[i] = 5.0 - 4.5 * core + rng.normal(0, 0.1, (h, w))
    times = np.datetime64("2020-06-01T00:00:00", "ns") + np.arange(t) * np.timedelta64(
        300, "s"
    )
    coords = {"t": times, "y": np.arange(h) * 2000.0, "x": np.arange(w) * 2000.0}

    def da(v, name):
        return DataArray(
            v, coords=coords, dims=("t", "y", "x"), name=name,
            attrs={"long_name": name, "units": "K"},
        )

    return da(bt, "bt"), da(wvd, "wvd"), da(swd, "swd")


def _detect_window_scene36(tmp_path, name, t0_index, t):
    from tobac_flow_tpu.cli.common import DetectionOptions, run_detection, save_dataset
    from tobac_flow_tpu.data.ncdataset import Dataset

    bt, wvd, swd = _long_lived_scene(36, 96, 128, seed=0)
    sl = slice(t0_index, t0_index + t)
    bt, wvd, swd = bt[sl], wvd[sl], swd[sl]
    ds = Dataset(coords={"t": bt.coords["t"], "y": bt.coords["y"], "x": bt.coords["x"]})
    opts = DetectionOptions(save_label_props=False, save_field_props=False)
    ds = run_detection(bt, wvd, swd, ds, opts=opts)
    path = tmp_path / name
    save_dataset(ds, path)
    return path


def _partition_bijection(a, b):
    """True when two label rasters induce the same partition of the nonzero
    pixels (bijective label correspondence)."""
    m = (a != 0) & (b != 0)
    if ((a != 0) != (b != 0)).any():
        return False
    pairs = set(zip(a[m].tolist(), b[m].tolist()))
    return len(pairs) == len({x for x, _ in pairs}) == len({y for _, y in pairs})


def test_file_linker_streams_four_files(four_windows):
    """The real streaming FileLinker: bounded two-file memory, global label
    continuity through three overlapping windows and across a time gap."""
    from tobac_flow_tpu.track.file_linker import FileLinker
    from tobac_flow_tpu.utils.datetime_utils import get_dates_from_filename

    tmp_path, files = four_windows
    out_dir = tmp_path / "filelinker_out"
    linker = FileLinker(files, out_dir)
    outputs = linker.process_files()
    assert len(outputs) == 4
    assert linker.max_open_datasets <= 2  # streaming: two files resident max

    datasets = [open_dataset(str(p)) for p in outputs]
    # outputs are trimmed to their owned windows: contiguous, non-overlapping
    for p, ds in zip(outputs, datasets):
        start, end = get_dates_from_filename(p)
        t = np.asarray(ds.coords["t"])
        assert (t >= np.datetime64(start)).all()
        assert (t < np.datetime64(end)).all()

    # the storm spans the three overlapping windows: one global core id
    ids = [set(np.unique(ds["core_label"].values)) - {0} for ds in datasets]
    spanning = ids[0] & ids[1] & ids[2]
    assert spanning, f"no core id spans the overlapping windows: {ids[:3]}"
    # labels never collide across the time gap
    assert not (ids[2] & ids[3])

    # step labels continue the running count across files
    step_maxes = [
        int(ds["core_step_label"].values.max()) for ds in datasets if "core_step_label" in ds
    ]
    assert step_maxes == sorted(step_maxes)


def test_file_linker_matches_batch_partition(four_windows):
    """Streamed output induces the same per-file core partition as the batch
    overlap-graph path on the overlapping windows."""
    from tobac_flow_tpu.track.file_linker import FileLinker
    from tobac_flow_tpu.utils.datetime_utils import trim_file_start_and_end
    from tobac_flow_tpu.utils.datetime_utils import get_dates_from_filename

    tmp_path, files = four_windows
    overlapping = files[:3]
    out_dir = tmp_path / "filelinker_batchcmp"
    linker = FileLinker(overlapping, out_dir)
    outputs = linker.process_files()

    results = [
        find_overlap_between_files(f1, f2)
        for f1, f2 in zip(overlapping[:-1], overlapping[1:])
    ]
    links = process_linking_output(results)
    for f, out in zip(overlapping, outputs):
        batch = relabel_file(f, links)
        start, end = get_dates_from_filename(f)
        batch = trim_file_start_and_end(batch, start, end)
        streamed = open_dataset(str(out))
        a = np.asarray(streamed["core_label"].values)
        b = np.asarray(batch["core_label"].values)
        # the streaming path additionally merges overlap-window pixels from
        # the neighbouring file; compare on the pixels both paths labelled
        m = (a != 0) & (b != 0)
        assert m.sum() > 0
        pairs = set(zip(a[m].tolist(), b[m].tolist()))
        assert len(pairs) == len({x for x, _ in pairs}) == len({y for _, y in pairs})


def test_label_linker_pointer_convergence(four_windows):
    """LabelLinker: global maps built by pointer convergence with two files
    resident, then a streaming relabel+write pass."""
    from tobac_flow_tpu.track.file_linker import LabelLinker

    tmp_path, files = four_windows
    out_dir = tmp_path / "labellinker_out"
    linker = LabelLinker(files, output_path=out_dir, atol=5, rtol=0.5)
    linker.link_all()
    assert linker.max_open_datasets <= 2

    # the map is converged: one more pointer hop changes nothing
    cmap = linker.core_label_map
    assert (cmap[cmap] == cmap).all()
    amap = linker.anvil_label_map
    assert (amap[amap] == amap).all()
    # something actually linked across the overlapping windows
    assert (cmap != np.arange(cmap.size)).any()

    outputs = linker.output_files()
    assert len(outputs) == 4
    datasets = [open_dataset(str(p)) for p in outputs]
    ids = [set(np.unique(ds["core_label"].values)) - {0} for ds in datasets]
    spanning = ids[0] & ids[1] & ids[2]
    assert spanning, f"no core id spans the overlapping windows: {ids[:3]}"
