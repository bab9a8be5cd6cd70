"""Shared detection-pipeline driver used by every ingest CLI.

Mirrors the step sequence and default thresholds of the reference main
pipeline (``scripts/dcc_detect_goes.py:134-449``): flow → detect_cores →
anvil markers → thick anvils (+optional relabel) → thin anvils → label
coords/links/steps → flags → optional properties/statistics → netCDF with
compressed encoding and atomic .temp rename.
"""

from __future__ import annotations

import os
from datetime import datetime
from pathlib import Path

import numpy as np

from tobac_flow_tpu.core.flow import create_flow
from tobac_flow_tpu.data.ncdataset import Dataset
from tobac_flow_tpu.detect import (
    detect_anvils,
    detect_cores,
    get_anvil_markers,
    relabel_anvils,
)
from tobac_flow_tpu.detect.analysis import get_label_stats
from tobac_flow_tpu.schema import (
    add_label_coords,
    add_step_labels,
    calculate_label_properties,
    flag_edge_labels,
    flag_nan_adjacent_labels,
    link_cores_and_anvils,
    link_step_labels,
)

__all__ = ["run_detection", "DetectionOptions"]


class DetectionOptions:
    """Pipeline thresholds (defaults = reference dcc_detect_goes.py:169-291)."""

    def __init__(
        self,
        wvd_threshold=0.25,
        bt_threshold=0.5,
        overlap=0.5,
        absolute_overlap=4,
        subsegment_shrink=0.0,
        t_offset=3,
        use_wvd=False,
        thick_upper=-5.0,
        thick_lower=-12.5,
        thin_upper=0.0,
        thin_lower=-7.5,
        erode_distance=2,
        relabel=True,
        flow_model="Farneback",
        vr_steps=1,
        smoothing_passes=1,
        interp_method="cubic",
        save_label_props=True,
        save_spatial_props=False,
        save_field_props=True,
        save_bt=False,
        save_wvd=False,
        save_swd=False,
        save_anvil_markers=False,
        checkpoint_path=None,
        flow_factory=None,
    ):
        self.__dict__.update(locals())
        del self.__dict__["self"]


def _seed_combined_field(combined, wvd, swd, sign):
    """Seed the device transfer cache for ``wvd + sign*swd``.

    The anvil marker/watershed stages consume the combined field on device;
    deriving it there from the already-cached ``wvd``/``swd`` uploads is one
    elementwise op vs a third full-volume trip over the host↔device link.
    Skipped above the whole-field residency budget (GOES full-disk scale),
    where the chunked drivers stream host slices instead."""
    try:
        from tobac_flow_tpu.detect.fused import WHOLE_UPLOAD_BUDGET_BYTES
        from tobac_flow_tpu.utils.device_cache import (
            device_put_cached,
            seed_device_cache,
        )

        cv = np.asarray(combined.values)
        wv = np.asarray(wvd.values)
        sv = np.asarray(swd.values)
        if cv.nbytes > WHOLE_UPLOAD_BUDGET_BYTES or cv.dtype != wv.dtype:
            return
        wd, sd = device_put_cached(wv), device_put_cached(sv)
        seed_device_cache(cv, (wd - sd) if sign < 0 else (wd + sd))
    except Exception:
        pass  # seeding is an optimisation only; the upload path still works


def run_detection(
    bt,
    wvd,
    swd,
    dataset: Dataset,
    start_date=None,
    end_date=None,
    opts: DetectionOptions | None = None,
    timer=None,
) -> Dataset:
    """Run the full DCC detection pipeline into ``dataset``.

    ``timer`` (a :class:`tobac_flow_tpu.utils.profiling.StageTimer`) records
    per-stage wall clock when provided — the instrumentation behind the
    end-to-end benchmark's stage breakdown."""
    import contextlib

    if opts is None:
        opts = DetectionOptions()
    stage = timer.stage if timer is not None else (
        lambda name: contextlib.nullcontext()
    )

    print(datetime.now(), "Calculating flow field", flush=True)
    with stage("flow"):
        if opts.flow_factory is not None:
            # pluggable flow construction (e.g. the reference-semantics CPU
            # stack for end-to-end baseline measurement, tools/bench_e2e.py)
            flow = opts.flow_factory(bt)
        else:
            flow = create_flow(
                bt,
                model=opts.flow_model,
                vr_steps=opts.vr_steps,
                smoothing_passes=opts.smoothing_passes,
                interp_method=opts.interp_method,
            )

    print(datetime.now(), "Detecting growth markers", flush=True)
    with stage("detect_cores"):
        core_labels = detect_cores(
            flow,
            bt,
            wvd,
            swd,
            wvd_threshold=opts.wvd_threshold,
            bt_threshold=opts.bt_threshold,
            overlap=opts.overlap,
            absolute_overlap=opts.absolute_overlap,
            subsegment_shrink=opts.subsegment_shrink,
            min_length=opts.t_offset,
            use_wvd=opts.use_wvd,
        )
    print("Final detected core count: n =", core_labels.values.max(), flush=True)
    dataset["core_label"] = core_labels

    # mid-run checkpoint to bound host memory (reference
    # dcc_detect_goes.py:191-213, 275-284): the dataset with the core labels
    # goes to disk and is freed for the anvil-detection peak; bt is freed too
    # when nothing downstream needs it.  Reopened after thin-anvil detection.
    checkpoint = Path(opts.checkpoint_path) if opts.checkpoint_path else None
    if checkpoint is not None:
        if opts.save_bt:
            dataset["bt"] = bt
        dataset.to_netcdf(checkpoint, compress=True, complevel=5)
        print(datetime.now(), "Checkpointed core labels to", checkpoint, flush=True)
        dataset = None
        core_labels = None
        if not (opts.save_field_props or opts.save_bt):
            bt = None  # frees the frame when the caller passed its only ref

    # Above ~1 GB per field the anvil watersheds run HBM-chunked and need
    # most of the 16 GB chip for their per-chunk working set: unpin the
    # transfer cache's full-volume uploads (bt/wvd/swd/combined fields from
    # the flow/core stages — LRU 8 x ~GB pinned HBM was measured exhausting
    # the chip inside the first chunk's coarse scan at CONUS-96 scale) and
    # cap re-population by the stage prep's streamed slices.
    _vol_bytes = np.asarray(getattr(wvd, "values", wvd)).nbytes
    if _vol_bytes > (1 << 30):
        from tobac_flow_tpu.utils import device_cache as _dc

        _dc._MAX_ENTRIES = 2
        _dc.clear_device_cache()

    print(datetime.now(), "Detecting thick anvil region", flush=True)
    # build each derived field once: the marker and watershed stages share
    # the SAME array object, so its device upload is cached across stages —
    # and its device copy is SEEDED from the already-uploaded wvd/swd
    # operands (one elementwise op) instead of a third full-volume upload
    wvd_minus_swd = wvd - swd
    if _vol_bytes <= (1 << 30):
        # (skipped at chunked-watershed scale: seeding would re-upload wvd
        # AND swd into the just-capped cache — twice the traffic of letting
        # the stage upload the one combined field it actually consumes)
        _seed_combined_field(wvd_minus_swd, wvd, swd, sign=-1.0)
    with stage("anvil_markers"):
        anvil_markers = get_anvil_markers(
            flow,
            wvd_minus_swd,
            threshold=opts.thick_upper,
            overlap=opts.overlap,
            absolute_overlap=opts.absolute_overlap,
            subsegment_shrink=opts.subsegment_shrink,
            min_length=opts.t_offset,
            name="anvil_marker_label",
        )
    print(
        "Final thick anvil markers: n =", anvil_markers.values.max(), flush=True
    )

    with stage("thick_anvils"):
        thick_anvil_labels = detect_anvils(
            flow,
            wvd_minus_swd,
            markers=anvil_markers,
            upper_threshold=opts.thick_upper,
            lower_threshold=opts.thick_lower,
            erode_distance=opts.erode_distance,
            min_length=opts.t_offset,
            name="thick_anvil_label",
            attributes=dict(long_name="Labels of detected thick anvil regions"),
        )
    if opts.relabel:
        with stage("relabel_anvils"):
            thick_anvil_labels = relabel_anvils(
                flow,
                thick_anvil_labels,
                markers=anvil_markers,
                overlap=opts.overlap,
                absolute_overlap=opts.absolute_overlap,
                min_length=opts.t_offset,
                name="thick_anvil_label",
                attributes=dict(
                    long_name="Labels of detected thick anvil regions"
                ),
            )
    print(
        "Final detected thick anvils: n =",
        thick_anvil_labels.values.max(),
        flush=True,
    )
    if dataset is not None:
        dataset["thick_anvil_label"] = thick_anvil_labels
        if opts.save_anvil_markers:
            dataset["anvil_marker_label"] = anvil_markers
    if checkpoint is not None and not opts.save_anvil_markers:
        anvil_markers = None  # free before the thin-anvil watershed peak

    wvd_minus_swd = None  # free (and uncache) before the thin-anvil peak
    if _vol_bytes > (1 << 30):
        from tobac_flow_tpu.utils import device_cache as _dc

        _dc.clear_device_cache()
    print(datetime.now(), "Detecting thin anvil region", flush=True)
    wvd_plus_swd = wvd + swd
    if _vol_bytes <= (1 << 30):
        _seed_combined_field(wvd_plus_swd, wvd, swd, sign=1.0)
    with stage("thin_anvils"):
        thin_anvil_labels = detect_anvils(
            flow,
            wvd_plus_swd,
            markers=thick_anvil_labels,
            upper_threshold=opts.thin_upper,
            lower_threshold=opts.thin_lower,
            erode_distance=opts.erode_distance,
            min_length=opts.t_offset,
            name="thin_anvil_label",
            attributes=dict(long_name="Labels of detected thin anvil regions"),
        )
    print(
        "Detected thin anvils: n =", thin_anvil_labels.values.max(), flush=True
    )
    if checkpoint is not None:
        from tobac_flow_tpu.data.ncdataset import open_dataset

        print(datetime.now(), "Reopening checkpoint", checkpoint, flush=True)
        dataset = open_dataset(checkpoint)
        dataset["thick_anvil_label"] = thick_anvil_labels
        if opts.save_anvil_markers and anvil_markers is not None:
            dataset["anvil_marker_label"] = anvil_markers
        checkpoint.unlink()
    dataset["thin_anvil_label"] = thin_anvil_labels

    print(datetime.now(), "Preparing output", flush=True)
    with stage("schema"):
        dataset = add_label_coords(dataset)
        link_cores_and_anvils(dataset)
        add_step_labels(dataset)
        dataset = add_label_coords(dataset)
        link_step_labels(dataset)
        flag_edge_labels(dataset, start_date, end_date)
        flag_nan_adjacent_labels(dataset, wvd)

    if opts.save_label_props:
        with stage("label_props"):
            calculate_label_properties(dataset)
    if opts.save_spatial_props:
        get_label_stats(dataset["core_label"], dataset)
        get_label_stats(dataset["thick_anvil_label"], dataset)
        get_label_stats(dataset["thin_anvil_label"], dataset)
    if opts.save_field_props:
        from tobac_flow_tpu.detect.analysis import weighted_statistics_on_labels

        bt_shape = np.asarray(bt.values).shape
        if "area" in dataset:
            weights = np.broadcast_to(
                np.asarray(dataset["area"].values)[np.newaxis], bt_shape
            )
        else:
            weights = np.broadcast_to(
                np.ones((), dtype=np.asarray(bt.values).dtype), bt_shape
            )
        with stage("field_props"):
            for field in (bt, wvd, swd):
                for labels, name, dim in [
                    (dataset["core_label"], "core", "core"),
                    (dataset["thick_anvil_label"], "thick_anvil", "anvil"),
                    (dataset["thin_anvil_label"], "thin_anvil", "anvil"),
                    (dataset["core_step_label"], "core_step", "core_step"),
                    (
                        dataset["thick_anvil_step_label"],
                        "thick_anvil_step",
                        "thick_anvil_step",
                    ),
                    (
                        dataset["thin_anvil_step_label"],
                        "thin_anvil_step",
                        "thin_anvil_step",
                    ),
                ]:
                    for da in weighted_statistics_on_labels(
                        labels, field, weights, name=name, dim=dim,
                        dtype=np.float32,
                    ):
                        dataset[da.name] = da
    if opts.save_bt:
        dataset["bt"] = bt
    if opts.save_wvd:
        dataset["wvd"] = wvd
    if opts.save_swd:
        dataset["swd"] = swd
    return dataset


def save_dataset(dataset: Dataset, save_path) -> None:
    """Write via an atomic-ish .temp.nc rename (reference
    dcc_detect_goes.py:206,445-452)."""
    save_path = Path(save_path)
    temp_path = save_path.with_suffix(".temp.nc")
    dataset.to_netcdf(temp_path, compress=True, complevel=5)
    os.replace(temp_path, save_path)
    print(datetime.now(), "Saved to", save_path, flush=True)
