"""Run tools/bench_e2e.py with RUNTIME (monkeypatched) sub-stage timers.

Wraps the fused detect programs, the watershed, and the host label
bookkeeping with wall-clock timers WITHOUT touching package source — the
persistent program cache keys on a digest of every package .py file, so
edit-based instrumentation would invalidate every compiled program and
measure compile time instead of steady state.

Usage:  python tools/e2e_instrumented.py -t 96 -y 512 -x 768 --no-write
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

_DEPTH = [0]


def _wrap(mod, name, tag=None):
    fn = getattr(mod, name)
    label = tag or f"{mod.__name__.split('.')[-1]}.{name}"

    @functools.wraps(fn)
    def timed(*args, **kwargs):
        _DEPTH[0] += 1
        start = time.perf_counter()
        try:
            return fn(*args, **kwargs)
        finally:
            _DEPTH[0] -= 1
            print(
                f"[sub]{'  ' * _DEPTH[0]} {label}: "
                f"{time.perf_counter() - start:.2f}s",
                flush=True,
            )

    setattr(mod, name, timed)


def main():
    import tobac_flow_tpu.detect.fused as fused
    import tobac_flow_tpu.detect.detection as detection
    import tobac_flow_tpu.detect.analysis as analysis
    import tobac_flow_tpu.ops.watershed as ws
    import tobac_flow_tpu.segment.label as seg_label
    import tobac_flow_tpu.utils.labels as labels_mod

    for mod, names in (
        (fused, ("fused_core_markers", "fused_anvil_marker_mask",
                 "fused_anvil_pre_watershed", "fused_anvil_post_watershed")),
        (ws, ("watershed",)),
        (seg_label, ("flow_label", "flow_link_overlap",
                     "link_labels_by_overlap", "_overlap_pair_hists_device")),
        (labels_mod, ("remap_labels", "slice_labels", "make_step_labels",
                      "labeled_comprehension", "apply_func_to_labels")),
        (analysis, ("find_object_lengths", "mask_labels")),
        (detection, ("get_combined_filters", "get_growth_rate")),
    ):
        for n in names:
            _wrap(mod, n)
    # detection.py binds some names at import time via `from ... import`;
    # re-point those references at the wrapped versions
    detection.remap_labels = labels_mod.remap_labels
    detection.slice_labels = labels_mod.slice_labels
    detection.make_step_labels = labels_mod.make_step_labels
    detection.labeled_comprehension = labels_mod.labeled_comprehension
    detection.find_object_lengths = analysis.find_object_lengths
    detection.mask_labels = analysis.mask_labels

    import bench_e2e

    bench_e2e.main(sys.argv[1:])


if __name__ == "__main__":
    main()
