"""Aggregate JAX transfer-guard logs into a per-stage transfer ledger.

Run the pipeline with ``JAX_TRANSFER_GUARD=log`` (stderr merged into the
log file); guard_lib emits one ``host-to-device transfer: aval=...`` /
``device-to-host transfer: aval=...`` line per crossing, timestamped, and
the pipeline's own ``datetime.now()`` stage prints interleave.  This tool
buckets the transfer bytes between stage prints so the end-to-end
benchmark's stage table can be split into tunnel time vs everything else
(the rig's measured tunnel: ~12.5 MB/s up, ~8 MB/s down).

Usage: python tools/transfer_ledger.py /tmp/e2e96.log
"""

from __future__ import annotations

import json
import re
import sys

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1, "u8": 1,
    "u32": 4, "u16": 2, "bool": 1, "pred": 1,
}

AVAL_RE = re.compile(
    r"(host-to-device|device-to-host) transfer: "
    r"aval=ShapedArray\((\w+?)\[([\d,\s]*)\]"
)
# device-to-host lines use a different guard_lib format:
#   device-to-host transfer: shape=(50,512,768), dtype=PRED, device=...
SHAPE_RE = re.compile(
    r"(host-to-device|device-to-host) transfer: "
    r"shape=\(([\d,\s]*)\), dtype=(\w+)"
)
XLA_DTYPE_BYTES = {
    "PRED": 1, "S8": 1, "U8": 1, "S16": 2, "U16": 2, "F16": 2, "BF16": 2,
    "S32": 4, "U32": 4, "F32": 4, "S64": 8, "U64": 8, "F64": 8,
}
GUARD_TS_RE = re.compile(r"^W\d{4} (\d\d:\d\d:\d\d)")
STAGE_RE = re.compile(
    r"^\d{4}-\d\d-\d\d (\d\d:\d\d:\d\d)[\d.]* (.+)$"
)

STAGE_MARKS = [
    ("Calculating flow field", "flow"),
    ("Detecting growth markers", "detect_cores"),
    ("Checkpointed core labels", "anvil_markers"),
    ("Detecting thick anvil region", "anvil_markers"),
    ("Detecting thin anvil region", "thin_anvils"),
    ("Preparing output", "schema"),
    ("Saved to", "save"),
]
# thick_anvils begins at the "Final thick anvil markers" print (no
# datetime); detected from plain prints below.


def parse(path):
    stage = "startup"
    per_stage = {}
    with open(path, errors="replace") as fh:
        for line in fh:
            m = STAGE_RE.match(line)
            if m:
                msg = m.group(2)
                for mark, name in STAGE_MARKS:
                    if msg.startswith(mark):
                        stage = name
                        break
                continue
            if line.startswith("Final thick anvil markers"):
                stage = "thick_anvils"
                continue
            if line.startswith("Final detected thick anvils"):
                stage = "thin_anvils"
                continue
            m = AVAL_RE.search(line)
            if m:
                direction, dtype, dims = m.groups()
                nbytes = DTYPE_BYTES.get(dtype, 4)
            else:
                m = SHAPE_RE.search(line)
                if not m:
                    continue
                direction, dims, dtype = m.groups()
                nbytes = XLA_DTYPE_BYTES.get(dtype, 4)
            for d in dims.split(","):
                d = d.strip()
                if d:
                    nbytes *= int(d)
            key = "up" if direction == "host-to-device" else "down"
            bucket = per_stage.setdefault(stage, {"up": 0, "down": 0,
                                                  "n_up": 0, "n_down": 0})
            bucket[key] += nbytes
            bucket["n_" + key] += 1
    return per_stage


def main():
    per_stage = parse(sys.argv[1])
    up_bw = 12.5e6   # measured tunnel MB/s
    down_bw = 8.0e6
    total_up = total_down = 0
    report = {}
    for stage, b in per_stage.items():
        est_s = b["up"] / up_bw + b["down"] / down_bw
        report[stage] = {
            "up_mb": round(b["up"] / 1e6, 1),
            "down_mb": round(b["down"] / 1e6, 1),
            "n_up": b["n_up"],
            "n_down": b["n_down"],
            "est_tunnel_s": round(est_s, 1),
        }
        total_up += b["up"]
        total_down += b["down"]
    report["TOTAL"] = {
        "up_mb": round(total_up / 1e6, 1),
        "down_mb": round(total_down / 1e6, 1),
        "est_tunnel_s": round(total_up / up_bw + total_down / down_bw, 1),
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
