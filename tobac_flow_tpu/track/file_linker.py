"""Streaming cross-file linkers.

Parity target: reference ``tobac_flow/linking.py`` classes — ``File_Linker``
(651-1105), a streaming two-file linker holding a running max-label state,
and ``Label_Linker`` (1107-1575), a global label map resolved by
pointer-convergence.  Here both are built on the vectorised pair-overlap +
connected-components machinery in ``track/linking.py``: ``FileLinker``
streams file pairs (bounded memory), ``LabelLinker`` resolves a global label
map in one pass.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from tobac_flow_tpu.track.linking import (
    find_overlap_between_files,
    process_linking_output,
    relabel_file,
)

__all__ = ["FileLinker", "LabelLinker"]


class FileLinker:
    """Stream consecutive detection files, link their labels, and write
    relabelled outputs with globally consistent ids."""

    def __init__(self, files, output_path, atol=5, rtol=0.5, output_file_suffix=None):
        self.files = [Path(f) for f in files]
        self.output_path = Path(output_path)
        self.output_path.mkdir(parents=True, exist_ok=True)
        self.atol = atol
        self.rtol = rtol
        self.suffix = output_file_suffix
        self.overlap_results = []

    def process_files(self):
        """Compute pair overlaps one pair at a time, resolve the global
        graph, then relabel every file."""
        for f1, f2 in zip(self.files[:-1], self.files[1:]):
            print(f"Linking {f1.name} -> {f2.name}", flush=True)
            self.overlap_results.append(
                find_overlap_between_files(f1, f2, atol=self.atol, rtol=self.rtol)
            )
        links = process_linking_output(self.overlap_results)
        outputs = []
        for f in self.files:
            name = f.name.replace("detected_", "linked_")
            if self.suffix:
                name = name.replace(".nc", f"{self.suffix}.nc")
            out = self.output_path / name
            relabel_file(f, links, save_path=out)
            print(f"Relabelled {f.name} -> {out.name}", flush=True)
            outputs.append(out)
        return links, outputs


class LabelLinker:
    """Global label-map resolution over precomputed pair overlaps (the batch
    counterpart of the reference's pointer-convergence Label_Linker)."""

    def __init__(self, overlap_results):
        self.overlap_results = list(overlap_results)
        self.links = None

    def resolve(self):
        self.links = process_linking_output(self.overlap_results)
        return self.links

    def label_map(self, kind="core"):
        """The global relabel map for 'core' or 'anvil' labels."""
        if self.links is None:
            self.resolve()
        return np.asarray(self.links[f"{kind}_labels"].values)
