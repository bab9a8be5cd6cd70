"""tobac-flow-tpu: TPU-native detection, segmentation and tracking of deep
convective clouds in geostationary satellite imagery.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
``w-k-jones/tobac-flow`` (reference v1.8.3). The public API mirrors the
reference: a :class:`Flow` object exposing semi-Lagrangian
``convolve``/``diff``/``sobel``/``watershed``/``label``/``link_overlap``,
plus ``detect_cores``/``detect_anvils`` science entry points.
"""

__version__ = "0.1.0"

from tobac_flow_tpu.core.flow import (  # noqa: F401
    Flow,
    create_flow,
    calculate_flow,
)

# Reference-style module aliases (PEP 562, resolved lazily so importing the
# package stays light): reference users write ``from tobac_flow import abi``
# etc. (flat layout); the same names resolve to this package's modules.
_MODULE_ALIASES = {
    "flow": "tobac_flow_tpu.core.flow",
    "convolve": "tobac_flow_tpu.ops.convolve",
    "sobel": "tobac_flow_tpu.ops.sobel",
    "watershed": "tobac_flow_tpu.ops.watershed",
    "label": "tobac_flow_tpu.segment.label",
    "detection": "tobac_flow_tpu.detect.detection",
    "analysis": "tobac_flow_tpu.detect.analysis",
    "dataset": "tobac_flow_tpu.schema.dataset",
    "postprocess": "tobac_flow_tpu.schema.postprocess",
    "linking": "tobac_flow_tpu.track.linking",
    "validation": "tobac_flow_tpu.validate.validation",
    "io": "tobac_flow_tpu.data.io",
    "abi": "tobac_flow_tpu.data.abi",
    "glm": "tobac_flow_tpu.data.glm",
    "nexrad": "tobac_flow_tpu.data.nexrad",
    "dataloader": "tobac_flow_tpu.data.dataloader",
    "geo": "tobac_flow_tpu.utils.geo",
}


def __getattr__(name):
    target = _MODULE_ALIASES.get(name)
    if target is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    module = importlib.import_module(target)
    globals()[name] = module  # cache for subsequent lookups
    return module


def __dir__():
    return sorted(list(globals()) + list(_MODULE_ALIASES))
