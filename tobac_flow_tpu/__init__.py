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
