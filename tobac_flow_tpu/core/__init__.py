from tobac_flow_tpu.core.abstracts import AbstractFlow  # noqa: F401
from tobac_flow_tpu.core.flow import (  # noqa: F401
    Flow,
    calculate_flow,
    combine_flow,
    create_flow,
    flow_magnitude,
    smooth_flow_step,
)
