from tobac_flow_tpu.parallel.mesh import make_mesh  # noqa: F401
from tobac_flow_tpu.parallel.halo import halo_exchange_t, halo_exchange_x  # noqa: F401
from tobac_flow_tpu.parallel.pipeline import sharded_detect_step  # noqa: F401
from tobac_flow_tpu.parallel.label import (  # noqa: F401
    make_sharded_flow_label,
    sharded_flow_label,
)
from tobac_flow_tpu.parallel.watershed import sharded_watershed  # noqa: F401
