from tobac_flow_tpu.utils.normalisation import (  # noqa: F401
    to_8bit,
    linearise_field,
    linear_norm,
    log_norm,
    inverse_log_norm,
    z_norm,
    uniform_norm,
    local_linear_norm,
    select_normalisation_method,
)
