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
from tobac_flow_tpu.utils.datetime_utils import (  # noqa: F401
    get_datetime_from_coord,
    get_time_diff_from_coord,
    time_diff,
    get_dates_from_filename,
    trim_file_start,
    trim_file_end,
    trim_file_start_and_end,
)
from tobac_flow_tpu.utils.labels import (  # noqa: F401
    labeled_comprehension,
    apply_func_to_labels,
    flat_label,
    make_step_labels,
    get_step_labels_for_label,
    relabel_objects,
    remap_labels,
    slice_labels,
    find_overlapping_labels,
)
