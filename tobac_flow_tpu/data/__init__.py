from tobac_flow_tpu.data.ncdataset import DataArray, Dataset, open_dataset  # noqa: F401
from tobac_flow_tpu.data.dataset_utils import (  # noqa: F401
    add_cell_method,
    add_compression_encoding,
    add_dataarray_to_ds,
    create_dataarray,
    get_coord_bin_edges,
    isel_anvil,
    isel_core,
    sel_anvil,
    sel_core,
)
