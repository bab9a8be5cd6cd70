from tobac_flow_tpu.data.ncdataset import DataArray, Dataset, open_dataset  # noqa: F401
