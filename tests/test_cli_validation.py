"""End-to-end drive of the validation CLI with a pre-gridded flash file."""

import numpy as np

from tobac_flow_tpu.cli import dcc_validation
from tobac_flow_tpu.data.ncdataset import DataArray, Dataset, open_dataset


def _detection_file(path):
    t, h, w = 6, 48, 48
    times = np.datetime64("2018-06-19T12:00") + np.arange(t) * np.timedelta64(
        300, "s"
    )
    cores = np.zeros((t, h, w), np.int32)
    cores[1:5, 22:26, 22:26] = 1
    anvils = np.zeros((t, h, w), np.int32)
    anvils[1:5, 16:32, 16:32] = 1
    ds = Dataset(coords={"t": times, "core": [1], "anvil": [1]})
    ds["core_label"] = DataArray(cores, dims=("t", "y", "x"))
    ds["thick_anvil_label"] = DataArray(anvils, dims=("t", "y", "x"))
    ds.to_netcdf(str(path))
    return t, h, w, times


def test_validation_cli_with_gridded_flashes(tmp_path):
    det = tmp_path / "detected_test_S20181701200000_E20181701230000_X0648.nc"
    t, h, w, times = _detection_file(det)

    glm = np.zeros((t, h, w), np.float32)
    glm[2, 24, 24] = 2.0  # flashes on the core
    glm_ds = Dataset(coords={"t": times})
    glm_ds["glm_flashes"] = DataArray(glm, dims=("t", "y", "x"))
    glm_file = tmp_path / "gridded_glm.nc"
    glm_ds.to_netcdf(str(glm_file))

    out = dcc_validation.main(
        [str(det), "-glm", str(glm_file), "-sd", str(tmp_path), "-margin", "5"]
    )
    assert out.name.startswith("validated_")
    vds = open_dataset(str(out))
    assert vds.attrs["core_pod"] == 1.0
    assert vds.attrs["core_far"] == 0.0
    assert vds["core_glm_distance"].values[0] == 0.0
    np.testing.assert_array_equal(vds["glm_flashes"].values, glm)
