"""Plotting smoke tests (Agg backend; cartopy optional)."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np

from tobac_flow_tpu.data.ncdataset import DataArray, Dataset
from tobac_flow_tpu.plotting import bias_plot, goes_subplot, plot_field, plot_labels


def _ds():
    ds = Dataset(coords={"y": np.linspace(0.1, -0.1, 16), "x": np.linspace(-0.1, 0.1, 24)})
    ds["bt"] = DataArray(np.random.default_rng(0).normal(250, 10, (16, 24)), dims=("y", "x"))
    return ds


def test_goes_subplot_and_field_render_to_png(tmp_path):
    ds = _ds()
    fig = plt.figure()
    ax = goes_subplot(ds, fig=fig)
    im = plot_field(ax, ds["bt"], dataset=ds, cmap="viridis")
    assert im.get_array().shape == (16, 24)
    labels = np.zeros((16, 24), np.int32)
    labels[4:8, 6:12] = 1
    plot_labels(ax, labels, dataset=ds)
    out = tmp_path / "field.png"
    fig.savefig(out)
    plt.close(fig)
    assert out.stat().st_size > 0


def test_bias_plot_handles_nans(tmp_path):
    fig, ax = plt.subplots()
    obs = np.array([1.0, 2.0, np.nan, 4.0, 5.0])
    pred = np.array([1.1, 1.9, 3.0, np.nan, 5.2])
    h = bias_plot(ax, obs, pred, bins=5)
    assert h[0].sum() == 3  # only pairwise-finite samples counted
    fig.savefig(tmp_path / "bias.png")
    plt.close(fig)
