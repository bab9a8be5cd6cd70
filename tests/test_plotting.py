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


def test_goes_figure_and_bound_helpers(tmp_path):
    """The bound imshow/contour/quiver/colorbar helpers render without a CRS
    (cartopy absent) — reference plotting.py:27-152 surface."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from tobac_flow_tpu.data.ncdataset import Dataset
    from tobac_flow_tpu.plotting import add_gl_ticks, bias_plot, goes_figure

    h, w = 24, 32
    ds = Dataset(coords={"y": np.linspace(0.1, -0.1, h), "x": np.linspace(-0.1, 0.1, w)})
    fig = goes_figure(ds, figsize=(4, 3))
    ax = fig.subplot(111)
    rng = np.random.default_rng(0)
    data = rng.normal(280, 5, (h, w))
    im = ax.imshow(data)
    cb = ax.colorbar(im, location="right")
    assert cb is not None
    ax.contour(data, levels=3)
    ax.contourf(data, levels=3)
    ax.quiver(data * 0.01, data * 0.01, spacing=4)
    ax.quiver(data * 0.01, data * 0.01, spacing=4, block_method="reduce")
    add_gl_ticks(ax, object())  # no cartopy gridliner: must be a no-op
    fig.savefig(tmp_path / "helpers.png")
    plt.close(fig)

    fig, ax = plt.subplots()
    bias_plot(ax, data, data + rng.normal(0, 1, data.shape), weights=np.ones_like(data))
    fig.savefig(tmp_path / "bias.png")
    plt.close(fig)
