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
    "get_goes_extent",
    "goes_subplot",
    "goes_figure",
    "add_gl_ticks",
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


def get_goes_extent(dataset):
    """Image extent [x0, x1, y1, y0] in projection metres (scan angle ×
    satellite height; reference ``plotting.py:16-24``)."""
    try:
        from tobac_flow_tpu.data.abi import get_abi_proj

        proj = get_abi_proj(dataset)
        h = proj.h - proj.req  # perspective point height
    except Exception:
        h = 1.0
    x = np.asarray(dataset.coords["x"], dtype=float)
    y = np.asarray(dataset.coords["y"], dtype=float)
    return [x[0] * h, x[-1] * h, y[-1] * h, y[0] * h]


def goes_subplot(
    dataset, fig=None, rect=111, cbar_size="5%", cbar_pad=0.1, **kwargs
):
    """Create an axes for the dataset's grid with bound drawing helpers
    (reference ``plotting.py:27-141``): ``imshow``/``contour``/``contourf``
    default to the image extent, ``quiver`` subsamples by ``spacing`` (slice
    or block-reduce), and ``colorbar`` appends a dedicated axes at any
    location.  Uses the true Geostationary CRS when cartopy is importable,
    otherwise plain scan-angle axes."""
    import matplotlib.pyplot as plt
    from mpl_toolkits.axes_grid1 import make_axes_locatable

    if fig is None:
        fig = plt.gcf()
    crs = get_goes_crs(dataset) if "goes_imager_projection" in dataset else None
    if crs is not None:
        ax = fig.add_subplot(rect, projection=crs, **kwargs)
        try:
            ax.coastlines(resolution="50m", color="k", linewidth=0.5)
        except Exception:
            pass
    else:
        ax = fig.add_subplot(rect, **kwargs)
        ax.set_xlabel("x (scan angle)")
        ax.set_ylabel("y (scan angle)")

    try:
        extent = get_goes_extent(dataset)
        xs = np.asarray(dataset.coords["x"], dtype=float)
        ys = np.asarray(dataset.coords["y"], dtype=float)
    except Exception:
        extent, xs, ys = None, None, None

    _imshow = ax.imshow
    _contour = ax.contour
    _contourf = ax.contourf
    _quiver = ax.quiver

    def imshow(*args, **kw):
        kw.setdefault("extent", extent)
        return _imshow(*args, **kw)

    def contour(data, *args, **kw):
        return _contour(xs, ys, np.asarray(getattr(data, "values", data)), *args, **kw)

    def contourf(data, *args, **kw):
        return _contourf(xs, ys, np.asarray(getattr(data, "values", data)), *args, **kw)

    def quiver(u, v, *args, spacing=1, block_method="slice", **kw):
        u = np.asarray(getattr(u, "values", u))
        v = np.asarray(getattr(v, "values", v))
        if block_method == "slice":
            slc = slice(spacing // 2, None, spacing)
            return _quiver(xs[slc], ys[slc], u[slc, slc], v[slc, slc], *args, **kw)
        if block_method == "reduce":
            def block(a, shape):
                trims = [s - (s % b) for s, b in zip(a.shape, shape)]
                a = a[tuple(slice(0, t) for t in trims)]
                new = []
                for s, b in zip(a.shape, shape):
                    new += [s // b, b]
                return np.nanmean(a.reshape(new), axis=tuple(range(1, len(new), 2)))

            return _quiver(
                block(xs, (spacing,)), block(ys, (spacing,)),
                block(u, (spacing, spacing)), block(v, (spacing, spacing)),
                *args, **kw,
            )
        raise ValueError("invalid input for 'block_method'")

    def colorbar(mappable, *args, location="right", **kw):
        divider = make_axes_locatable(ax)
        orientation = (
            "vertical" if location in ("right", "left") else "horizontal"
        )
        cax = divider.append_axes(location, size=cbar_size, pad=cbar_pad)
        return fig.colorbar(
            mappable, cax=cax, orientation=orientation, *args, **kw
        )

    ax.imshow = imshow
    ax.contour = contour
    ax.contourf = contourf
    ax.quiver = quiver
    ax.colorbar = colorbar
    return ax


def goes_figure(dataset, *args, **kwargs):
    """A figure whose ``subplot`` method builds GOES axes
    (reference ``plotting.py:144-152``)."""
    import matplotlib.pyplot as plt

    fig = plt.figure(*args, **kwargs)
    fig.subplot = lambda rect=111, **kw: goes_subplot(dataset, fig=fig, rect=rect, **kw)
    return fig


def add_gl_ticks(ax, gl):
    """Mirror cartopy gridline label positions as axes ticks
    (reference ``plotting.py:155-195``); no-op without cartopy gridliners."""
    try:
        x_locs = [
            a.properties()["unitless_position"][0]
            for attr in ("bottom_label_artists", "top_label_artists")
            for a in getattr(gl, attr, [])
            if a.properties()["visible"]
        ]
        y_locs = [
            a.properties()["unitless_position"][1]
            for attr in ("left_label_artists", "right_label_artists")
            for a in getattr(gl, attr, [])
            if a.properties()["visible"]
        ]
        ax.set_xticks(x_locs, crs=ax.projection)
        ax.set_xticklabels([""] * len(x_locs))
        ax.set_yticks(y_locs, crs=ax.projection)
        ax.set_yticklabels([""] * len(y_locs))
        ax.tick_params(
            top=gl.top_labels, bottom=gl.bottom_labels,
            left=gl.left_labels, right=gl.right_labels,
        )
    except Exception:
        pass


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


def bias_plot(ax, observed, predicted, bins=50, weights=None, fit=True):
    """2D histogram of predicted vs observed with the 1:1 line and
    (optionally weighted) linear fits (reference ``plotting.py:198-271``)."""
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
    if fit and ok.sum() >= 2:
        from scipy.stats import linregress

        res = linregress(obs[ok], pred[ok])
        print(f"All points -- Slope: {res.slope}, Intercept: {res.intercept}")
        xs = np.asarray(lims)
        ax.plot(xs, res.slope * xs + res.intercept, "b", linewidth=1)
        if weights is not None:
            w = np.ravel(np.asarray(weights, dtype=float))[ok]
            mo = np.average(obs[ok], weights=w)
            mp = np.average(pred[ok], weights=w)
            cov = np.average((obs[ok] - mo) * (pred[ok] - mp), weights=w)
            var = np.average((obs[ok] - mo) ** 2, weights=w)
            slope = cov / var if var > 0 else np.nan
            intercept = mp - slope * mo
            print(f"Weighted -- Slope: {slope}, Intercept: {intercept}")
            ax.plot(xs, slope * xs + intercept, "r", linewidth=1)
    ax.set_xlabel("observed")
    ax.set_ylabel("predicted")
    return h
