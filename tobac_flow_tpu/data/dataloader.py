"""GOES / SEVIRI ingest: channel arithmetic, quality masking, gap filling.

Parity target: reference ``tobac_flow/dataloader.py``:
``goes_dataloader`` (27-198) producing bt = CMI_C13, wvd = C08 − C10,
swd = C13 − C15 with DQF and stripe-artifact masking (240-321), NaN
time-gap filling (324-357), and the SEVIRI loaders (588-958, here via
pre-converted netCDF since satpy is absent).  Files are read with the
framework's h5py-backed reader instead of xarray/dask; frames stream into a
preallocated stack (the device prefetcher feeds windows to HBM downstream).
"""

from __future__ import annotations

import warnings
from datetime import datetime, timedelta

import numpy as np

from tobac_flow_tpu.data import io
from tobac_flow_tpu.data.ncdataset import DataArray, Dataset, open_dataset

__all__ = [
    "goes_dataloader",
    "find_goes_files",
    "load_mcmip",
    "fill_time_gap_nan",
    "get_stripe_deviation",
    "seviri_dataloader",
]


def find_goes_files(start_date, end_date, n_pad_files=1, **io_kwargs):
    """ABI files for the window plus up to n_pad_files each side
    (reference ``dataloader.py:201-231``)."""
    files = io.find_abi_files(start_date, end_date, **io_kwargs)
    if n_pad_files > 0:
        pad = timedelta(hours=int(np.ceil(n_pad_files / 12)))
        pre = io.find_abi_files(start_date - pad, start_date, **io_kwargs)
        post = io.find_abi_files(end_date, end_date + pad, **io_kwargs)
        files = list(pre)[-n_pad_files:] + list(files) + list(post)[:n_pad_files]
    return files


def get_stripe_deviation(dqf):
    """Per-row deviation score of a DQF field used to blank stripe artifacts
    (reference ``dataloader.py:234-237``): |mean over x of (DQF - column
    mean)/column std|, broadcast back over the frame."""
    y_mean = np.nanmean(dqf, axis=-2, keepdims=True)
    y_std = np.nanstd(dqf, axis=-2, keepdims=True)
    dev = np.abs(np.nanmean((dqf - y_mean) / (y_std + 1e-8), axis=-1))
    return dev[..., np.newaxis]


def _read_mcmip_frame(path, x0=None, x1=None, y0=None, y1=None):
    """Read the needed channels of one MCMIP file."""
    ds = open_dataset(path)
    sl = (slice(y0, y1), slice(x0, x1))

    def ch(name):
        return np.asarray(ds[name].values)[sl].astype(np.float32)

    c08, c10, c13, c15 = ch("CMI_C08"), ch("CMI_C10"), ch("CMI_C13"), ch("CMI_C15")
    dqf = np.zeros(c13.shape, dtype=bool)
    stripe = np.zeros(c13.shape, dtype=bool)
    for name in ("DQF_C08", "DQF_C10", "DQF_C13", "DQF_C15"):
        if name in ds.data_vars:
            d = np.asarray(ds[name].values)[sl]
            d = np.nan_to_num(d, nan=0.0)
            dqf |= d != 0
            stripe |= np.broadcast_to(get_stripe_deviation(d) > 2, d.shape)
    t = np.asarray(ds.coords.get("t", ds["t"].values if "t" in ds else None))
    time = np.ravel(t)[0]
    x = ds.coords["x"][slice(x0, x1)] if "x" in ds.coords else None
    y = ds.coords["y"][slice(y0, y1)] if "y" in ds.coords else None
    proj_attrs = (
        dict(ds["goes_imager_projection"].attrs)
        if "goes_imager_projection" in ds.data_vars
        else {}
    )
    return time, c08, c10, c13, c15, dqf, stripe, x, y, proj_attrs


def load_mcmip(files, x0=None, x1=None, y0=None, y1=None):
    """Load a stack of MCMIP files into bt/wvd/swd DataArrays with DQF and
    stripe masking (reference ``dataloader.py:240-321``)."""
    print(f"Loading {len(files)} files", flush=True)
    times, bts, wvds, swds = [], [], [], []
    x = y = None
    proj_attrs = {}
    for f in files:
        try:
            t, c08, c10, c13, c15, dqf, stripe, x_, y_, pa = _read_mcmip_frame(
                f, x0, x1, y0, y1
            )
        except Exception as exc:
            warnings.warn(f"could not read {f}: {exc}")
            continue
        bt = c13
        wvd = c08 - c10
        swd = c13 - c15
        bad = (
            ~np.isfinite(bt) | ~np.isfinite(wvd) | ~np.isfinite(swd) | dqf | stripe
        )
        for arr in (bt, wvd, swd):
            arr[bad] = np.nan
        times.append(t)
        bts.append(bt)
        wvds.append(wvd)
        swds.append(swd)
        if x is None:
            x, y, proj_attrs = x_, y_, pa

    if not times:
        raise FileNotFoundError("no readable MCMIP files")
    order = np.argsort(np.asarray(times))
    times = np.asarray(times)[order]
    coords = {"t": times}
    if y is not None:
        coords["y"] = y
    if x is not None:
        coords["x"] = x

    def da(stack, name, long_name, units="K"):
        return DataArray(
            np.stack([stack[i] for i in order]),
            coords=coords,
            dims=("t", "y", "x"),
            name=name,
            attrs={"long_name": long_name, "units": units},
        )

    bt = da(bts, "bt", "ABI Cloud and Moisture Imagery brightness temperature")
    wvd = da(
        wvds,
        "wvd",
        "ABI Cloud and Moisture Imagery water vapour difference temperature",
    )
    swd = da(
        swds,
        "swd",
        "ABI Cloud and Moisture Imagery split window difference temperature",
    )
    bt.attrs["_proj"] = ""
    return bt, wvd, swd, proj_attrs


def fill_time_gap_nan(da, time_gap=timedelta(minutes=15)):
    """Insert NaN frames into time gaps larger than ``time_gap``
    (reference ``dataloader.py:341-357``)."""
    times = da.coords["t"]
    gaps = np.where(np.diff(times).astype("timedelta64[s]") > np.timedelta64(time_gap))[0]
    if not gaps.size:
        return da
    vals = da.values
    new_vals = []
    new_times = []
    last = 0
    for g in gaps:
        new_vals.append(vals[last : g + 1])
        new_times.append(times[last : g + 1])
        mid = times[g] + (times[g + 1] - times[g]) / 2
        print(f"Adding NaN slice at {mid}", flush=True)
        new_vals.append(np.full((1,) + vals.shape[1:], np.nan, vals.dtype))
        new_times.append(np.asarray([mid]))
        last = g + 1
    new_vals.append(vals[last:])
    new_times.append(times[last:])
    out = DataArray(
        np.concatenate(new_vals),
        coords={**da.coords, "t": np.concatenate(new_times)},
        dims=da.dims,
        name=da.name,
        attrs=dict(da.attrs),
    )
    return out


def fill_time_gap_full_disk(
    bt,
    wvd,
    swd,
    start_date,
    end_date,
    time_gap=timedelta(minutes=15),
    x0=None,
    x1=None,
    y0=None,
    y1=None,
    **io_kwargs,
):
    """Fill CONUS time gaps from full-disk scans (reference
    ``dataloader.py:385-517``): the CONUS sector sits at a fixed offset
    (x+902, y+422 at 2 km) inside the full-disk grid, so missing CONUS frames
    can be cut from M/C→F fallback files."""
    from tobac_flow_tpu.utils.datetime_utils import get_datetime_from_coord

    times = bt.coords["t"]
    dates = get_datetime_from_coord(times)
    gaps = np.where(np.diff(times).astype("timedelta64[s]") > np.timedelta64(time_gap))[0]
    if not gaps.size:
        return bt, wvd, swd

    fx0 = (x0 or 0) + 902
    fx1 = (x1 if x1 is not None else 2500) + 902
    fy0 = (y0 or 0) + 422
    fy1 = (y1 if y1 is not None else 1500) + 422

    io_kwargs = dict(io_kwargs)
    io_kwargs["view"] = "F"
    new_frames = {"bt": [], "wvd": [], "swd": []}
    new_times = []
    for g in gaps:
        print(
            f"Filling time gap between {dates[g].isoformat()} and "
            f"{dates[g + 1].isoformat()} from full disk",
            flush=True,
        )
        files = io.find_abi_files(dates[g], dates[g + 1], **io_kwargs)
        if not files:
            continue
        try:
            fbt, fwvd, fswd, _ = load_mcmip(files, x0=fx0, x1=fx1, y0=fy0, y1=fy1)
        except Exception as exc:
            warnings.warn(f"full-disk gap fill failed: {exc}")
            continue
        new_frames["bt"].append(fbt.values)
        new_frames["wvd"].append(fwvd.values)
        new_frames["swd"].append(fswd.values)
        new_times.append(fbt.coords["t"])

    if not new_times:
        return bt, wvd, swd

    def merge(da, frames):
        vals = np.concatenate([da.values] + frames)
        t = np.concatenate([da.coords["t"]] + new_times)
        order = np.argsort(t)
        return DataArray(
            vals[order], coords={**da.coords, "t": t[order]}, dims=da.dims,
            name=da.name, attrs=dict(da.attrs),
        )

    return (
        merge(bt, new_frames["bt"]),
        merge(wvd, new_frames["wvd"]),
        merge(swd, new_frames["swd"]),
    )


def goes_dataloader(
    start_date,
    end_date,
    n_pad_files=12,
    x0=None,
    x1=None,
    y0=None,
    y1=None,
    time_gap=timedelta(minutes=15),
    return_new_ds=False,
    **io_kwargs,
):
    """Load bt/wvd/swd for a GOES window with padding, masking and gap
    filling (reference ``dataloader.py:27-198``)."""
    files = find_goes_files(start_date, end_date, n_pad_files=n_pad_files, **io_kwargs)
    if not files:
        raise FileNotFoundError(
            f"no ABI files found between {start_date} and {end_date}"
        )
    bt, wvd, swd, proj_attrs = load_mcmip(files, x0=x0, x1=x1, y0=y0, y1=y1)

    if io_kwargs.get("view", "C") == "C":
        try:
            bt, wvd, swd = fill_time_gap_full_disk(
                bt, wvd, swd, start_date, end_date, time_gap,
                x0=x0, x1=x1, y0=y0, y1=y1,
                **{k: v for k, v in io_kwargs.items() if k != "view"},
            )
        except Exception as exc:
            warnings.warn(f"full-disk gap fill unavailable: {exc}")
    bt = fill_time_gap_nan(bt, time_gap)
    wvd = fill_time_gap_nan(wvd, time_gap)
    swd = fill_time_gap_nan(swd, time_gap)

    if return_new_ds:
        ds = Dataset(coords=dict(bt.coords))
        if proj_attrs:
            ds["goes_imager_projection"] = DataArray(
                np.zeros((), dtype=np.int32), dims=(), attrs=proj_attrs
            )
            try:
                from tobac_flow_tpu.data.abi import (
                    get_abi_lat_lon,
                    get_abi_pixel_area,
                )

                lat, lon = get_abi_lat_lon(ds)
                ds["lat"] = DataArray(
                    lat.astype(np.float32), dims=("y", "x"),
                    attrs={"long_name": "latitude"},
                )
                ds["lon"] = DataArray(
                    lon.astype(np.float32), dims=("y", "x"),
                    attrs={"long_name": "longitude"},
                )
                ds["area"] = DataArray(
                    get_abi_pixel_area(ds).astype(np.float32), dims=("y", "x"),
                    attrs={"long_name": "pixel area", "units": "km^2"},
                )
            except Exception as exc:
                warnings.warn(f"could not derive geometry: {exc}")
        return bt, wvd, swd, ds
    return bt, wvd, swd


def seviri_dataloader(
    start_date,
    end_date,
    file_paths,
    x0=None,
    x1=None,
    y0=None,
    y1=None,
    time_gap=timedelta(minutes=20),
):
    """SEVIRI loader from pre-converted netCDF channel files
    (bt = IR_108, wvd = WV_062 − WV_073, swd = IR_087 − IR_120; reference
    ``dataloader.py:588-958`` loads the same fields through satpy/ORAC)."""
    times, bts, wvds, swds = [], [], [], []
    coords = {}
    for f in sorted(file_paths):
        ds = open_dataset(f)
        sl = (slice(y0, y1), slice(x0, x1))

        def ch(*names):
            for n in names:
                if n in ds.data_vars:
                    return np.asarray(ds[n].values)[sl].astype(np.float32)
            raise KeyError(names)

        bt = ch("IR_108", "ch9")
        wvd = ch("WV_062", "ch5") - ch("WV_073", "ch6")
        try:
            swd = ch("IR_087") - ch("IR_120")
        except KeyError:
            swd = bt - ch("ch10")
        t = np.ravel(np.asarray(ds.coords.get("t")))[0]
        times.append(t)
        bts.append(bt)
        wvds.append(wvd)
        swds.append(swd)

    order = np.argsort(np.asarray(times))
    coords["t"] = np.asarray(times)[order]

    def da(stack, name):
        return DataArray(
            np.stack([stack[i] for i in order]),
            coords=coords,
            dims=("t", "y", "x"),
            name=name,
            attrs={"long_name": name, "units": "K"},
        )

    bt = fill_time_gap_nan(da(bts, "bt"), time_gap)
    wvd = fill_time_gap_nan(da(wvds, "wvd"), time_gap)
    swd = fill_time_gap_nan(da(swds, "swd"), time_gap)
    return bt, wvd, swd
