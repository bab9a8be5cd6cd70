"""Cloud discovery and checked download of GOES/GLM/NEXRAD data.

Parity target: reference ``tobac_flow/io.py`` — GOES public-bucket blob
discovery per product/view/mode/channel (200-256), resumable checked
downloads with size validation, free-space guard and retries (74-197,
329-405), local-first file finding with optional download (455-523), GLM
blob/file discovery (526-666) and NEXRAD bucket listing (668-727).

Differences by design: the client is created lazily and anonymously (the
reference requires GOOGLE_APPLICATION_CREDENTIALS at import time); all
functions degrade gracefully when offline so local archives keep working.
"""

from __future__ import annotations

import os
import shutil
import warnings
from datetime import datetime, timedelta
from pathlib import Path

__all__ = [
    "GOES_BUCKETS",
    "find_abi_blobs",
    "find_abi_files",
    "find_glm_blobs",
    "find_glm_files",
    "find_nexrad_blobs",
    "download_blob",
]

GOES_BUCKETS = {16: "gcp-public-data-goes-16", 17: "gcp-public-data-goes-17"}
NEXRAD_BUCKET = "gcp-public-data-nexrad-l2"

# blobs known to be corrupt upstream (reference io.py:39-42 keeps a denylist)
CORRUPT_BLOBS: set[str] = set()

_CLIENT = None


def _client():
    if os.environ.get("TFT_OFFLINE"):
        # skip cloud discovery entirely (local archives only) — without this
        # an airgapped host pays a full DNS/connect timeout per listing
        # before find_abi_files falls back to the local glob
        raise RuntimeError("TFT_OFFLINE set: cloud discovery disabled")
    global _CLIENT
    if _CLIENT is None:
        from google.cloud import storage

        try:
            _CLIENT = storage.Client()
        except Exception:
            _CLIENT = storage.Client.create_anonymous_client()
    return _CLIENT


def _hours_in_range(start_date, end_date):
    t = start_date.replace(minute=0, second=0, microsecond=0)
    while t < end_date:
        yield t
        t += timedelta(hours=1)


def _abi_prefix(date, product="MCMIP", view="C", mode=3):
    return (
        f"ABI-L2-{product}{view}/{date.year}/{date.timetuple().tm_yday:03d}/"
        f"{date.hour:02d}/OR_ABI-L2-{product}{view}-M{mode}"
    )


def _l1b_prefix(date, view="C", mode=3, channel=13):
    return (
        f"ABI-L1b-Rad{view}/{date.year}/{date.timetuple().tm_yday:03d}/"
        f"{date.hour:02d}/OR_ABI-L1b-Rad{view}-M{mode}C{channel:02d}"
    )


def _blob_start_time(name):
    try:
        tok = name.split("_s")[-1][:13]
        return datetime.strptime(tok, "%Y%j%H%M%S")
    except ValueError:
        return None


def get_goes_date(filename):
    """Scan start time parsed from a GOES filename's _s token (reference
    ``io.py`` date helper)."""
    return _blob_start_time(str(filename))


def find_abi_blobs(
    start_date,
    end_date=None,
    satellite=16,
    product="MCMIP",
    view="C",
    mode=3,
    channel=None,
):
    """List ABI blobs in the public bucket for a date range
    (reference ``io.py:200-256``). ``mode`` may be an int or list of ints."""
    if end_date is None:
        end_date = start_date + timedelta(hours=1)
    modes = mode if isinstance(mode, (list, tuple)) else [mode]
    bucket = _client().bucket(GOES_BUCKETS[satellite])
    blobs = []
    for hour in _hours_in_range(start_date, end_date):
        for m in modes:
            if product.startswith("Rad") or channel is not None:
                prefix = _l1b_prefix(hour, view=view, mode=m, channel=channel or 13)
            else:
                prefix = _abi_prefix(hour, product=product, view=view, mode=m)
            try:
                found = list(bucket.list_blobs(prefix=prefix))
            except Exception as exc:  # offline / auth problems degrade
                warnings.warn(f"blob listing failed: {exc}")
                return []
            for b in found:
                t = _blob_start_time(b.name)
                if t is not None and start_date <= t < end_date:
                    if b.name not in CORRUPT_BLOBS:
                        blobs.append(b)
    return sorted(blobs, key=lambda b: b.name)


def _validate_netcdf(path):
    """Cheap validity check: HDF5 signature + h5py open."""
    try:
        import h5py

        with h5py.File(path, "r"):
            return True
    except Exception:
        return False


def download_blob(
    blob,
    save_dir,
    replicate_path=True,
    check_download=True,
    n_attempts=3,
    min_free_bytes=2 << 30,
):
    """Checked, resumable download of one blob (reference ``io.py:74-197``):
    verifies size against the blob, validates the netCDF, guards free disk
    space and retries."""
    save_dir = Path(save_dir)
    dest = save_dir / blob.name if replicate_path else save_dir / Path(blob.name).name
    dest.parent.mkdir(parents=True, exist_ok=True)

    if dest.exists():
        blob.reload()
        if dest.stat().st_size == blob.size and (
            not check_download or _validate_netcdf(dest)
        ):
            return dest
        dest.unlink()

    free = shutil.disk_usage(dest.parent).free
    if free < min_free_bytes:
        raise OSError(f"insufficient disk space ({free} bytes free)")

    for attempt in range(n_attempts):
        try:
            blob.download_to_filename(str(dest))
            blob.reload()
            if dest.stat().st_size != blob.size:
                raise IOError("size mismatch after download")
            if check_download and not _validate_netcdf(dest):
                raise IOError("invalid netCDF after download")
            return dest
        except Exception as exc:
            if dest.exists():
                dest.unlink()
            if attempt == n_attempts - 1:
                raise
            warnings.warn(f"download attempt {attempt + 1} failed: {exc}")
    return None


def find_abi_files(
    start_date,
    end_date=None,
    satellite=16,
    product="MCMIP",
    view="C",
    mode=3,
    channel=None,
    save_dir=".",
    replicate_path=True,
    check_download=True,
    n_attempts=3,
    download_missing=False,
    **kwargs,
):
    """Local-first ABI file discovery with optional download of missing files
    (reference ``io.py:455-523``)."""
    save_dir = Path(save_dir)
    files = []
    try:
        blobs = find_abi_blobs(
            start_date,
            end_date,
            satellite=satellite,
            product=product,
            view=view,
            mode=mode,
            channel=channel,
        )
    except Exception:
        blobs = []
    if blobs:
        for blob in blobs:
            local = (
                save_dir / blob.name if replicate_path else save_dir / Path(blob.name).name
            )
            if local.exists():
                files.append(local)
            elif download_missing:
                try:
                    files.append(
                        download_blob(
                            blob,
                            save_dir,
                            replicate_path=replicate_path,
                            check_download=check_download,
                            n_attempts=n_attempts,
                        )
                    )
                except Exception as exc:
                    warnings.warn(f"could not download {blob.name}: {exc}")
    else:
        # fully offline: glob the local archive
        if end_date is None:
            end_date = start_date + timedelta(hours=1)
        # single trailing * — "M*" + "*.nc" would form "**", which pathlib
        # rejects unless it is an entire path component
        for p in sorted(save_dir.rglob(f"OR_ABI-L2-{product}{view}-M*.nc")):
            t = _blob_start_time(p.name)
            if t is not None and start_date <= t < end_date:
                files.append(p)
    return sorted(set(map(Path, filter(None, files))))


def find_glm_blobs(start_date, end_date=None, satellite=16):
    """GLM LCFA blob discovery (reference ``io.py:526-606``)."""
    if end_date is None:
        end_date = start_date + timedelta(hours=1)
    bucket = _client().bucket(GOES_BUCKETS[satellite])
    blobs = []
    for hour in _hours_in_range(start_date, end_date):
        prefix = (
            f"GLM-L2-LCFA/{hour.year}/{hour.timetuple().tm_yday:03d}/"
            f"{hour.hour:02d}/OR_GLM-L2-LCFA"
        )
        try:
            found = list(bucket.list_blobs(prefix=prefix))
        except Exception as exc:
            warnings.warn(f"blob listing failed: {exc}")
            return []
        for b in found:
            t = _blob_start_time(b.name)
            if t is not None and start_date <= t < end_date:
                blobs.append(b)
    return sorted(blobs, key=lambda b: b.name)


def find_glm_files(
    start_date,
    end_date=None,
    satellite=16,
    save_dir=".",
    replicate_path=True,
    check_download=True,
    n_attempts=3,
    download_missing=False,
    **kwargs,
):
    """Local-first GLM file discovery (reference ``io.py:609-666``)."""
    save_dir = Path(save_dir)
    files = []
    try:
        blobs = find_glm_blobs(start_date, end_date, satellite=satellite)
    except Exception:
        blobs = []
    if blobs:
        for blob in blobs:
            local = (
                save_dir / blob.name if replicate_path else save_dir / Path(blob.name).name
            )
            if local.exists():
                files.append(local)
            elif download_missing:
                try:
                    files.append(
                        download_blob(
                            blob,
                            save_dir,
                            replicate_path=replicate_path,
                            check_download=check_download,
                            n_attempts=n_attempts,
                        )
                    )
                except Exception as exc:
                    warnings.warn(f"could not download {blob.name}: {exc}")
    else:
        if end_date is None:
            end_date = start_date + timedelta(hours=1)
        for p in sorted(save_dir.rglob("OR_GLM-L2-LCFA*.nc")):
            t = _blob_start_time(p.name)
            if t is not None and start_date <= t < end_date:
                files.append(p)
    return sorted(set(map(Path, filter(None, files))))


def find_nexrad_blobs(start_date, end_date, site):
    """NEXRAD level-II blob discovery (reference ``io.py:668-727``)."""
    bucket = _client().bucket(NEXRAD_BUCKET)
    blobs = []
    day = start_date.replace(hour=0, minute=0, second=0, microsecond=0)
    while day < end_date:
        prefix = f"{day.year}/{day.month:02d}/{day.day:02d}/{site}/"
        try:
            found = list(bucket.list_blobs(prefix=prefix))
        except Exception as exc:
            warnings.warn(f"blob listing failed: {exc}")
            return []
        for b in found:
            try:
                tok = Path(b.name).name.split("_")[0][len(site) :]
                t = datetime.strptime(
                    Path(b.name).name[len(site) : len(site) + 15], "%Y%m%d_%H%M%S"
                )
            except ValueError:
                continue
            if start_date <= t < end_date:
                blobs.append(b)
        day += timedelta(days=1)
    return sorted(blobs, key=lambda b: b.name)
