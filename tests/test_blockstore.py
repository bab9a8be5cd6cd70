"""Spill-array store: functional round-trips and resident-page trimming."""

import numpy as np

from tobac_flow_tpu.utils.blockstore import (
    as_spilled,
    is_spilled,
    release,
    spill_empty,
    trim_pages,
)


def _resident_bytes():
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * 4096


def test_spill_round_trip_and_ndarray_compat():
    a = spill_empty((6, 8, 10), np.float32, "t")
    assert isinstance(a, np.ndarray)
    assert is_spilled(a) and is_spilled(a[2:4])
    rng = np.random.default_rng(0)
    vals = rng.normal(size=a.shape).astype(np.float32)
    a[...] = vals
    trim_pages(a)  # data survives the trim (pages fault back in)
    assert np.array_equal(np.asarray(a), vals)
    # slices interoperate with numpy ops like any ndarray
    assert np.allclose(a[1:3].mean(), vals[1:3].mean())
    release(a)


def test_as_spilled_copies():
    src = np.arange(24, dtype=np.int32).reshape(4, 6)
    sp = as_spilled(src, "c")
    assert is_spilled(sp) and np.array_equal(sp, src)
    src[0, 0] = -1  # independent storage
    assert sp[0, 0] == 0
    release(sp)


def test_trim_pages_drops_resident_set():
    n = 64 << 20  # 64 MB
    a = spill_empty((n // 4,), np.float32, "rss")
    a[...] = 1.0
    before = _resident_bytes()
    trim_pages(a)
    after = _resident_bytes()
    # the 64 MB of dirty pages must actually leave the resident set
    assert before - after > (n // 2), (before, after)
    assert float(a[123]) == 1.0  # still readable afterwards
    release(a)


def test_trim_pages_noop_on_plain_arrays():
    x = np.ones(16)
    trim_pages(x, None)
    assert x.sum() == 16
