"""Identity-keyed host->device transfer cache (utils/device_cache)."""

import numpy as np

from tobac_flow_tpu.utils.device_cache import (
    clear_device_cache,
    device_put_cached,
)


def setup_function(_fn):
    clear_device_cache()


def test_same_array_returns_same_device_buffer():
    a = np.random.default_rng(0).normal(size=(64, 64, 64)).astype(np.float32)
    d1 = device_put_cached(a)
    d2 = device_put_cached(a)
    assert d1 is d2  # replayed, not re-uploaded
    np.testing.assert_array_equal(np.asarray(d1), a)


def test_distinct_arrays_get_distinct_buffers():
    a = np.zeros((64, 64, 64), np.float32)
    b = np.zeros((64, 64, 64), np.float32)
    assert device_put_cached(a) is not device_put_cached(b)


def test_mutation_detected_by_fingerprint():
    a = np.zeros((64, 64, 64), np.float32)
    d1 = device_put_cached(a)
    a[0, 0, 0] = 42.0  # in-place mutation changes the fingerprint
    d2 = device_put_cached(a)
    assert d2 is not d1
    assert float(np.asarray(d2)[0, 0, 0]) == 42.0


def test_small_arrays_bypass_cache():
    a = np.zeros((4, 4), np.float32)
    d1 = device_put_cached(a)
    d2 = device_put_cached(a)
    assert d1 is not d2  # under the 1 MB threshold: plain asarray


def test_device_input_passthrough():
    import jax.numpy as jnp

    x = jnp.ones((8, 8))
    assert device_put_cached(x) is not None


def test_lru_eviction_bounds_entries():
    from tobac_flow_tpu.utils import device_cache

    keep = [np.full((64, 64, 64), i, np.float32) for i in range(12)]
    for a in keep:
        device_put_cached(a)
    assert len(device_cache._CACHE) <= device_cache._MAX_ENTRIES
