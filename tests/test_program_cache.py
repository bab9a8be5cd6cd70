"""Persistent program cache: key stability and the no-repr contract.

The cache key must be computable without materialising argument values:
``repr()`` of a device array blocks on (and downloads) the whole buffer over
the axon tunnel, which at the watershed's packed-state sizes was a ~340 MB
sync per dispatch.  Tuples/lists of arrays must therefore be keyed by
element avals, never by ``repr``.
"""

import numpy as np
import pytest

from tobac_flow_tpu.utils import program_cache as pc


class _NoRepr:
    """Array stand-in whose repr (i.e. a blocking device download) is fatal."""

    shape = (4, 5)
    dtype = np.float32

    def __repr__(self):  # pragma: no cover - the point is it never runs
        raise AssertionError("repr() called on a device array during keying")


def test_aval_token_never_reprs_arrays_in_containers():
    tok = pc._aval_token((_NoRepr(), [_NoRepr(), _NoRepr()]))
    assert tok == "tuple(<f4(4, 5),list(<f4(4, 5),<f4(4, 5)))"


def test_aval_token_scalars_and_arrays():
    assert pc._aval_token(np.zeros((2, 3), np.int32)) == "<i4(2, 3)"
    assert pc._aval_token(3) == "py:int:3"
    assert pc._aval_token(None) == "py:NoneType:None"


def test_key_distinguishes_tuple_element_shapes():
    @pc.persistent_jit
    def prog(state):
        return state[0] + state[1]

    k1 = prog._key(((np.zeros((2, 2)), np.zeros((2, 2))),), {})
    k2 = prog._key(((np.zeros((3, 2)), np.zeros((3, 2))),), {})
    assert k1 != k2
    # and identical avals with different VALUES share a key (no value syncs)
    k3 = prog._key(((np.ones((2, 2)), np.full((2, 2), 7.0)),), {})
    assert k1 == k3


def test_persistent_jit_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("TFT_PROGRAM_CACHE", "1")
    monkeypatch.setenv("TFT_PROGRAM_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(pc, "_ENABLED", None)

    calls = []

    @pc.persistent_jit(static_argnames=("k",))
    def prog(state, k):
        calls.append(1)
        return state[0] * k + state[1]

    state = (np.full((3,), 2.0, np.float32), np.ones((3,), np.float32))
    out = np.asarray(prog(state, k=3))
    np.testing.assert_allclose(out, [7.0, 7.0, 7.0])
    # a second call with same avals must reuse the in-memory executable
    out2 = np.asarray(prog((state[0] + 1, state[1]), k=3))
    np.testing.assert_allclose(out2, [10.0, 10.0, 10.0])
    monkeypatch.setattr(pc, "_ENABLED", None)
