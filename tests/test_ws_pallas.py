"""Pallas time-tiled watershed sweeps: interpreter-mode bit-equivalence
against the XLA Jacobi formulation (the TPU path is additionally A/B'd on
hardware — labels are identical; see ops/watershed._pallas_spatial_usable)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tobac_flow_tpu.ops import watershed as ws
from tobac_flow_tpu.ops.ws_pallas import spatial_sweeps_pallas

META_MAX = np.int32(np.iinfo(np.int32).max)


def xla_spatial_sweep(state, field, seeded, floodable, in_plane):
    """Reference single sweep — the in-plane branch of
    ops/watershed._watershed_sweeps verbatim."""
    t, h, w = field.shape
    c, c2, m = state
    cost = jnp.where(seeded, field, jnp.maximum(field, c))
    # frozen gate value (ops/watershed._watershed_sweeps)
    cost2 = jnp.where(seeded, -jnp.inf, jnp.where(field > c, c, c2))
    # plateau-relative hop reset at plateau entries (ops/watershed.sweep)
    meta_p = jnp.where(
        ~seeded & (field > c), m & jnp.int32((1 << 23) - 1), m
    )
    bc, bc2, bm = c, c2, m
    hops_step = jnp.int32(1 << 23)
    hops_cap = jnp.int32(255 << 23)

    def shift2(a, dy, dx, fill):
        pad = jnp.pad(
            a, ((0, 0), (abs(dy), abs(dy)), (abs(dx), abs(dx))),
            constant_values=fill,
        )
        return jax.lax.dynamic_slice(pad, (0, abs(dy) + dy, abs(dx) + dx), (t, h, w))

    for dy, dx in in_plane:
        cq = shift2(cost, dy, dx, jnp.inf)
        c2q = shift2(cost2, dy, dx, jnp.inf)
        mq = shift2(meta_p, dy, dx, META_MAX)
        # on-level-only hop increment (ops/watershed.consider)
        cand = mq + jnp.where((mq < hops_cap) & (field == cq), hops_step, 0)
        valid = mq != META_MAX
        # lexicographic (claim, hops, gate, label-with--1-last) —
        # ops/watershed._lex_better
        hq, hb = cand >> 23, bm >> 23
        lab_top = jnp.int32((1 << 23) - 1)
        kq = jnp.where((cand & lab_top) == 1, cand | lab_top, cand)
        kb = jnp.where((bm & lab_top) == 1, bm | lab_top, bm)
        better = (
            (cq < bc)
            | ((cq == bc) & (hq < hb))
            | ((cq == bc) & (hq == hb) & (c2q < bc2))
            | ((cq == bc) & (hq == hb) & (c2q == bc2) & (kq < kb))
        ) & valid
        bc = jnp.where(better, cq, bc)
        bc2 = jnp.where(better, c2q, bc2)
        bm = jnp.where(better, cand, bm)
    return (
        jnp.where(floodable, bc, c),
        jnp.where(floodable, bc2, c2),
        jnp.where(floodable, bm, m),
    )


@pytest.mark.parametrize("connectivity", [1, 2])
def test_time_tiled_sweeps_bit_equal(connectivity):
    """K tiled sweeps (block halo = K) must equal K whole-array sweeps
    exactly — including across block boundaries, at non-multiple heights,
    and with -1 barrier markers competing."""
    rng = np.random.default_rng(0)
    t, h, w = 3, 230, 256  # h deliberately not a block-rows multiple
    field = rng.uniform(0, 1, (t, h, w)).astype(np.float32)
    markers = np.zeros((t, h, w), np.int32)
    markers[:, 20, 30] = 1
    markers[:, 200, 200] = 2
    markers[:, 100, 128] = -1
    mask = rng.uniform(0, 1, (t, h, w)) > 0.1
    seeded = markers != 0
    floodable = jnp.asarray(mask & ~seeded)
    seeded = jnp.asarray(seeded)
    state = (
        jnp.where(seeded, -jnp.inf, jnp.inf).astype(jnp.float32),
        jnp.where(seeded, -jnp.inf, jnp.inf).astype(jnp.float32),
        jnp.where(seeded, jnp.asarray(markers) + 2, META_MAX).astype(jnp.int32),
    )
    taps = ws._structure_taps_3d(ws.connectivity_structure(connectivity))
    in_plane = tuple((dy, dx) for dt, dy, dx in taps if dt == 0)
    fj = jnp.asarray(field)

    K = 8
    ref = state
    for _ in range(K):
        ref = xla_spatial_sweep(ref, fj, seeded, floodable, in_plane)
    out = spatial_sweeps_pallas(
        state[0], state[1], state[2], fj, seeded, floodable, in_plane,
        k_sweeps=K, block_rows=64, interpret=True,
    )
    for name, a, b in zip(("claim", "claim2", "meta"), ref, out):
        a, b = np.asarray(a), np.asarray(b)
        assert (a == b).all(), f"{name}: {(a != b).sum()} mismatches"


def test_pallas_disabled_on_cpu():
    """The auto-probe must refuse the kernel off-TPU (tests run on CPU)."""
    ws._PALLAS_SPATIAL.clear()
    assert ws._pallas_spatial_usable() is False
    # the per-width cache records the refusal for the probed bucket
    assert ws._PALLAS_SPATIAL == {256: False}
