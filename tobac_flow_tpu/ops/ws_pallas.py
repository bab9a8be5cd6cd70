"""Pallas time-tiled spatial watershed sweeps.

The Jacobi watershed (``ops/watershed.py``) runs 8 in-plane relaxation
sweeps per temporal round.  In pure XLA every sweep is a full HBM
read+write of the packed (claim, claim2, meta) state — sweeps cannot be
fused across the data dependency, so the spatial phase is bandwidth-bound
at 8x the minimum traffic.  This kernel time-tiles K sweeps in VMEM: each
grid cell loads one frame row-block plus a K-row halo, relaxes K times
on-chip, and writes the interior rows once — the classic overlapped
stencil time-tiling, exact for the interior because a K-sweep Jacobi cone
only reaches K rows outward.

Used by ``ops.watershed._watershed_sweeps`` when enabled; falls back to the
XLA formulation on failure (the remote Mosaic compiler rejects some
programs) and under sharding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["spatial_sweeps_pallas", "pallas_available"]

_INF = np.float32(np.inf)
_NINF = np.float32(-np.inf)
_META_MAX = np.int32(np.iinfo(np.int32).max)
_HOPS_STEP = np.int32(1 << 23)
_HOPS_CAP = np.int32(255 << 23)


def _shift_rows(a, dy, fill):
    """a[y + dy, x] with constant fill rows (static dy, 2D block)."""
    if dy == 0:
        return a
    h = a.shape[0]
    fill_rows = jnp.full((abs(dy),) + a.shape[1:], fill, dtype=a.dtype)
    if dy > 0:
        return jnp.concatenate([a[dy:], fill_rows], axis=0)
    return jnp.concatenate([fill_rows, a[:dy]], axis=0)


def _shift_cols(a, dx, fill):
    if dx == 0:
        return a
    fill_cols = jnp.full(a.shape[:-1] + (abs(dx),), fill, dtype=a.dtype)
    if dx > 0:
        return jnp.concatenate([a[:, dx:], fill_cols], axis=1)
    return jnp.concatenate([fill_cols, a[:, :dx]], axis=1)


def _shift2(a, dy, dx, fill):
    return _shift_cols(_shift_rows(a, dy, fill), dx, fill)


def _lex_better(c1a, c2a, ma, c1b, c2b, mb):
    # (claim, hops, second-claim, label) — must stay bit-equal to
    # ops/watershed._lex_better (see rationale there)
    ha = ma >> 23
    hb = mb >> 23
    # -1 barrier (label code 1) loses full-tuple ties to positive labels —
    # must stay bit-equal to ops/watershed._lex_better (rationale there)
    lab_top = np.int32((1 << 23) - 1)
    ka = jnp.where((ma & lab_top) == 1, ma | lab_top, ma)
    kb = jnp.where((mb & lab_top) == 1, mb | lab_top, mb)
    return (
        (c1a < c1b)
        | ((c1a == c1b) & (ha < hb))
        | ((c1a == c1b) & (ha == hb) & (c2a < c2b))
        | ((c1a == c1b) & (ha == hb) & (c2a == c2b) & (ka < kb))
    )


def _sweep_block(c, c2, m, f, sd, fl, in_plane):
    """One Jacobi relaxation of a 2D block (mirrors the sweep body in
    ops/watershed._watershed_sweeps, spatial taps only)."""
    cost = jnp.where(sd, f, jnp.maximum(f, c))
    # frozen gate (approach bottleneck at the last strict max rise) — must
    # stay bit-equal to ops/watershed._watershed_sweeps (rationale there)
    cost2 = jnp.where(sd, _NINF, jnp.where(f > c, c, c2))
    # plateau-relative hop reset at plateau entries — must stay bit-equal to
    # ops/watershed._watershed_sweeps (see comment there)
    mp = jnp.where(~sd & (f > c), m & np.int32((1 << 23) - 1), m)
    bc, bc2, bm = c, c2, m
    for dy, dx in in_plane:
        cq = _shift2(cost, dy, dx, _INF)
        c2q = _shift2(cost2, dy, dx, _INF)
        mq = _shift2(mp, dy, dx, _META_MAX)
        # hop clock ticks only on-level (f == candidate claim); frozen on
        # descents — must stay bit-equal to ops/watershed.consider
        cand_m = mq + jnp.where((mq < _HOPS_CAP) & (f == cq), _HOPS_STEP, 0)
        valid = mq != _META_MAX
        better = _lex_better(cq, c2q, cand_m, bc, bc2, bm) & valid
        bc = jnp.where(better, cq, bc)
        bc2 = jnp.where(better, c2q, bc2)
        bm = jnp.where(better, cand_m, bm)
    return (
        jnp.where(fl, bc, c),
        jnp.where(fl, bc2, c2),
        jnp.where(fl, bm, m),
    )


def _make_kernel(k_sweeps, hb, halo, w, in_plane):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hext = hb + 2 * halo

    def kernel(c_hbm, c2_hbm, m_hbm, f_hbm, sd_hbm, fl_hbm,
               oc_ref, oc2_ref, om_ref,
               c_s, c2_s, m_s, f_s, sd_s, fl_s, sems):
        i = pl.program_id(0)
        row0 = i * hb  # into the halo-padded array: block top halo start

        copies = [
            pltpu.make_async_copy(
                src.at[pl.ds(row0, hext), :], dst, sems.at[j]
            )
            for j, (src, dst) in enumerate(
                (
                    (c_hbm, c_s), (c2_hbm, c2_s), (m_hbm, m_s),
                    (f_hbm, f_s), (sd_hbm, sd_s), (fl_hbm, fl_s),
                )
            )
        ]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

        c = c_s[:]
        c2 = c2_s[:]
        m = m_s[:]
        f = f_s[:]
        sd = sd_s[:] > 0
        fl = fl_s[:] > 0
        for _ in range(k_sweeps):
            c, c2, m = _sweep_block(c, c2, m, f, sd, fl, in_plane)
        oc_ref[...] = c[halo : halo + hb]
        oc2_ref[...] = c2[halo : halo + hb]
        om_ref[...] = m[halo : halo + hb]

    def build(n_blocks, interpret=False):
        """Per-frame call: grid over row blocks only — the caller maps over
        frames with ``lax.map`` so the traced program stays small (the
        remote Mosaic compile helper rejects large frame-parallel grids)."""
        return pl.pallas_call(
            kernel,
            interpret=interpret,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 6,
            out_specs=[
                pl.BlockSpec((hb, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
            ]
            * 3,
            out_shape=[
                jax.ShapeDtypeStruct((n_blocks * hb, w), jnp.float32),
                jax.ShapeDtypeStruct((n_blocks * hb, w), jnp.float32),
                jax.ShapeDtypeStruct((n_blocks * hb, w), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((hext, w), jnp.float32),
                pltpu.VMEM((hext, w), jnp.float32),
                pltpu.VMEM((hext, w), jnp.int32),
                pltpu.VMEM((hext, w), jnp.float32),
                pltpu.VMEM((hext, w), jnp.float32),
                pltpu.VMEM((hext, w), jnp.float32),
                pltpu.SemaphoreType.DMA((6,)),
            ],
        )

    return build


def pick_block_rows(w, k_sweeps=8, budget_bytes=8_000_000, n_buffers=12):
    """Row-block height keeping the kernel's VMEM working set (6 input
    buffers + scratch, each (block + 2·k halo) × padded width) under budget —
    the scoped-VMEM limit is ~16 MB, and a fixed 112-row block overflows it
    beyond ~3500-px-wide frames (GOES full disk is 5424)."""
    w_pad = -(-int(w) // 128) * 128
    hb = budget_bytes // (n_buffers * 4 * w_pad) - 2 * k_sweeps
    return int(max(8, min(112, (hb // 8) * 8)))


@functools.partial(
    jax.jit, static_argnames=("in_plane", "k_sweeps", "block_rows", "interpret")
)
def spatial_sweeps_pallas(
    claim, claim2, meta, field, seeded, floodable,
    in_plane, k_sweeps=8, block_rows=None, interpret=False,
):
    """Apply ``k_sweeps`` spatial Jacobi sweeps to the packed watershed
    state via the time-tiled VMEM kernel.  Exact equivalent of calling the
    XLA sweep ``k_sweeps`` times with the same taps.

    All arrays are (T, H, W); seeded/floodable boolean.  Returns the relaxed
    (claim, claim2, meta).
    """
    from jax.experimental import pallas as pl  # noqa: F401

    t, h, w = claim.shape
    halo = k_sweeps  # the K-sweep dependence cone
    hb = int(block_rows) if block_rows is not None else pick_block_rows(w, k_sweeps)
    n_blocks = -(-h // hb)
    h_pad = n_blocks * hb
    w_pad = -(-w // 128) * 128  # lane alignment; extra columns stay inert

    def pad(a, fill, dtype=None):
        a = a.astype(dtype) if dtype is not None else a
        return jnp.pad(
            a,
            ((0, 0), (halo, halo + (h_pad - h)), (0, w_pad - w)),
            constant_values=fill,
        )

    args = (
        pad(claim, _INF),
        pad(claim2, _INF),
        pad(meta, _META_MAX),
        pad(field, _INF),
        pad(seeded.astype(jnp.float32), 0.0),
        pad(floodable.astype(jnp.float32), 0.0),
    )

    build = _make_kernel(int(k_sweeps), hb, halo, w_pad, tuple(in_plane))
    call = build(n_blocks, interpret=bool(interpret))
    oc, oc2, om = jax.lax.map(lambda frames: call(*frames), args)
    return oc[:, :h, :w], oc2[:, :h, :w], om[:, :h, :w]


def pallas_available():
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401

        return True
    except Exception:
        return False
