"""Flow-aware watershed segmentation, TPU-native.

Reference behaviour: ``tobac_flow/watershed.py`` + ``tobac_flow/_watershed.pyx``
— a serial priority-flood (min-heap over (value, age)) where the temporal
neighbour offsets are displaced by the per-pixel rounded flow vectors.

The serial heap is inherently sequential, so the TPU implementation solves the
equivalent *minimax-path* formulation with data-parallel Jacobi sweeps:

  claim(p)  = min over neighbours q of cost(q),  cost(q) = max(field(q), claim(q))
  label(p)  = label of the lexicographic argmin (claim, hops, gate, label')

approximating the heap's pop clock (measured against the oracle in
WS_CLAIM_PROBE.json / tools/ws_claim_probe.py):

  * ``hops`` counts steps taken ON the wave's level (receiver field ==
    candidate claim) since the last strict rise of the running max — the
    heap expands equal-value plateaus in level-synchronised BFS order from
    their entries, while everything strictly below a popped gateway floods
    in consecutive pops (winner-take-all), so hops freeze on descents;
  * ``gate`` is the approach bottleneck at the path's last strict max rise
    (NOT a running second-max, which two competing waves sharing the
    post-gateway descent would equalise) — the proxy for the gateway's pop
    age: the heap decides the race at a shared saddle by arrival there and
    label-at-push hands everything beyond it to the winner;
  * ``label'`` orders the -1 barrier AFTER all positive labels: on detect
    fields the heap resolves the residual exact-tie races for the anvil
    1479:0 (the anvil-side approach over the linearised interior is
    structurally lower than the barrier-side approach over the mask
    plateau).

Each sweep uses

  * static shifts for the in-plane taps (no gathers at all), and
  * banded-shift gathers (``ops/banded.py``) for the flow-displaced temporal
    taps — flow is clipped to ±20 px so the 2R+1 masked shifts replace XLA's
    pathologically slow general gather.

Sweeps run in fixed-size device chunks with host-side convergence checks
(one long while_loop trips the remote worker's watchdog at GOES scale).

Temporal adjacency matches the serial kernel exactly: claims are *scattered*
along the source pixel's flow vector (``_banded_scatter_min`` — each source
pushes its cost to the displaced destination, the reference's neighbourhood
``_watershed.pyx``), not pulled at the destination.  Equivalence is tested
against the native C++ heap oracle (``tobac_flow_tpu/native``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tobac_flow_tpu.ops.banded import banded_gather_axis
from tobac_flow_tpu.utils.device_cache import device_put_cached
from tobac_flow_tpu.utils.program_cache import persistent_jit

__all__ = ["watershed"]

_INF = np.float32(np.inf)

# diagnostic: route temporal taps through the O(R^2) reference-exact scatter
import os as _os

_EXACT_SCATTER = _os.environ.get("TFT_WS_EXACT_SCATTER", "") == "1"
# diagnostic: per-call round/radius/timing prints (TFT_WS_VERBOSE=1)
_VERBOSE = _os.environ.get("TFT_WS_VERBOSE", "") == "1"

# per-width probe cache: padded-width bucket -> True/False (the kernel's
# VMEM working set scales with frame width, so usability is width-dependent)
_PALLAS_SPATIAL: dict = {}


def _pallas_spatial_usable(h=256, w=256):
    """Probe whether the time-tiled Pallas sweep kernel compiles on the
    current backend AT THIS FRAME WIDTH (the remote Mosaic compiler rejects
    some programs and the VMEM scratch scales with width; CPU runs use the
    XLA formulation which the kernel is bit-equivalent to).  One probe
    compile per distinct padded width per process."""
    key = -(-int(w) // 128) * 128
    if key in _PALLAS_SPATIAL:
        return _PALLAS_SPATIAL[key]
    try:
        platform = jax.devices()[0].platform.lower()
    except Exception:
        platform = "cpu"
    if platform in ("cpu", "gpu"):
        _PALLAS_SPATIAL[key] = False
        return False
    # the probe compile itself costs seconds on the remote rig — memoise the
    # verdict on disk next to the persistent program cache
    from tobac_flow_tpu.utils.program_cache import (
        package_source_digest,
        program_cache_dir,
    )

    memo = (
        program_cache_dir()
        / f"pallas_probe_{platform}_{key}_{package_source_digest()}.ok"
    )
    try:
        if memo.exists():
            _PALLAS_SPATIAL[key] = memo.read_text().strip() == "1"
            return _PALLAS_SPATIAL[key]
    except OSError:
        pass
    try:
        from tobac_flow_tpu.ops.ws_pallas import spatial_sweeps_pallas

        hp = int(min(max(h, 8), 256))
        z = jnp.zeros((1, hp, int(w)), jnp.float32)
        m = jnp.full((1, hp, int(w)), np.iinfo(np.int32).max, jnp.int32)
        b = jnp.zeros((1, hp, int(w)), bool)
        out = spatial_sweeps_pallas(
            z, z, m, z, b, b, ((0, 1), (0, -1), (1, 0), (-1, 0)), k_sweeps=8
        )
        jax.block_until_ready(out)
        _PALLAS_SPATIAL[key] = True
    except Exception:
        _PALLAS_SPATIAL[key] = False
    try:
        memo.parent.mkdir(parents=True, exist_ok=True)
        memo.write_text("1" if _PALLAS_SPATIAL[key] else "0")
    except OSError:
        pass
    return _PALLAS_SPATIAL[key]


def connectivity_structure(connectivity):
    """Build the (3,3,3) boolean neighbourhood from an int connectivity or
    pass an explicit structuring array through."""
    if isinstance(connectivity, np.ndarray) or hasattr(connectivity, "shape"):
        s = np.asarray(connectivity).astype(bool)
        if s.shape != (3, 3, 3):
            raise ValueError("connectivity structure must have shape (3,3,3)")
        return s
    c = int(connectivity)
    grid = np.abs(np.indices((3, 3, 3)) - 1).sum(axis=0)
    return grid <= c


def _structure_taps_3d(structure):
    """(dt, dy, dx) neighbour offsets, excluding the centre."""
    taps = [
        (int(t) - 1, int(r) - 1, int(c) - 1)
        for t, r, c in zip(*np.nonzero(structure))
        if not (t == 1 and r == 1 and c == 1)
    ]
    return tuple(taps)


def _shift_t(arr, dt, fill):
    """arr[t + dt] with constant fill at the sequence ends."""
    t = arr.shape[0]
    fill_frame = jnp.full((1,) + arr.shape[1:], fill, dtype=arr.dtype)
    if dt == 1:
        return jnp.concatenate([arr[1:], fill_frame], axis=0)
    return jnp.concatenate([fill_frame, arr[:-1]], axis=0)


def _banded_pull(arrs, fills, disp_y, disp_x, radius):
    """2D banded gather of several same-shaped arrays by one displacement."""
    outs = []
    for a, fill in zip(arrs, fills):
        g = banded_gather_axis(a, disp_y, -2, radius, fill)
        outs.append(banded_gather_axis(g, disp_x, -1, radius, fill))
    return outs


def _scatter_axis(arrs, fills, s, axis, radius):
    """out[p + s ê_axis] = in[p] for a traced integer s in [-radius, radius]:
    one padded dynamic-slice per array (out[p] = in[p - s])."""
    outs = []
    for a, fill in zip(arrs, fills):
        pads = [(0, 0)] * a.ndim
        pads[axis % a.ndim] = (radius, radius)
        padded = jnp.pad(a, pads, constant_values=fill)
        starts = [0] * a.ndim
        starts[axis % a.ndim] = radius - s
        outs.append(jax.lax.dynamic_slice(padded, starts, list(a.shape)))
    return outs


def _lex_better(c1a, c2a, ma, c1b, c2b, mb):
    """Lexicographic (claim, hops, second-claim, label) comparison: a < b.

    Hop count ranks BEFORE the second-max: the heap pops strictly by
    (value, age), so within an equal-value plateau ALL entry pushes precede
    any intra-plateau push and the wave expands in global BFS level order —
    plateau distance decides first; entry age (whose proxy is the pusher's
    path profile, ~ the second-max, with seeds-in-plateau earliest of all)
    only breaks equidistant ties.  Comparing the second-max first lets a
    seed's -inf cost2 steal cells from nearer entries, measured as the
    -1-barrier over-winning 681:2 on the tie-probe scene."""
    ha = ma >> 23
    hb = mb >> 23
    # full-tuple ties: the -1 barrier (label code 1) loses to any positive
    # label.  On real detect fields the heap resolves every such race for
    # the anvil (measured 1479:0, WS_CLAIM_PROBE.json): the shared-saddle
    # arrival recursion bottoms out in the approach profiles, and the
    # anvil-side approach (edges ~ sobel - 1 inside the linearised anvil)
    # is structurally lower than the barrier-side approach over the mask
    # plateau (edges ~ sobel - 0).  Mapping code 1 to the top of the label
    # range encodes that while keeping the meta_max sentinel above all.
    lab_top = jnp.int32((1 << 23) - 1)
    ka = jnp.where((ma & lab_top) == 1, ma | lab_top, ma)
    kb = jnp.where((mb & lab_top) == 1, mb | lab_top, mb)
    return (
        (c1a < c1b)
        | ((c1a == c1b) & (ha < hb))
        | ((c1a == c1b) & (ha == hb) & (c2a < c2b))
        | ((c1a == c1b) & (ha == hb) & (c2a == c2b) & (ka < kb))
    )


def _banded_scatter_min_exact(
    cost_s, cost2_s, meta_s, disp_y, disp_x, radius, meta_max
):
    """Reference-exact (2R+1)^2 scatter: every (dy, dx) pair is its own
    masked static-shift pass, so no push is ever lost to an intermediate
    collision.  O(R^2) passes — diagnostic / small-radius use only."""
    dy = disp_y.astype(jnp.int32)
    dx = disp_x.astype(jnp.int32)
    big = jnp.asarray(_INF, cost_s.dtype)
    out = (
        jnp.full(cost_s.shape, _INF, cost_s.dtype),
        jnp.full(cost_s.shape, _INF, cost_s.dtype),
        jnp.full(meta_s.shape, meta_max, meta_s.dtype),
    )
    for sy in range(-radius, radius + 1):
        rowsel = dy == sy
        for sx in range(-radius, radius + 1):
            m = rowsel & (dx == sx)
            cand = (
                jnp.where(m, cost_s, big),
                jnp.where(m, cost2_s, big),
                jnp.where(m, meta_s, meta_max),
            )
            cc, cc2, cm = _scatter_axis(
                cand, (big, big, meta_max), sy, -2, radius
            )
            cc, cc2, cm = _scatter_axis(
                (cc, cc2, cm), (big, big, meta_max), sx, -1, radius
            )
            better = _lex_better(cc, cc2, cm, out[0], out[1], out[2])
            out = (
                jnp.where(better, cc, out[0]),
                jnp.where(better, cc2, out[1]),
                jnp.where(better, cm, out[2]),
            )
    return out


def _banded_scatter_min(cost_s, cost2_s, meta_s, disp_y, disp_x, radius, meta_max):
    """Banded scatter-min: each source pixel p pushes (cost, cost2, meta) to
    p + (disp_y(p), disp_x(p)); colliding pushes keep the lexicographic
    minimum.  Two 1D passes — the y-pass transports each winner's
    x-displacement so the x-pass lands it exactly (unlike the gather, whose
    second pass must evaluate the displacement at the shifted position).
    This is the *push* adjacency of the reference heap
    (``_watershed.pyx:308-313``: neighbours at structure + index +
    flow-at-source), which a destination-side pull cannot represent when the
    forward and backward flows are not exact inverses."""
    # out-of-band displacements are DROPPED, not clipped: a clipped push
    # lands on a pixel the reference heap's graph has no edge to (phantom
    # adjacency) and can hand it an unbeatable understated claim.  The heap
    # pads by max|flow| and never clips (_watershed.pyx:308-313); sources
    # beyond the band match no shift k in [-R, R] and so push nowhere.
    dy = disp_y.astype(jnp.int32)
    dx = disp_x.astype(jnp.int32)
    big = jnp.asarray(_INF, cost_s.dtype)

    # The y-pass reduces colliding pushes (same intermediate row) to ONE
    # survivor, but colliding pushes whose x-displacements differ target
    # DIFFERENT final cells — a single-lane reduction silently drops edges
    # the reference heap has (measured: 2-4% of pixels receive divergent-dx
    # collisions on the tie-probe scene).  Two lanes survive the y-pass:
    # the lexicographic best, and the best among pushes with a different dx
    # (a distinct final destination).  Pushes are lost only at >=3-way
    # collisions with >=3 distinct dx where the dropped one would have won
    # its destination — unobserved on the probe scenes.
    def pass_y(k, acc):
        (ac, ac2, am, adx), (bc, bc2, bm, bdx) = acc
        s = k - radius
        m = dy == s
        cand = (
            jnp.where(m, cost_s, big),
            jnp.where(m, cost2_s, big),
            jnp.where(m, meta_s, meta_max),
            jnp.where(m, dx, 0),
        )
        cc, cc2, cm, cdx = _scatter_axis(
            cand, (big, big, meta_max, 0), s, -2, radius
        )
        cand_first = _lex_better(cc, cc2, cm, ac, ac2, am)
        tc = jnp.where(cand_first, cc, ac)
        tc2 = jnp.where(cand_first, cc2, ac2)
        tm = jnp.where(cand_first, cm, am)
        tdx = jnp.where(cand_first, cdx, adx)
        # the displaced runner-up (whichever of {cand, lane A} lost)
        oc = jnp.where(cand_first, ac, cc)
        oc2 = jnp.where(cand_first, ac2, cc2)
        om = jnp.where(cand_first, am, cm)
        odx = jnp.where(cand_first, adx, cdx)
        # lane B keeps the best push whose dx differs from lane A's
        o_ok = (om != meta_max) & (odx != tdx)
        b_ok = (bm != meta_max) & (bdx != tdx)
        pick_o = o_ok & (~b_ok | _lex_better(oc, oc2, om, bc, bc2, bm))
        return (
            (tc, tc2, tm, tdx),
            (
                jnp.where(pick_o, oc, jnp.where(b_ok, bc, big)),
                jnp.where(pick_o, oc2, jnp.where(b_ok, bc2, big)),
                jnp.where(pick_o, om, jnp.where(b_ok, bm, meta_max)),
                jnp.where(pick_o, odx, jnp.where(b_ok, bdx, 0)),
            ),
        )

    # join each carry init with a dead read of the inputs: inside shard_map
    # the loop carry must have the inputs' varying type, and a constant init
    # is replicated (fori carry input/output types must match)
    dead = jnp.zeros((), bool)
    lane0 = (
        jnp.where(dead, cost_s, jnp.full(cost_s.shape, _INF, cost_s.dtype)),
        jnp.where(dead, cost2_s, jnp.full(cost_s.shape, _INF, cost_s.dtype)),
        jnp.where(dead, meta_s, jnp.full(meta_s.shape, meta_max, meta_s.dtype)),
        jnp.where(dead, dx, jnp.zeros(dx.shape, jnp.int32)),
    )
    lane_a, lane_b = jax.lax.fori_loop(
        0, 2 * radius + 1, pass_y, (lane0, lane0)
    )

    def pass_x(k, acc):
        out_c, out_c2, out_m = acc
        s = k - radius
        for lc, lc2, lm, ldx in (lane_a, lane_b):
            m = (ldx == s) & (lm != meta_max)
            cand = (
                jnp.where(m, lc, big),
                jnp.where(m, lc2, big),
                jnp.where(m, lm, meta_max),
            )
            cc, cc2, cm = _scatter_axis(
                cand, (big, big, meta_max), s, -1, radius
            )
            better = _lex_better(cc, cc2, cm, out_c, out_c2, out_m)
            out_c = jnp.where(better, cc, out_c)
            out_c2 = jnp.where(better, cc2, out_c2)
            out_m = jnp.where(better, cm, out_m)
        return (out_c, out_c2, out_m)

    out0 = (lane0[0], lane0[1], lane0[2])
    return jax.lax.fori_loop(0, 2 * radius + 1, pass_x, out0)


@persistent_jit(
    static_argnames=(
        "taps", "radius", "n_iters", "spatial_per_temporal", "grace",
        "use_pallas", "label_only",
    ),
    # the packed state is rewritten every chunk: donating it lets XLA reuse
    # the ~1.4 GB of buffers instead of holding input + output copies
    donate_argnums=(5,),
)
def _watershed_sweeps(
    field, markers, mask, fwd_int, bwd_int, state, taps, radius, n_iters,
    spatial_per_temporal=8, grace=2, use_pallas=False, label_only=True,
):
    """Run up to n_iters sweep rounds; returns (state, rounds_used).

    State is (claim: f32, claim2: f32, meta: int32) with
    meta = min(hops, 255) << 23 | (label + 2).  ``claim`` is the minimax
    path cost; ``claim2`` is the second-largest value along the optimal
    path — the serial heap's pop clock orders fronts by their descending
    path-value profile, so ties in the minimax cost (plateaus behind equal
    barriers) resolve by the second barrier before falling back to the hop
    count (the heap's push-age analogue).  Labels must lie in
    [-1, 2^23 - 3] (detection labels are far below; asserted by the wrapper).
    """
    t, h, w = field.shape
    seeded = markers != 0
    floodable = mask & ~seeded
    meta_max = jnp.int32(np.iinfo(np.int32).max)
    ninf = jnp.float32(-jnp.inf)

    in_plane = tuple((dy, dx) for dt, dy, dx in taps if dt == 0)
    temporal = tuple((dt, dy, dx) for dt, dy, dx in taps if dt != 0)

    hops_step = jnp.int32(1 << 23)
    hops_cap = jnp.int32(255 << 23)

    def shift2(arrs, dy, dx, fills):
        outs = []
        for a, fill in zip(arrs, fills):
            padded = jnp.pad(
                a,
                ((0, 0), (abs(dy), abs(dy)), (abs(dx), abs(dx))),
                constant_values=fill,
            )
            outs.append(
                jax.lax.dynamic_slice(
                    padded, (0, abs(dy) + dy, abs(dx) + dx), (t, h, w)
                )
            )
        return outs

    def consider(best, cq, c2q, mq):
        bc, bc2, bm = best
        # bump the hop count only while the wave stays ON its level plateau
        # (receiver field == candidate claim): the heap's pop clock ticks in
        # BFS levels only across equal-value cells — once a gateway pops, it
        # floods everything STRICTLY BELOW its level in consecutive pops
        # (each downhill push becomes the new heap minimum), so the whole
        # sub-level basin goes to the earliest gateway no matter how far it
        # is (winner-take-all), and hop distance must freeze on descents.
        # Saturate at 255 — an unconditional add would overflow the int32.
        on_level = field == cq
        cand_m = mq + jnp.where((mq < hops_cap) & on_level, hops_step, 0)
        valid = mq != meta_max  # unlabeled/out-of-frame sources never compete
        better = _lex_better(cq, c2q, cand_m, bc, bc2, bm) & valid
        return (
            jnp.where(better, cq, bc),
            jnp.where(better, c2q, bc2),
            jnp.where(better, cand_m, bm),
        )

    def sweep(state, include_temporal):
        claim, claim2, meta = state
        # extend the stored path cost through the pixel's own field value.
        # claim2 is the GATE value: the approach bottleneck at the path's
        # last strict max rise (its gateway).  It freezes through level
        # moves and descents — the heap decides the race between two waves
        # AT their shared gateway saddle (label-at-push: the first wave to
        # claim the saddle owns everything beyond it), ordered by arrival
        # there ≈ approach bottleneck.  A running second-max instead gets
        # contaminated by the shared post-gateway descent (both waves transit
        # the same cells, equalising their second-maxes), measured as the -1
        # barrier winning 820/822 exact-cost-tie pixels the heap gives to
        # anvils (WS_CLAIM_PROBE.json).
        cost = jnp.where(seeded, field, jnp.maximum(field, claim))
        cost2 = jnp.where(
            seeded, ninf, jnp.where(field > claim, claim, claim2)
        )
        # plateau-relative hops: the heap pops by (value, age), so within an
        # equal-value plateau the partition is BFS order from the plateau
        # ENTRY points, not distance from the seed.  A source whose own
        # field strictly raised the running max IS a plateau entry — reset
        # its hop bits before pushing so downstream (claim, claim2) ties
        # compare within-plateau BFS distance like the heap's age clock.
        # The full tuple still strictly increases along every push (claim
        # rose where hops reset), so convergence is unaffected.
        meta_p = jnp.where(
            ~seeded & (field > claim), meta & jnp.int32((1 << 23) - 1), meta
        )
        best = (claim, claim2, meta)
        for dy, dx in in_plane:
            cq, c2q, mq = shift2(
                (cost, cost2, meta_p), dy, dx, (_INF, _INF, meta_max)
            )
            best = consider(best, cq, c2q, mq)
        if include_temporal:
            # the heap's temporal graph is directed by SOURCE-side flow:
            # p@t pushes to p + (dy,dx) + fwd(p) @ t+1 and to
            # p + (dy,dx) + bwd(p) @ t-1 (_watershed.pyx:308-313).  A tap
            # (dt, dy, dx) therefore receives, at the current frame, pushes
            # from frame t-dt displaced by that frame's own flow — an exact
            # banded scatter (destination-side pulls are a different graph
            # wherever fwd and bwd are not mutual inverses, e.g. growing
            # anvil edges).
            for dt, dy, dx in temporal:
                src_flow = fwd_int if dt == 1 else bwd_int
                cs = _shift_t(cost, -dt, _INF)
                c2s = _shift_t(cost2, -dt, _INF)
                ms = _shift_t(meta_p, -dt, meta_max)
                fs = _shift_t(src_flow, -dt, 0)
                # measured dead end: a Pallas VMEM form of this scatter
                # (tools git history, ws_pallas banded_scatter_min_pallas)
                # lost to this XLA formulation both ways it was built —
                # unrolled band passes blow scoped VMEM past 16M unless the
                # row blocks shrink to DMA-latency-bound sizes (11.2s vs
                # 6.9s), and fori_loop+roll rotation passes are slower still
                # (3.7s vs 2.3s) with diverging roll semantics between the
                # Mosaic backend and the interpreter
                scatter = (
                    _banded_scatter_min_exact
                    if _EXACT_SCATTER
                    else _banded_scatter_min
                )
                cq, c2q, mq = scatter(
                    cs, c2s, ms, fs[..., 1] + dy, fs[..., 0] + dx, radius,
                    meta_max,
                )
                best = consider(best, cq, c2q, mq)
        return (
            jnp.where(floodable, best[0], claim),
            jnp.where(floodable, best[1], claim2),
            jnp.where(floodable, best[2], meta),
        )

    label_mask = jnp.int32((1 << 23) - 1)

    def cond(carry):
        _, quiet, it = carry
        # stop after `grace` consecutive rounds without label changes (claims
        # keep relaxing long after the assignment stabilises; label-only
        # convergence with a grace window avoids paying for that tail)
        return jnp.logical_and(quiet < grace, it < n_iters)

    if use_pallas:
        from tobac_flow_tpu.ops.ws_pallas import spatial_sweeps_pallas

        in_plane_taps = in_plane

        def run_spatial(new):
            # time-tiled VMEM kernel: exact equivalent of
            # spatial_per_temporal Jacobi sweeps, one HBM pass
            return spatial_sweeps_pallas(
                new[0], new[1], new[2], field, seeded, floodable,
                tuple((dy, dx) for dy, dx in in_plane_taps),
                k_sweeps=spatial_per_temporal,
            )
    else:

        def run_spatial(new):
            for _ in range(spatial_per_temporal):
                new = sweep(new, False)
            return new

    def body(carry):
        state, quiet, it = carry
        new = sweep(state, True)
        new = run_spatial(new)
        if label_only:
            changed = jnp.any(
                (new[2] & label_mask) != (state[2] & label_mask)
            )
        else:
            # full-state convergence: the barrier-first pre-flood must hand
            # phase 1 its FINAL claim field — label-quiet is vacuous when
            # every labeled cell carries the same (-1) label
            changed = (
                jnp.any(new[2] != state[2])
                | jnp.any(new[0] != state[0])
                | jnp.any(new[1] != state[1])
            )
        quiet = jnp.where(changed, 0, quiet + 1)
        return new, quiet, it + 1

    state, _, used = jax.lax.while_loop(
        cond, body, (state, jnp.int32(0), jnp.int32(0))
    )
    return state, used


@persistent_jit(
    static_argnames=("taps", "radius", "k_spatial", "label_only"),
    donate_argnums=(5,),
)
def _watershed_scan_round(
    field, markers, mask, fwd_int, bwd_int, state, taps, radius, k_spatial=4,
    label_only=True,
):
    """One temporal Gauss–Seidel round: a forward then a backward
    ``lax.scan`` over frames, each frame receiving the already-updated
    neighbour's pushes plus ``k_spatial`` in-plane relaxations.

    The Jacobi rounds in ``_watershed_sweeps`` propagate temporal claims one
    frame per round, so a T-frame volume needs O(T) rounds before labels can
    traverse the time axis — the dominant cost at day scale (T≈300).  A
    forward/backward scan pair relaxes the same monotone operator in frame
    order, carrying each frame's post-update (cost, cost2, meta) into its
    successor, so one round propagates across the whole axis.  The
    lexicographic relaxation is a shortest-path fixed point (every push
    strictly increases the (claim, hops, claim2) tuple), so update order
    changes only the trajectory, never the fixed point — the Jacobi
    verification rounds that follow confirm convergence on the identical
    operator.  Returns (state, labels_changed)."""
    t, h, w = field.shape
    seeded = markers != 0
    floodable = mask & ~seeded
    meta_max = jnp.int32(np.iinfo(np.int32).max)
    ninf = jnp.float32(-jnp.inf)
    label_mask = jnp.int32((1 << 23) - 1)
    hops_step = jnp.int32(1 << 23)
    hops_cap = jnp.int32(255 << 23)

    in_plane = tuple((dy, dx) for dt, dy, dx in taps if dt == 0)
    temporal = tuple((dt, dy, dx) for dt, dy, dx in taps if dt != 0)

    def frame_cost(c, c2, m, f, sd):
        # (max, frozen gate) of the optimal path extended through this
        # pixel, with the plateau-relative hop reset — bit-equal to the
        # volume form in _watershed_sweeps (see gate rationale there)
        cost = jnp.where(sd, f, jnp.maximum(f, c))
        cost2 = jnp.where(sd, ninf, jnp.where(f > c, c, c2))
        meta_p = jnp.where(~sd & (f > c), m & label_mask, m)
        return cost, cost2, meta_p

    def consider(best, cq, c2q, mq, f):
        bc, bc2, bm = best
        # hop clock ticks only on-level (receiver field == candidate claim);
        # frozen on descents — bit-equal to the volume form's consider
        on_level = f == cq
        cand_m = mq + jnp.where((mq < hops_cap) & on_level, hops_step, 0)
        valid = mq != meta_max
        better = _lex_better(cq, c2q, cand_m, bc, bc2, bm) & valid
        return (
            jnp.where(better, cq, bc),
            jnp.where(better, c2q, bc2),
            jnp.where(better, cand_m, bm),
        )

    def shift2d(arrs, dy, dx, fills):
        outs = []
        for a, fill in zip(arrs, fills):
            padded = jnp.pad(
                a, ((abs(dy), abs(dy)), (abs(dx), abs(dx))),
                constant_values=fill,
            )
            outs.append(
                jax.lax.dynamic_slice(padded, (abs(dy) + dy, abs(dx) + dx), (h, w))
            )
        return outs

    def spatial_relax(c, c2, m, f, sd, fl):
        for _ in range(k_spatial):
            cost, cost2, meta_p = frame_cost(c, c2, m, f, sd)
            best = (c, c2, m)
            for dy, dx in in_plane:
                cq, c2q, mq = shift2d(
                    (cost, cost2, meta_p), dy, dx, (_INF, _INF, meta_max)
                )
                best = consider(best, cq, c2q, mq, f)
            c = jnp.where(fl, best[0], c)
            c2 = jnp.where(fl, best[1], c2)
            m = jnp.where(fl, best[2], m)
        return c, c2, m

    def direction(state, dt_dir, flow, reverse):
        claim, claim2, meta = state
        d_taps = tuple(
            (dy, dx) for dt, dy, dx in temporal if dt == dt_dir
        )

        def body(carry, x):
            pc, pc2, pm, pflow = carry
            f, sd, fl, flw, c, c2, m = x
            best = (c, c2, m)
            for dy, dx in d_taps:
                cq, c2q, mq = _banded_scatter_min(
                    pc, pc2, pm,
                    pflow[..., 1].astype(jnp.int32) + dy,
                    pflow[..., 0].astype(jnp.int32) + dx,
                    radius, meta_max,
                )
                best = consider(best, cq, c2q, mq, f)
            c = jnp.where(fl, best[0], c)
            c2 = jnp.where(fl, best[1], c2)
            m = jnp.where(fl, best[2], m)
            c, c2, m = spatial_relax(c, c2, m, f, sd, fl)
            cost, cost2, meta_p = frame_cost(c, c2, m, f, sd)
            return (cost, cost2, meta_p, flw), (c, c2, m)

        init = (
            jnp.full((h, w), _INF, jnp.float32),
            jnp.full((h, w), _INF, jnp.float32),
            jnp.full((h, w), meta_max, jnp.int32),
            jnp.zeros((h, w, 2), flow.dtype),
        )
        xs = (field, seeded, floodable, flow, claim, claim2, meta)
        _, (nc, nc2, nm) = jax.lax.scan(body, init, xs, reverse=reverse)
        return nc, nc2, nm

    state0 = state
    labels0 = state[2] & label_mask
    # forward pass pushes t-1 -> t along each frame's own forward flow;
    # backward pass pushes t+1 -> t along the backward flow (the reference
    # heap's source-side adjacency, _watershed.pyx:308-313)
    state = direction(state, 1, fwd_int, reverse=False)
    state = direction(state, -1, bwd_int, reverse=True)
    if label_only:
        changed = jnp.any((state[2] & label_mask) != labels0)
    else:
        changed = (
            jnp.any(state[2] != state0[2])
            | jnp.any(state[0] != state0[0])
            | jnp.any(state[1] != state0[1])
        )
    return state, changed


def _sweeps_guarded(*args, use_pallas, width, **kw):
    """_watershed_sweeps with a one-time Pallas->XLA fallback: the probe
    compiles a fixed-height frame, but the real dispatch's VMEM scratch
    scales with the (height, width) actually used — if Mosaic rejects it,
    demote this width bucket on disk and rerun with the XLA sweeps
    (ws_pallas docstring contract: 'falls back to the XLA formulation')."""
    if use_pallas:
        try:
            return _watershed_sweeps(*args, use_pallas=True, **kw), True
        except Exception:
            key = -(-int(width) // 128) * 128
            _PALLAS_SPATIAL[key] = False
            try:
                from tobac_flow_tpu.utils.program_cache import (
                    package_source_digest,
                    program_cache_dir,
                )

                platform = jax.devices()[0].platform.lower()
                (
                    program_cache_dir()
                    / f"pallas_probe_{platform}_{key}_{package_source_digest()}.ok"
                ).write_text("0")
            except Exception:
                pass
    return _watershed_sweeps(*args, use_pallas=False, **kw), False


def _coarsen(a, f, reduce="max"):
    """Factor-f pooling of the spatial axes of a (T, H, W) array."""
    t, h, w = a.shape
    hc, wc = h // f, w // f
    v = a[:, : hc * f, : wc * f].reshape(t, hc, f, wc, f)
    if reduce == "max":
        return v.max(axis=(2, 4))
    if reduce == "min":
        return v.min(axis=(2, 4))
    return v.mean(axis=(2, 4))


def _upsample_nearest(a, f, h, w):
    up = jnp.repeat(jnp.repeat(a, f, axis=1), f, axis=2)
    pad_h = h - up.shape[1]
    pad_w = w - up.shape[2]
    if pad_h or pad_w:
        up = jnp.pad(up, ((0, 0), (0, pad_h), (0, pad_w)), mode="edge")
    return up


_META_MAX = np.int32(np.iinfo(np.int32).max)


@persistent_jit
def _ws_prep_jit(field_j, markers_j, mask_j, fwd_f, bwd_f):
    """Watershed preprocessing as one program: inf-fill NaN barriers,
    round/clip flows to int8 bands, seed the packed state, and compute the
    band-radius exceedance curve — ``exceed[k]`` = in-mask displacement
    components with ``|disp| > k`` plus the in-mask total, from which the
    host picks the temporal band radius (``_band_radius_from_stats``;
    full coverage by default)."""
    field_j = jnp.where(jnp.isnan(field_j), jnp.inf, field_j)
    fwd_int = jnp.clip(jnp.round(fwd_f), -127, 127).astype(jnp.int8)
    bwd_int = jnp.clip(jnp.round(bwd_f), -127, 127).astype(jnp.int8)
    mag = jnp.maximum(jnp.abs(fwd_int), jnp.abs(bwd_int))
    mag = jnp.where(mask_j[..., None], mag, 0)
    total = jnp.maximum(mask_j.sum() * 2, 1)
    # band-radius exceedance curve: exceed[k] = in-mask displacement
    # components with |disp| > k.  The host picks the band radius from this
    # (full coverage by default; see the radius selection in ``watershed``).
    exceed = jnp.stack([(mag > k).sum() for k in range(21)])
    band_stats = jnp.stack([exceed, jnp.broadcast_to(total, (21,))])
    seeded = markers_j != 0
    # packed meta = hops << 23 | (label + 2); unlabeled = INT32_MAX sentinel
    meta0 = jnp.where(seeded, markers_j + 2, _META_MAX).astype(jnp.int32)
    claim0 = jnp.where(seeded, -jnp.inf, jnp.inf).astype(jnp.float32)
    return field_j, fwd_int, bwd_int, (claim0, claim0, meta0), band_stats


@persistent_jit(static_argnames=("factor",))
def _ws_coarse_prep_jit(field_j, markers_j, mask_j, fwd_int, bwd_int, factor):
    """Coarse-grid (max-pooled) V-cycle inputs as one program."""
    cf = _coarsen(field_j, factor, "max")
    cmask = _coarsen(mask_j.astype(jnp.int32), factor, "max").astype(bool)
    cmark = _coarsen(markers_j, factor, "max")
    neg = _coarsen(markers_j, factor, "min")
    cmark = jnp.where((cmark == 0) & (neg < 0), neg, cmark)
    cfwd = (_coarsen(fwd_int[..., 0], factor, "mean") / factor).astype(jnp.int32)
    cfwy = (_coarsen(fwd_int[..., 1], factor, "mean") / factor).astype(jnp.int32)
    cbwx = (_coarsen(bwd_int[..., 0], factor, "mean") / factor).astype(jnp.int32)
    cbwy = (_coarsen(bwd_int[..., 1], factor, "mean") / factor).astype(jnp.int32)
    cfwd_i = jnp.stack([cfwd, cfwy], axis=-1)
    cbwd_i = jnp.stack([cbwx, cbwy], axis=-1)
    cseeded = cmark != 0
    cstate = (
        jnp.where(cseeded, -jnp.inf, jnp.inf).astype(jnp.float32),
        jnp.where(cseeded, -jnp.inf, jnp.inf).astype(jnp.float32),
        jnp.where(cseeded, cmark + 2, _META_MAX).astype(jnp.int32),
    )
    return cf, cmask, cmark, cfwd_i, cbwd_i, cstate


def _sep_window(a, init, op, rc):
    """Separable (3, 2rc+1, 2rc+1) moving min/max over a (T,Hc,Wc) volume."""
    for dims in ((3, 1, 1), (1, 2 * rc + 1, 1), (1, 1, 2 * rc + 1)):
        a = jax.lax.reduce_window(a, init, op, dims, (1, 1, 1), "SAME")
    return a


@persistent_jit(static_argnames=("factor",), donate_argnums=(5,))
def _ws_adopt_jit(cstate, cmark, field_j, markers_j, mask_j, state, factor):
    """Adopt the coarse flood as an upper-bound initial fine state — but
    ONLY deep inside label-uniform coarse territory, for every label.

    The coarse graph is block-granular: max-pooled masks and factor-divided
    flows create adjacency the fine graph does not have, so coarse labels
    within a flow-band's reach of a coarse label frontier are unreliable
    (measured: adopting them costs mean anvil IoU 0.981 -> 0.945 vs the
    serial heap, WS_TIE_PROBE.json / WS_DROP_PROBE.json — the deviation
    concentrates at the -1/positive frontier in both directions).  A cell
    qualifies when its whole (3, 2rc+1, 2rc+1) coarse neighbourhood — ±1
    frame, in-plane radius covering the temporal flow band at coarse scale —
    carries one label, leaving a ~band-wide fine frontier strip for the fine
    flood to decide.  Interiors (the vast -1 ocean, large anvil cores) still
    warm-start, so the V-cycle keeps its round-count win (regression:
    test_negative_marker_boundary_multigrid).  The edge-replicated crop
    margin is excluded (no upper-bound guarantee)."""
    t, h, w = field_j.shape
    seeded = markers_j != 0
    up_claim = _upsample_nearest(cstate[0], factor, h, w)
    up_meta = _upsample_nearest(cstate[2], factor, h, w)
    yi = jax.lax.broadcasted_iota(jnp.int32, (t, h, w), 1)
    xi = jax.lax.broadcasted_iota(jnp.int32, (t, h, w), 2)
    in_cov = (yi < (h // factor) * factor) & (xi < (w // factor) * factor)
    lab_valid = cstate[2] != _META_MAX
    clabel = (cstate[2] & ((1 << 23) - 1)) - 2
    rc = -(-21 // int(factor)) + 1  # flow band in coarse cells + fuzz margin
    big = jnp.int32(1 << 30)
    wmax = _sep_window(jnp.where(lab_valid, clabel, big), -big, jax.lax.max, rc)
    wmin = _sep_window(jnp.where(lab_valid, clabel, -big), big, jax.lax.min, rc)
    deep_same = lab_valid & (wmax == clabel) & (wmin == clabel)
    up_deep = _upsample_nearest(
        deep_same.astype(jnp.int32), factor, h, w
    ).astype(bool)
    adopt = mask_j & ~seeded & (up_meta != _META_MAX) & up_deep & in_cov
    adopted_claim = jnp.maximum(up_claim, field_j)
    # Rescale the coarse hop counts to fine-grid units (x factor, saturating
    # at the 255 cap): a raw coarse hop count is ~factor smaller than the
    # fine path it summarises, so adopted cells would win (claim, claim2)
    # ties against legitimate fine fronts — measured at 2/3 of the
    # watershed-vs-heap anvil deviation (WS_TIE_PROBE.json: production IoU
    # 0.944 vs 0.981 with multigrid off).  With the rescale the adopted meta
    # is an upper bound in the full lexicographic order, so fine sweeps
    # strictly improve it along every real path (same-label hop repair
    # included) and the fixed point matches the no-multigrid flood.
    up_hops = jnp.minimum(
        (up_meta >> 23) * jnp.int32(factor), jnp.int32(255)
    )
    up_meta = (up_hops << 23) | (up_meta & ((1 << 23) - 1))
    return (
        jnp.where(adopt, adopted_claim, state[0]),
        # the coarse second-max is not an upper bound on the fine grid;
        # claim2 <= claim always holds, so claim itself is the safe one
        jnp.where(adopt, adopted_claim, state[1]),
        jnp.where(adopt, up_meta, state[2]),
    )


@persistent_jit
def _ws_decode_jit(meta, markers_j, mask_j):
    """Unpack labels from the converged meta and restore marker identity."""
    label = jnp.where(meta == _META_MAX, 0, (meta & ((1 << 23) - 1)) - 2)
    label = jnp.where(markers_j != 0, markers_j, label)
    return jnp.where((markers_j != 0) | (mask_j & (label != 0)), label, 0)


def _band_radius_from_stats(stats):
    """Temporal band radius from ``_ws_prep_jit``'s (exceed, total) curve.

    Full coverage by default: the banded scatter DROPS out-of-band pushes,
    so any displacement outside the band is a temporal edge the reference
    heap has and we don't (measured: 2731 px of thin-anvil territory ceded
    to the barrier at a 99% band, 125 at full — THIN_GAP_PROBE.json).
    ``TFT_WS_BAND_COVERAGE=0.99`` restores the lossy percentile band for
    speed A/Bs."""
    exceed, total = np.asarray(stats[0]), np.asarray(stats[1])
    cov = float(_os.environ.get("TFT_WS_BAND_COVERAGE", "1.0"))
    if cov >= 1.0:
        covered = exceed == 0
        return int(np.argmax(covered)) if covered.any() else 21
    allowed = np.maximum((total * (1.0 - cov)).astype(np.int64), 1)
    small = exceed <= allowed
    q = int(np.argmax(small)) if small.any() else 21
    return int(min(q + 2, 21))


def _flood_state(
    field_j, markers_j, mask_j, fwd_int, bwd_int, state, taps, radius, *,
    max_iters, chunk_iters, grace, use_pallas, run_scans, multigrid,
    label_only=True, barrier_first=True,
):
    """Run the full flood schedule (coarse V-cycle -> temporal scans ->
    Jacobi verification) on device-resident inputs and return the converged
    packed state.  Shared by the whole-volume path (``watershed``) and the
    HBM-bounded time-chunked path (``_watershed_time_chunked``).

    ``barrier_first``: when the markers mix -1 barrier seeds with positive
    labels, flood the barrier ALONE to full-state convergence first and seed
    the mixed flood with its final claim field.  The temporal scan rounds
    otherwise race positive claims across the whole time axis while the
    barrier's claims relax silently (no label change), and the label-only
    convergence grace freezes the over-reach — measured as the thin-anvil
    flood over-running the serial-heap oracle by ~800 px/scene.  The
    barrier's claim field is independent of the positive seeds (no path
    relaxes THROUGH a frozen seed cell), so the pre-flood computes exactly
    the mixed system's final barrier claims; phase 2's remaining
    corrections all flip labels, which the label-only check sees."""
    import time as _time

    t, h, w = field_j.shape

    if (
        barrier_first
        and label_only
        and _os.environ.get("TFT_WS_BARRIER_FIRST", "1") != "0"
        and bool(jnp.any(markers_j < 0))
        and bool(jnp.any(markers_j > 0))
    ):
        neg = jnp.where(markers_j < 0, markers_j, 0)
        seeded0 = neg != 0
        state0 = (
            jnp.where(seeded0, -jnp.inf, jnp.inf).astype(jnp.float32),
            jnp.where(seeded0, -jnp.inf, jnp.inf).astype(jnp.float32),
            jnp.where(seeded0, neg + 2, _META_MAX).astype(jnp.int32),
        )
        # adopt the INCOMING state's barrier-labeled cells (the time-chunked
        # path's frozen halo frames carry the neighbour chunk's converged
        # barrier claims): a halo barrier claim the local pre-flood cannot
        # derive would otherwise enter only in phase 2, where it relaxes
        # silently under label-only convergence — the exact trap
        # barrier-first exists to avoid
        in_bar = (state[2] != _META_MAX) & (
            (state[2] & jnp.int32((1 << 23) - 1)) == jnp.int32(1)
        )
        adopt = in_bar & _lex_better(
            state[0], state[1], state[2], state0[0], state0[1], state0[2]
        )
        state0 = tuple(
            jnp.where(adopt, a, b) for a, b in zip(state, state0)
        )
        t0 = _time.perf_counter()
        state0 = _flood_state(
            field_j, neg, mask_j & (markers_j <= 0), fwd_int, bwd_int,
            state0, taps, radius, max_iters=max_iters,
            chunk_iters=chunk_iters, grace=1, use_pallas=use_pallas,
            run_scans=run_scans, multigrid=multigrid, label_only=False,
            barrier_first=False,
        )
        if _VERBOSE:
            print(
                f"[ws] barrier pre-flood: {_time.perf_counter() - t0:.2f}s",
                flush=True,
            )
        # merge: elementwise lexicographic best of the incoming state (seeds,
        # chunk boundary conditions) and the final barrier state — both are
        # achievable path-weight states, so the mixed relaxation still
        # converges monotonically to the same fixed point
        better0 = _lex_better(
            state0[0], state0[1], state0[2], state[0], state[1], state[2]
        )
        state = tuple(
            jnp.where(better0, a, b) for a, b in zip(state0, state)
        )
        del state0

    def scan_rounds(fld, mrk, msk, fwd, bwd, st, rad, cap, tag=""):
        # Gauss–Seidel rounds until labels hold still for one round (the
        # Jacobi loop that follows re-verifies convergence of the identical
        # operator, so a single quiet round suffices here)
        for i in range(cap):
            t0 = _time.perf_counter()
            st, changed = _watershed_scan_round(
                fld, mrk, msk, fwd, bwd, st, taps, rad,
                label_only=label_only,
            )
            changed = bool(changed)  # forces sync: honest per-round timing
            if _VERBOSE:
                print(
                    f"[ws]{tag} scan round {i}: {_time.perf_counter() - t0:.2f}s"
                    f" changed={changed}",
                    flush=True,
                )
            if not changed:
                break
        return st

    factor = 4
    if multigrid and h >= 8 * factor and w >= 8 * factor:
        # V-cycle: flood a max-pooled field first (coarse barriers >= true
        # barriers, so the upsampled claims are upper bounds and full-res
        # sweeps relax monotonically to the same fixed point), then refine.
        cf, cmask, cmark, cfwd_i, cbwd_i, cstate = _ws_coarse_prep_jit(
            field_j, markers_j, mask_j, fwd_int, bwd_int, factor
        )
        cradius = max(radius // factor, 1) if radius is not None else 5
        if run_scans:
            cstate = scan_rounds(
                cf, cmark, cmask, cfwd_i, cbwd_i, cstate, cradius, cap=12,
                tag=" coarse",
            )
        cdone = 0
        cmax = (max_iters // 2) + 8
        while cdone < cmax:
            n = min(chunk_iters, cmax - cdone)
            t0 = _time.perf_counter()
            (cstate, used), ok = _sweeps_guarded(
                cf, cmark, cmask, cfwd_i, cbwd_i, cstate, taps, cradius, n,
                grace=grace, label_only=label_only,
                use_pallas=use_pallas and (h // factor) * (w // factor) >= 256 * 256,
                width=w // factor,
            )
            used = int(used)
            if _VERBOSE:
                print(
                    f"[ws] coarse jacobi chunk: {used}/{n} rounds in "
                    f"{_time.perf_counter() - t0:.2f}s (radius={cradius})",
                    flush=True,
                )
            cdone += used
            if used < n:
                break
        state = _ws_adopt_jit(
            cstate, cmark, field_j, markers_j, mask_j, state, factor
        )
        # free the coarse-grid device buffers before the fine dispatches —
        # at GOES-day scale they are several hundred MB of HBM the flood
        # needs back
        del cstate, cf, cmask, cmark, cfwd_i, cbwd_i

    if run_scans:
        state = scan_rounds(
            field_j, markers_j, mask_j, fwd_int, bwd_int, state, radius,
            cap=12, tag=" fine",
        )

    done = 0
    while done < max_iters:
        n = min(chunk_iters, max_iters - done)
        t0 = _time.perf_counter()
        (state, used), use_pallas = _sweeps_guarded(
            field_j, markers_j, mask_j, fwd_int, bwd_int, state, taps, radius, n,
            grace=grace, label_only=label_only, use_pallas=use_pallas,
            width=w,
        )
        used = int(used)
        if _VERBOSE:
            print(
                f"[ws] fine jacobi chunk: {used}/{n} rounds in "
                f"{_time.perf_counter() - t0:.2f}s (radius={radius}, "
                f"pallas={use_pallas})",
                flush=True,
            )
        done += used
        if used < n:  # converged inside the chunk
            break
    return state


@persistent_jit
def _ws_chunk_sums_jit(labels):
    """Cheap per-frame change-detection checksums of a label chunk: the
    int32 wrap-sums of the labels, their squares, and the foreground count.
    Used to skip re-downloading an unchanged chunk's labels between passes
    of the time-chunked flood (collision odds are negligible and a
    collision costs at most a stale chunk that the boundary-state
    comparison still catches)."""
    lab = labels.astype(jnp.int32)
    s1 = jnp.sum(lab, axis=(1, 2))
    s2 = jnp.sum(lab * lab, axis=(1, 2))
    s3 = jnp.sum((lab != 0).astype(jnp.int32), axis=(1, 2))
    return jnp.stack([s1, s2, s3])


def _watershed_time_chunked(
    forward_flow, backward_flow, field, markers, mask, taps, radius, *,
    max_iters_cap, chunk_iters, grace, multigrid, temporal_scan, budget,
    return_device, max_passes=8,
):
    """HBM-bounded watershed: block Gauss–Seidel over overlapping time
    chunks.

    Each chunk floods with the full single-chip machinery
    (:func:`_flood_state`) plus one FROZEN halo frame per side carrying the
    neighbouring chunk's converged (claim, claim2, meta) state: halo frames
    are excluded from the floodable mask (never updated) but their packed
    state pushes through the temporal scatter exactly like interior
    sources, so the chunked relaxation optimises the same lexicographic
    path objective as the whole-volume flood.  Passes alternate direction
    (forward/backward chunk order) until a full pass changes neither any
    chunk's labels nor any boundary state — claims relax monotonically, so
    the fixed point matches the whole-volume flood's up to the shared
    label-only convergence grace.

    Inputs stay host-resident (numpy); per-chunk uploads are the field
    (f32), markers (int32), and the HOST-rounded int8 flows; downloads are
    the decoded labels of changed chunks plus two state frames per chunk
    boundary.  Reference scale contract: ``dcc_detect_goes.py:42-45,153``
    (2500x1500 CONUS, 288+ frames) cannot hold state+field+flows in 16 GB
    of HBM at once."""
    import time as _time

    field_np = np.asarray(getattr(field, "values", field), np.float32)
    markers_np = np.asarray(getattr(markers, "values", markers)).astype(
        np.int32
    )
    t, h, w = field_np.shape
    mask_np = (
        None
        if mask is None
        else np.asarray(getattr(mask, "values", mask)).astype(bool)
    )

    fwd_i8 = np.clip(
        np.round(np.asarray(getattr(forward_flow, "values", forward_flow))),
        -127, 127,
    ).astype(np.int8)
    bwd_i8 = np.clip(
        np.round(np.asarray(getattr(backward_flow, "values", backward_flow))),
        -127, 127,
    ).astype(np.int8)

    if radius is None:
        cov = float(_os.environ.get("TFT_WS_BAND_COVERAGE", "1.0"))
        if cov >= 1.0:
            # full band coverage (see _band_radius_from_stats): exact masked
            # max of the rounded displacements, frame-chunked to bound temps
            mx = 0
            for f in (fwd_i8, bwd_i8):
                for k in range(t):
                    m = np.maximum(np.abs(f[k, ..., 0]), np.abs(f[k, ..., 1]))
                    if mask_np is not None:
                        m = m[mask_np[k]]
                    if m.size:
                        mx = max(mx, int(m.max()))
            radius = int(min(max(mx, 1), 21))
        else:
            # lossy percentile band: strided sample of the masked rounded
            # displacement magnitudes
            step = max(1, (t * h * w) // 4_000_000)
            mags = []
            for f in (fwd_i8, bwd_i8):
                m = np.maximum(
                    np.abs(f[..., 0].ravel()[::step]),
                    np.abs(f[..., 1].ravel()[::step]),
                )
                if mask_np is not None:
                    m = m[mask_np.ravel()[::step]]
                mags.append(m)
            mm = np.concatenate(mags)
            q = float(np.percentile(mm, 100 * cov)) if mm.size else 1.0
            radius = int(min(int(q) + 2, 21))

    # same measured working-set estimate as the whole-volume gate (see
    # ``watershed``): each chunk's flood runs barrier-first too.  The flood
    # actually dispatches chunk_t + 2 frames (one frozen halo per side), so
    # size chunks by a per-dispatch frame cap that includes the halos.
    mixed = bool((markers_np < 0).any()) and bool((markers_np > 0).any())
    _bpx = 224 if mixed else 200
    frames_cap = max(4, int(budget // max(_bpx * h * w, 1)) - 2)
    n_chunks = max(1, -(-t // frames_cap))
    chunk_t = -(-t // n_chunks)
    n_chunks = -(-t // chunk_t)
    use_pallas = h * w >= 256 * 256 and _pallas_spatial_usable(h, w)
    run_scans = temporal_scan and any(dt != 0 for dt, _, _ in taps)

    labels_out = np.zeros((t, h, w), np.int32)
    sums_prev: dict = {}
    bound: dict = {}  # global frame index -> (claim, claim2, meta) np frames
    bound_ver: dict = {}  # global frame index -> content version counter
    flooded_ver: dict = {}  # chunk -> (left ver, right ver) at last flood

    # Global coarse solve: with frozen-halo block Gauss–Seidel, claim
    # refinements propagate ONE chunk per pass — measured as 8 ping-pong
    # passes x ~8 chunk re-floods on a 9-chunk CONUS volume (~7300 s,
    # BENCH_E2E_CONUS96_PARTIAL.json).  A spatially max-pooled WHOLE-TIME
    # coarse flood fits HBM even at CONUS scale (8x: ~3.4 GB) and carries
    # the cross-chunk information in one solve; passes >= 1 adopt it into
    # each chunk's initial state through the guarded `_ws_adopt_jit`
    # (deep-interior label-uniform territory only — same upper-bound
    # argument as the per-chunk V-cycle), so boundary conditions settle in
    # ~2 passes instead of ~n_chunks.
    gfactor = None
    if n_chunks >= 3:
        for f in (4, 8, 16):
            if (
                h // f >= 32
                and w // f >= 32
                and t * (h // f) * (w // f) * _bpx <= budget // 2
            ):
                gfactor = f
                break
    gpieces: dict = {}  # chunk -> host (cf, cmask, cmark, cfwd, cbwd)
    gstate = None  # host (claim, claim2, meta) of the solved coarse volume
    gmark = None

    for pass_i in range(max_passes):
        order = (
            range(n_chunks)
            if pass_i % 2 == 0
            else range(n_chunks - 1, -1, -1)
        )
        changed_any = False
        for ci in order:
            s, e = ci * chunk_t, min(t, (ci + 1) * chunk_t)
            # a chunk's flood is a deterministic function of its inputs, and
            # only the boundary-condition frames (bound[s-1], bound[e]) vary
            # between passes: skip chunks whose boundary conditions are
            # unchanged since their last flood.  Verification passes then
            # cost nothing, and partially-stable passes re-flood only the
            # chunks a neighbour actually perturbed.
            in_ver = (
                bound_ver.get(s - 1, 0) if s > 0 else -1,
                bound_ver.get(e, 0) if e < t else -1,
            )
            # pass 1 re-floods every chunk once when a global coarse state
            # exists: the adoption injects cross-chunk information the
            # boundary-version check cannot see
            force = pass_i == 1 and gstate is not None
            if flooded_ver.get(ci) == in_ver and not force:
                if _VERBOSE:
                    print(
                        f"[ws] chunk pass {pass_i} [{s}:{e}] unchanged "
                        "boundary conditions — skipped",
                        flush=True,
                    )
                continue
            lo = s - 1 if s > 0 else 0
            hi = e + 1 if e < t else e
            t0 = _time.perf_counter()
            fld = jnp.asarray(
                np.where(
                    np.isnan(field_np[lo:hi]), np.inf, field_np[lo:hi]
                )
            )
            mrk_np = markers_np[lo:hi]
            mrk = jnp.asarray(mrk_np)
            msk_c = (
                np.ones((hi - lo, h, w), bool)
                if mask_np is None
                else mask_np[lo:hi].copy()
            )
            if s > 0:
                msk_c[0] = False  # frozen boundary-condition frame
            if e < t:
                msk_c[-1] = False
            msk = jnp.asarray(msk_c)
            fwd_c = jnp.asarray(fwd_i8[lo:hi])
            bwd_c = jnp.asarray(bwd_i8[lo:hi])

            seeded = mrk_np != 0
            claim0 = np.where(seeded, -np.inf, np.inf).astype(np.float32)
            claim20 = claim0.copy()
            meta0 = np.where(
                seeded, mrk_np + 2, np.iinfo(np.int32).max
            ).astype(np.int32)
            if s > 0 and (s - 1) in bound:
                claim0[0], claim20[0], meta0[0] = bound[s - 1]
            if e < t and e in bound:
                claim0[-1], claim20[-1], meta0[-1] = bound[e]
            state = (
                jnp.asarray(claim0),
                jnp.asarray(claim20),
                jnp.asarray(meta0),
            )
            del claim0, claim20, meta0

            if pass_i == 0 and gfactor is not None:
                # piggyback on pass 0's uploads: pool this chunk's INTERIOR
                # frames for the global coarse problem (halo frames belong
                # to the neighbour)
                _i0, _i1 = s - lo, (e - 1) - lo
                piece = _ws_coarse_prep_jit(
                    fld[_i0 : _i1 + 1], mrk[_i0 : _i1 + 1],
                    msk[_i0 : _i1 + 1], fwd_c[_i0 : _i1 + 1],
                    bwd_c[_i0 : _i1 + 1], gfactor,
                )
                gpieces[ci] = tuple(np.asarray(x) for x in piece[:5])
            if gstate is not None:
                # warm-start from the solved global coarse volume (passes
                # >= 1): guarded deep-interior adoption; halo frames are
                # masked out so boundary conditions survive untouched
                state = _ws_adopt_jit(
                    tuple(jnp.asarray(a[lo:hi]) for a in gstate),
                    jnp.asarray(gmark[lo:hi]),
                    fld, mrk, msk, state, gfactor,
                )

            state = _flood_state(
                fld, mrk, msk, fwd_c, bwd_c, state, taps, radius,
                max_iters=min(
                    max_iters_cap
                    if max_iters_cap is not None
                    else (1 << 30),
                    int(hi - lo) + int(h) + int(w) + 32,
                ),
                chunk_iters=chunk_iters, grace=grace,
                use_pallas=use_pallas,
                run_scans=run_scans and (hi - lo) >= 4,
                multigrid=multigrid,
            )

            # boundary-condition frames for the neighbours: this chunk's
            # FIRST/LAST interior frames (= their halo frames)
            i0 = s - lo
            i1 = (e - 1) - lo
            for key, idx, has in (
                (s, i0, s > 0),
                (e - 1, i1, e < t),
            ):
                if not has:
                    continue
                new_b = tuple(np.asarray(a[idx]) for a in state)
                old_b = bound.get(key)
                if old_b is None or not all(
                    np.array_equal(x, y) for x, y in zip(new_b, old_b)
                ):
                    changed_any = True
                    bound_ver[key] = bound_ver.get(key, 0) + 1
                bound[key] = new_b
            flooded_ver[ci] = in_ver

            lab = _ws_decode_jit(state[2], mrk, msk)
            sums = np.asarray(_ws_chunk_sums_jit(lab[i0 : i1 + 1]))
            if not np.array_equal(sums, sums_prev.get(ci)):
                changed_any = True
                sums_prev[ci] = sums
                labels_out[s:e] = np.asarray(lab[i0 : i1 + 1])
            if _VERBOSE:
                print(
                    f"[ws] chunk pass {pass_i} [{s}:{e}] radius={radius} "
                    f"{_time.perf_counter() - t0:.1f}s",
                    flush=True,
                )
            del state, lab, fld, mrk, msk, fwd_c, bwd_c
            # Collect the chunk's dead jax arrays NOW: their host-side
            # transfer shadows otherwise accumulate ~1 GB per chunk-flood
            # (measured 130.7 GB anon RSS — a host OOM — 7.9 passes into a
            # CONUS-96 thick flood, BENCH_E2E_CONUS96_PARTIAL.json).
            from tobac_flow_tpu.utils.profiling import release_host_memory

            release_host_memory()

        if pass_i == 0 and gfactor is not None and gpieces:
            # solve the assembled whole-time coarse volume on device
            t0 = _time.perf_counter()
            parts = [gpieces[c] for c in sorted(gpieces)]
            gcf = np.concatenate([p[0] for p in parts])
            gcmask = np.concatenate([p[1] for p in parts])
            gmark = np.concatenate([p[2] for p in parts])
            gcfwd = np.concatenate([p[3] for p in parts])
            gcbwd = np.concatenate([p[4] for p in parts])
            gpieces.clear()
            seedg = gmark != 0
            gc0 = np.where(seedg, -np.inf, np.inf).astype(np.float32)
            gm0 = np.where(
                seedg, gmark + 2, np.iinfo(np.int32).max
            ).astype(np.int32)
            gs = _flood_state(
                jnp.asarray(gcf), jnp.asarray(gmark), jnp.asarray(gcmask),
                jnp.asarray(gcfwd), jnp.asarray(gcbwd),
                (jnp.asarray(gc0), jnp.asarray(gc0.copy()), jnp.asarray(gm0)),
                taps, max(radius // gfactor, 1),
                max_iters=t + (h // gfactor) + (w // gfactor) + 32,
                chunk_iters=chunk_iters, grace=grace, use_pallas=False,
                run_scans=run_scans, multigrid=True,
            )
            gstate = tuple(np.asarray(a) for a in gs)
            del gs, gcf, gcmask, gcfwd, gcbwd, gc0, gm0
            from tobac_flow_tpu.utils.profiling import release_host_memory

            release_host_memory()
            if _VERBOSE:
                print(
                    f"[ws] global coarse solve (factor {gfactor}): "
                    f"{_time.perf_counter() - t0:.1f}s",
                    flush=True,
                )
        if not changed_any:
            break
    if return_device:
        # at this scale callers stream host chunks; hand back host labels
        return labels_out
    return labels_out


def watershed(
    forward_flow,
    backward_flow,
    field,
    markers,
    mask=None,
    connectivity=1,
    max_iters: int | None = None,
    chunk_iters: int = 16,
    radius: int | None = None,
    return_device: bool = False,
    multigrid: bool = True,
    grace: int = 2,
    temporal_scan: bool = True,
):
    """Watershed segmentation of a (T, H, W) sequence in the moving frame
    (API parity: reference ``watershed.py:17-168``).

    Parameters
    ----------
    forward_flow, backward_flow : (T, H, W, 2) flow fields (x, y channels).
    field : (T, H, W) topography to flood (NaN treated as +inf barriers).
    markers : (T, H, W) int seeds; negative markers flood as barriers and can
        be removed by the caller afterwards (reference ``detection.py:570``).
    mask : optional bool array; False pixels are never flooded.
    connectivity : int (1..3) or explicit (3,3,3) structuring element.
    max_iters : total sweep-round cap; defaults to T + H + W + 32.
    chunk_iters : sweep rounds per device dispatch (long single programs trip
        remote-worker watchdogs; convergence is checked between chunks).
    radius : band radius for the flow-displaced temporal gathers; None
        (default) adapts it to the actual maximum rounded flow.
    temporal_scan : run forward/backward Gauss–Seidel scan rounds over the
        time axis before the Jacobi convergence loop (same fixed point,
        O(1) instead of O(T) rounds to traverse the axis; see
        ``_watershed_scan_round``).
    """
    # HBM-bounded dispatch: the whole-volume flood's working set is ~40
    # bytes/px (packed state x3, field, markers, int8 flows, plus the banded
    # scatter's lane temporaries); above the budget (a 16 GB chip cannot
    # hold a 2500x1500x288 CONUS day) the flood runs in overlapping time
    # chunks with frozen boundary-condition frames — block Gauss–Seidel over
    # the time axis, the single-chip analogue of the mesh-sharded
    # reconciliation (parallel/watershed.py) and of the reference's own
    # padded file chunking (dcc_detect_goes.py:153).  Checked BEFORE any
    # device conversion: the whole volume must never be uploaded at once.
    _shape = np.shape(getattr(field, "values", field))
    hbm_budget = int(_os.environ.get("TFT_WS_HBM_BUDGET_BYTES", 10 << 30))
    _mk = getattr(markers, "values", markers)
    if isinstance(_mk, np.ndarray):
        _mixed = bool((_mk < 0).any()) and bool((_mk > 0).any())
    else:  # device-resident markers (fused path): two scalar readbacks
        _mixed = bool(jnp.any(_mk < 0)) and bool(jnp.any(_mk > 0))
    # Working-set estimate, MEASURED via AOT memory_analysis of the sweeps
    # program at full-band radius 21 (13x1500x2500: temp 8.33 GB, args
    # 1.25 GB => ~197 B/px; 18 frames: 11.52+1.73 GB => ~196 B/px): the
    # banded temporal scatter's two-lane fori carries dominate.  Mixed
    # -1/positive markers add the barrier-first pre-flood's extra live
    # state (outer packed state + neg markers, ~24 B/px).  The old 40/96
    # estimates let a 113 Mpx whole-volume flood through that needed
    # ~22 GB — the round-4 OOM on the 16 GB chip.
    _bytes_px = 224 if _mixed else 200
    if (
        len(_shape) == 3
        and int(np.prod(_shape)) * _bytes_px > hbm_budget
        and _shape[0] >= 12
    ):
        structure = connectivity_structure(connectivity)
        return _watershed_time_chunked(
            forward_flow, backward_flow, field, markers, mask,
            _structure_taps_3d(structure), radius,
            max_iters_cap=max_iters, chunk_iters=chunk_iters, grace=grace,
            multigrid=multigrid, temporal_scan=temporal_scan,
            budget=hbm_budget, return_device=return_device,
        )

    # keep device arrays on device: all preprocessing is jnp (a host numpy
    # round-trip here costs ~GBs of transfer on GOES-scale windows)
    field_j = jnp.asarray(getattr(field, "values", field), dtype=jnp.float32)
    markers_j = jnp.asarray(getattr(markers, "values", markers)).astype(jnp.int32)
    if markers_j.shape != field_j.shape:
        raise ValueError(
            f"`markers` (shape {markers_j.shape}) must have same shape as "
            f"`image` (shape {field_j.shape})"
        )
    if mask is None:
        mask_j = jnp.ones(field_j.shape, dtype=bool)
    else:
        mask_j = jnp.asarray(getattr(mask, "values", mask)).astype(bool)
        if mask_j.shape != field_j.shape:
            raise ValueError(
                f"`mask` (shape {mask_j.shape}) must have same shape "
                f"as `image` (shape {field_j.shape})"
            )
    structure = connectivity_structure(connectivity)
    taps = _structure_taps_3d(structure)
    if max_iters is None:
        max_iters = int(sum(field_j.shape)) + 32

    # rounded displacements fit int8 (flow is clipped to ±20 px upstream,
    # reference flow.py:60-61) — at GOES-day scale the int32 form alone was
    # 1.8 GB of HBM.  The whole prep runs as ONE program: on the remote-TPU
    # rig every eager jnp op is its own (per-process) compile, and this
    # block alone was ~30 mini-programs of first-dispatch latency.
    field_j, fwd_int, bwd_int, state, band_stats = _ws_prep_jit(
        field_j,
        markers_j,
        mask_j,
        device_put_cached(forward_flow),
        device_put_cached(backward_flow),
    )
    if radius is None:
        # adaptive band radius (one small readback; compile cache is keyed
        # per radius value).  Only masked pixels can ever push a label
        # (unmasked sources carry +inf cost), so the exceedance curve is
        # taken over the mask — the flow over empty background is Farneback
        # noise with a fat tail that would otherwise inflate the band 2-3x.
        # Coverage must be FULL by default: the banded scatter DROPS
        # out-of-band pushes (see _banded_scatter_min — clipping would
        # create phantom adjacency), so a 99th-percentile band amputates
        # the reference graph's temporal edges exactly at the fast-moving
        # anvil fringe, measured as the thin-anvil flood ceding 2731 px of
        # exact-tie territory to the -1 barrier on the 12x192x256 parity
        # scene (THIN_GAP_PROBE.json: gap 2731 -> 125 px at full band).
        # TFT_WS_BAND_COVERAGE=0.99 restores the lossy band for speed A/Bs.
        radius = _band_radius_from_stats(np.asarray(band_stats))

    t, h, w = field_j.shape
    # the Pallas time-tiled sweep kernel pays off once a frame outgrows its
    # block size; below that the XLA sweeps win on dispatch overhead
    use_pallas = h * w >= 256 * 256 and _pallas_spatial_usable(h, w)

    run_scans = (
        temporal_scan
        and t >= 4
        and any(dt != 0 for dt, _, _ in taps)
    )

    state = _flood_state(
        field_j, markers_j, mask_j, fwd_int, bwd_int, state, taps, radius,
        max_iters=max_iters, chunk_iters=chunk_iters, grace=grace,
        use_pallas=use_pallas, run_scans=run_scans, multigrid=multigrid,
    )

    if _os.environ.get("TFT_WS_DUMP_STATE"):
        np.savez(
            _os.environ["TFT_WS_DUMP_STATE"],
            claim=np.asarray(state[0]),
            claim2=np.asarray(state[1]),
            meta=np.asarray(state[2]),
        )
    out = _ws_decode_jit(state[2], markers_j, mask_j)
    if return_device:
        return out
    return np.array(out)
