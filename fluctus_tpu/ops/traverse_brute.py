"""Brute-chunk streamed traversal — the r4 beyond-VMEM redesign.

The r2/r3 treelet forest (ops/traverse_forest.py) ran a per-lane stack
traversal inside each streamed chunk; measured on hardware its per-visit
cost was dominated by (a) the leaf one-hot matmul, whose FLOPs are
proportional to the WHOLE chunk's triangle count regardless of how few
leaves a lane touches, and (b) a ~1.4 ms fixed floor per pallas_call on
this toolchain (scripts/probe_pallas_floor.py) times 12 scheduling
rounds. This kernel removes both:

  * Chunks carry NO hierarchy: a visit Möller-tests every triangle of
    the chunk as (blk, tile) VPU planes — the same O(tris_chunk * blk)
    work the one-hot matmul already paid, minus the stack walk, the
    divergence, and the bf16 table encode. Per-visit cost scales
    linearly DOWN with chunk size (the treelet kernel's could not).
  * The kernel computes each lane's NEXT chunks itself from the chunk
    AABB table resident in VMEM (slab test over all C chunks as
    (blk, Cp) planes), so the per-round XLA rescan/argmin disappears
    and — crucially — all entry-distance comparisons live in ONE float
    semantics domain (Mosaic's), making the (entry, id) cursor walk
    self-consistent. A "scout" launch (sel = -1: no visit, cursor
    (-inf, -1)) produces the first next-chunk lists.
  * Rounds visit M chunks per ray per launch (M ramps, e.g. 1,2,4):
    a ray occupies M slots, each slot seeded with the round-start best;
    results min-merge. This collapses the r3 12-round walk to ~3
    launches — each launch costs the fixed pallas floor, so round
    count, not per-visit work, dominated the old design.

Reference analogue: src/bvh.cl:234-310 traverses one global-memory BVH
per thread; src/bvh.cl:253-279's leaf loop is here promoted to the
whole chunk. Scheduling (sort rays by next chunk, pad segments to block
multiples so every kernel block holds ONE chunk) follows the r3
work-queue (ops/traverse_forest.py _run_workqueue).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluctus_tpu.core.types import BruteForest
from fluctus_tpu.ops.traverse_mxu import TRI_EPS, Traversal

# module defaults, env-overridable for hardware sweeps
# (scripts/sweep_brute.py): rays/block, visits-per-ray round plan (last
# entry repeats in the drain loop), next-chunk lookahead, smallest
# width-shrinking phase
BLK = int(os.environ.get("FLUCTUS_BRUTE_BLK", "128"))
PLAN = tuple(int(x) for x in
             os.environ.get("FLUCTUS_BRUTE_PLAN", "1,2,4").split(","))
MM = int(os.environ.get("FLUCTUS_BRUTE_MM", str(max(max(PLAN), 4))))
MIN_PHASE_W = int(os.environ.get("FLUCTUS_BRUTE_PHASE_W", "1024"))
# plain Python floats: jnp scalars would be captured as pallas constants
_INF = float("inf")
_BIG = 3.0e38


def _safe_inv(d):
    return 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                           jnp.where(d < 0, -1e-20, 1e-20), d)


# ---------------------------------------------------------------------------
# kernel

def _kernel(sel_ref, tris_ref, boxes_ref, rays_ref,
            it_ref, ip_ref, iu_ref, iv_ref,
            ot_ref, op_ref, ou_ref, ov_ref, onc_ref,
            any_hit: bool, blk: int, tt: int, mm: int, c_real: int):
    f32 = jnp.float32
    i32 = jnp.int32
    b = pl.program_id(0)
    c_id = sel_ref[b]             # chunk this block visits; -1 = scout
    scout = c_id < 0
    tp = tris_ref.shape[2]
    cp = boxes_ref.shape[1]
    nt = tp // tt

    best_t = it_ref[:, :]
    best_p = ip_ref[:, :]
    best_u = iu_ref[:, :]
    best_v = iv_ref[:, :]

    # seed all outputs first; fully-dead blocks (the sort clusters dead
    # padding slots at the grid tail) then skip EVERY vector op below —
    # without this, pad blocks paid the full C-wide slab + next-chunk
    # scan (measured dominant at m=4 round caps)
    ot_ref[:, :] = best_t
    op_ref[:, :] = best_p
    ou_ref[:, :] = best_u
    ov_ref[:, :] = best_v
    onc_ref[:, :] = jnp.full((blk, mm), -1, i32)

    alive_in = best_p <= 0 if any_hit else jnp.full((blk, 1), True)
    block_live = jnp.any((best_t > 0.0) & alive_in)

    @pl.when(block_live)
    def _run():
        _kernel_body(c_id, tris_ref, boxes_ref, rays_ref, it_ref,
                     ot_ref, op_ref, ou_ref, ov_ref, onc_ref,
                     best_t, best_p, best_u, best_v,
                     any_hit, blk, tt, mm, c_real)


def _kernel_body(c_id, tris_ref, boxes_ref, rays_ref, it_ref,
                 ot_ref, op_ref, ou_ref, ov_ref, onc_ref,
                 best_t, best_p, best_u, best_v,
                 any_hit: bool, blk: int, tt: int, mm: int, c_real: int):
    f32 = jnp.float32
    i32 = jnp.int32
    scout = c_id < 0
    tp = tris_ref.shape[2]
    cp = boxes_ref.shape[1]
    nt = tp // tt

    ox = rays_ref[:, 0:1]
    oy = rays_ref[:, 1:2]
    oz = rays_ref[:, 2:3]
    dx = rays_ref[:, 3:4]
    dy = rays_ref[:, 4:5]
    dz = rays_ref[:, 5:6]
    ix = _safe_inv(dx)
    iy = _safe_inv(dy)
    iz = _safe_inv(dz)

    # slab test of ALL chunk AABBs: (blk, Cp) component planes. Used both
    # for this block's chunk entry (one-hot the c_id lane) and for the
    # per-lane next-chunk selection — one float-semantics domain, so the
    # (entry, id) cursor walk across rounds is exactly self-consistent.
    lox = boxes_ref[0:1, :]
    loy = boxes_ref[1:2, :]
    loz = boxes_ref[2:3, :]
    hix = boxes_ref[3:4, :]
    hiy = boxes_ref[4:5, :]
    hiz = boxes_ref[5:6, :]
    t0x = (lox - ox) * ix
    t1x = (hix - ox) * ix
    t0y = (loy - oy) * iy
    t1y = (hiy - oy) * iy
    t0z = (loz - oz) * iz
    t1z = (hiz - oz) * iz
    tmn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                  jnp.minimum(t0y, t1y)),
                      jnp.minimum(t0z, t1z))
    tmx = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                  jnp.maximum(t0y, t1y)),
                      jnp.maximum(t0z, t1z))
    # pad chunks (cid >= c_real) masked explicitly: the min/max slab test
    # is insensitive to an inverted lo/hi sentinel box
    cid_iota = jax.lax.broadcasted_iota(i32, (blk, cp), 1)
    hitc = (tmx >= 0.0) & (tmn <= tmx) & (cid_iota < c_real)
    e_all = jnp.where(hitc, jnp.maximum(tmn, 0.0), _INF)   # (blk, Cp)

    my_e = jnp.min(jnp.where(cid_iota == c_id, e_all, _INF), axis=1,
                   keepdims=True)
    live = ~scout & (my_e < best_t) & (best_t > 0.0)
    if any_hit:
        live = live & (best_p <= 0)

    @pl.when(jnp.any(live))
    def _():
        def tile(i, s):
            bt, bp, bu, bv = s
            ds = pl.ds(i * tt, tt)
            ax = tris_ref[0, 0:1, ds]
            ay = tris_ref[0, 1:2, ds]
            az = tris_ref[0, 2:3, ds]
            e1x = tris_ref[0, 3:4, ds]
            e1y = tris_ref[0, 4:5, ds]
            e1z = tris_ref[0, 5:6, ds]
            e2x = tris_ref[0, 6:7, ds]
            e2y = tris_ref[0, 7:8, ds]
            e2z = tris_ref[0, 8:9, ds]
            tidp = tris_ref[0, 9:10, ds]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            ok = jnp.abs(det) >= TRI_EPS
            idet = 1.0 / jnp.where(ok, det, 1.0)
            tvx = ox - ax
            tvy = oy - ay
            tvz = oz - az
            u = (tvx * px + tvy * py + tvz * pz) * idet
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            v = (dx * qx + dy * qy + dz * qz) * idet
            t = (e2x * qx + e2y * qy + e2z * qz) * idet
            ok = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) \
                & (u + v <= 1.0) & (t >= 0.0) & (t < bt) \
                & (tidp > 0.0) & live
            if any_hit:
                bp = jnp.maximum(
                    bp, jnp.max(ok.astype(i32), axis=1, keepdims=True))
                return bt, bp, bu, bv
            t_c = jnp.where(ok, t, _BIG)
            t_min = jnp.min(t_c, axis=1, keepdims=True)
            improved = t_min < bt
            lane = jax.lax.broadcasted_iota(i32, (blk, tt), 1)
            win = ok & (t_c == t_min)
            first = jnp.min(jnp.where(win, lane, tt), axis=1,
                            keepdims=True)
            sel_m = win & (lane == first)
            pick = lambda x: jnp.sum(jnp.where(sel_m, x, 0.0), axis=1,
                                     keepdims=True)
            bt = jnp.where(improved, t_min, bt)
            bp = jnp.where(improved,
                           pick(jnp.broadcast_to(tidp, (blk, tt)))
                           .astype(i32) - 1, bp)
            bu = jnp.where(improved, pick(u), bu)
            bv = jnp.where(improved, pick(v), bv)
            return bt, bp, bu, bv

        bt, bp, bu, bv = jax.lax.fori_loop(
            0, nt, tile, (best_t, best_p, best_u, best_v))
        ot_ref[:, :] = bt
        op_ref[:, :] = bp
        ou_ref[:, :] = bu
        ov_ref[:, :] = bv

    # --- per-lane next chunks after this visit. Cursor = (entry, id) of
    # the chunk just visited; scout or chunk-missed lanes fall back to
    # (-inf, c_id) which only over-includes (revisits are idempotent and
    # the cursor is strictly monotonic, so the walk still terminates).
    fin_t = ot_ref[:, :]
    fin_p = op_ref[:, :]
    eff_t = jnp.where(fin_p > 0, 0.0, it_ref[:, :]) if any_hit else fin_t
    cur_e = jnp.where(scout | (my_e == _INF), -_INF, my_e)
    cur_c = jnp.where(scout, -1, c_id)
    cand = hitc & (e_all < eff_t) & (
        (e_all > cur_e) | ((e_all == cur_e) & (cid_iota > cur_c)))
    for j in range(mm):
        e_j = jnp.min(jnp.where(cand, e_all, _INF), axis=1, keepdims=True)
        c_j = jnp.min(jnp.where(cand & (e_all == e_j), cid_iota,
                                jnp.int32(0x7FFFFFFF)),
                      axis=1, keepdims=True)
        got = e_j < _INF
        onc_ref[:, j:j + 1] = jnp.where(got, c_j, -1)
        cand = cand & ~((e_all == e_j) & (cid_iota == c_j) & got)


# ---------------------------------------------------------------------------
# launch

@functools.partial(jax.jit,
                   static_argnames=("any_hit", "blk", "tt", "mm", "c_real"))
def _launch(sel, tris, boxes_t, rays8, it, ip, iu, iv,
            any_hit: bool, blk: int, tt: int, mm: int, c_real: int):
    cap = rays8.shape[0]
    nb = cap // blk
    tp = tris.shape[2]
    cp = boxes_t.shape[1]
    kernel = functools.partial(_kernel, any_hit=any_hit, blk=blk, tt=tt,
                               mm=mm, c_real=c_real)
    col = lambda: pl.BlockSpec((blk, 1), lambda b, sel: (b, 0),
                               memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 16, tp),
                         lambda b, sel: (jnp.maximum(sel[b], 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cp), lambda b, sel: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 8), lambda b, sel: (b, 0),
                         memory_space=pltpu.VMEM),
            col(), col(), col(), col(),
        ],
        out_specs=(col(), col(), col(), col(),
                   pl.BlockSpec((blk, mm), lambda b, sel: (b, 0),
                                memory_space=pltpu.VMEM)),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((cap, 1), jnp.float32),
        jax.ShapeDtypeStruct((cap, 1), jnp.int32),
        jax.ShapeDtypeStruct((cap, 1), jnp.float32),
        jax.ShapeDtypeStruct((cap, 1), jnp.float32),
        jax.ShapeDtypeStruct((cap, mm), jnp.int32),
    )
    return pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=out_shapes)(
        sel, tris, boxes_t, rays8, it, ip, iu, iv)


# ---------------------------------------------------------------------------
# work-queue driver

def _round(bf: BruteForest, rays8, octant, state, m_r: int, any_hit: bool,
           blk: int, tt: int, mm: int):
    """One multi-visit round: every live ray visits its next m_r chunks.
    Slots (m-major: slot = m*bb + r) sort by (chunk, octant), each
    chunk's segment pads to a block multiple so every kernel block holds
    ONE chunk; per-slot results min-merge; the LAST valid slot's
    next-chunk list carries to the next round (its cursor is furthest)."""
    bt, bp, bu, bv, ncm = state
    bb = rays8.shape[0]
    c = bf.boxes.shape[0]
    s = m_r * bb
    # Cap the distinct chunks scheduled per round at nz and renumber the
    # active ones DENSELY: the padded-slot bound becomes s + nz*blk,
    # independent of C (at 6.3M tris C=3584 made the old C*blk term
    # 458k pad slots per 16k-ray round — 30x overhead, BASELINE r4c).
    # Rays whose chunk falls beyond the first nz distinct stay live with
    # an unmoved cursor and reschedule next round; the first nz distinct
    # chunks always carry rays, so every round makes progress.
    nz = min(c, int(os.environ.get("FLUCTUS_BRUTE_NZ",
                                   max(128, (2 * s) // blk))))
    cap = s + nz * blk
    nb = cap // blk

    nc_used = ncm[:, :m_r]                               # (bb, m_r)
    key = jnp.where(nc_used >= 0, nc_used, c)
    if m_r > 1 and nz < c:
        # The dense window must be built from FIRST-slot chunks only:
        # picking the nz smallest ids over ALL slots can fill the window
        # entirely with m>=1 slots while every ray's m=0 slot stays
        # outside — no cursor ever advances (prefix rule) and the round
        # loop spins forever (observed as a TPU watchdog kill at
        # C=1024+). Window = first nz distinct m=0 chunks; later slots
        # demote to dead unless their chunk is inside it.
        k0 = jnp.sort(key[:, 0])
        first0 = jnp.concatenate(
            [jnp.ones((1,), bool), k0[1:] != k0[:-1]]) & (k0 < c)
        dense0 = jnp.cumsum(first0.astype(jnp.int32)) - 1
        d0_key = jnp.where(k0 < c, dense0, jnp.int32(0x7FFFFFFF))
        w_start = jnp.searchsorted(
            d0_key, jnp.arange(nz, dtype=jnp.int32),
            side="left").astype(jnp.int32)
        wc = jnp.where(w_start < bb, k0[jnp.clip(w_start, 0, bb - 1)], c)
        pos_w = jnp.clip(jnp.searchsorted(wc, key), 0, nz - 1)
        member = wc[pos_w] == key
        key = jnp.where(member, key, c)
    keys = (key * 8 + octant[:, None]).T.reshape(-1)     # (S,) m-major
    order = jnp.argsort(keys).astype(jnp.int32)
    rank = jnp.argsort(order).astype(jnp.int32)
    ks = keys[order]
    ch_sorted = ks // 8
    live_s = ch_sorted < c                               # dead keys last
    first = live_s & jnp.concatenate(
        [jnp.ones((1,), bool), ch_sorted[1:] != ch_sorted[:-1]])
    dense = jnp.cumsum(first.astype(jnp.int32)) - 1      # per sorted elem

    dj = jnp.arange(nz, dtype=jnp.int32)
    dense_key = jnp.where(live_s, dense, jnp.int32(0x7FFFFFFF))
    starts_d = jnp.searchsorted(dense_key, dj,
                                side="left").astype(jnp.int32)
    ends_d = jnp.searchsorted(dense_key, dj,
                              side="right").astype(jnp.int32)
    count_d = ends_d - starts_d
    chunk_of = ch_sorted[jnp.clip(starts_d, 0, s - 1)]
    pc = -(-count_d // blk) * blk
    ps = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(pc)])

    bpos = jnp.arange(nb, dtype=jnp.int32) * blk
    cbd = jnp.clip(
        jnp.searchsorted(ps, bpos, side="right").astype(jnp.int32) - 1,
        0, nz - 1)
    sel = jnp.where(count_d[cbd] > 0,
                    jnp.clip(chunk_of[cbd], 0, c - 1), 0)
    s_idx = jnp.arange(cap, dtype=jnp.int32)
    d_slot = jnp.repeat(cbd, blk)
    j = s_idx - ps[d_slot]
    dead = (j < 0) | (j >= count_d[d_slot])
    src = jnp.where(dead, 0,
                    order[jnp.clip(starts_d[d_slot] + j, 0, s - 1)])
    ray = src % bb
    it = jnp.where(dead, 0.0, bt[ray])[:, None]
    ip = jnp.where(dead, 1 if any_hit else 0, bp[ray])[:, None]
    iu = bu[ray][:, None]
    iv = bv[ray][:, None]

    ot, op, ou, ov, onc = _launch(sel, bf.tris, bf.boxes_t, rays8[ray],
                                  it, ip, iu, iv, any_hit=any_hit,
                                  blk=blk, tt=tt, mm=mm, c_real=c)

    # merge the m_r slot results back per ray (only SCHEDULED slots —
    # dense id within this round's nz window). Hit results merge from
    # ANY scheduled slot (idempotent min), but the carried next-chunk
    # list may only advance along a PREFIX of scheduled slots: a ray's
    # 2nd-next chunk can land inside the nz window while its 1st-next
    # does not (dense order is by chunk id, next-lists by entry
    # distance), and taking the 2nd slot's cursor would walk PAST the
    # unvisited 1st chunk forever (caught by test_brute_dense_chunk_cap).
    prefix = jnp.ones((bb,), bool)
    for m in range(m_r):
        valid = nc_used[:, m] >= 0
        srnk = rank[m * bb + jnp.arange(bb, dtype=jnp.int32)]
        did = dense[srnk]
        # live_s guards window-demoted slots: their sorted position sits
        # in the dead region where the dense cumsum plateaus below nz
        sched = valid & live_s[srnk] & (did < nz)
        did_c = jnp.clip(did, 0, nz - 1)
        pos = jnp.clip(ps[did_c] + (srnk - starts_d[did_c]), 0, cap - 1)
        if any_hit:
            bp = jnp.where(sched, jnp.maximum(bp, op[pos, 0]), bp)
        else:
            better = sched & (ot[pos, 0] < bt)
            bt = jnp.where(better, ot[pos, 0], bt)
            bp = jnp.where(better, op[pos, 0], bp)
            bu = jnp.where(better, ou[pos, 0], bu)
            bv = jnp.where(better, ov[pos, 0], bv)
        use = sched & prefix
        ncm = jnp.where(use[:, None], onc[pos], ncm)
        prefix = use
    return bt, bp, bu, bv, ncm


def _run_workqueue(bf: BruteForest, orig, dir, t_vec, any_hit: bool,
                   blk: int, plan, mm: int, tt: int):
    bb = orig.shape[0]
    rays8 = jnp.concatenate(
        [orig, dir, jnp.zeros((bb, 2), jnp.float32)], axis=1)
    octant = ((dir[:, 0] < 0).astype(jnp.int32)
              | ((dir[:, 1] < 0).astype(jnp.int32) << 1)
              | ((dir[:, 2] < 0).astype(jnp.int32) << 2))

    # scout launch: no visit, emit each lane's first next-chunk list
    nb0 = bb // blk
    sel0 = jnp.full((nb0,), -1, jnp.int32)
    it0 = t_vec[:, None]
    ip0 = jnp.zeros((bb, 1), jnp.int32) if any_hit \
        else jnp.full((bb, 1), -1, jnp.int32)
    z = jnp.zeros((bb, 1), jnp.float32)
    ot, op, ou, ov, onc = _launch(sel0, bf.tris, bf.boxes_t, rays8,
                                  it0, ip0, z, z, any_hit=any_hit,
                                  blk=blk, tt=tt, mm=mm,
                                  c_real=bf.boxes.shape[0])
    state = (ot[:, 0], op[:, 0], ou[:, 0], ov[:, 0], onc)

    for m_r in plan[:-1]:
        state = _round(bf, rays8, octant, state, m_r, any_hit, blk, tt, mm)
    m_t = plan[-1]

    def live_count(s):
        return jnp.sum((s[4][:, 0] >= 0).astype(jnp.int32))

    # --- width-shrinking drain (r3c design): the tail rounds process a
    # few hundred live rays; running them at full width paid full-width
    # sorts/gathers and a full-size kernel grid every round. Guard rounds
    # at width w run only until the live set fits the next width, then
    # the live rays COMPACT (sort by liveness + slice — gather only, no
    # scatter; merged back by rank-gather at the end).
    widths = []
    w = bb
    while w // 4 >= max(blk, MIN_PHASE_W):
        w = max(blk, w // 4)
        widths.append(w)
    widths = widths[:2]

    # rounds are bounded by C per ray (each round advances every
    # scheduled ray's cursor by >= 1 chunk; >= 1 ray is always
    # scheduled); the hard cap is a safety net so a scheduling bug can
    # never spin the device into a watchdog kill (observed pre-fix when
    # the dense window starved every m=0 slot). If the cap fires with
    # rays still holding next-chunk cursors the walk is TRUNCATED (their
    # current best is returned); that case is surfaced via the
    # `exhausted` flag so tests/protocol runs can detect it instead of
    # silently accepting wrong closest hits / unblocked shadow rays.
    c = bf.boxes.shape[0]
    round_cap = jnp.int32(int(os.environ.get("FLUCTUS_BRUTE_ROUND_CAP",
                                             2 * c + 16)))
    exhausted = jnp.bool_(False)

    def drain(state, rays8_w, octant_w, w_next):
        def cond(s):
            r, st = s
            more = st[4][:, 0] >= 0
            n_live = jnp.sum(more.astype(jnp.int32))
            live_ok = (n_live > w_next) if w_next else (n_live > 0)
            return live_ok & (r < round_cap)

        def body(s):
            r, st = s
            return r + 1, _round(bf, rays8_w, octant_w, st, m_t, any_hit,
                                 blk, tt, mm)
        state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))[1]
        n_live = jnp.sum((state[4][:, 0] >= 0).astype(jnp.int32))
        # live rays beyond w_next here mean the cap fired (a width phase
        # would then drop them at compaction; the final phase w_next=0
        # would return them truncated)
        return state, n_live > w_next

    stack = []
    cur_rays, cur_oct = rays8, octant
    for w in widths:
        state, trunc = drain(state, cur_rays, cur_oct, w)
        exhausted = exhausted | trunc
        live = state[4][:, 0] >= 0
        order = jnp.argsort(jnp.where(live, 0, 1),
                            stable=True).astype(jnp.int32)
        rank = jnp.argsort(order).astype(jnp.int32)
        take = order[:w]
        stack.append((state, rank))
        state = tuple(a[take] for a in state)
        cur_rays = cur_rays[take]
        cur_oct = cur_oct[take]
    state, trunc = drain(state, cur_rays, cur_oct, 0)
    exhausted = exhausted | trunc

    # merge compacted results back out, innermost phase first
    for full_state, rank in reversed(stack):
        w = state[0].shape[0]
        inside = rank < w
        r_c = jnp.minimum(rank, w - 1)
        state = tuple(
            jnp.where(inside if a_full.ndim == 1 else inside[:, None],
                      a_sub[r_c], a_full)
            for a_full, a_sub in zip(full_state, state))
    return state[:4] + (exhausted,)


def _prep(orig, dir, t_max, blk):
    b = orig.shape[0]
    pad = (-b) % blk
    t_vec = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (b,))
    if pad:
        orig = jnp.concatenate(
            [orig, jnp.full((pad, 3), 3.0e37, orig.dtype)])
        dir = jnp.concatenate(
            [dir, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dir.dtype),
                                   (pad, 3))])
        t_vec = jnp.concatenate([t_vec, jnp.zeros((pad,), jnp.float32)])
    return orig, dir, t_vec, b


# ---------------------------------------------------------------------------
# r5 visit-list scheduler ("vlist"): ONE kernel launch per pass instead of
# the per-round argsort/gather/launch walk.
#
# Motivation (VERDICT r4 weak 1): the round loop paid ~7 ms of XLA
# scheduling (argsort pair + cap-sized gathers) plus the ~1.4 ms pallas
# floor PER ROUND, ~12 rounds — while the coherent config-4 protocol
# needs ~1 visit/ray. Here scheduling happens ONCE:
#   * rays sort by (first-hit chunk, octant) a single time;
#   * each kernel BLOCK gets a visit list = all chunks any of its lanes'
#     AABB-intersects, ordered front-to-back by block-min entry distance
#     (computed in XLA as an (nb, Cp) reduction — no per-lane (bb, Cp)
#     materialization);
#   * the launch walks grid steps (block, visit); consecutive visits of
#     one block keep ray/output tiles resident in VMEM (revisiting), and
#     padded visit slots repeat the previous chunk id so their table DMA
#     is elided by the pipeline;
#   * per-visit work prunes at TILE granularity: chunks carry per-tile
#     AABBs (tboxes, spatially re-ordered tris), so a visit Möller-tests
#     only tiles some live lane can still hit — the brute scan's
#     O(tris_chunk) per-visit floor drops to O(tris actually nearby).
# A while_loop reruns the launch for rank windows [kV, (k+1)V) until no
# block has a candidate chunk closer than its worst live lane — for
# coherent workloads exactly one pass runs.
#
# Reference analogue: src/bvh.cl:234-310 (one global-memory BVH per
# thread); the visit list plays the role of the traversal stack, hoisted
# to scheduling, and tiles play the role of leaves (bvh.cl:253-279).

V_PER = int(os.environ.get("FLUCTUS_BRUTE_V", "8"))
# Möller guard-group width in tiles; 0 = auto (group up to ~512 tris per
# guarded slice — the measured sweet spot between guard-step count and
# wasted Möller width)
GR = int(os.environ.get("FLUCTUS_BRUTE_GR", "0"))


def _resolve_gr(tt: int, tp: int) -> int:
    # ~1024 tris per guarded Möller slice: the measured sweet spot on the
    # 6.3M-tri protocol sweep (t128: g8 beats g1 2x and g32 1.4x on
    # primaries AND divergent bounces; t512: g2 best)
    gr = GR if GR > 0 else max(1, 1024 // tt)
    nt = tp // tt
    return next(g for g in (gr, 32, 16, 8, 4, 2, 1)
                if g <= gr and nt % g == 0)


def _vkernel(sel_ref, val_ref, tris_ref, tbox_ref, rays_ref,
             it_ref, ip_ref, iu_ref, iv_ref,
             ot_ref, op_ref, ou_ref, ov_ref,
             any_hit: bool, blk: int, tt: int, v_per: int, gr: int):
    i32 = jnp.int32
    i = pl.program_id(0)
    v = jax.lax.rem(i, v_per)
    first = v == 0

    # seed current best: first visit of a block reads the carried-in
    # state; later visits continue from the output tile resident in VMEM
    # (jnp.where is a select — stale VMEM garbage in the untaken branch
    # is safe)
    bt = jnp.where(first, it_ref[:, :], ot_ref[:, :])
    bp = jnp.where(first, ip_ref[:, :], op_ref[:, :])
    bu = jnp.where(first, iu_ref[:, :], ou_ref[:, :])
    bv = jnp.where(first, iv_ref[:, :], ov_ref[:, :])
    ot_ref[:, :] = bt
    op_ref[:, :] = bp
    ou_ref[:, :] = bu
    ov_ref[:, :] = bv

    alive = bp <= 0 if any_hit else jnp.full((blk, 1), True)
    run = (val_ref[i] > 0) & jnp.any((bt > 0.0) & alive)

    @pl.when(run)
    def _():
        _vkernel_body(tris_ref, tbox_ref, rays_ref,
                      ot_ref, op_ref, ou_ref, ov_ref,
                      bt, bp, any_hit, blk, tt, gr)


def _vkernel_body(tris_ref, tbox_ref, rays_ref,
                  ot_ref, op_ref, ou_ref, ov_ref,
                  bt, bp, any_hit: bool, blk: int, tt: int, gr: int):
    f32 = jnp.float32
    i32 = jnp.int32
    tp = tris_ref.shape[2]
    ntp = tbox_ref.shape[2]
    nt = tp // tt

    ox = rays_ref[:, 0:1]
    oy = rays_ref[:, 1:2]
    oz = rays_ref[:, 2:3]
    dx = rays_ref[:, 3:4]
    dy = rays_ref[:, 4:5]
    dz = rays_ref[:, 5:6]
    ix = _safe_inv(dx)
    iy = _safe_inv(dy)
    iz = _safe_inv(dz)

    # slab test of ALL tile AABBs of this chunk: (blk, NTp) planes. Pad
    # tiles carry inverted boxes (never hit).
    lox = tbox_ref[0, 0:1, :]
    loy = tbox_ref[0, 1:2, :]
    loz = tbox_ref[0, 2:3, :]
    hix = tbox_ref[0, 3:4, :]
    hiy = tbox_ref[0, 4:5, :]
    hiz = tbox_ref[0, 5:6, :]
    t0x = (lox - ox) * ix
    t1x = (hix - ox) * ix
    t0y = (loy - oy) * iy
    t1y = (hiy - oy) * iy
    t0z = (loz - oz) * iz
    t1z = (hiz - oz) * iz
    tmn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                  jnp.minimum(t0y, t1y)),
                      jnp.minimum(t0z, t1z))
    tmx = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                  jnp.maximum(t0y, t1y)),
                      jnp.maximum(t0z, t1z))
    alive = bp <= 0 if any_hit else jnp.full((blk, 1), True)
    cand = ((tmx >= 0.0) & (tmn <= tmx)
            & (jnp.maximum(tmn, 0.0) < bt) & (bt > 0.0) & alive)
    tile_any = jnp.any(cand, axis=0, keepdims=True)        # (1, NTp)
    lane = jax.lax.broadcasted_iota(i32, (1, ntp), 1)

    # Guard at GROUP granularity (gr consecutive tiles Möller-tested as
    # one wide slice when ANY of them is live). The trip count stays
    # STATIC (a traced-bound loop lowers to an unpipelined while —
    # measured 10x WORSE on incoherent visits); gr trades guard-step
    # count against Möller slice width: coherent visits want narrow
    # slices (1 live tile), divergent visits want few guards (most tiles
    # live anyway). gr is resolved by the launcher (see _resolve_gr).
    gr = next(g for g in (gr, 32, 16, 8, 4, 2, 1)
              if g <= gr and nt % g == 0)
    ng = nt // gr
    lane_g = lane // gr if gr > 1 else lane    # group id per tile column

    def group_step(g, _):
        # scalar group liveness via the one-hot sum trick (dynamic
        # per-element vector reads don't lower well on Mosaic)
        live_g = jnp.sum(jnp.where(lane_g == g,
                                   tile_any.astype(i32), 0)) > 0

        @pl.when(live_g)
        def _():
            cbt = ot_ref[:, :]
            cbp = op_ref[:, :]
            cbu = ou_ref[:, :]
            cbv = ov_ref[:, :]
            live = (cbt > 0.0)
            if any_hit:
                live = live & (cbp <= 0)
            nbt, nbp, nbu, nbv = _moller_tile(
                tris_ref, g, gr * tt, ox, oy, oz, dx, dy, dz, live,
                cbt, cbp, cbu, cbv, any_hit, blk)
            ot_ref[:, :] = nbt
            op_ref[:, :] = nbp
            ou_ref[:, :] = nbu
            ov_ref[:, :] = nbv
        return 0

    jax.lax.fori_loop(0, ng, group_step, 0)


def _moller_tile(tris_ref, i, tt, ox, oy, oz, dx, dy, dz, live,
                 bt, bp, bu, bv, any_hit: bool, blk: int):
    """Möller-test one tile of tt consecutive triangles against the block
    (shared by the round-loop kernel's tile loop and the vlist kernel)."""
    i32 = jnp.int32
    ds = pl.ds(i * tt, tt)
    ax = tris_ref[0, 0:1, ds]
    ay = tris_ref[0, 1:2, ds]
    az = tris_ref[0, 2:3, ds]
    e1x = tris_ref[0, 3:4, ds]
    e1y = tris_ref[0, 4:5, ds]
    e1z = tris_ref[0, 5:6, ds]
    e2x = tris_ref[0, 6:7, ds]
    e2y = tris_ref[0, 7:8, ds]
    e2z = tris_ref[0, 8:9, ds]
    tidp = tris_ref[0, 9:10, ds]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    ok = jnp.abs(det) >= TRI_EPS
    idet = 1.0 / jnp.where(ok, det, 1.0)
    tvx = ox - ax
    tvy = oy - ay
    tvz = oz - az
    u = (tvx * px + tvy * py + tvz * pz) * idet
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    v = (dx * qx + dy * qy + dz * qz) * idet
    t = (e2x * qx + e2y * qy + e2z * qz) * idet
    ok = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) \
        & (u + v <= 1.0) & (t >= 0.0) & (t < bt) \
        & (tidp > 0.0) & live
    if any_hit:
        bp = jnp.maximum(
            bp, jnp.max(ok.astype(i32), axis=1, keepdims=True))
        return bt, bp, bu, bv
    t_c = jnp.where(ok, t, _BIG)
    t_min = jnp.min(t_c, axis=1, keepdims=True)
    improved = t_min < bt
    lane = jax.lax.broadcasted_iota(i32, (blk, tt), 1)
    win = ok & (t_c == t_min)
    first = jnp.min(jnp.where(win, lane, tt), axis=1, keepdims=True)
    sel_m = win & (lane == first)
    pick = lambda x: jnp.sum(jnp.where(sel_m, x, 0.0), axis=1,
                             keepdims=True)
    bt = jnp.where(improved, t_min, bt)
    bp = jnp.where(improved,
                   pick(jnp.broadcast_to(tidp, (blk, tt)))
                   .astype(i32) - 1, bp)
    bu = jnp.where(improved, pick(u), bu)
    bv = jnp.where(improved, pick(v), bv)
    return bt, bp, bu, bv


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "blk", "tt", "v_per", "gr"))
def _vlaunch(sel, val, tris, tboxes, rays8, it, ip, iu, iv,
             any_hit: bool, blk: int, tt: int, v_per: int, gr: int = 1):
    cap = rays8.shape[0]
    nb = cap // blk
    tp = tris.shape[2]
    ntp = tboxes.shape[2]
    kernel = functools.partial(_vkernel, any_hit=any_hit, blk=blk, tt=tt,
                               v_per=v_per, gr=gr)
    bmap = lambda i, sel, val: (i // v_per, 0)
    col = lambda: pl.BlockSpec((blk, 1), bmap, memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb * v_per,),
        in_specs=[
            pl.BlockSpec((1, 16, tp), lambda i, sel, val: (sel[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, ntp), lambda i, sel, val: (sel[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 8), bmap, memory_space=pltpu.VMEM),
            col(), col(), col(), col(),
        ],
        out_specs=(col(), col(), col(), col()),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((cap, 1), jnp.float32),
        jax.ShapeDtypeStruct((cap, 1), jnp.int32),
        jax.ShapeDtypeStruct((cap, 1), jnp.float32),
        jax.ShapeDtypeStruct((cap, 1), jnp.float32),
    )
    return pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=out_shapes)(
        sel, val, tris, tboxes, rays8, it, ip, iu, iv)


def _chunk_entries_blockmin(boxes_t, orig, dir, t_per_lane, alive, blk):
    """(nb, Cp) block-min chunk entry distances + INF where no lane of
    the block can improve its current best inside the chunk. Computed as
    a lane reduction without materializing the (bb, Cp) per-lane matrix
    in HBM (XLA fuses the reshape-min)."""
    bb = orig.shape[0]
    nb = bb // blk
    ox, oy, oz = orig[:, 0:1], orig[:, 1:2], orig[:, 2:3]
    dx, dy, dz = dir[:, 0:1], dir[:, 1:2], dir[:, 2:3]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    lox, loy, loz = boxes_t[0:1, :], boxes_t[1:2, :], boxes_t[2:3, :]
    hix, hiy, hiz = boxes_t[3:4, :], boxes_t[4:5, :], boxes_t[5:6, :]
    t0x, t1x = (lox - ox) * ix, (hix - ox) * ix
    t0y, t1y = (loy - oy) * iy, (hiy - oy) * iy
    t0z, t1z = (loz - oz) * iz, (hiz - oz) * iz
    tmn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                  jnp.minimum(t0y, t1y)),
                      jnp.minimum(t0z, t1z))
    tmx = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                  jnp.maximum(t0y, t1y)),
                      jnp.maximum(t0z, t1z))
    e = jnp.maximum(tmn, 0.0)
    hit = (tmx >= 0.0) & (tmn <= tmx) & (e < t_per_lane[:, None]) \
        & alive[:, None]
    e = jnp.where(hit, e, _INF)
    cp = boxes_t.shape[1]
    return jnp.min(e.reshape(nb, blk, cp), axis=1)       # (nb, Cp)


def _first_chunk_key(boxes_t, orig, dir, t_per_lane):
    """Per-ray sort key: (nearest, second-nearest) intersected chunk ids
    packed as first*(C+1)+second (C+1 = none). Two-level clustering packs
    rays that share their whole candidate PREFIX into the same kernel
    block — the block's visit list is the union of its lanes' candidates,
    so shared prefixes directly cut visit count (measured the dominant
    cost on protocol primaries)."""
    cp = boxes_t.shape[1]
    ox, oy, oz = orig[:, 0:1], orig[:, 1:2], orig[:, 2:3]
    dx, dy, dz = dir[:, 0:1], dir[:, 1:2], dir[:, 2:3]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    lox, loy, loz = boxes_t[0:1, :], boxes_t[1:2, :], boxes_t[2:3, :]
    hix, hiy, hiz = boxes_t[3:4, :], boxes_t[4:5, :], boxes_t[5:6, :]
    t0x, t1x = (lox - ox) * ix, (hix - ox) * ix
    t0y, t1y = (loy - oy) * iy, (hiy - oy) * iy
    t0z, t1z = (loz - oz) * iz, (hiz - oz) * iz
    tmn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                  jnp.minimum(t0y, t1y)),
                      jnp.minimum(t0z, t1z))
    tmx = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                  jnp.maximum(t0y, t1y)),
                      jnp.maximum(t0z, t1z))
    e = jnp.maximum(tmn, 0.0)
    hit = (tmx >= 0.0) & (tmn <= tmx) & (e < t_per_lane[:, None])
    e = jnp.where(hit, e, _INF)
    first = jnp.argmin(e, axis=1).astype(jnp.int32) \
        + jnp.where(jnp.all(~hit, axis=1), cp, 0).astype(jnp.int32)
    cid = jax.lax.broadcasted_iota(jnp.int32, e.shape, 1)
    e2 = jnp.where(cid == first[:, None], _INF, e)
    second = jnp.argmin(e2, axis=1).astype(jnp.int32) \
        + jnp.where(jnp.all(e2 == _INF, axis=1), cp, 0).astype(jnp.int32)
    return first * (cp + 1) + second


def _run_vlist(bf: BruteForest, orig, dir, t_vec, any_hit: bool,
               blk: int, v_per: int, tt: int, gr: int = 0):
    bb = orig.shape[0]
    nb = bb // blk
    c = bf.boxes.shape[0]
    cp = bf.boxes_t.shape[1]
    gr_r = gr if gr > 0 else _resolve_gr(tt, bf.tris.shape[2])

    octant = ((dir[:, 0] < 0).astype(jnp.int32)
              | ((dir[:, 1] < 0).astype(jnp.int32) << 1)
              | ((dir[:, 2] < 0).astype(jnp.int32) << 2))
    key = _first_chunk_key(bf.boxes_t, orig, dir, t_vec) * 8 + octant
    order = jnp.argsort(key).astype(jnp.int32)
    rank = jnp.argsort(order).astype(jnp.int32)
    o_s, d_s, t_s = orig[order], dir[order], t_vec[order]
    rays8 = jnp.concatenate(
        [o_s, d_s, jnp.zeros((bb, 2), jnp.float32)], axis=1)

    # pass-window bookkeeping: per-block chunk ranking, once
    def ranked(bt_now, bp_now):
        alive = (bp_now <= 0) if any_hit else jnp.full((bb,), True)
        e_b = _chunk_entries_blockmin(bf.boxes_t, o_s, d_s, bt_now,
                                      alive, blk)
        cid = jax.lax.broadcasted_iota(jnp.int32, (nb, cp), 1)
        e_b = jnp.where(cid < c, e_b, _INF)
        sidx = jnp.argsort(e_b, axis=1).astype(jnp.int32)
        e_srt = jnp.take_along_axis(e_b, sidx, axis=1)
        # pad a full window of dead columns so dynamic_slice stays in
        # bounds on the last pass
        pad = jnp.full((nb, v_per), jnp.int32(0))
        sidx = jnp.concatenate([sidx, pad], axis=1)
        e_srt = jnp.concatenate(
            [e_srt, jnp.full((nb, v_per), _INF, jnp.float32)], axis=1)
        return sidx, e_srt

    bt0 = t_s
    bp0 = jnp.zeros((bb,), jnp.int32) if any_hit \
        else jnp.full((bb,), -1, jnp.int32)
    z0 = jnp.zeros((bb,), jnp.float32)
    sidx, e_srt = ranked(bt0, bp0)

    def block_limit(bt_now, bp_now):
        """Per-block pruning bound: worst (max) live-lane best-t."""
        if any_hit:
            lim = jnp.where(bp_now <= 0, bt_now, 0.0)
        else:
            lim = bt_now
        return jnp.max(lim.reshape(nb, blk), axis=1)     # (nb,)

    def cond(s):
        k, bt_c, bp_c, _, _ = s
        col = jax.lax.dynamic_slice(e_srt, (0, k * v_per), (nb, 1))[:, 0]
        return jnp.any(col < block_limit(bt_c, bp_c)) & (k * v_per < cp)

    def body(s):
        k, bt_c, bp_c, bu_c, bv_c = s
        sel_w = jax.lax.dynamic_slice(sidx, (0, k * v_per), (nb, v_per))
        e_w = jax.lax.dynamic_slice(e_srt, (0, k * v_per), (nb, v_per))
        valid = (e_w < block_limit(bt_c, bp_c)[:, None])
        # dead slots repeat the window's first chunk so the pipeline
        # elides their table DMA
        sel_w = jnp.where(valid, sel_w, sel_w[:, 0:1])
        ot, op, ou, ov = _vlaunch(
            sel_w.reshape(-1), valid.astype(jnp.int32).reshape(-1),
            bf.tris, bf.tboxes, rays8,
            bt_c[:, None], bp_c[:, None], bu_c[:, None], bv_c[:, None],
            any_hit=any_hit, blk=blk, tt=tt, v_per=v_per, gr=gr_r)
        return (k + 1, ot[:, 0], op[:, 0], ou[:, 0], ov[:, 0])

    _, bt, bp, bu, bv = jax.lax.while_loop(
        cond, body, (jnp.int32(0), bt0, bp0, z0, z0))

    # unsort
    return bt[rank], bp[rank], bu[rank], bv[rank]


def _fit_tile(tt: int, tp: int) -> int:
    """Largest divisor of the padded chunk width tp that is <= tt. The
    kernel's tile loop runs nt = tp // tt tiles; a non-divisor tt would
    silently skip the tail tile's triangles (ADVICE r4)."""
    import math
    tt = min(tt, tp)
    if tp % tt:
        tt = math.gcd(tt, tp)
    assert tt > 0 and tp % tt == 0
    return tt


def _use_vlist(bf: BruteForest) -> bool:
    return (bf.tboxes is not None
            and os.environ.get("FLUCTUS_BRUTE_SCHED", "vlist") == "vlist")


def _vlist_tile(bf: BruteForest) -> int:
    """The vlist kernel's Möller tile MUST equal the builder tile the
    per-tile AABBs were computed for (carried statically on the pytree)."""
    assert bf.tris.shape[2] % bf.tile == 0
    return int(bf.tile)


def traverse_closest(bf: BruteForest, orig, dir, t_max,
                     blk: int = BLK, plan=PLAN, mm: int = MM,
                     tt: int = 512, with_flag: bool = False):
    o, d, tv, b = _prep(orig, dir, t_max, blk)
    if _use_vlist(bf):
        bt, bp, bu, bv = _run_vlist(bf, o, d, tv, False, blk, V_PER,
                                    _vlist_tile(bf))
        exhausted = jnp.bool_(False)   # the pass loop is exhaustive
    else:
        tt = _fit_tile(tt, bf.tris.shape[2])
        bt, bp, bu, bv, exhausted = _run_workqueue(
            bf, o, d, tv, False, blk, tuple(plan), mm, tt)
    res = Traversal(bt[:b], bp[:b], bu[:b], bv[:b])
    return (res, exhausted) if with_flag else res


def traverse_any(bf: BruteForest, orig, dir, t_max,
                 blk: int = BLK, plan=PLAN, mm: int = MM,
                 tt: int = 512, with_flag: bool = False):
    o, d, tv, b = _prep(orig, dir, t_max, blk)
    if _use_vlist(bf):
        _, bp, _, _ = _run_vlist(bf, o, d, tv, True, blk, V_PER,
                                 _vlist_tile(bf))
        exhausted = jnp.bool_(False)
    else:
        tt = _fit_tile(tt, bf.tris.shape[2])
        _, bp, _, _, exhausted = _run_workqueue(
            bf, o, d, tv, True, blk, tuple(plan), mm, tt)
    blocked = bp[:b] > 0
    return (blocked, exhausted) if with_flag else blocked
