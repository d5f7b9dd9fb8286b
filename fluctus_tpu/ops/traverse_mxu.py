"""Per-lane stackless traversal with MXU one-hot gathers — incoherent rays.

The packet kernel (traverse_pallas.py) is optimal for coherent rays: one
shared stack, scalar row reads, dense VPU tests. For INCOHERENT rays
(bounce/NEE directions after the first hit) the packet's visited-node set is
the UNION over 512 lanes, which approaches the whole tree — each lane does
~tree-size work. Per-lane traversal fixes the work complexity but needs a
per-lane node fetch, and TPUs have no per-lane gather: XLA lowers one to a
latency-bound loop (~0.5 ms per step at 64k lanes, measured — see
traverse_wide.py).

This kernel makes the per-lane fetch DENSE instead: a gather of B rows from
a T-row VMEM table is a one-hot matmul — onehot(cur_node) @ table on the
MXU. Tables are stored TRANSPOSED, (rows, T) and (rows, L), so the matmul
result lands as (rows, BLK) and every per-lane scalar is a cheap static row
slice.

Exactness under the MXU's bf16 multiply path: Mosaic lowers default f32
dots on this hardware to a SINGLE bf16 pass, which truncates operands to 8
mantissa bits (measured: 27% wrong-prim rays on teapot — child indices
themselves were rounding). Rather than paying the ~6x multi-pass cost of
precision=HIGHEST, the tables are stored as bf16 in encodings the single
native pass gathers EXACTLY (a one-hot is bf16-exact, and the product of
two bf16 values is exact in the f32 accumulator):

  - child AABBs: conservatively rounded to bf16 (lo toward -inf, hi toward
    +inf). A slab test against a widened box can only ADD node visits,
    never skip a true intersection, so traversal results stay exact.
  - child refs / triangle ids: split into 8-bit integer chunks, each in
    [0, 255] and hence bf16-exact; reconstructed exactly in f32 by
    chunk_hi*256 + chunk_lo (< 2^24).
  - triangle vertices: exact 3-way bf16 split (Dekker-style): b1=bf16(x),
    b2=bf16(x-b1), b3=x-b1-b2 which has <= 8 significant bits left and is
    itself bf16-exact, so (b1+b2)+b3 reconstructs the f32 value bit-exactly
    (modulo subnormals, which never occur in scene geometry).

The traversal itself is a per-lane near-first STACK (the TPU form of the
reference's 64-entry local stack): pops and ordered pushes are one-hot
masked writes over a small static row axis — no dynamic per-lane indexing
anywhere. One step per node/leaf visit (a restart-trail variant measured
~2-3 steps per visit from parent re-tests and backtracks); each lane
visits exactly the nodes IT intersects (near-first, pruned by best-t), so
a block's step count is max-over-lanes instead of union-over-lanes.

Reference analogue: src/bvh.cl:234-310 per-thread stack traversal; this is
its TPU-native form for divergent rays.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluctus_tpu.core.types import WideBVH

# Block size trades divergence (total work = sum over blocks of
# blk * max_steps(block)) against sublane utilization of the (8, blk)
# child/slot tiles and amortization of per-step (blk,) scalar phases.
# With the component-major tables, 1024 measured fastest on both coherent
# and incoherent teapot rays (128: 12.0/4.1 ms per 131k rays, 1024:
# 8.4/3.5 ms); pre-rewrite the ordering was reversed.
BLK = 1024
TRI_EPS = 1e-12
BIG = 3.0e38
# child-slot tags (bf16-exact small ints)
TAG_INNER = 0.0
TAG_LEAF = 1.0
TAG_EMPTY = 2.0


class Traversal(NamedTuple):
    t: jnp.ndarray
    prim: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray


# Stack entries pack (pruning key | tag | index) into ONE i32:
#   bits 31..17: top 15 bits of the f32 entry tmin (clamped to >= 0, so the
#                sign bit is 0 and integer order == float order; truncation
#                only LOWERS the pruning key, which is conservative)
#   bit  16    : leaf flag
#   bits 15..0 : node/leaf index (< 2^16, enforced by _check_index_range)
# One packed stack halves the push/pop masked-write traffic vs separate
# ref + key planes, and rank ordering compares packed ints directly
# (distinct children always differ in the low 17 bits, so no tie logic).
_KEY_MASK = -0x20000       # 0xFFFE0000
_LEAF_BIT = 0x10000
_IDX_MASK = 0xFFFF
_INVALID = 0x7FFFFFFF


def _kernel(orig_ref, dir_ref, tmax_ref, nodes_ref, leaves_ref,
            out_t, out_prim, out_u, out_v,
            root_ref: int, leaf_width: int, lvl: int, any_hit: bool,
            blk: int, debug_steps: bool = False):
    f32 = jnp.float32
    i32 = jnp.int32
    bf16 = jnp.bfloat16
    t_nodes = nodes_ref.shape[1]
    l_leaves = leaves_ref.shape[1]
    w = leaf_width

    ox = orig_ref[0:1, :]
    oy = orig_ref[1:2, :]
    oz = orig_ref[2:3, :]
    dx = dir_ref[0:1, :]
    dy = dir_ref[1:2, :]
    dz = dir_ref[2:3, :]

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                               jnp.where(d < 0, -1e-20, 1e-20), d)

    ix = safe_inv(dx)
    iy = safe_inv(dy)
    iz = safe_inv(dz)

    # Per-lane traversal STACK (reference: the 64-entry local stack of
    # src/bvh.cl:234-310), one packed i32 entry per pending child; pops and
    # ordered pushes are one-hot masked writes over the static row axis. A
    # descend pops 1 and pushes <= 8 children, so worst-case occupancy is
    # 7 per ancestor level + 8.
    s_rows = -(-(7 * lvl + 9) // 8) * 8
    stk_iota = jax.lax.broadcasted_iota(i32, (s_rows, blk), 0)

    init = (
        jnp.ones((blk,), i32),                    # sp (root pre-pushed)
        jnp.where(stk_iota == 0, root_ref, 0),    # packed stack (key 0)
        tmax_ref[0, :],                           # best_t
        jnp.full((blk,), -1, i32),                # best_prim
        jnp.zeros((blk,), f32),                   # best_u
        jnp.zeros((blk,), f32),                   # best_v
        jnp.zeros((blk,), i32),                   # blocked
        jnp.int32(0),                             # step counter
    )

    def cond(s):
        return jnp.max(s[0]) > 0    # any_hit lanes zero sp when blocked

    def body(s):
        sp, stk, best_t, best_prim, best_u, best_v, blocked, steps = s
        act = sp > 0

        # ---- pop the stack top (sp==0 lanes match no row: sp-1 == -1)
        pop_oh = stk_iota == (sp - 1)[None, :]
        popped = jnp.sum(jnp.where(pop_oh, stk, 0), axis=0)
        key = jax.lax.bitcast_convert_type(popped & jnp.int32(_KEY_MASK),
                                           f32)
        sp = sp - act.astype(i32)
        # prune entries made stale by best-t improvements since push time
        live = act & (key < best_t)
        is_leaf = (popped & _LEAF_BIT) != 0
        idx = popped & _IDX_MASK
        do_node = live & ~is_leaf
        visit_leaf = live & is_leaf

        # ---- fetch node row: one-hot matmul gather (MXU, bf16 single pass;
        # exact by the table encoding, see module docstring). Inactive lanes
        # use index -1: matches no iota row, so no separate mask pass.
        cur = jnp.where(do_node, idx, -1)
        oh = (jax.lax.broadcasted_iota(i32, (t_nodes, blk), 0)
              == cur[None, :]).astype(bf16)
        rows = jax.lax.dot_general(
            nodes_ref[:, :], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)              # (72, BLK)

        # ---- slab tests for all 8 children at once on (8, BLK) tiles
        # (component-major table rows: children live on the sublane axis;
        # per-child (BLK,) vectors would run at 1/8 VPU utilization)
        lox = rows[0:8, :]
        loy = rows[8:16, :]
        loz = rows[16:24, :]
        hix = rows[24:32, :]
        hiy = rows[32:40, :]
        hiz = rows[40:48, :]
        t0x = (lox - ox) * ix
        t1x = (hix - ox) * ix
        t0y = (loy - oy) * iy
        t1y = (hiy - oy) * iy
        t0z = (loz - oz) * iz
        t1z = (hiz - oz) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.minimum(t0z, t1z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.maximum(t0z, t1z))
        tag = rows[48:56, :]
        cidx = (rows[56:64, :] * 256.0 + rows[64:72, :]).astype(i32)
        hit = (tmax >= 0.0) & (tmin <= tmax) & (tmin < best_t[None, :])
        valid = do_node[None, :] & hit & (tag != TAG_EMPTY)
        kb = jax.lax.bitcast_convert_type(jnp.maximum(tmin, 0.0), i32)
        packed = ((kb & jnp.int32(_KEY_MASK))
                  | jnp.where(tag == TAG_LEAF, _LEAF_BIT, 0) | cidx)
        packed = jnp.where(valid, packed, _INVALID)

        # ---- push hit children farthest-first so the nearest pops next:
        # rank r_j = count of valid children strictly deeper; packed ints
        # order like keys and are distinct, so no tie-break is needed
        for j in range(8):
            deeper = valid & (packed > packed[j:j + 1, :])
            r = jnp.sum(deeper.astype(i32), axis=0)
            row_j = jnp.where(valid[j, :], sp + r, -1)
            stk = jnp.where(stk_iota == row_j[None, :],
                            packed[j:j + 1, :], stk)
        sp = sp + jnp.sum(valid.astype(i32), axis=0)

        # ---- leaf: one-hot matmul gather + Möller over all W slots on
        # (W, BLK) tiles (slot-on-sublane layout, like the slab tests).
        # Runs unconditionally: wrapping it in lax.cond (to skip steps where
        # no lane visits a leaf) crashes this toolchain's Mosaic pipeline
        # with a layout check (`arr.size() >= layout_rank`).
        li = jnp.where(visit_leaf, idx, -1)
        oh_l = (jax.lax.broadcasted_iota(i32, (l_leaves, blk), 0)
                == li[None, :]).astype(bf16)
        lrows = jax.lax.dot_general(
            leaves_ref[:, :], oh_l, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)          # (30*W, BLK)

        def val(k):
            # exact f32 reconstruction from the 3-way bf16 split
            return ((lrows[k * w:(k + 1) * w, :]
                     + lrows[(9 + k) * w:(10 + k) * w, :])
                    + lrows[(18 + k) * w:(19 + k) * w, :])

        ax = val(0)
        ay = val(1)
        az = val(2)
        e1x = val(3)
        e1y = val(4)
        e1z = val(5)
        e2x = val(6)
        e2y = val(7)
        e2z = val(8)
        tc = 27 * w
        tid = (lrows[tc:tc + w, :] * 65536.0
               + lrows[tc + w:tc + 2 * w, :] * 256.0
               + lrows[tc + 2 * w:tc + 3 * w, :]).astype(i32) - 1
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
            & (u + v <= 1.0) & (t >= 0.0) & (t < best_t[None, :]) \
            & (tid >= 0) & visit_leaf[None, :]
        if any_hit:
            blocked = jnp.maximum(blocked, jnp.max(ok.astype(i32), axis=0))
            sp = jnp.where(blocked > 0, 0, sp)
        else:
            t_c = jnp.where(ok, t, BIG)
            t_min = jnp.min(t_c, axis=0)
            # gate on any(ok), NOT t_min < best_t: with t_max above the
            # BIG sentinel (trace_scene passes 3.4e38) the all-miss
            # sentinel itself would count as an "improvement" and write a
            # phantom prim-0 hit
            improved = jnp.max(ok.astype(i32), axis=0) > 0
            # first slot achieving the min (matches the sequential
            # strict-< update order of a slot loop)
            slot_iota = jax.lax.broadcasted_iota(i32, (w, blk), 0)
            win = ok & (t_c == t_min[None, :])
            first = jnp.min(jnp.where(win, slot_iota, w), axis=0)
            sel = win & (slot_iota == first[None, :])
            best_t = jnp.where(improved, t_min, best_t)
            best_prim = jnp.where(improved,
                                  jnp.sum(jnp.where(sel, tid, 0), axis=0),
                                  best_prim)
            best_u = jnp.where(improved,
                               jnp.sum(jnp.where(sel, u, 0.0), axis=0),
                               best_u)
            best_v = jnp.where(improved,
                               jnp.sum(jnp.where(sel, v, 0.0), axis=0),
                               best_v)

        return (sp, stk, best_t, best_prim, best_u, best_v, blocked,
                steps + 1)

    s = jax.lax.while_loop(cond, body, init)
    _, _, best_t, best_prim, best_u, best_v, blocked, steps = s
    out_t[0, :] = best_t
    out_prim[0, :] = blocked if any_hit else best_prim
    out_u[0, :] = best_u
    if debug_steps:
        out_v[0, :] = jnp.zeros((blk,), f32) + steps.astype(f32)
    else:
        out_v[0, :] = best_v


@functools.partial(jax.jit,
                   static_argnames=("root_ref", "leaf_width", "lvl",
                                    "any_hit", "blk", "debug_steps"))
def _launch(orig_t, dir_t, tmax_row, nodes_t, leaves_t,
            root_ref: int, leaf_width: int, lvl: int, any_hit: bool,
            blk: int, debug_steps: bool = False):
    b = orig_t.shape[1]
    grid = (b // blk,)
    kernel = functools.partial(_kernel, root_ref=root_ref,
                               leaf_width=leaf_width, lvl=lvl,
                               any_hit=any_hit, blk=blk,
                               debug_steps=debug_steps)
    out_shapes = (
        jax.ShapeDtypeStruct((1, b), jnp.float32),
        jax.ShapeDtypeStruct((1, b), jnp.int32),
        jax.ShapeDtypeStruct((1, b), jnp.float32),
        jax.ShapeDtypeStruct((1, b), jnp.float32),
    )
    blk_map = lambda i: (0, i)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec((3, blk), blk_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, blk), blk_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), blk_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, blk), blk_map, memory_space=pltpu.VMEM)
            for _ in range(4)),
    )(orig_t, dir_t, tmax_row, nodes_t, leaves_t)


def _trunc_bf16(x):
    """f32 value with the mantissa truncated to bf16's 8 bits (round toward
    zero), computed with INTEGER bit ops.

    Why not x.astype(bf16).astype(f32): this toolchain compiles with
    --xla_allow_excess_precision=true, which lets XLA ELIDE the
    down-up convert pair — `x - f32(bf16(x))` folds to 0 and conservative
    rounding checks silently pass. Bit masking cannot be elided."""
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jax.lax.bitcast_convert_type(i & jnp.int32(-65536), jnp.float32)


def _bf16_conservative(x, up: bool):
    """Round f32 -> bf16 toward +inf (up) or -inf (down): the result always
    bounds x from the requested side, so quantized AABBs only widen.
    Integer bit arithmetic throughout (see _trunc_bf16); stepping the
    truncated pattern by 0x10000 moves one bf16 ulp away from zero, with
    IEEE bit ordering carrying the exponent naturally (incl. up to inf)."""
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    masked = i & jnp.int32(-65536)
    t = jax.lax.bitcast_convert_type(masked, jnp.float32)
    inexact = (i & jnp.int32(65535)) != 0
    away = (x > 0) == up  # the bound lies away from zero
    stepped = jax.lax.bitcast_convert_type(masked + jnp.int32(65536),
                                           jnp.float32)
    out = jnp.where(inexact & away, stepped, t)
    return out.astype(jnp.bfloat16)  # exact: out has only high-16 bits


def _split3(x):
    """Exact 3-way bf16 split: returns (b1, b2, b3) with
    (f32(b1)+f32(b2))+f32(b3) == x bit-exactly (x normal f32; each residual
    subtraction is exact, and the final 8-bit residual is bf16-exact).
    Truncation-based (integer bit ops) so XLA's excess-precision pass
    cannot fold the residuals to zero — see _trunc_bf16."""
    b1 = _trunc_bf16(x)
    r1 = x - b1
    b2 = _trunc_bf16(r1)
    r2 = r1 - b2
    return (b1.astype(jnp.bfloat16), b2.astype(jnp.bfloat16),
            r2.astype(jnp.bfloat16))


@jax.jit
def mxu_tables(bvh: WideBVH):
    """Build the transposed bf16 gather tables (see module docstring).

    Layouts are COMPONENT-MAJOR so the kernel's post-gather math runs on
    (8, BLK)/(W, BLK) tiles with the child/slot axis on sublanes (per-child
    (BLK,) vectors would occupy one sublane each = 1/8 VPU utilization):

      nodes  (72, Tpad): rows [c*8 + child], c in 0..5 = lox loy loz hix
                         hiy hiz — conservative child boxes;
                         rows 48..55 child tag (0 inner / 1 leaf / 2 empty)
                         rows 56..63 child index high byte
                         rows 64..71 child index low byte
      leaves (30W, Lpad): rows [(s*9 + k)*W + slot], s in 0..2 — vertex
                         split planes, component k in 0..8;
                         rows [27W + c*W + slot] — (tid+1) byte chunks
                         (pad rows are all-zero => tid -1).

    Indices are byte-chunked so the single-pass bf16 matmul gathers them
    exactly; callers guarantee node/leaf counts < 2^16 (fits_vmem bounds
    them far lower)."""
    boxes = bvh.nodes[:, 0:48].reshape(-1, 8, 6)
    # empty child slots are +inf sentinels (accel/wide.py); a matmul gather
    # would turn them into NaN columns (0 * inf). Rewrite empty slots as far
    # finite point boxes (min/max slab tests ignore box inversion, so an
    # inverted box would HIT everything) and tag them TAG_EMPTY.
    empty = ~jnp.isfinite(boxes[:, :, 0:1])
    far_point = jnp.full((6,), 3e37, jnp.float32)
    boxes = jnp.where(empty, far_point, boxes)
    lo_q = _bf16_conservative(boxes[:, :, 0:3], up=False)
    hi_q = _bf16_conservative(boxes[:, :, 3:6], up=True)
    boxes_q = jnp.concatenate([lo_q, hi_q], axis=2)         # (T, 8, 6)
    boxes_cm = jnp.swapaxes(boxes_q, 1, 2).reshape(-1, 48)  # rows c*8+child

    refs = jax.lax.bitcast_convert_type(bvh.nodes[:, 48:56], jnp.int32)
    is_leaf = refs < 0
    idx = jnp.where(is_leaf, ~refs, refs)
    emp = empty[:, :, 0]
    tag = jnp.where(emp, 2, jnp.where(is_leaf, 1, 0))
    idx = jnp.where(emp, 0, idx)
    extra = jnp.concatenate([tag, idx >> 8, idx & 255],
                            axis=1).astype(jnp.bfloat16)
    nodes = jnp.concatenate([boxes_cm, extra], axis=1)      # (T, 72) bf16
    n_pad = (-nodes.shape[0]) % 128
    nodes = jnp.pad(nodes, ((0, n_pad), (0, 0)))

    lv = bvh.leaves                                         # (L, W, 10)
    n_l, w = lv.shape[0], lv.shape[1]
    b1, b2, b3 = _split3(lv[:, :, 0:9])
    tid = jax.lax.bitcast_convert_type(lv[:, :, 9], jnp.int32)
    enc = tid + 1                                           # pad slots -> 0
    chunks = jnp.stack([enc >> 16, (enc >> 8) & 255, enc & 255],
                       axis=1).astype(jnp.bfloat16)         # (L, 3, W)
    leaves = jnp.concatenate(
        [jnp.swapaxes(b1, 1, 2).reshape(n_l, -1),
         jnp.swapaxes(b2, 1, 2).reshape(n_l, -1),
         jnp.swapaxes(b3, 1, 2).reshape(n_l, -1),
         chunks.reshape(n_l, -1)], axis=1)                  # (L, 30W) bf16
    l_pad = (-leaves.shape[0]) % 128
    leaves = jnp.pad(leaves, ((0, l_pad), (0, 0)))
    return nodes.T, leaves.T


def _tables(bvh: WideBVH):
    """Precomputed tables when the scene carries them (built once at
    upload); otherwise encode on the fly (tests, ad-hoc calls). Without
    this, jit callers retrace the encode into every program — inside the
    wavefront scan that meant re-encoding EVERY segment."""
    if bvh.mxu_nodes_t is not None:
        return bvh.mxu_nodes_t, bvh.mxu_leaves_t
    return mxu_tables(bvh)


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
    return orig.T, dir.T, t_vec[None, :], b


def fits_vmem(bvh: WideBVH, blk: int = BLK,
              budget_bytes: int = 10 << 20) -> bool:
    """The kernel holds both transposed bf16 tables AND the (T, BLK)/(L, BLK)
    one-hot operands in VMEM; all four must fit."""
    t_pad = -(-bvh.nodes.shape[0] // 128) * 128
    l_pad = -(-bvh.leaves.shape[0] // 128) * 128
    tables = (t_pad * 72 + l_pad * bvh.leaf_width * 30) * 2
    onehots = (t_pad + l_pad) * blk * 2
    return tables + onehots <= budget_bytes


def _check_index_range(bvh: WideBVH):
    # two byte chunks address node/leaf indices; three address (tid+1)
    assert bvh.nodes.shape[0] < (1 << 16), "mxu: node count >= 2^16"
    assert bvh.leaves.shape[0] < (1 << 16), "mxu: leaf count >= 2^16"


def traverse_closest(bvh: WideBVH, orig, dir, t_max,
                     blk: int = BLK) -> Traversal:
    if bvh.root_ref < 0:
        from fluctus_tpu.ops import traverse_wide
        r = traverse_wide.traverse_closest(bvh, orig, dir, t_max)
        return Traversal(r.t, r.prim, r.u, r.v)
    _check_index_range(bvh)
    nodes_t, leaves_t = _tables(bvh)
    orig_t, dir_t, t_row, b = _prep(orig, dir, t_max, blk)
    t, prim, u, v = _launch(orig_t, dir_t, t_row, nodes_t, leaves_t,
                            int(bvh.root_ref), int(bvh.leaf_width),
                            int(bvh.depth) + 1, False, blk)
    return Traversal(t[0, :b], prim[0, :b], u[0, :b], v[0, :b])


def traversal_steps(bvh: WideBVH, orig, dir, t_max,
                    blk: int = BLK) -> jnp.ndarray:
    """Per-block while-iteration counts (perf instrumentation; the cost
    model is sum-over-blocks of steps x per-step latency)."""
    _check_index_range(bvh)
    nodes_t, leaves_t = _tables(bvh)
    orig_t, dir_t, t_row, b = _prep(orig, dir, t_max, blk)
    _, _, _, v = _launch(orig_t, dir_t, t_row, nodes_t, leaves_t,
                         int(bvh.root_ref), int(bvh.leaf_width),
                         int(bvh.depth) + 1, False, blk, debug_steps=True)
    return v[0, ::blk].astype(jnp.int32)


def traverse_any(bvh: WideBVH, orig, dir, t_max,
                 blk: int = BLK) -> jnp.ndarray:
    if bvh.root_ref < 0:
        from fluctus_tpu.ops import traverse_wide
        return traverse_wide.traverse_any(bvh, orig, dir, t_max)
    _check_index_range(bvh)
    nodes_t, leaves_t = _tables(bvh)
    orig_t, dir_t, t_row, b = _prep(orig, dir, t_max, blk)
    _, prim, _, _ = _launch(orig_t, dir_t, t_row, nodes_t, leaves_t,
                            int(bvh.root_ref), int(bvh.leaf_width),
                            int(bvh.depth) + 1, True, blk)
    return prim[0, :b] > 0


def _chunk_closest(bvh: WideBVH, orig, dir, t_vec, blk: int) -> Traversal:
    """Closest hit against one treelet with a per-lane t_max vector."""
    if bvh.root_ref < 0:
        from fluctus_tpu.ops import traverse_wide
        r = traverse_wide.traverse_closest(bvh, orig, dir, t_vec)
        return Traversal(r.t, r.prim, r.u, r.v)
    _check_index_range(bvh)
    nodes_t, leaves_t = _tables(bvh)
    orig_t, dir_t, t_row, b = _prep(orig, dir, t_vec, blk)
    t, prim, u, v = _launch(orig_t, dir_t, t_row, nodes_t, leaves_t,
                            int(bvh.root_ref), int(bvh.leaf_width),
                            int(bvh.depth) + 1, False, blk)
    return Traversal(t[0, :b], prim[0, :b], u[0, :b], v[0, :b])


def traverse_closest_forest(chunks, prim_maps, orig, dir, t_max,
                            blk: int = BLK) -> Traversal:
    """Closest hit over a forest of VMEM-sized treelets with per-lane
    traversal: each chunk runs the stack kernel, threading the running
    best-t as the next chunk's t_max (chunk order prunes like near-first
    traversal; a lane whose ray misses a chunk's root exits that chunk in
    one step). Beyond-VMEM counterpart of traverse_closest; the packet
    forest (traverse_pallas.traverse_closest_forest) remains the coherent
    alternative. prim_maps[i] maps chunk-local triangle ids to global."""
    b = orig.shape[0]
    best = Traversal(
        t=jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (b,)),
        prim=jnp.full((b,), -1, jnp.int32),
        u=jnp.zeros((b,), jnp.float32),
        v=jnp.zeros((b,), jnp.float32))
    for wb, pmap in zip(chunks, prim_maps):
        r = _chunk_closest(wb, orig, dir, best.t, blk)
        got = r.prim >= 0
        gprim = pmap[jnp.maximum(r.prim, 0)]
        best = Traversal(
            t=jnp.where(got, r.t, best.t),
            prim=jnp.where(got, gprim, best.prim),
            u=jnp.where(got, r.u, best.u),
            v=jnp.where(got, r.v, best.v))
    return best


def traverse_any_forest(chunks, orig, dir, t_max,
                        blk: int = BLK) -> jnp.ndarray:
    """Any-hit over a treelet forest: shorten subsequent chunks' rays to
    zero once blocked (a blocked lane exits later chunks in one step)."""
    b = orig.shape[0]
    lens = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (b,))
    blocked = jnp.zeros((b,), bool)
    for wb in chunks:
        cur_len = jnp.where(blocked, 0.0, lens)
        if wb.root_ref < 0:
            from fluctus_tpu.ops import traverse_wide
            blocked = blocked | traverse_wide.traverse_any(wb, orig, dir,
                                                           cur_len)
            continue
        _check_index_range(wb)
        nodes_t, leaves_t = _tables(wb)
        orig_t, dir_t, t_row, _ = _prep(orig, dir, cur_len, blk)
        _, prim, _, _ = _launch(orig_t, dir_t, t_row, nodes_t, leaves_t,
                                int(wb.root_ref), int(wb.leaf_width),
                                int(wb.depth) + 1, True, blk)
        blocked = blocked | (prim[0, :b] > 0)
    return blocked


def forest_fits_vmem(chunks, blk: int = BLK,
                     budget_bytes: int = 10 << 20) -> bool:
    """Every treelet's tables + one-hots must fit the kernel budget (and
    its byte-chunked indices must stay addressable)."""
    return all(wb.root_ref < 0
               or (fits_vmem(wb, blk, budget_bytes)
                   and wb.nodes.shape[0] < (1 << 16)
                   and wb.leaves.shape[0] < (1 << 16))
               for wb in chunks)
