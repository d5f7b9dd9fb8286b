"""Pallas TPU packet traversal — the hot-loop kernel.

Architecture (chosen from measured constraints, see traverse_wide.py): XLA
vector gathers from HBM run at ~25 GB/s effective and dominate the render,
so this kernel eliminates them entirely using the TPU's scalar/vector split:

  * a BLOCK of rays (one grid program) traverses TOGETHER — classic SIMD
    packet tracing: the scalar unit walks ONE shared stack; a node is
    visited if ANY lane in the block intersects it (vector reduce), and
    every fetch is a scalar-indexed row read from a VMEM-resident table —
    no per-lane gathers exist anywhere;
  * node/leaf tables live whole in VMEM (teapot: 0.2 MB, egyptcat: ~1 MB;
    scenes beyond VMEM fall back to the XLA wide backend);
  * all per-lane math (8-wide slab tests, 16-wide Möller) is dense VPU work
    on (BLK,) vectors; hit bookkeeping is elementwise.

Ray coherence sets the block's visited-node union; the renderer sorts rays
by pixel (primary/shadow rays are coherent by construction). The reference's
per-thread stack traversal (src/bvh.cl:234-310) maps to the GPU's per-lane
divergence model; this packet form is its TPU-native equivalent.

Two table placements:
  * hbm=False (default for scenes fitting VMEM): tables whole in VMEM,
    row reads are dynamic slices.
  * hbm=True: tables stay in HBM/ANY and each visit DMAs the shared row
    into VMEM scratch — unbounded scene size at ~1-2 µs/visit extra.
    CAVEAT: this container's remote-compile toolchain crashes on ANY kernel
    containing a DMA (even a trivial one — reproduced in isolation), so the
    hbm variant is validated in interpret mode only; on real hardware with
    a standard toolchain it should compile as-is. Scenes beyond VMEM
    currently route to the XLA wide backend (driver auto-selection).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluctus_tpu.core.types import WideBVH

BLK = 512          # rays per packet (block)
STACK = 192        # shared stack entries (>= 7 * wide-depth)
TRI_EPS = 1e-12
BIG = 3.0e38  # python float: jnp constants may not be captured by kernels
NEG_INF = float("-inf")


class Traversal(NamedTuple):
    t: jnp.ndarray
    prim: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray


def _kernel(orig_ref, dir_ref, tmax_ref, nodes_ref, nrefs_ref, leaves_ref,
            lids_ref, out_t, out_prim, out_u, out_v,
            stack_ref, node_scr, refs_scr, leaf_scr, lid_scr, sems,
            root_ref: int, leaf_width: int, any_hit: bool,
            blk: int = BLK, hbm: bool = False):
    ox = orig_ref[0, :]
    oy = orig_ref[1, :]
    oz = orig_ref[2, :]
    dx = dir_ref[0, :]
    dy = dir_ref[1, :]
    dz = dir_ref[2, :]

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                               jnp.where(d < 0, -1e-20, 1e-20), d)

    ix = safe_inv(dx)
    iy = safe_inv(dy)
    iz = safe_inv(dz)

    stack_ref[0] = root_ref

    init = (jnp.int32(1),                 # sp
            tmax_ref[0, :],               # best_t
            jnp.full((blk,), -1, jnp.int32),
            jnp.zeros((blk,), jnp.float32),
            jnp.zeros((blk,), jnp.float32),
            jnp.zeros((blk,), jnp.int32))  # blocked 0/1 (any-hit mode; bool vectors fail Mosaic scf.yield legalization)

    def cond(s):
        sp, _, _, _, _, blocked = s
        live = sp > 0
        if any_hit:
            live = jnp.logical_and(live, jnp.min(blocked) == 0)
        return live

    def body(s):
        sp, best_t, best_prim, best_u, best_v, blocked = s
        enc = stack_ref[sp - 1]
        sp = sp - 1
        is_inner = enc >= 0

        if hbm:
            # DMA the (possibly unused) node AND leaf rows up front —
            # conditional DMAs inside lax.cond crash the Mosaic pipeline
            ni_ = jnp.maximum(enc, 0)
            li_ = jnp.maximum(~enc, 0)
            dmas = (
                pltpu.make_async_copy(nodes_ref.at[pl.ds(ni_, 1), :],
                                      node_scr, sems.at[0]),
                pltpu.make_async_copy(nrefs_ref.at[pl.ds(ni_, 1), :],
                                      refs_scr, sems.at[1]),
                pltpu.make_async_copy(leaves_ref.at[pl.ds(li_, 1), :],
                                      leaf_scr, sems.at[2]),
                pltpu.make_async_copy(lids_ref.at[pl.ds(li_, 1), :],
                                      lid_scr, sems.at[3]),
            )
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()

        # ---------------- inner node: test 8 children, push hit ones
        def inner(sp):
            node = enc
            # one dynamic ROW load per node; elements extracted statically
            # (Mosaic supports dynamic-major row loads, not element loads).
            # hbm variant: tables stay in HBM, the packet DMAs one shared
            # row per visit into VMEM scratch (scene size unbounded).
            if hbm:
                nrow = node_scr[:, :]                # (1, 48)
                rrow = refs_scr[:, :]                # (1, 8)
            else:
                nrow = nodes_ref[pl.ds(node, 1), :]  # (1, 48)
                rrow = nrefs_ref[pl.ds(node, 1), :]  # (1, 8)
            keys = []
            hits = []
            refs = []
            for j in range(8):
                lox = nrow[0, j * 6 + 0]
                loy = nrow[0, j * 6 + 1]
                loz = nrow[0, j * 6 + 2]
                hix = nrow[0, j * 6 + 3]
                hiy = nrow[0, j * 6 + 4]
                hiz = nrow[0, j * 6 + 5]
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
                lane_hit = (tmax >= 0.0) & (tmin <= tmax) & (tmin < best_t)
                if any_hit:
                    lane_hit = lane_hit & (blocked == 0)
                hit_any = jnp.any(lane_hit)
                # near-ordering key: closest lane entry distance
                key = jnp.min(jnp.where(lane_hit, tmin, BIG))
                keys.append(key)
                hits.append(hit_any)
                refs.append(rrow[0, j])
            # push far-to-near: selection over 8 scalar keys, descending
            key_sel = [jnp.where(hits[j], keys[j], NEG_INF)
                       for j in range(8)]
            refs_v = refs

            # push far-to-near with an unrolled scalar selection network
            ks = list(key_sel)        # 8 scalars
            for _ in range(8):
                far = 0
                fk = ks[0]
                for j in range(1, 8):
                    take = ks[j] > fk
                    far = jnp.where(take, j, far)
                    fk = jnp.where(take, ks[j], fk)
                valid = fk > NEG_INF
                ref = refs_v[0]
                for j in range(1, 8):
                    ref = jnp.where(far == j, refs_v[j], ref)
                pos = jnp.minimum(sp, STACK - 1)
                stack_ref[pos] = jnp.where(valid, ref, stack_ref[pos])
                sp = sp + valid.astype(jnp.int32)
                ks = [jnp.where(far == j, NEG_INF, ks[j]) for j in range(8)]
            return sp, best_t, best_prim, best_u, best_v, blocked

        # ---------------- leaf: dense Möller over leaf_width triangle slots
        def leaf(sp):
            li = jnp.maximum(~enc, 0)  # guarded: cond may predicate-execute
            if hbm:
                lrow = leaf_scr[:, :]                # (1, W*9)
                irow = lid_scr[:, :]                 # (1, W)
            else:
                lrow = leaves_ref[pl.ds(li, 1), :]   # (1, W*9)
                irow = lids_ref[pl.ds(li, 1), :]     # (1, W)
            bt, bp, bu, bv, blk = best_t, best_prim, best_u, best_v, blocked
            for slot in range(leaf_width):
                c = slot * 9
                ax = lrow[0, c + 0]
                ay = lrow[0, c + 1]
                az = lrow[0, c + 2]
                e1x = lrow[0, c + 3]
                e1y = lrow[0, c + 4]
                e1z = lrow[0, c + 5]
                e2x = lrow[0, c + 6]
                e2y = lrow[0, c + 7]
                e2z = lrow[0, c + 8]
                tid = irow[0, slot]
                # pvec = d × e2
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
                # qvec = tvec × e1
                qx = tvy * e1z - tvz * e1y
                qy = tvz * e1x - tvx * e1z
                qz = tvx * e1y - tvy * e1x
                v = (dx * qx + dy * qy + dz * qz) * idet
                t = (e2x * qx + e2y * qy + e2z * qz) * idet
                ok = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) \
                    & (u + v <= 1.0) & (t >= 0.0) & (t < bt) & (tid >= 0)
                if any_hit:
                    blk = jnp.maximum(blk, ok.astype(jnp.int32))
                else:
                    bt = jnp.where(ok, t, bt)
                    bp = jnp.where(ok, tid, bp)
                    bu = jnp.where(ok, u, bu)
                    bv = jnp.where(ok, v, bv)
            return sp, bt, bp, bu, bv, blk

        return jax.lax.cond(is_inner, inner, leaf, sp)

    sp, best_t, best_prim, best_u, best_v, blocked = \
        jax.lax.while_loop(cond, body, init)

    out_t[0, :] = best_t
    out_prim[0, :] = blocked if any_hit else best_prim
    out_u[0, :] = best_u
    out_v[0, :] = best_v


@functools.partial(jax.jit,
                   static_argnames=("root_ref", "leaf_width", "any_hit",
                                    "blk", "hbm"))
def _launch(orig_t, dir_t, tmax_row, nodes, nrefs, leaves2d, lids,
            root_ref: int, leaf_width: int, any_hit: bool, blk: int = BLK,
            hbm: bool = False):
    b = orig_t.shape[1]
    grid = (b // blk,)
    kernel = functools.partial(_kernel, root_ref=root_ref,
                               leaf_width=leaf_width, any_hit=any_hit,
                               blk=blk, hbm=hbm)
    table_space = pltpu.ANY if hbm else pltpu.VMEM
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
            pl.BlockSpec((3, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), blk_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=table_space),
            pl.BlockSpec(memory_space=table_space),
            pl.BlockSpec(memory_space=table_space),
            pl.BlockSpec(memory_space=table_space),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, blk), blk_map, memory_space=pltpu.VMEM)
            for _ in range(4)),
        scratch_shapes=[
            pltpu.SMEM((STACK,), jnp.int32),
            pltpu.VMEM((1, 48), jnp.float32),
            pltpu.VMEM((1, 8), jnp.int32),
            pltpu.VMEM((1, leaves2d.shape[1]), jnp.float32),
            pltpu.VMEM((1, lids.shape[1]), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )(orig_t, dir_t, tmax_row, nodes, nrefs, leaves2d, lids)


def split_tables(bvh: WideBVH):
    """Split packed rows into separate f32/i32 tables for the kernel
    (pltpu.bitcast does not handle scalars)."""
    import jax.lax as lax
    nodes = bvh.nodes[:, 0:48]
    nrefs = lax.bitcast_convert_type(bvh.nodes[:, 48:56], jnp.int32)
    leaves2d = bvh.leaves[:, :, 0:9].reshape(bvh.leaves.shape[0], -1)
    lids = lax.bitcast_convert_type(bvh.leaves[:, :, 9], jnp.int32)
    return nodes, nrefs, leaves2d, lids


def _prep(bvh: WideBVH, orig, dir, t_max, blk: int = BLK):
    b = orig.shape[0]
    pad = (-b) % blk
    t_vec = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (b,))
    if pad:
        orig = jnp.concatenate([orig, jnp.zeros((pad, 3), orig.dtype)])
        dir = jnp.concatenate(
            [dir, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dir.dtype),
                                   (pad, 3))])
        t_vec = jnp.concatenate([t_vec, jnp.zeros((pad,), jnp.float32)])
    return orig.T, dir.T, t_vec[None, :], b


def traverse_closest(bvh: WideBVH, orig, dir, t_max, blk: int = BLK,
                     hbm: bool | None = None) -> Traversal:
    orig_t, dir_t, t_row, b = _prep(bvh, orig, dir, t_max, blk)
    nodes, nrefs, leaves2d, lids = split_tables(bvh)
    hbm = (not fits_vmem(bvh)) if hbm is None else hbm
    t, prim, u, v = _launch(orig_t, dir_t, t_row, nodes, nrefs, leaves2d,
                            lids, int(bvh.root_ref), int(bvh.leaf_width),
                            False, blk, hbm)
    return Traversal(t[0, :b], prim[0, :b], u[0, :b], v[0, :b])


def traverse_any(bvh: WideBVH, orig, dir, t_max, blk: int = BLK,
                 hbm: bool | None = None) -> jnp.ndarray:
    orig_t, dir_t, t_row, b = _prep(bvh, orig, dir, t_max, blk)
    nodes, nrefs, leaves2d, lids = split_tables(bvh)
    hbm = (not fits_vmem(bvh)) if hbm is None else hbm
    _, prim, _, _ = _launch(orig_t, dir_t, t_row, nodes, nrefs, leaves2d,
                            lids, int(bvh.root_ref), int(bvh.leaf_width),
                            True, blk, hbm)
    return prim[0, :b] > 0


def fits_vmem(bvh: WideBVH, budget_bytes: int = 8 << 20) -> bool:
    return (bvh.nodes.size + bvh.leaves.size) * 4 <= budget_bytes


def traverse_closest_forest(chunks, prim_maps, orig, dir, t_max,
                            blk: int = BLK) -> Traversal:
    """Closest hit over a forest of VMEM-sized treelets: each chunk is
    traced with the VMEM packet kernel, threading the running best-t as the
    next chunk's t_max so chunk order prunes like near-first traversal.
    prim_maps[i] maps chunk-local triangle ids to global ids."""
    b = orig.shape[0]
    best = Traversal(
        t=jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (b,)),
        prim=jnp.full((b,), -1, jnp.int32),
        u=jnp.zeros((b,), jnp.float32),
        v=jnp.zeros((b,), jnp.float32))
    for wb, pmap in zip(chunks, prim_maps):
        r = traverse_closest(wb, orig, dir, best.t, blk=blk, hbm=False)
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
    blocked = jnp.zeros((orig.shape[0],), bool)
    for wb in chunks:
        blocked = blocked | traverse_any(wb, orig, dir, t_max, blk=blk,
                                         hbm=False)
    return blocked
