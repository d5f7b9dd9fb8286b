"""Gather-optimized batched BVH traversal over the packed layout.

TPU redesign of the traversal hot loop (reference: src/bvh.cl:234-375).
Differences vs ops/traverse.py (the correctness reference):

  * child-pair test on pop: one (16,) f32 row gather tests both children,
    with near-child-first push ordering (reference: src/bvh.cl:286-297) and
    a tmin stack so stale entries are pruned on pop without re-fetching.
  * swizzled leaves: one (8, 9) f32 row gather tests a whole leaf with
    pre-computed Möller edges.

Per-iteration HBM traffic per lane is one 64 B node row or one 288 B leaf
row (vs ~13 scattered gathers before) and typical step counts are halved.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fluctus_tpu.core.types import PackedBVH

STACK_DEPTH = 96  # soft depth bound: see accel/bvh.py
TRI_EPS = jnp.float32(1e-12)


class Traversal(NamedTuple):
    t: jnp.ndarray
    prim: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray


def _inv_dir(dir):
    return 1.0 / jnp.where(jnp.abs(dir) < 1e-20,
                           jnp.where(dir < 0, -1e-20, 1e-20), dir)


def _slab(orig, inv, lo, hi, t_best):
    t0 = (lo - orig) * inv
    t1 = (hi - orig) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tmax >= 0.0) & (tmin <= tmax) & (tmin < t_best)
    return hit, tmin


def _push(stack_ref, stack_t, sp, ref, tmin, mask):
    pos = jnp.minimum(sp, STACK_DEPTH - 1)
    rows = jnp.arange(stack_ref.shape[0], dtype=jnp.int32)
    cur_r = stack_ref[rows, pos]
    cur_t = stack_t[rows, pos]
    stack_ref = stack_ref.at[rows, pos].set(jnp.where(mask, ref, cur_r))
    stack_t = stack_t.at[rows, pos].set(jnp.where(mask, tmin, cur_t))
    sp = jnp.where(mask, sp + 1, sp)
    return stack_ref, stack_t, sp


def _leaf_hit(pbvh: PackedBVH, orig, dir, li, best_t, mask):
    """Möller-Trumbore over one swizzled leaf row per lane: (B, 8) tests."""
    rows = pbvh.leaf_tris[li]            # (B, 8, 9)
    ids = pbvh.leaf_ids[li]              # (B, 8)
    a = rows[..., 0:3]
    e1 = rows[..., 3:6]
    e2 = rows[..., 6:9]
    o = orig[:, None, :]
    d = dir[:, None, :]
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    ok = jnp.abs(det) >= TRI_EPS
    idet = 1.0 / jnp.where(ok, det, 1.0)
    tvec = o - a
    u = jnp.sum(tvec * pvec, axis=-1) * idet
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * idet
    t = jnp.sum(e2 * qvec, axis=-1) * idet
    ok = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0) \
        & (t >= 0.0) & (ids >= 0) & mask[:, None] & (t < best_t[:, None])
    return t, u, v, ids, ok


def traverse_closest(pbvh: PackedBVH, orig, dir, t_max) -> Traversal:
    b = orig.shape[0]
    inv = _inv_dir(dir)
    stack_ref = jnp.zeros((b, STACK_DEPTH), jnp.int32)
    stack_t = jnp.zeros((b, STACK_DEPTH), jnp.float32)
    stack_ref = stack_ref.at[:, 0].set(pbvh.root_ref)
    sp = jnp.ones((b,), jnp.int32)

    best_t = jnp.asarray(t_max, jnp.float32) * jnp.ones((b,), jnp.float32)
    best_prim = jnp.full((b,), -1, jnp.int32)
    best_u = jnp.zeros((b,), jnp.float32)
    best_v = jnp.zeros((b,), jnp.float32)

    def cond(s):
        return jnp.any(s[2] > 0)

    def body(s):
        stack_ref, stack_t, sp, best_t, best_prim, best_u, best_v = s
        active = sp > 0
        pos = jnp.maximum(sp - 1, 0)
        rows = jnp.arange(b, dtype=jnp.int32)
        ref = jnp.where(active, stack_ref[rows, pos], 0)
        tmin = stack_t[rows, pos]
        sp = jnp.where(active, sp - 1, sp)
        act = active & (tmin < best_t)

        is_leaf = ref < 0
        inner_m = act & ~is_leaf

        # --- inner: test both children from one row
        ni = jnp.where(inner_m, ref, 0)
        boxes = pbvh.child_boxes[ni]            # (B, 16)
        refs = pbvh.child_refs[ni]              # (B, 2)
        hit_l, t_l = _slab(orig, inv, boxes[:, 0:3], boxes[:, 3:6], best_t)
        hit_r, t_r = _slab(orig, inv, boxes[:, 6:9], boxes[:, 9:12], best_t)
        l_first = t_l <= t_r
        near_ref = jnp.where(l_first, refs[:, 0], refs[:, 1])
        far_ref = jnp.where(l_first, refs[:, 1], refs[:, 0])
        near_t = jnp.minimum(t_l, t_r)
        far_t = jnp.maximum(t_l, t_r)
        near_hit = jnp.where(l_first, hit_l, hit_r)
        far_hit = jnp.where(l_first, hit_r, hit_l)
        stack_ref, stack_t, sp = _push(stack_ref, stack_t, sp, far_ref,
                                       far_t, inner_m & far_hit)
        stack_ref, stack_t, sp = _push(stack_ref, stack_t, sp, near_ref,
                                       near_t, inner_m & near_hit)

        # --- leaf: one swizzled row
        leaf_m = act & is_leaf
        li = jnp.where(leaf_m, ~ref, 0)
        t, u, v, ids, ok = _leaf_hit(pbvh, orig, dir, li, best_t, leaf_m)
        t_sel = jnp.where(ok, t, jnp.inf)
        j = jnp.argmin(t_sel, axis=1)
        got = jnp.take_along_axis(ok, j[:, None], 1)[:, 0]
        pick = lambda a: jnp.take_along_axis(a, j[:, None], 1)[:, 0]
        best_prim = jnp.where(got, pick(ids), best_prim)
        best_u = jnp.where(got, pick(u), best_u)
        best_v = jnp.where(got, pick(v), best_v)
        best_t = jnp.where(got, pick(t), best_t)
        return stack_ref, stack_t, sp, best_t, best_prim, best_u, best_v

    s = (stack_ref, stack_t, sp, best_t, best_prim, best_u, best_v)
    s = jax.lax.while_loop(cond, body, s)
    return Traversal(s[3], s[4], s[5], s[6])


def traverse_any(pbvh: PackedBVH, orig, dir, t_max) -> jnp.ndarray:
    """Any-hit with early lane exit (reference: src/bvh.cl:312-375)."""
    b = orig.shape[0]
    inv = _inv_dir(dir)
    t_max = jnp.asarray(t_max, jnp.float32) * jnp.ones((b,), jnp.float32)
    stack_ref = jnp.zeros((b, STACK_DEPTH), jnp.int32)
    stack_t = jnp.zeros((b, STACK_DEPTH), jnp.float32)
    stack_ref = stack_ref.at[:, 0].set(pbvh.root_ref)
    sp = jnp.ones((b,), jnp.int32)
    blocked = jnp.zeros((b,), bool)

    def cond(s):
        return jnp.any((s[2] > 0) & ~s[3])

    def body(s):
        stack_ref, stack_t, sp, blocked = s
        active = (sp > 0) & ~blocked
        pos = jnp.maximum(sp - 1, 0)
        rows = jnp.arange(b, dtype=jnp.int32)
        ref = jnp.where(active, stack_ref[rows, pos], 0)
        sp = jnp.where(active, sp - 1, sp)
        act = active

        is_leaf = ref < 0
        inner_m = act & ~is_leaf
        ni = jnp.where(inner_m, ref, 0)
        boxes = pbvh.child_boxes[ni]
        refs = pbvh.child_refs[ni]
        hit_l, t_l = _slab(orig, inv, boxes[:, 0:3], boxes[:, 3:6], t_max)
        hit_r, t_r = _slab(orig, inv, boxes[:, 6:9], boxes[:, 9:12], t_max)
        stack_ref, stack_t, sp = _push(stack_ref, stack_t, sp, refs[:, 1],
                                       t_r, inner_m & hit_r)
        stack_ref, stack_t, sp = _push(stack_ref, stack_t, sp, refs[:, 0],
                                       t_l, inner_m & hit_l)

        leaf_m = act & is_leaf
        li = jnp.where(leaf_m, ~ref, 0)
        t, _, _, ids, ok = _leaf_hit(pbvh, orig, dir, li, t_max, leaf_m)
        blocked = blocked | jnp.any(ok, axis=1)
        return stack_ref, stack_t, sp, blocked

    s = jax.lax.while_loop(cond, body,
                           (stack_ref, stack_t, sp, blocked))
    return s[3]
