"""Batched BVH traversal in pure JAX (lax.while_loop + explicit stack arrays).

TPU redesign of the reference's per-thread stack traversal
(reference: src/bvh.cl:234-310 bvh_intersect, :312-375 bvh_occluded): the whole
ray batch advances in lockstep, one node pop per ray per iteration, with lane
masks covering divergence. Data layout is the same flat 2-wide node array
(left child = i+1), gathered SoA.

This is the correctness-reference implementation; the Pallas kernel in
traverse_pallas.py replaces it on the hot path.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fluctus_tpu.core.types import FlatBVH
from fluctus_tpu.ops.intersect import ray_aabb, ray_triangle

STACK_DEPTH = 96   # > builder MaxDepth 64 (soft bound: median splits may go deeper)
MAX_LEAF = 8       # builder leaf cap (reference: src/sbvh.hpp:38)


class Traversal(NamedTuple):
    t: jnp.ndarray     # (B,) closest hit distance (t_max when miss)
    prim: jnp.ndarray  # (B,) triangle index into geometry arrays, -1 = miss
    u: jnp.ndarray     # (B,) barycentric u
    v: jnp.ndarray     # (B,) barycentric v


def _leaf_test(bvh: FlatBVH, v0, v1, v2, orig, dir, i_start, n_prims,
               best_t, best_prim, best_u, best_v, do_leaf):
    """Test up to MAX_LEAF triangles of one leaf per ray, vectorized (B, K)."""
    k = jnp.arange(MAX_LEAF, dtype=jnp.int32)
    # (B, K) gather of primitive ids; masked lanes clamp to 0
    slot = i_start[:, None] + k[None, :]
    valid = (k[None, :] < n_prims[:, None]) & do_leaf[:, None]
    slot = jnp.where(valid, slot, 0)
    tri = bvh.prim_idx[slot]                       # (B, K)
    t, u, v, hit = ray_triangle(
        orig[:, None, :], dir[:, None, :], v0[tri], v1[tri], v2[tri])
    hit = hit & valid & (t < best_t[:, None])
    t = jnp.where(hit, t, jnp.inf)
    j = jnp.argmin(t, axis=1)                      # (B,)
    any_hit = jnp.take_along_axis(hit, j[:, None], axis=1)[:, 0]
    sel = lambda a: jnp.take_along_axis(a, j[:, None], axis=1)[:, 0]
    best_prim = jnp.where(any_hit, sel(tri), best_prim)
    best_u = jnp.where(any_hit, sel(u), best_u)
    best_v = jnp.where(any_hit, sel(v), best_v)
    best_t = jnp.where(any_hit, sel(t), best_t)
    return best_t, best_prim, best_u, best_v, any_hit


@partial(jax.jit, static_argnames=())
def traverse_closest(bvh: FlatBVH, v0, v1, v2, orig, dir, t_max) -> Traversal:
    """Closest-hit traversal for a batch of rays.

    Args:
      bvh: FlatBVH arrays.
      v0/v1/v2: (M, 3) triangle vertices.
      orig/dir: (B, 3) rays. t_max: (B,) max distance.
    """
    b = orig.shape[0]
    inv_dir = 1.0 / jnp.where(jnp.abs(dir) < 1e-20,
                              jnp.where(dir < 0, -1e-20, 1e-20), dir)

    stack = jnp.zeros((b, STACK_DEPTH), jnp.int32)
    sp = jnp.ones((b,), jnp.int32)  # root pre-pushed at slot 0

    best_t = jnp.asarray(t_max, jnp.float32) * jnp.ones((b,), jnp.float32)
    best_prim = jnp.full((b,), -1, jnp.int32)
    best_u = jnp.zeros((b,), jnp.float32)
    best_v = jnp.zeros((b,), jnp.float32)

    def cond(state):
        sp = state[1]
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, best_t, best_prim, best_u, best_v = state
        active = sp > 0
        # Pop one node per active ray
        sp_idx = jnp.maximum(sp - 1, 0)
        node = jnp.take_along_axis(stack, sp_idx[:, None], axis=1)[:, 0]
        node = jnp.where(active, node, 0)
        sp = jnp.where(active, sp - 1, sp)

        lo = bvh.node_lo[node]
        hi = bvh.node_hi[node]
        right = bvh.node_right[node]
        count = bvh.node_count[node]

        box_hit, _ = ray_aabb(orig, inv_dir, lo, hi, best_t)
        box_hit = box_hit & active

        is_leaf = count > 0
        do_leaf = box_hit & is_leaf
        do_inner = box_hit & ~is_leaf

        # Leaf: vectorized triangle tests
        best_t, best_prim, best_u, best_v, _ = _leaf_test(
            bvh, v0, v1, v2, orig, dir, right, count,
            best_t, best_prim, best_u, best_v, do_leaf)

        # Inner: push right child then left child (left popped first)
        push1 = do_inner
        stack = _push(stack, sp, right, push1)
        sp = jnp.where(push1, sp + 1, sp)
        stack = _push(stack, sp, node + 1, push1)
        sp = jnp.where(push1, sp + 1, sp)
        return stack, sp, best_t, best_prim, best_u, best_v

    state = (stack, sp, best_t, best_prim, best_u, best_v)
    stack, sp, best_t, best_prim, best_u, best_v = jax.lax.while_loop(
        cond, body, state)
    return Traversal(best_t, best_prim, best_u, best_v)


def _push(stack, sp, value, mask):
    """Masked per-ray stack push at position sp (clamped)."""
    pos = jnp.minimum(sp, STACK_DEPTH - 1)
    rows = jnp.arange(stack.shape[0], dtype=jnp.int32)
    cur = stack[rows, pos]
    val = jnp.where(mask, value, cur)
    return stack.at[rows, pos].set(val)


@partial(jax.jit, static_argnames=())
def traverse_any(bvh: FlatBVH, v0, v1, v2, orig, dir, t_max) -> jnp.ndarray:
    """Any-hit (occlusion) traversal with early lane exit
    (reference: src/bvh.cl:312-375 bvh_occluded). Returns (B,) bool."""
    b = orig.shape[0]
    inv_dir = 1.0 / jnp.where(jnp.abs(dir) < 1e-20,
                              jnp.where(dir < 0, -1e-20, 1e-20), dir)
    t_max = jnp.asarray(t_max, jnp.float32) * jnp.ones((b,), jnp.float32)

    stack = jnp.zeros((b, STACK_DEPTH), jnp.int32)
    sp = jnp.ones((b,), jnp.int32)
    blocked = jnp.zeros((b,), bool)

    def cond(state):
        _, sp, blocked = state
        return jnp.any((sp > 0) & ~blocked)

    def body(state):
        stack, sp, blocked = state
        active = (sp > 0) & ~blocked
        sp_idx = jnp.maximum(sp - 1, 0)
        node = jnp.take_along_axis(stack, sp_idx[:, None], axis=1)[:, 0]
        node = jnp.where(active, node, 0)
        sp = jnp.where(active, sp - 1, sp)

        lo = bvh.node_lo[node]
        hi = bvh.node_hi[node]
        right = bvh.node_right[node]
        count = bvh.node_count[node]

        box_hit, _ = ray_aabb(orig, inv_dir, lo, hi, t_max)
        box_hit = box_hit & active
        is_leaf = count > 0
        do_leaf = box_hit & is_leaf
        do_inner = box_hit & ~is_leaf

        k = jnp.arange(MAX_LEAF, dtype=jnp.int32)
        slot = right[:, None] + k[None, :]
        valid = (k[None, :] < count[:, None]) & do_leaf[:, None]
        slot = jnp.where(valid, slot, 0)
        tri = bvh.prim_idx[slot]
        t, _, _, hit = ray_triangle(
            orig[:, None, :], dir[:, None, :], v0[tri], v1[tri], v2[tri])
        hit = hit & valid & (t < t_max[:, None])
        blocked = blocked | jnp.any(hit, axis=1)

        push1 = do_inner
        stack = _push(stack, sp, right, push1)
        sp = jnp.where(push1, sp + 1, sp)
        stack = _push(stack, sp, node + 1, push1)
        sp = jnp.where(push1, sp + 1, sp)
        return stack, sp, blocked

    _, _, blocked = jax.lax.while_loop(cond, body, (stack, sp, blocked))
    return blocked
