import jax.numpy as jnp
import numpy as np
import pytest

from fluctus_tpu.accel import bvh as bvh_mod
from fluctus_tpu.accel import cpu_ref
from fluctus_tpu.core.types import FlatBVH
from fluctus_tpu.ops import traverse


def random_tris(rng, m=200, spread=2.0, size=0.3):
    base = rng.uniform(-spread, spread, (m, 3)).astype(np.float32)
    v0 = base
    v1 = base + rng.uniform(-size, size, (m, 3)).astype(np.float32)
    v2 = base + rng.uniform(-size, size, (m, 3)).astype(np.float32)
    return v0, v1, v2


def random_rays(rng, b=128, spread=3.0):
    orig = rng.uniform(-spread, spread, (b, 3)).astype(np.float32)
    dir = rng.normal(size=(b, 3)).astype(np.float32)
    dir /= np.linalg.norm(dir, axis=1, keepdims=True)
    return orig, dir


def to_device_bvh(built) -> FlatBVH:
    return FlatBVH(
        node_lo=jnp.asarray(built.node_lo),
        node_hi=jnp.asarray(built.node_hi),
        node_right=jnp.asarray(built.node_right),
        node_count=jnp.asarray(built.node_count),
        node_parent=jnp.asarray(built.node_parent),
        prim_idx=jnp.asarray(built.prim_idx),
    )


def test_builder_invariants(rng):
    v0, v1, v2 = random_tris(rng)
    built = bvh_mod.build_bvh(v0, v1, v2)
    bvh_mod.validate(built)
    assert built.depth <= bvh_mod.MAX_DEPTH
    # leaves cover every triangle exactly once (plain BVH: no duplication)
    assert sorted(built.prim_idx.tolist()) == list(range(len(v0)))


def test_traverse_matches_oracle(rng):
    v0, v1, v2 = random_tris(rng, m=300)
    orig, dir = random_rays(rng, b=256)
    built = bvh_mod.build_bvh(v0, v1, v2)
    dbvh = to_device_bvh(built)

    t_max = np.float32(1e30)
    res = traverse.traverse_closest(
        dbvh, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
        jnp.asarray(orig), jnp.asarray(dir), t_max)
    t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig, dir,
                                                      t_max)
    t_got = np.asarray(res.t)
    prim_got = np.asarray(res.prim)
    np.testing.assert_array_equal(prim_got >= 0, prim_ref >= 0)
    hit = prim_ref >= 0
    np.testing.assert_allclose(t_got[hit], t_ref[hit], rtol=1e-4, atol=1e-5)
    # primitive ids may differ only at exactly-equal t (coplanar overlap)
    diff = hit & (prim_got != prim_ref)
    assert (np.abs(t_got[diff] - t_ref[diff]) < 1e-4).all()


def test_traverse_any_matches_oracle(rng):
    v0, v1, v2 = random_tris(rng, m=300)
    orig, dir = random_rays(rng, b=256)
    built = bvh_mod.build_bvh(v0, v1, v2)
    dbvh = to_device_bvh(built)
    t_max = np.full(len(orig), 2.5, np.float32)
    blocked = traverse.traverse_any(
        dbvh, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
        jnp.asarray(orig), jnp.asarray(dir), jnp.asarray(t_max))
    ref = cpu_ref.intersect_any(v0, v1, v2, orig, dir, t_max)
    np.testing.assert_array_equal(np.asarray(blocked), ref)


def test_single_triangle_and_miss(rng):
    v0 = np.array([[0, 0, 0]], np.float32)
    v1 = np.array([[1, 0, 0]], np.float32)
    v2 = np.array([[0, 1, 0]], np.float32)
    built = bvh_mod.build_bvh(v0, v1, v2)
    dbvh = to_device_bvh(built)
    orig = np.array([[0.2, 0.2, 1.0], [5.0, 5.0, 1.0]], np.float32)
    dir = np.array([[0, 0, -1], [0, 0, -1]], np.float32)
    res = traverse.traverse_closest(
        dbvh, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
        jnp.asarray(orig), jnp.asarray(dir), np.float32(1e30))
    assert np.asarray(res.prim).tolist() == [0, -1]
    np.testing.assert_allclose(float(res.t[0]), 1.0, rtol=1e-6)


def test_depth_bound_never_oversizes_leaves():
    """Pathological coincident geometry: the depth bound is soft — leaves
    must never exceed MAX_LEAF (oversized leaves would silently overflow
    the fixed-width device leaf tests)."""
    # 4096 identical triangles: SAH cannot separate them; builder must
    # median-split past max_depth instead of emitting one giant leaf
    v0 = np.zeros((4096, 3), np.float32)
    v1 = np.tile(np.array([[1, 0, 0]], np.float32), (4096, 1))
    v2 = np.tile(np.array([[0, 1, 0]], np.float32), (4096, 1))
    built = bvh_mod.build_bvh(v0, v1, v2, max_depth=8)
    assert built.node_count.max() <= bvh_mod.MAX_LEAF
    from fluctus_tpu.accel.sbvh import build_sbvh
    sb = build_sbvh(v0, v1, v2, max_depth=8)
    assert sb.node_count.max() <= bvh_mod.MAX_LEAF
    from fluctus_tpu.accel import native
    if native.available():
        nb = native.build_native(v0, v1, v2, 8, 8, 1e-5, True)
        assert nb.node_count.max() <= 8
