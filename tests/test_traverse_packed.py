import jax.numpy as jnp
import numpy as np

from fluctus_tpu.accel import bvh as bvh_mod, cpu_ref
from fluctus_tpu.accel.pack import pack_bvh
from fluctus_tpu.core.types import PackedBVH
from fluctus_tpu.ops import traverse_packed

from test_bvh import random_rays, random_tris


def to_packed(built, v0, v1, v2) -> PackedBVH:
    p = pack_bvh(built, v0, v1, v2)
    return PackedBVH(
        child_boxes=jnp.asarray(p.child_boxes),
        child_refs=jnp.asarray(p.child_refs),
        leaf_tris=jnp.asarray(p.leaf_tris),
        leaf_ids=jnp.asarray(p.leaf_ids),
        root_ref=jnp.asarray(p.root_ref, jnp.int32))


def test_packed_closest_matches_oracle(rng):
    v0, v1, v2 = random_tris(rng, m=300)
    orig, dir = random_rays(rng, b=256)
    built = bvh_mod.build_bvh(v0, v1, v2)
    pbvh = to_packed(built, v0, v1, v2)
    t_max = np.float32(1e30)
    res = traverse_packed.traverse_closest(
        pbvh, jnp.asarray(orig), jnp.asarray(dir), t_max)
    t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig, dir,
                                                      t_max)
    np.testing.assert_array_equal(np.asarray(res.prim) >= 0, prim_ref >= 0)
    hit = prim_ref >= 0
    np.testing.assert_allclose(np.asarray(res.t)[hit], t_ref[hit],
                               rtol=1e-4, atol=1e-5)


def test_packed_any_matches_oracle(rng):
    v0, v1, v2 = random_tris(rng, m=300)
    orig, dir = random_rays(rng, b=256)
    built = bvh_mod.build_bvh(v0, v1, v2)
    pbvh = to_packed(built, v0, v1, v2)
    t_max = np.full(len(orig), 2.5, np.float32)
    blocked = traverse_packed.traverse_any(
        pbvh, jnp.asarray(orig), jnp.asarray(dir), jnp.asarray(t_max))
    ref = cpu_ref.intersect_any(v0, v1, v2, orig, dir, t_max)
    np.testing.assert_array_equal(np.asarray(blocked), ref)


def test_packed_single_leaf_root(rng):
    """Root that is itself a leaf (tiny scene) must traverse correctly."""
    v0 = np.array([[0, 0, 0], [2, 0, 0]], np.float32)
    v1 = np.array([[1, 0, 0], [3, 0, 0]], np.float32)
    v2 = np.array([[0, 1, 0], [2, 1, 0]], np.float32)
    built = bvh_mod.build_bvh(v0, v1, v2)
    assert built.node_count[0] > 0  # 2 tris <= max_leaf -> root leaf
    pbvh = to_packed(built, v0, v1, v2)
    orig = np.array([[0.2, 0.2, 1.0], [9.0, 9.0, 1.0]], np.float32)
    dir = np.array([[0, 0, -1], [0, 0, -1]], np.float32)
    res = traverse_packed.traverse_closest(
        pbvh, jnp.asarray(orig), jnp.asarray(dir), np.float32(1e30))
    assert np.asarray(res.prim).tolist() == [0, -1]


def test_backend_parity_full_render():
    """Both traversal backends must produce identical images (same RNG)."""
    import sys
    sys.path.insert(0, "tests")
    from test_integrator import plane_session
    from fluctus_tpu.integrators import lockstep

    scene, params, cfg = plane_session()
    a = lockstep.render(scene, params, cfg.replace(backend="jnp"), 2)
    b = lockstep.render(scene, params, cfg.replace(backend="packed"), 2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_wide_matches_oracle(rng):
    from fluctus_tpu.accel.wide import build_wide
    from fluctus_tpu.core.types import WideBVH
    from fluctus_tpu.ops import traverse_wide

    v0, v1, v2 = random_tris(rng, m=500)
    orig, dir = random_rays(rng, b=256)
    built = bvh_mod.build_bvh(v0, v1, v2)
    w = build_wide(built, v0, v1, v2)
    wbvh = WideBVH(nodes=jnp.asarray(w.nodes), leaves=jnp.asarray(w.leaves),
                   root_ref=int(w.root_ref), depth=int(w.depth),
                   leaf_width=int(w.leaves.shape[1]))
    t_max = np.float32(1e30)
    res = traverse_wide.traverse_closest(wbvh, jnp.asarray(orig),
                                         jnp.asarray(dir), t_max)
    t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig, dir,
                                                      t_max)
    np.testing.assert_array_equal(np.asarray(res.prim) >= 0, prim_ref >= 0)
    hit = prim_ref >= 0
    np.testing.assert_allclose(np.asarray(res.t)[hit], t_ref[hit],
                               rtol=1e-4, atol=1e-5)
    # occlusion
    t2 = np.full(len(orig), 2.5, np.float32)
    blocked = traverse_wide.traverse_any(wbvh, jnp.asarray(orig),
                                         jnp.asarray(dir), jnp.asarray(t2))
    ref_any = cpu_ref.intersect_any(v0, v1, v2, orig, dir, t2)
    np.testing.assert_array_equal(np.asarray(blocked), ref_any)


def test_wide_tiny_scene_leaf_root(rng):
    from fluctus_tpu.accel.wide import build_wide
    from fluctus_tpu.core.types import WideBVH
    from fluctus_tpu.ops import traverse_wide

    v0, v1, v2 = random_tris(rng, m=10)  # <= leaf_width -> leaf root
    built = bvh_mod.build_bvh(v0, v1, v2)
    w = build_wide(built, v0, v1, v2)
    assert w.root_ref < 0
    wbvh = WideBVH(nodes=jnp.asarray(w.nodes), leaves=jnp.asarray(w.leaves),
                   root_ref=int(w.root_ref), depth=int(w.depth),
                   leaf_width=int(w.leaves.shape[1]))
    orig, dir = random_rays(rng, b=64)
    res = traverse_wide.traverse_closest(wbvh, jnp.asarray(orig),
                                         jnp.asarray(dir), np.float32(1e30))
    t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig, dir)
    np.testing.assert_array_equal(np.asarray(res.prim) >= 0, prim_ref >= 0)


def test_pallas_hbm_variant_interpret(rng):
    """HBM-DMA packet variant (tables in ANY memory, per-visit row DMA):
    correctness vs oracle in interpret mode (the container's remote-compile
    toolchain cannot compile DMA kernels; see traverse_pallas.py docstring)."""
    import jax.experimental.pallas as pl
    import fluctus_tpu.ops.traverse_pallas as tp
    from fluctus_tpu.accel.wide import build_wide
    from fluctus_tpu.core.types import WideBVH

    orig_call = pl.pallas_call
    tp.pl.pallas_call = lambda *a, **k: orig_call(*a, **{**k,
                                                         'interpret': True})
    try:
        v0, v1, v2 = random_tris(rng, m=300)
        orig, dir = random_rays(rng, b=512)
        built = bvh_mod.build_bvh(v0, v1, v2)
        w = build_wide(built, v0, v1, v2)
        wbvh = WideBVH(nodes=jnp.asarray(w.nodes),
                       leaves=jnp.asarray(w.leaves),
                       root_ref=int(w.root_ref), depth=int(w.depth),
                       leaf_width=int(w.leaves.shape[1]))
        res = tp.traverse_closest(wbvh, jnp.asarray(orig), jnp.asarray(dir),
                                  np.float32(1e30), hbm=True)
        t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig,
                                                          dir)
        np.testing.assert_array_equal(np.asarray(res.prim) >= 0,
                                      prim_ref >= 0)
    finally:
        tp.pl.pallas_call = orig_call


def test_camera_basis_from_rotation():
    """Yaw/pitch camera basis (reference: src/tracer.cpp:803-818)."""
    from fluctus_tpu.ops.camera import camera_basis_from_rotation
    r, u, d = camera_basis_from_rotation(0.0, 0.0)
    np.testing.assert_allclose(np.asarray(d), [0, 0, -1], atol=1e-6)
    # positive yaw swings the view toward +x, positive pitch toward -y
    # (rows-of-R convention, reference: src/tracer.cpp:803-818)
    r, u, d = camera_basis_from_rotation(90.0, 0.0)
    np.testing.assert_allclose(np.asarray(d), [1, 0, 0], atol=1e-6)
    r, u, d = camera_basis_from_rotation(0.0, 90.0)
    np.testing.assert_allclose(np.asarray(d), [0, -1, 0], atol=1e-6)
    # orthonormal
    for a, b in ((r, u), (u, d), (r, d)):
        assert abs(float(jnp.dot(a, b))) < 1e-6


def test_forest_matches_oracle(rng):
    """Treelet-forest packet traversal (beyond-VMEM path) vs oracle, using a
    tiny budget to force multiple chunks."""
    import jax.experimental.pallas as pl
    import fluctus_tpu.ops.traverse_pallas as tp
    from fluctus_tpu.accel.wide import build_wide_forest
    from fluctus_tpu.core.types import WideBVH

    orig_call = pl.pallas_call
    tp.pl.pallas_call = lambda *a, **k: orig_call(*a, **{**k,
                                                         'interpret': True})
    try:
        v0, v1, v2 = random_tris(rng, m=600)
        hosts, maps = build_wide_forest(v0, v1, v2, bvh_mod.build_bvh,
                                        budget_bytes=8_000)
        assert len(hosts) >= 4  # forced chunking
        n_max = max(h.nodes.shape[0] for h in hosts)
        l_max = max(h.leaves.shape[0] for h in hosts)
        chunks = []
        for h in hosts:
            nodes = np.zeros((n_max, 56), np.float32)
            nodes[:, 0:48:6] = np.inf
            nodes[:h.nodes.shape[0]] = h.nodes
            leaves = np.zeros((l_max,) + h.leaves.shape[1:], np.float32)
            leaves[..., 9] = np.frombuffer(np.int32(-1).tobytes(),
                                           np.float32)[0]
            leaves[:h.leaves.shape[0]] = h.leaves
            chunks.append(WideBVH(nodes=jnp.asarray(nodes),
                                  leaves=jnp.asarray(leaves),
                                  root_ref=0, depth=int(h.depth),
                                  leaf_width=int(h.leaves.shape[1])))
        pmaps = tuple(jnp.asarray(m) for m in maps)
        orig, dir = random_rays(rng, b=512)
        res = tp.traverse_closest_forest(tuple(chunks), pmaps,
                                         jnp.asarray(orig), jnp.asarray(dir),
                                         np.float32(1e30))
        t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig,
                                                          dir)
        np.testing.assert_array_equal(np.asarray(res.prim) >= 0,
                                      prim_ref >= 0)
        hit = prim_ref >= 0
        np.testing.assert_allclose(np.asarray(res.t)[hit], t_ref[hit],
                                   rtol=1e-4, atol=1e-5)
        # global prim ids must match the oracle's where t is unique
        diff = hit & (np.asarray(res.prim) != prim_ref)
        assert (np.abs(np.asarray(res.t)[diff] - t_ref[diff]) < 1e-4).all()
        # occlusion
        t2 = np.full(len(orig), 2.5, np.float32)
        blocked = tp.traverse_any_forest(tuple(chunks), jnp.asarray(orig),
                                         jnp.asarray(dir), jnp.asarray(t2))
        np.testing.assert_array_equal(
            np.asarray(blocked),
            cpu_ref.intersect_any(v0, v1, v2, orig, dir, t2))
    finally:
        tp.pl.pallas_call = orig_call
