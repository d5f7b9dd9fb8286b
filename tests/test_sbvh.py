import jax.numpy as jnp
import numpy as np

from fluctus_tpu.accel import cpu_ref
from fluctus_tpu.accel.sbvh import build_sbvh
from fluctus_tpu.accel.bvh import build_bvh
from fluctus_tpu.accel.wide import build_wide
from fluctus_tpu.core.types import FlatBVH, WideBVH
from fluctus_tpu.ops import traverse, traverse_wide

from test_bvh import random_rays, random_tris, to_device_bvh


def long_thin_tris(rng, m=150):
    """Elongated triangles spanning the scene — the case spatial splits
    exist for (object splits produce heavily overlapping children)."""
    a = rng.uniform(-3, 3, (m, 3)).astype(np.float32)
    d = rng.normal(size=(m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    v0 = a
    v1 = a + d * rng.uniform(2.0, 5.0, (m, 1)).astype(np.float32)
    v2 = a + rng.uniform(-0.05, 0.05, (m, 3)).astype(np.float32)
    return v0, v1, v2


def test_sbvh_duplicates_and_correctness(rng):
    v0, v1, v2 = long_thin_tris(rng)
    built = build_sbvh(v0, v1, v2)
    # spatial splits should duplicate some references on this geometry
    assert len(built.prim_idx) >= len(v0)
    # every triangle still referenced at least once
    assert set(built.prim_idx.tolist()) == set(range(len(v0)))

    dbvh = to_device_bvh(built)
    orig, dir = random_rays(rng, b=256)
    res = traverse.traverse_closest(
        dbvh, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
        jnp.asarray(orig), jnp.asarray(dir), np.float32(1e30))
    t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig, dir)
    np.testing.assert_array_equal(np.asarray(res.prim) >= 0, prim_ref >= 0)
    hit = prim_ref >= 0
    np.testing.assert_allclose(np.asarray(res.t)[hit], t_ref[hit],
                               rtol=1e-4, atol=1e-5)


def test_sbvh_wide_collapse_correct(rng):
    """The wide collapse must stay correct on SBVH trees with duplicates."""
    v0, v1, v2 = long_thin_tris(rng, m=120)
    built = build_sbvh(v0, v1, v2)
    w = build_wide(built, v0, v1, v2)
    wbvh = WideBVH(nodes=jnp.asarray(w.nodes), leaves=jnp.asarray(w.leaves),
                   root_ref=int(w.root_ref), depth=int(w.depth),
                   leaf_width=int(w.leaves.shape[1]))
    orig, dir = random_rays(rng, b=256)
    res = traverse_wide.traverse_closest(wbvh, jnp.asarray(orig),
                                         jnp.asarray(dir), np.float32(1e30))
    t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig, dir)
    np.testing.assert_array_equal(np.asarray(res.prim) >= 0, prim_ref >= 0)
    hit = prim_ref >= 0
    np.testing.assert_allclose(np.asarray(res.t)[hit], t_ref[hit],
                               rtol=1e-4, atol=1e-5)


def test_sbvh_quality_not_worse_on_compact_tris(rng):
    """On compact tris (no need for spatial splits) SBVH ~ BVH node counts."""
    v0, v1, v2 = random_tris(rng, m=300)
    sb = build_sbvh(v0, v1, v2)
    b = build_bvh(v0, v1, v2)
    assert sb.n_nodes <= b.n_nodes * 2
    assert len(sb.prim_idx) <= int(len(v0) * 1.6)


def test_native_unsplit_arbitration_stats():
    """The native SBVH reports duplication accounting (reference logs the
    same, src/sbvh.cpp:41-48) and the unsplit arbitration actually fires:
    on long thin tris some straddlers duplicate AND some unsplit. Trees
    with unsplit references must still traverse exactly.

    Uses a LOCAL fixed-seed generator: the session-scoped rng fixture's
    draw sequence depends on which tests ran before this one, and
    whether unsplit fires is data-dependent (flaked when the file ran
    in a different subset). Seed 11 produces both unsplit directions."""
    from fluctus_tpu.accel import native
    if not native.available():
        import pytest
        pytest.skip("no g++ toolchain")
    rng = np.random.default_rng(11)
    v0, v1, v2 = long_thin_tris(rng, m=400)
    nb = native.build_native(v0, v1, v2, 8, 64, 1e-5, True)
    st = nb.stats
    assert st is not None and st["spatial_nodes"] > 0
    assert st["duplicated"] > 0
    assert st["unsplit_left"] + st["unsplit_right"] > 0
    assert st["refs"] == len(nb.prim_idx)
    assert st["duplication_pct"] == 100.0 * (st["refs"] - 400) / 400

    dbvh = to_device_bvh(nb)
    orig, dir = random_rays(rng, b=256)
    res = traverse.traverse_closest(
        dbvh, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
        jnp.asarray(orig), jnp.asarray(dir), np.float32(1e30))
    t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig, dir)
    np.testing.assert_array_equal(np.asarray(res.prim) >= 0, prim_ref >= 0)
    hit = prim_ref >= 0
    np.testing.assert_allclose(np.asarray(res.t)[hit], t_ref[hit],
                               rtol=1e-4, atol=1e-5)


def test_native_builder_parity():
    """C++ and NumPy SBVH builders are independent implementations with
    different float tie-breaks, so trees are NOT bit-identical; parity is
    a principled SAH-cost bound (MacDonald-Booth expected traversal cost
    within 10%) plus matching duplication scale, over multiple fixed seeds.
    Both trees must also traverse correctly vs the brute-force oracle."""
    from fluctus_tpu.accel import native
    from fluctus_tpu.accel.bvh import sah_cost
    if not native.available():
        import pytest
        pytest.skip("no g++ toolchain")
    for seed in (0, 1, 2, 7, 42):
        r = np.random.default_rng(seed)
        v0, v1, v2 = long_thin_tris(r, m=200)
        nb = native.build_native(v0, v1, v2, 8, 64, 1e-5, True)
        pb = build_sbvh(v0, v1, v2)
        cn, cp = sah_cost(nb), sah_cost(pb)
        assert abs(cn - cp) <= 0.10 * min(cn, cp), \
            f"seed {seed}: SAH cost native {cn:.2f} vs numpy {cp:.2f}"
        assert abs(len(nb.prim_idx) - len(pb.prim_idx)) <= 0.10 * 200, \
            f"seed {seed}: refs native {len(nb.prim_idx)} numpy {len(pb.prim_idx)}"
        # correctness of BOTH trees through traversal vs the oracle
        orig, dir = random_rays(r, b=128)
        t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(
            v0, v1, v2, orig, dir)
        for built in (nb, pb):
            res = traverse.traverse_closest(
                to_device_bvh(built), jnp.asarray(v0), jnp.asarray(v1),
                jnp.asarray(v2), jnp.asarray(orig), jnp.asarray(dir),
                np.float32(1e30))
            np.testing.assert_array_equal(
                np.asarray(res.prim) >= 0, prim_ref >= 0)
