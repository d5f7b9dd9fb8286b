"""MXU one-hot-gather per-lane traversal vs the brute-force oracle.

Runs the Pallas kernel in interpret mode on CPU (same approach as the
packet-kernel tests); the real-hardware path is exercised by
scripts/bench_traversal.py and the driver benchmark."""
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

import fluctus_tpu.ops.traverse_mxu as tm
from fluctus_tpu.accel import bvh as bvh_mod, cpu_ref
from fluctus_tpu.accel.wide import build_wide
from fluctus_tpu.core.types import WideBVH

from test_bvh import random_rays, random_tris


@pytest.fixture
def interp(monkeypatch):
    orig_call = pl.pallas_call
    monkeypatch.setattr(
        tm.pl, "pallas_call",
        lambda *a, **k: orig_call(*a, **{**k, "interpret": True}))


def make_wide(v0, v1, v2) -> WideBVH:
    built = bvh_mod.build_bvh(v0, v1, v2)
    w = build_wide(built, v0, v1, v2)
    return WideBVH(nodes=jnp.asarray(w.nodes), leaves=jnp.asarray(w.leaves),
                   root_ref=int(w.root_ref), depth=int(w.depth),
                   leaf_width=int(w.leaves.shape[1]))


def test_mxu_closest_matches_oracle(rng, interp):
    v0, v1, v2 = random_tris(rng, m=500)
    orig, dir = random_rays(rng, b=640)
    wbvh = make_wide(v0, v1, v2)
    assert wbvh.root_ref >= 0
    res = tm.traverse_closest(wbvh, jnp.asarray(orig), jnp.asarray(dir),
                              np.float32(1e30), blk=128)
    t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig, dir)
    np.testing.assert_array_equal(np.asarray(res.prim) >= 0, prim_ref >= 0)
    hit = prim_ref >= 0
    np.testing.assert_allclose(np.asarray(res.t)[hit], t_ref[hit],
                               rtol=1e-4, atol=1e-5)


def test_mxu_any_matches_oracle(rng, interp):
    v0, v1, v2 = random_tris(rng, m=500)
    orig, dir = random_rays(rng, b=384)
    wbvh = make_wide(v0, v1, v2)
    t_max = np.full(len(orig), 2.5, np.float32)
    blocked = tm.traverse_any(wbvh, jnp.asarray(orig), jnp.asarray(dir),
                              jnp.asarray(t_max), blk=128)
    ref = cpu_ref.intersect_any(v0, v1, v2, orig, dir, t_max)
    np.testing.assert_array_equal(np.asarray(blocked), ref)


def test_mxu_leaf_root_falls_back(rng):
    """Tiny scenes collapse to a leaf root; the MXU path must still answer
    (delegates to the wide backend)."""
    v0, v1, v2 = random_tris(rng, m=10)
    wbvh = make_wide(v0, v1, v2)
    assert wbvh.root_ref < 0
    orig, dir = random_rays(rng, b=64)
    res = tm.traverse_closest(wbvh, jnp.asarray(orig), jnp.asarray(dir),
                              np.float32(1e30))
    t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig, dir)
    np.testing.assert_array_equal(np.asarray(res.prim) >= 0, prim_ref >= 0)
