"""Streamed treelet-forest traversal (ops/traverse_forest.py) vs oracle.

Runs the Pallas kernel in interpret mode on CPU (same approach as the
MXU-kernel tests); the real-hardware path is exercised by
scripts/bench_forest.py and the San Miguel-scale protocol runs."""
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

import fluctus_tpu.ops.traverse_forest as tf
from fluctus_tpu.accel import bvh as bvh_mod, cpu_ref
from fluctus_tpu.accel.forest import build_host_forest

from test_bvh import random_rays, random_tris


@pytest.fixture
def interp(monkeypatch):
    orig_call = pl.pallas_call
    monkeypatch.setattr(
        tf.pl, "pallas_call",
        lambda *a, **k: orig_call(*a, **{**k, "interpret": True}))


def make_forest(v0, v1, v2, target_tris=128):
    host = build_host_forest(v0, v1, v2, bvh_mod.build_bvh,
                             target_tris=target_tris)
    return tf.encode_forest(host), host


def test_forest_closest_matches_oracle(rng, interp):
    v0, v1, v2 = random_tris(rng, m=900)
    orig, dir = random_rays(rng, b=640)
    ft, host = make_forest(v0, v1, v2)
    assert ft.nodes.shape[0] >= 4  # several chunks
    res = tf.traverse_closest(ft, jnp.asarray(orig), jnp.asarray(dir),
                              np.float32(1e30), blk=128)
    t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig, dir)
    np.testing.assert_array_equal(np.asarray(res.prim) >= 0, prim_ref >= 0)
    hit = prim_ref >= 0
    np.testing.assert_allclose(np.asarray(res.t)[hit], t_ref[hit],
                               rtol=1e-4, atol=1e-5)
    # global prim ids must agree where the oracle's hit is unique
    np.testing.assert_allclose(np.asarray(res.prim)[hit], prim_ref[hit])


def test_forest_multi_pass_small_k(rng, interp):
    """All three schedules — block-sched kk=1 (many while passes),
    block-sched kk=8, and the per-ray work queue — must agree exactly."""
    v0, v1, v2 = random_tris(rng, m=600)
    orig, dir = random_rays(rng, b=256)
    ft, _ = make_forest(v0, v1, v2)
    r1 = tf.traverse_closest(ft, jnp.asarray(orig), jnp.asarray(dir),
                             np.float32(1e30), blk=128, kk=1,
                             mode="blocksched")
    r8 = tf.traverse_closest(ft, jnp.asarray(orig), jnp.asarray(dir),
                             np.float32(1e30), blk=128, kk=8,
                             mode="blocksched")
    rq = tf.traverse_closest(ft, jnp.asarray(orig), jnp.asarray(dir),
                             np.float32(1e30))
    np.testing.assert_array_equal(np.asarray(r1.prim), np.asarray(r8.prim))
    np.testing.assert_array_equal(np.asarray(r1.t), np.asarray(r8.t))
    np.testing.assert_array_equal(np.asarray(rq.prim), np.asarray(r8.prim))
    np.testing.assert_array_equal(np.asarray(rq.t), np.asarray(r8.t))


def test_forest_any_matches_oracle(rng, interp):
    v0, v1, v2 = random_tris(rng, m=700)
    orig, dir = random_rays(rng, b=384)
    ft, _ = make_forest(v0, v1, v2)
    t_max = np.full(len(orig), 2.5, np.float32)
    blocked = tf.traverse_any(ft, jnp.asarray(orig), jnp.asarray(dir),
                              jnp.asarray(t_max), blk=128)
    ref = cpu_ref.intersect_any(v0, v1, v2, orig, dir, t_max)
    np.testing.assert_array_equal(np.asarray(blocked), ref)


def test_forest_tmax_above_big_sentinel(rng, interp):
    """f32-max t_max must not fabricate hits (phantom prim-0 regression,
    same guarantee as the single-chunk MXU kernel)."""
    v0, v1, v2 = random_tris(rng, m=400)
    orig, dir = random_rays(rng, b=256)
    orig[128:] += 100.0
    ft, _ = make_forest(v0, v1, v2)
    res = tf.traverse_closest(ft, jnp.asarray(orig), jnp.asarray(dir),
                              np.float32(3.4e38), blk=128)
    t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig, dir)
    np.testing.assert_array_equal(np.asarray(res.prim) >= 0, prim_ref >= 0)


def test_forest_schedule_prunes(rng):
    """Blocks must not be scheduled into chunks their rays cannot touch:
    rays aimed straight at one corner chunk keep distant chunks' entries
    at +inf."""
    v0, v1, v2 = random_tris(rng, m=600)
    ft, _ = make_forest(v0, v1, v2)
    lo = np.asarray(ft.boxes[:, 0:3])
    target = int(np.argmin(lo[:, 0] + lo[:, 1] + lo[:, 2]))
    center = np.asarray((ft.boxes[target, 0:3] + ft.boxes[target, 3:6]) / 2)
    orig = np.tile(center + np.array([0, 0, 1e-3], np.float32), (128, 1))
    dir = np.tile(np.array([0, 0, 1.0], np.float32), (128, 1))
    orig_t, dir_t, t_row, _ = tf._prep(jnp.asarray(orig), jnp.asarray(dir),
                                       np.float32(1e30), 128)
    entries = tf._block_entries(ft.boxes, orig_t, dir_t, t_row, 128)
    e = np.asarray(entries)[0]
    assert np.isfinite(e[target])
    assert (~np.isfinite(e)).sum() >= 1  # some chunks pruned
