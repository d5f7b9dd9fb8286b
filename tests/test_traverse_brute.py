"""Brute-chunk streamed traversal (ops/traverse_brute.py) vs oracle.

Runs the Pallas kernel in interpret mode on CPU (same approach as the
MXU/treelet tests); the real-hardware path is exercised by
scripts/bench_forest.py --brute and the config-4 protocol runs."""
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

import fluctus_tpu.ops.traverse_brute as tb
from fluctus_tpu.accel import cpu_ref
from fluctus_tpu.accel.forest import build_brute_forest
from fluctus_tpu.core.types import BruteForest

from test_bvh import random_rays, random_tris


@pytest.fixture
def interp(monkeypatch):
    orig_call = pl.pallas_call
    monkeypatch.setattr(
        tb.pl, "pallas_call",
        lambda *a, **k: orig_call(*a, **{**k, "interpret": True}))


@pytest.fixture(params=["vlist", "rounds"])
def sched(request, monkeypatch):
    """Run oracle tests under BOTH brute schedulers: the r5 visit-list
    (default) and the r4 round-loop walk."""
    monkeypatch.setenv("FLUCTUS_BRUTE_SCHED", request.param)
    return request.param


@pytest.fixture
def rounds_only(monkeypatch):
    monkeypatch.setenv("FLUCTUS_BRUTE_SCHED", "rounds")


def make_brute(v0, v1, v2, target_tris=128, tile=128):
    host = build_brute_forest(v0, v1, v2, target_tris=target_tris,
                              tile=tile)
    return BruteForest(tris=jnp.asarray(host.tris),
                       boxes=jnp.asarray(host.boxes),
                       boxes_t=jnp.asarray(host.boxes_t),
                       tboxes=jnp.asarray(host.tboxes),
                       tile=host.tile)


def test_brute_closest_matches_oracle(rng, interp, sched):
    v0, v1, v2 = random_tris(rng, m=900)
    orig, dir = random_rays(rng, b=640)
    bf = make_brute(v0, v1, v2)
    assert bf.tris.shape[0] >= 4  # several chunks
    res = tb.traverse_closest(bf, jnp.asarray(orig), jnp.asarray(dir),
                              np.float32(1e30))
    t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig, dir)
    np.testing.assert_array_equal(np.asarray(res.prim) >= 0, prim_ref >= 0)
    hit = prim_ref >= 0
    np.testing.assert_allclose(np.asarray(res.t)[hit], t_ref[hit],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.prim)[hit], prim_ref[hit])


def test_brute_any_matches_oracle(rng, interp, sched):
    v0, v1, v2 = random_tris(rng, m=700)
    orig, dir = random_rays(rng, b=384)
    bf = make_brute(v0, v1, v2)
    t_max = np.full(len(orig), 2.5, np.float32)
    blocked = tb.traverse_any(bf, jnp.asarray(orig), jnp.asarray(dir),
                              jnp.asarray(t_max))
    ref = cpu_ref.intersect_any(v0, v1, v2, orig, dir, t_max)
    np.testing.assert_array_equal(np.asarray(blocked), ref)


def test_brute_plans_agree(rng, interp, rounds_only):
    """Different round plans (single-visit rounds vs the M-ramp) must
    produce identical hits — the multi-visit merge loses only in-round
    best-t pruning, never correctness."""
    v0, v1, v2 = random_tris(rng, m=600)
    orig, dir = random_rays(rng, b=256)
    bf = make_brute(v0, v1, v2, target_tris=64)
    r1 = tb.traverse_closest(bf, jnp.asarray(orig), jnp.asarray(dir),
                             np.float32(1e30), plan=(1,), mm=4)
    r2 = tb.traverse_closest(bf, jnp.asarray(orig), jnp.asarray(dir),
                             np.float32(1e30), plan=(1, 2, 4), mm=4)
    r3 = tb.traverse_closest(bf, jnp.asarray(orig), jnp.asarray(dir),
                             np.float32(1e30), plan=(2, 4), mm=4)
    np.testing.assert_array_equal(np.asarray(r1.prim), np.asarray(r2.prim))
    np.testing.assert_array_equal(np.asarray(r1.prim), np.asarray(r3.prim))
    np.testing.assert_array_equal(np.asarray(r1.t), np.asarray(r2.t))
    np.testing.assert_array_equal(np.asarray(r1.t), np.asarray(r3.t))


def test_brute_tmax_above_big_sentinel(rng, interp, sched):
    """f32-max t_max (what trace_scene passes) must not fabricate hits."""
    v0, v1, v2 = random_tris(rng, m=300)
    orig, dir = random_rays(rng, b=256)
    orig[128:] += 100.0  # aim half the rays away from everything
    bf = make_brute(v0, v1, v2)
    res = tb.traverse_closest(bf, jnp.asarray(orig), jnp.asarray(dir),
                              np.float32(3.4e38))
    t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig, dir)
    np.testing.assert_array_equal(np.asarray(res.prim) >= 0, prim_ref >= 0)


def test_brute_single_chunk(rng, interp, sched):
    """Degenerate C=1 forest still answers (cp pads 1 -> 128)."""
    v0, v1, v2 = random_tris(rng, m=60)
    orig, dir = random_rays(rng, b=128)
    bf = make_brute(v0, v1, v2, target_tris=4096)
    assert bf.tris.shape[0] == 1
    res = tb.traverse_closest(bf, jnp.asarray(orig), jnp.asarray(dir),
                              np.float32(1e30))
    t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig, dir)
    np.testing.assert_array_equal(np.asarray(res.prim) >= 0, prim_ref >= 0)
    hit = prim_ref >= 0
    np.testing.assert_allclose(np.asarray(res.prim)[hit], prim_ref[hit])


def test_trace_scene_dispatch_brute(rng, interp, sched):
    """End-to-end: a DeviceScene carrying bforest routes backend='mxu'
    closest/any-hit (incl. the fused ext+shadow branch) through the
    brute-chunk kernel and agrees with the wide backend."""
    from fluctus_tpu.core.types import RenderConfig, default_params
    from fluctus_tpu.integrators import common
    from helpers import make_host_scene, diffuse_material

    v0, v1, v2 = random_tris(rng, m=500)
    host = make_host_scene(np.asarray(v0), np.asarray(v1), np.asarray(v2),
                           materials=[diffuse_material()])
    host.build_bvh(cache_dir=None, use_sbvh=False)
    scene = host.to_device().replace(bforest=make_brute(v0, v1, v2))

    orig, dir = random_rays(rng, b=256)
    sh_orig, sh_dir = random_rays(rng, b=256)
    sh_len = jnp.full((256,), 2.5, jnp.float32)
    params = default_params(world_radius=host.world_radius())
    cfg_b = RenderConfig(width=8, height=8, use_env_map=False,
                         backend="mxu")
    cfg_w = cfg_b.replace(backend="wide")

    hit_b, blk_b = common.trace_scene_with_shadow(
        scene, params, cfg_b, jnp.asarray(orig), jnp.asarray(dir),
        jnp.asarray(sh_orig), jnp.asarray(sh_dir), sh_len)
    hit_w, blk_w = common.trace_scene_with_shadow(
        scene, params, cfg_w, jnp.asarray(orig), jnp.asarray(dir),
        jnp.asarray(sh_orig), jnp.asarray(sh_dir), sh_len)
    np.testing.assert_array_equal(np.asarray(hit_b.prim),
                                  np.asarray(hit_w.prim))
    np.testing.assert_array_equal(np.asarray(blk_b), np.asarray(blk_w))


def test_brute_width_phases(rng, interp, rounds_only, monkeypatch):
    """Force the width-shrinking drain phases (compaction + rank-gather
    merge) at test scale — they only engage above MIN_PHASE_W rays."""
    monkeypatch.setattr(tb, "MIN_PHASE_W", 64)
    v0, v1, v2 = random_tris(rng, m=700)
    orig, dir = random_rays(rng, b=640)
    bf = make_brute(v0, v1, v2, target_tris=64)
    res = tb.traverse_closest(bf, jnp.asarray(orig), jnp.asarray(dir),
                              np.float32(1e30))
    t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig, dir)
    np.testing.assert_array_equal(np.asarray(res.prim) >= 0, prim_ref >= 0)
    hit = prim_ref >= 0
    np.testing.assert_allclose(np.asarray(res.prim)[hit], prim_ref[hit])
    blocked = tb.traverse_any(bf, jnp.asarray(orig), jnp.asarray(dir),
                              jnp.full((640,), 2.5, jnp.float32))
    ref = cpu_ref.intersect_any(v0, v1, v2, orig, dir,
                                np.full(640, 2.5, np.float32))
    np.testing.assert_array_equal(np.asarray(blocked), ref)


def test_brute_dense_chunk_cap(rng, interp, rounds_only):
    """More active chunks than the per-round dense window (nz): capped
    rounds must still converge to the oracle — unscheduled rays carry an
    unmoved cursor and reschedule (r4c fix for the C*blk pad blowup)."""
    v0, v1, v2 = random_tris(rng, m=2000)
    orig, dir = random_rays(rng, b=256)
    bf = make_brute(v0, v1, v2, target_tris=8)
    assert bf.tris.shape[0] > 128  # forces nz < C at this ray count
    res = tb.traverse_closest(bf, jnp.asarray(orig), jnp.asarray(dir),
                              np.float32(1e30))
    t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig, dir)
    np.testing.assert_array_equal(np.asarray(res.prim) >= 0, prim_ref >= 0)
    hit = prim_ref >= 0
    np.testing.assert_allclose(np.asarray(res.prim)[hit], prim_ref[hit])
    blocked = tb.traverse_any(bf, jnp.asarray(orig), jnp.asarray(dir),
                              jnp.full((256,), 2.5, jnp.float32))
    ref = cpu_ref.intersect_any(v0, v1, v2, orig, dir,
                                np.full(256, 2.5, np.float32))
    np.testing.assert_array_equal(np.asarray(blocked), ref)


def test_brute_nondivisor_tile(rng, interp, sched):
    """tt that does not divide the padded chunk width must not skip the
    tail tile's triangles (ADVICE r4: tt=min(tt,tp) with nt=tp//tt
    silently dropped the remainder). _fit_tile rounds tt down to a
    divisor; hits must match the oracle exactly."""
    v0, v1, v2 = random_tris(rng, m=500)
    orig, dir = random_rays(rng, b=256)
    # tile=128 with target 320 -> widest chunk pads to a non-512 multiple
    bf = make_brute(v0, v1, v2, target_tris=320, tile=128)
    tp = int(bf.tris.shape[2])
    assert tp % 512 != 0 or tp < 512  # the hazard configuration
    res = tb.traverse_closest(bf, jnp.asarray(orig), jnp.asarray(dir),
                              np.float32(1e30), tt=512)
    t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig, dir)
    np.testing.assert_array_equal(np.asarray(res.prim) >= 0, prim_ref >= 0)
    hit = prim_ref >= 0
    np.testing.assert_allclose(np.asarray(res.prim)[hit], prim_ref[hit])


def test_brute_round_cap_exhaustion_flag(rng, interp, rounds_only, monkeypatch):
    """The drain loop's round-cap safety net truncates the work-queue
    walk silently (ADVICE r4); with_flag=True surfaces it. A forced cap
    of 0 rounds must raise the flag; the default cap must not."""
    v0, v1, v2 = random_tris(rng, m=600)
    orig, dir = random_rays(rng, b=256)
    bf = make_brute(v0, v1, v2, target_tris=64)
    _, ok_flag = tb.traverse_closest(bf, jnp.asarray(orig),
                                     jnp.asarray(dir), np.float32(1e30),
                                     with_flag=True)
    assert not bool(ok_flag)
    monkeypatch.setenv("FLUCTUS_BRUTE_ROUND_CAP", "0")
    _, bad_flag = tb.traverse_closest(bf, jnp.asarray(orig),
                                      jnp.asarray(dir), np.float32(1e30),
                                      with_flag=True)
    assert bool(bad_flag)


def test_fast_big_eligibility_and_guard(monkeypatch):
    """fast_big_eligible gates on size + env; the backend guard raises a
    clear error when a hierarchy-needing backend meets a fast-big scene."""
    import types
    import jax
    from fluctus_tpu.scene.scene import fast_big_eligible
    from fluctus_tpu.integrators.common import _check_backend_data
    from fluctus_tpu.core.types import RenderConfig

    small = types.SimpleNamespace(v0=np.zeros((1000, 3)))
    big = types.SimpleNamespace(v0=np.zeros((200_000, 3)))
    # the suite runs on CPU, where the brute path's only renderable
    # backend (a Pallas TPU kernel) cannot run: eligibility must be off
    assert jax.default_backend() == "cpu"
    assert not fast_big_eligible(big)
    # on an accelerator the size/env gates apply
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert not fast_big_eligible(small)
    assert fast_big_eligible(big)
    monkeypatch.setenv("FLUCTUS_FAST_BIG", "0")
    assert not fast_big_eligible(big)
    monkeypatch.delenv("FLUCTUS_FAST_BIG")
    monkeypatch.setenv("FLUCTUS_FOREST", "treelet")
    assert not fast_big_eligible(big)

    scene = types.SimpleNamespace(wbvh=None)
    cfg = RenderConfig(width=8, height=8, backend="wide")
    with pytest.raises(ValueError, match="fast big-scene"):
        _check_backend_data(scene, cfg)
    _check_backend_data(scene, cfg.replace(backend="mxu"))  # ok
