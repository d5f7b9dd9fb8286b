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


def test_bf16_conservative_bounds(rng):
    """Quantized box coords must bound the f32 value from the right side and
    stay within one bf16 ulp."""
    x = np.concatenate([
        rng.normal(size=8192) * 10.0 ** rng.integers(-6, 6, size=8192),
        np.array([0.0, -0.0, 3e37, -3e37, 1e-20, -1e-20])]).astype(np.float32)
    xj = jnp.asarray(x)
    lo = np.asarray(tm._bf16_conservative(xj, up=False).astype(jnp.float32))
    hi = np.asarray(tm._bf16_conservative(xj, up=True).astype(jnp.float32))
    assert (lo <= x).all()
    assert (hi >= x).all()
    span = np.maximum(np.abs(x) * 2.0 ** -7, 2e-38)
    assert (x - lo <= span).all()
    assert (hi - x <= span).all()


def test_split3_exact(rng):
    """The 3-way bf16 vertex split must reconstruct f32 bit-exactly."""
    x = np.concatenate([
        rng.normal(size=8192) * 10.0 ** rng.integers(-6, 6, size=8192),
        np.array([0.0, -0.0, 1.0 + 2.0 ** -23, 3e37])]).astype(np.float32)
    b1, b2, b3 = tm._split3(jnp.asarray(x))
    rec = np.asarray((b1.astype(jnp.float32) + b2.astype(jnp.float32))
                     + b3.astype(jnp.float32))
    assert (rec == x).all()  # -0.0 == 0.0: zero sign may flip, value exact
    nz = x != 0
    np.testing.assert_array_equal(rec[nz].view(np.int32),
                                  x[nz].view(np.int32))


def test_mxu_tables_roundtrip(rng):
    """Tags/indices/tri-ids survive the byte-chunk encoding exactly."""
    v0, v1, v2 = random_tris(rng, m=500)
    wbvh = make_wide(v0, v1, v2)
    nodes_t, leaves_t = tm.mxu_tables(wbvh)
    nodes = np.asarray(nodes_t.astype(jnp.float32)).T  # (Tpad, 72)
    refs = np.asarray(wbvh.nodes[:, 48:56]).view(np.int32)
    boxes = np.asarray(wbvh.nodes[:, 0:48]).reshape(-1, 8, 6)
    n = refs.shape[0]
    tag = nodes[:n, 48:56]
    idx = nodes[:n, 56:64] * 256 + nodes[:n, 64:72]
    empty = ~np.isfinite(boxes[:, :, 0])
    is_leaf = (refs < 0) & ~empty
    inner = (refs >= 0) & ~empty
    assert (tag[empty] == 2).all()
    assert (tag[is_leaf] == 1).all()
    assert (tag[inner] == 0).all()
    np.testing.assert_array_equal(idx[is_leaf], ~refs[is_leaf])
    np.testing.assert_array_equal(idx[inner], refs[inner])
    # leaf table: vertex reconstruction + tid chunks (component-major rows:
    # (s*9 + k)*W + slot; tid chunks at 27W + c*W + slot)
    lv = np.asarray(wbvh.leaves)
    L, W = lv.shape[0], lv.shape[1]
    lt = np.asarray(leaves_t.astype(jnp.float32)).T   # (Lpad, 30W)
    vw = 9 * W
    rec = lt[:L, 0:vw] + lt[:L, vw:2 * vw] + lt[:L, 2 * vw:3 * vw]
    rec = rec.reshape(L, 9, W).transpose(0, 2, 1)     # (L, W, 9)
    np.testing.assert_array_equal(rec, lv[:, :, 0:9])
    tids = lv[:, :, 9].view(np.int32)
    ch = lt[:L, 3 * vw:].reshape(L, 3, W)
    dec = (ch[:, 0, :] * 65536 + ch[:, 1, :] * 256
           + ch[:, 2, :]).astype(np.int64) - 1
    np.testing.assert_array_equal(dec, tids)


def test_mxu_forest_matches_oracle(rng, interp):
    """Treelet-forest per-lane traversal (beyond-VMEM path) vs oracle."""
    from fluctus_tpu.accel.wide import build_wide_forest
    v0, v1, v2 = random_tris(rng, m=800)
    # tiny budget forces several chunks
    forests, maps = build_wide_forest(v0, v1, v2, bvh_mod.build_bvh,
                                      budget_bytes=25_000)
    assert len(forests) >= 3
    chunks = tuple(
        WideBVH(nodes=jnp.asarray(w.nodes), leaves=jnp.asarray(w.leaves),
                root_ref=int(w.root_ref), depth=int(w.depth),
                leaf_width=int(w.leaves.shape[1])) for w in forests)
    pmaps = tuple(jnp.asarray(m) for m in maps)
    orig, dir = random_rays(rng, b=512)
    res = tm.traverse_closest_forest(chunks, pmaps, jnp.asarray(orig),
                                     jnp.asarray(dir), np.float32(1e30),
                                     blk=128)
    t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig, dir)
    np.testing.assert_array_equal(np.asarray(res.prim) >= 0, prim_ref >= 0)
    hit = prim_ref >= 0
    np.testing.assert_allclose(np.asarray(res.t)[hit], t_ref[hit],
                               rtol=1e-4, atol=1e-5)
    t_max = np.full(len(orig), 2.0, np.float32)
    blocked = tm.traverse_any_forest(chunks, jnp.asarray(orig),
                                     jnp.asarray(dir), jnp.asarray(t_max),
                                     blk=128)
    ref = cpu_ref.intersect_any(v0, v1, v2, orig, dir, t_max)
    np.testing.assert_array_equal(np.asarray(blocked), ref)


def test_mxu_tmax_above_big_sentinel(rng, interp):
    """t_max above the kernel's BIG sentinel (trace_scene passes f32-max
    3.4e38) must not fabricate hits: regression for the phantom prim-0
    bug where the all-miss leaf sentinel counted as an improvement."""
    v0, v1, v2 = random_tris(rng, m=200)
    orig, dir = random_rays(rng, b=256)
    # aim half the rays away from everything
    orig[128:] += 100.0
    wbvh = make_wide(v0, v1, v2)
    res = tm.traverse_closest(wbvh, jnp.asarray(orig), jnp.asarray(dir),
                              np.float32(3.4e38), blk=128)
    t_ref, prim_ref, _, _ = cpu_ref.intersect_closest(v0, v1, v2, orig, dir)
    np.testing.assert_array_equal(np.asarray(res.prim) >= 0, prim_ref >= 0)


def test_fused_ext_shadow_parity(rng, interp):
    """CPU-runnable parity for the fused ext+shadow traversal
    (common.trace_scene_with_shadow mxu branch): ONE closest call over
    [ext rays ; shadow rays] with per-lane t_max, where shadow lanes map
    prim>=0 to blocked. Must agree with the separate closest/any calls —
    the fused branch otherwise only runs on real TPU hardware
    (r3 advisor finding)."""
    v0, v1, v2 = random_tris(rng, m=400)
    orig, dir = random_rays(rng, b=256)
    sh_orig, sh_dir = random_rays(rng, b=256)
    wbvh = make_wide(v0, v1, v2)
    assert wbvh.root_ref >= 0
    sh_len = np.full(256, 2.5, np.float32)

    o2 = jnp.concatenate([jnp.asarray(orig), jnp.asarray(sh_orig)])
    d2 = jnp.concatenate([jnp.asarray(dir), jnp.asarray(sh_dir)])
    t2 = jnp.concatenate([jnp.full((256,), 3.4e38, jnp.float32),
                          jnp.asarray(sh_len)])
    fused = tm.traverse_closest(wbvh, o2, d2, t2, blk=128)
    fused_blocked = np.asarray(fused.prim[256:] >= 0)

    sep = tm.traverse_closest(wbvh, jnp.asarray(orig), jnp.asarray(dir),
                              np.float32(3.4e38), blk=128)
    sep_blocked = np.asarray(tm.traverse_any(
        wbvh, jnp.asarray(sh_orig), jnp.asarray(sh_dir),
        jnp.asarray(sh_len), blk=128))

    np.testing.assert_array_equal(np.asarray(fused.prim[:256]),
                                  np.asarray(sep.t * 0 + sep.prim))
    np.testing.assert_allclose(np.asarray(fused.t[:256]),
                               np.asarray(sep.t), rtol=0, atol=0)
    np.testing.assert_array_equal(fused_blocked, sep_blocked)


def test_trace_scene_with_shadow_fused_branch(rng, interp):
    """End-to-end check of common.trace_scene_with_shadow's FUSED branch
    (backend='mxu'): same Hit + blocked as the two-call fallback on the
    same rays. The fused branch otherwise only executes on real TPU
    hardware (r3 advisor finding)."""
    from fluctus_tpu.core.types import RenderConfig
    from fluctus_tpu.integrators import common
    from fluctus_tpu.core.types import default_params
    from helpers import make_host_scene, diffuse_material

    v0, v1, v2 = random_tris(rng, m=400)
    host = make_host_scene(np.asarray(v0), np.asarray(v1), np.asarray(v2),
                           materials=[diffuse_material()])
    host.build_bvh(cache_dir=None, use_sbvh=False)
    scene = host.to_device()
    assert scene.wbvh.root_ref >= 0 and scene.ftables is None \
        and not scene.wforest

    orig, dir = random_rays(rng, b=256)
    sh_orig, sh_dir = random_rays(rng, b=256)
    sh_len = jnp.full((256,), 2.5, jnp.float32)
    params = default_params(world_radius=host.world_radius())

    cfg_m = RenderConfig(width=8, height=8, use_env_map=False,
                         backend="mxu")
    hit_f, blk_f = common.trace_scene_with_shadow(
        scene, params, cfg_m, jnp.asarray(orig), jnp.asarray(dir),
        jnp.asarray(sh_orig), jnp.asarray(sh_dir), sh_len)

    cfg_w = cfg_m.replace(backend="wide")
    hit_s, blk_s = common.trace_scene_with_shadow(
        scene, params, cfg_w, jnp.asarray(orig), jnp.asarray(dir),
        jnp.asarray(sh_orig), jnp.asarray(sh_dir), sh_len)

    np.testing.assert_array_equal(np.asarray(hit_f.prim),
                                  np.asarray(hit_s.prim))
    h = np.asarray(hit_f.prim) >= 0
    np.testing.assert_allclose(np.asarray(hit_f.t)[h],
                               np.asarray(hit_s.t)[h], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(blk_f), np.asarray(blk_s))
