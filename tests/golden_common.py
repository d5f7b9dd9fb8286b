"""Golden-image render definitions shared by scripts/make_goldens.py (the
generator) and tests/test_golden.py (the regression check).

SURVEY §4: the reference validates shading by eye (two integrators + the
M-key sampling-mode toggle, src/tracer.cpp:837-855); this suite makes the
check mechanical with fixed-seed pixel-level goldens on the BASELINE staged
configs. Goldens are rendered on the CPU backend (the suite's platform,
tests/conftest.py) with state restore disabled so they are reproducible
from a clean checkout.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")

# pixel-level tolerance: same code + platform is bit-deterministic
# (test_render_deterministic); the slack absorbs XLA version drift in fused
# transcendentals while still failing on any real shading change — a
# mean-preserving regression (e.g. a swapped MIS weight pair) moves single
# pixels by far more than 1e-3 relative.
RTOL = 1e-3
ATOL = 1e-4


def _cornell_light():
    from fluctus_tpu.core.types import AreaLight
    return AreaLight(
        pos=jnp.array([0.0, 3.95, 0.0], jnp.float32),
        right=jnp.array([1.0, 0.0, 0.0], jnp.float32),
        up=jnp.array([0.0, 0.0, -1.0], jnp.float32),
        normal=jnp.array([0.0, -1.0, 0.0], jnp.float32),
        emission=jnp.array([15.0, 15.0, 15.0], jnp.float32),
        size=jnp.array([1.0, 1.0], jnp.float32),
    )


def golden_session(name: str):
    """Build the RenderSession + spp for a named golden config."""
    from fluctus_tpu.core.types import RenderConfig
    from fluctus_tpu.render import driver

    env = "/root/reference/assets/env_maps/night.hdr"
    if name == "teapot_cfg1":
        # BASELINE config 1: teapot + env MIS, short paths
        cfg = RenderConfig(width=64, height=64, max_bounces=2,
                           use_area_light=False)
        sess = driver.create_session(
            "/root/reference/assets/teapot.ply", env_map=env, cfg=cfg,
            use_sbvh=True, cache_dir=None, state_dir=None)
        return sess, 8
    if name == "luxball_cfg2":
        # BASELINE config 2: glossy + ideal dielectric, MIS env map, DoF
        cfg = RenderConfig(width=64, height=64, max_bounces=4,
                           use_area_light=False)
        sess = driver.create_session(
            os.path.join(REPO, "assets", "luxball_proxy.obj"), env_map=env,
            cfg=cfg, use_sbvh=True, cache_dir=None, state_dir=None)
        cam = sess.params.camera.replace(
            aperture_size=jnp.float32(0.06))  # thin-lens DoF on
        sess.params = sess.params.replace(camera=cam)
        return sess, 8
    if name == "cornell_area":
        # area-light MIS + mirror/GGX mix, no env
        cfg = RenderConfig(width=64, height=64, max_bounces=4,
                           use_area_light=True, use_env_map=False)
        sess = driver.create_session(
            os.path.join(REPO, "assets", "cornell_proxy.obj"), env_map=None,
            cfg=cfg, use_sbvh=True, cache_dir=None, state_dir=None)
        sess.params = sess.params.replace(area_light=_cornell_light())
        return sess, 8
    if name == "kitchen_cfg3":
        # BASELINE config 3: closed textured interior, full BSDF set,
        # 8 bounces, map_Kd/map_bump, ceiling area light (camera/light
        # restored from the committed data/states entry)
        cfg = RenderConfig(width=64, height=64, max_bounces=8,
                           use_area_light=True, use_env_map=False)
        sess = driver.create_session(
            os.path.join(REPO, "assets", "kitchen_proxy.obj"),
            env_map=None, cfg=cfg, use_sbvh=True, cache_dir=None,
            state_dir=os.path.join(REPO, "data", "states"),
            auto_frame=False)
        return sess, 4
    if name == "conference":
        # conference-class proxy (large flat interior, many materials —
        # completes the reference benchmark triple, src/tracer.cpp:384-389)
        cfg = RenderConfig(width=64, height=64, max_bounces=6,
                           use_area_light=True, use_env_map=False)
        sess = driver.create_session(
            os.path.join(REPO, "assets", "conference_proxy.obj"),
            env_map=None, cfg=cfg, use_sbvh=True, cache_dir=None,
            state_dir=os.path.join(REPO, "data", "states"),
            auto_frame=False)
        return sess, 4
    if name == "bforest_cfg4":
        # end-to-end image through the BRUTE-FOREST traversal path (the
        # r4+ default big-scene path) — locks the config-4 render path
        # with a pixel golden (VERDICT r4 weak 7). Teapot geometry with a
        # brute forest attached and backend forced to mxu; the kernel
        # runs in interpret mode on CPU (render_golden patches it).
        from fluctus_tpu.accel.forest import build_brute_forest
        from fluctus_tpu.core.types import BruteForest
        cfg = RenderConfig(width=64, height=64, max_bounces=2,
                           use_area_light=False, backend="mxu")
        sess = driver.create_session(
            "/root/reference/assets/teapot.ply", env_map=env, cfg=cfg,
            use_sbvh=False, cache_dir=None, state_dir=None)
        host = sess.host_scene
        hb = build_brute_forest(host.v0, host.v1, host.v2,
                                target_tris=512, tile=128)
        sess.scene = sess.scene.replace(bforest=BruteForest(
            tris=jnp.asarray(hb.tris), boxes=jnp.asarray(hb.boxes),
            boxes_t=jnp.asarray(hb.boxes_t),
            tboxes=jnp.asarray(hb.tboxes), tile=hb.tile))
        return sess, 4
    raise KeyError(name)


GOLDEN_NAMES = ("teapot_cfg1", "luxball_cfg2", "cornell_area",
                "kitchen_cfg3", "conference", "bforest_cfg4")


def render_golden(name: str) -> np.ndarray:
    from fluctus_tpu.render import driver
    sess, spp = golden_session(name)
    if name == "bforest_cfg4":
        # CPU cannot run the Pallas brute kernel natively — interpret it
        import jax.experimental.pallas as pl
        import fluctus_tpu.ops.traverse_brute as tb
        orig = pl.pallas_call
        tb.pl.pallas_call = \
            lambda *a, **k: orig(*a, **{**k, "interpret": True})
        try:
            return np.asarray(driver.render(sess, spp,
                                            integrator="lockstep"))
        finally:
            tb.pl.pallas_call = orig
    return np.asarray(driver.render(sess, spp, integrator="lockstep"))


def golden_path(name: str) -> str:
    return os.path.join(GOLDEN_DIR, f"{name}.npz")
