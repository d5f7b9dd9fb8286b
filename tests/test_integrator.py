"""End-to-end integrator correctness on analytically-solvable scenes.

This replaces the reference's by-eye MIS consistency check
(src/tracer.cpp:837-855 toggleSamplingMode) with statistical assertions:
all three sampling modes (explicit / implicit / MIS) must agree with each
other and with the analytic answer.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from fluctus_tpu.core.types import RenderConfig, default_params
from fluctus_tpu.integrators import lockstep
from fluctus_tpu.render import driver

from helpers import big_quad, diffuse_material, make_host_scene

RHO = 0.6
RHO_LIN = RHO ** 2.2  # reference gamma-decodes Kd (src/utils.cl:136-141)


def plane_session(sample_impl=True, sample_expl=True, env_val=1.0,
                  use_area_light=False, area_light=None, max_bounces=2):
    v0, v1, v2 = big_quad(y=0.0, half=500.0)
    # NOTE: env resolution matters for the analytic checks — NEE samples
    # texel centers, so ∫cosθ is a Riemann sum over H latitudes (error
    # ~1/H²; at 4×8 it is +11%). 32×64 keeps it <0.1%.
    env = np.full((32, 64, 3), env_val, np.float32)
    host = make_host_scene(v0, v1, v2,
                           materials=[diffuse_material((RHO, RHO, RHO))],
                           env_image=env if env_val is not None else None)
    host.build_bvh(cache_dir=None, use_sbvh=False)
    scene = host.to_device()
    cfg = RenderConfig(width=24, height=24, max_bounces=max_bounces,
                       use_env_map=env_val is not None,
                       use_area_light=use_area_light,
                       sample_impl=sample_impl, sample_expl=sample_expl,
                       bsdf_types_mask=host.material_types_mask)
    params = default_params(world_radius=host.world_radius())
    cam = params.camera.replace(
        pos=jnp.array([0.0, 3.0, 0.0], jnp.float32),
        dir=jnp.array([0.0, -1.0, 0.0], jnp.float32),
        up=jnp.array([0.0, 0.0, -1.0], jnp.float32),
        right=jnp.array([1.0, 0.0, 0.0], jnp.float32),
    )
    params = params.replace(camera=cam)
    if area_light is not None:
        params = params.replace(area_light=area_light)
    return scene, params, cfg


def render_mean(scene, params, cfg, spp):
    img = lockstep.render(scene, params, cfg, spp)
    return float(jnp.mean(img))


def test_furnace_diffuse_plane_mis_unbiased():
    """Camera looks straight down at an infinite Lambertian plane under a
    constant unit environment: exact radiance is the albedo (single scatter,
    continuation rays never re-hit). Validates NEE + implicit MIS combo."""
    scene, params, cfg = plane_session()
    mean = render_mean(scene, params, cfg, spp=48)
    np.testing.assert_allclose(mean, RHO_LIN, rtol=0.03)


def test_sampling_modes_converge_to_same_value():
    """Explicit-only, implicit-only and MIS must all estimate the same
    integral (the reference's M-key check, by statistics instead of eyes)."""
    means = {}
    for name, (si, se) in {"mis": (True, True), "expl": (False, True),
                           "impl": (True, False)}.items():
        scene, params, cfg = plane_session(sample_impl=si, sample_expl=se)
        means[name] = render_mean(scene, params, cfg, spp=64)
    assert abs(means["mis"] - RHO_LIN) < 0.02
    assert abs(means["expl"] - RHO_LIN) < 0.02
    assert abs(means["impl"] - RHO_LIN) < 0.06  # impl-only: higher variance


def test_env_only_miss_shows_environment():
    """Rays that miss everything return the env radiance directly."""
    scene, params, cfg = plane_session(env_val=0.25)
    cam = params.camera.replace(dir=jnp.array([0.0, 1.0, 0.0], jnp.float32),
                                up=jnp.array([0.0, 0.0, 1.0], jnp.float32))
    params = params.replace(camera=cam)
    mean = render_mean(scene, params, cfg, spp=4)
    np.testing.assert_allclose(mean, 0.25, rtol=1e-3)


def test_area_light_explicit_vs_implicit():
    """Plane lit only by an area light: explicit and implicit sampling agree
    (cross-check of the two estimator paths incl. the quad intersect)."""
    from fluctus_tpu.core.types import AreaLight
    al = AreaLight(
        pos=jnp.array([0.0, 2.0, 0.0], jnp.float32),
        right=jnp.array([1.0, 0.0, 0.0], jnp.float32),
        up=jnp.array([0.0, 0.0, 1.0], jnp.float32),
        normal=jnp.array([0.0, -1.0, 0.0], jnp.float32),
        emission=jnp.array([40.0, 40.0, 40.0], jnp.float32),
        size=jnp.array([0.4, 0.4], jnp.float32),
    )
    means = {}
    for name, (si, se) in {"expl": (False, True), "impl": (True, False),
                           "mis": (True, True)}.items():
        scene, params, cfg = plane_session(
            sample_impl=si, sample_expl=se, env_val=None,
            use_area_light=True, area_light=al)
        means[name] = render_mean(scene, params, cfg, spp=96)
    assert means["expl"] > 0.005
    np.testing.assert_allclose(means["expl"], means["mis"], rtol=0.15)
    np.testing.assert_allclose(means["impl"], means["mis"], rtol=0.3)


def test_render_deterministic():
    scene, params, cfg = plane_session()
    a = lockstep.render(scene, params, cfg, 2)
    b = lockstep.render(scene, params, cfg, 2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _plane_render_session(**kw):
    """plane_session wrapped as a driver.RenderSession (for driver APIs)."""
    v0, v1, v2 = big_quad(y=0.0, half=500.0)
    env = np.full((32, 64, 3), 1.0, np.float32)
    host = make_host_scene(v0, v1, v2,
                           materials=[diffuse_material((RHO, RHO, RHO))],
                           env_image=env)
    host.build_bvh(cache_dir=None, use_sbvh=False)
    scene, params, cfg = plane_session(**kw)
    return driver.RenderSession(host_scene=host, scene=scene,
                                params=params, cfg=cfg)


def test_progressive_matches_oneshot(tmp_path):
    """K increments into the progressive accumulator == one one-shot
    K·spp render, bit-for-bit (reference semantics: the refinement loop
    adds samples to one accumulator, src/tracer.cpp:189-358)."""
    sess = _plane_render_session()
    prog = driver.ProgressiveRender(sess, samples_per_launch=4)
    prog.add(4)
    prog.add(4)
    assert prog.spp_done == 8
    one = lockstep.render(sess.scene, sess.params, sess.cfg, 8,
                          samples_per_launch=4)
    np.testing.assert_array_equal(prog.image(), np.asarray(one))

    # param change resets the accumulator (reference: iteration=0 on
    # paramsUpdatePending, src/tracer.cpp:203-218)
    sess.params = sess.params.replace(env_strength=jnp.float32(2.0))
    prog.add(4)
    assert prog.spp_done == 4

    # driver loop + periodic auto-export (src/tracer.cpp:356-357)
    out = tmp_path / "prog.png"
    img = driver.render_progressive(sess, iterations=2, spp_increment=4,
                                    export_every=1, export_path=str(out))
    assert out.exists()
    assert img.shape == (sess.cfg.height, sess.cfg.width, 3)


def test_teapot_smoke():
    """BASELINE config 1 shape: teapot.ply + env map, Lambert-only."""
    cfg = RenderConfig(width=32, height=32, max_bounces=2,
                       use_area_light=False)
    sess = driver.create_session(
        "/root/reference/assets/teapot.ply",
        env_map="/root/reference/assets/env_maps/night.hdr",
        cfg=cfg, use_sbvh=False, cache_dir=None)
    img = driver.render(sess, spp=2)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.0


def test_integrator_decision_boundary():
    """Pure decision rule (r2 verdict weak 5): open scenes pick the stream,
    closed scenes pick lockstep, and the boundary follows the calibrated
    0.55·(mb+1) threshold exactly."""
    from fluctus_tpu.render.driver import integrator_decision
    mb = 4
    # teapot-like: 30% hit rate, most bounces escape -> short paths
    assert integrator_decision(0.3, 0.9, mb) == "stream"
    # egyptcat-like: everything hits, almost nothing escapes -> long paths
    assert integrator_decision(1.0, 0.05, mb) == "lockstep"
    # exact boundary: mean_len = 1 + h*min(1/e, mb) vs 0.55*(mb+1) = 2.75
    # with e=0.5 -> mean_len = 1 + 2h; boundary at h = 0.875
    assert integrator_decision(0.875, 0.5, mb) == "stream"   # == threshold
    assert integrator_decision(0.88, 0.5, mb) == "lockstep"  # just above
    # escape rate floors at 1/(mb+1): e=0 must not divide by zero
    assert integrator_decision(1.0, 0.0, mb) == "lockstep"
    # fully open sky: no hits at all -> mean_len 1 -> stream
    assert integrator_decision(0.0, 0.0, mb) == "stream"
    # no light sampling (no env map, no area light): always lockstep —
    # r3 protocol ground truth (psor-cube 11.1 vs 6.9, gold_rings 10.9
    # vs 8.8 Msamples/s with auto's old stream pick losing both)
    assert integrator_decision(0.3, 0.9, mb, nee=False) == "lockstep"
    assert integrator_decision(0.0, 0.0, mb, nee=False) == "lockstep"


def test_auto_choice_invalidated_on_param_change():
    """The cached auto choice re-probes when params/cfg change (r2 verdict
    weak 5: a camera move can flip the openness profile)."""
    from fluctus_tpu.render import driver
    scene, params, cfg = plane_session()
    sess = driver.RenderSession(host_scene=None, scene=scene, params=params,
                                cfg=cfg)
    driver.render(sess, 1, integrator="auto")
    first_key = sess._choice_key
    assert first_key is not None
    # same params object -> cache reused (key unchanged)
    driver.render(sess, 1, integrator="auto")
    assert sess._choice_key == first_key
    # identical CONTENT in a new object -> key unchanged (the r3 id()-
    # based key could recycle across unrelated objects; the content hash
    # both fixes that and legitimately reuses equal-content params)
    sess.params = params.replace()
    driver.render(sess, 1, integrator="auto")
    assert sess._choice_key == first_key
    # changed content -> re-probe (key differs)
    cam = params.camera.replace(pos=params.camera.pos + 1.0)
    sess.params = params.replace(camera=cam)
    driver.render(sess, 1, integrator="auto")
    assert sess._choice_key != first_key
