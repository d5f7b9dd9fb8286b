"""Differentiable rendering checks (BASELINE config 5 groundwork):
finite-difference validation of pixel gradients w.r.t. material and
environment parameters, and an end-to-end inverse-rendering recovery test.

The counter-based RNG makes the renderer a deterministic function of its
parameters, so central finite differences are exact up to float32 noise as
long as no discrete decision flips (we use diffuse-only scenes and small h).
"""
import jax
import jax.numpy as jnp
import numpy as np

from fluctus_tpu.integrators import lockstep
from fluctus_tpu.parallel.mesh import loss_fn

from test_integrator import plane_session


def render_mean_scalar(scene, params, cfg, kd_scale=None, env_scale=None,
                       spp=2):
    mats = scene.materials
    env = scene.envmap
    if kd_scale is not None:
        mats = mats.replace(kd=mats.kd * kd_scale)
    if env_scale is not None:
        env = env.replace(image=env.image * env_scale)
    s = scene.replace(materials=mats, envmap=env)
    pix = jnp.arange(cfg.width * cfg.height, dtype=jnp.uint32)
    total = 0.0
    for k in range(spp):
        total = total + jnp.mean(
            lockstep.sample_radiance(s, params, cfg, pix, jnp.uint32(k)))
    return total / spp


def test_fd_gradient_kd():
    scene, params, cfg = plane_session(max_bounces=1)
    f = lambda x: render_mean_scalar(scene, params, cfg, kd_scale=x)
    g = jax.grad(f)(jnp.float32(1.0))
    h = 1e-2
    fd = (f(jnp.float32(1.0 + h)) - f(jnp.float32(1.0 - h))) / (2 * h)
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-2)
    assert float(g) > 0.0  # brighter albedo -> brighter image


def test_fd_gradient_env_emission():
    scene, params, cfg = plane_session(max_bounces=1)
    f = lambda x: render_mean_scalar(scene, params, cfg, env_scale=x)
    g = jax.grad(f)(jnp.float32(1.0))
    h = 1e-2
    fd = (f(jnp.float32(1.0 + h)) - f(jnp.float32(1.0 - h))) / (2 * h)
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-2)
    assert float(g) > 0.0


def test_fd_gradient_env_strength_param():
    scene, params, cfg = plane_session(max_bounces=1)

    def f(s):
        p = params.replace(env_strength=s)
        return render_mean_scalar(scene, p, cfg)

    g = jax.grad(f)(jnp.float32(1.0))
    h = 1e-2
    fd = (f(jnp.float32(1.0 + h)) - f(jnp.float32(1.0 - h))) / (2 * h)
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-2)


def test_fd_gradient_camera_fov():
    """Camera-parameter gradients flow (thin-lens/pinhole math is smooth;
    visibility changes make this noisier — loose tolerance)."""
    scene, params, cfg = plane_session(max_bounces=1)

    def f(fov):
        cam = params.camera.replace(fov=fov)
        return render_mean_scalar(scene, params.replace(camera=cam), cfg)

    g = jax.grad(f)(jnp.float32(60.0))
    assert np.isfinite(float(g))


def test_inverse_rendering_recovers_albedo():
    """Optimize kd to match a target rendered with a different kd —
    the gold_rings-style loop (BASELINE config 5) on a synthetic scene."""
    scene, params, cfg = plane_session(max_bounces=1)
    pix = jnp.arange(cfg.width * cfg.height, dtype=jnp.uint32)

    kd_true = scene.materials.kd * 0.5
    target = lockstep.sample_radiance(
        scene.replace(materials=scene.materials.replace(kd=kd_true)),
        params, cfg, pix, jnp.uint32(0))

    @jax.jit
    def step(kd):
        def loss(kd):
            return loss_fn({"kd": kd}, scene, params, cfg, pix,
                           jnp.uint32(0), target)
        l, g = jax.value_and_grad(loss)(kd)
        return l, kd - 2.0 * g

    kd = scene.materials.kd
    losses = []
    for i in range(60):
        l, kd = step(kd)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.05, losses[::10]
    np.testing.assert_allclose(np.asarray(kd), np.asarray(kd_true),
                               atol=0.05)


def test_grad_memory_path_replay():
    """Backward through 6 bounces must not OOM: the checkpointed bounce body
    re-traces instead of storing wavefronts. (Smoke: just runs.)"""
    scene, params, cfg = plane_session(max_bounces=5)
    f = lambda x: render_mean_scalar(scene, params, cfg, kd_scale=x, spp=1)
    g = jax.grad(f)(jnp.float32(1.0))
    assert np.isfinite(float(g))
