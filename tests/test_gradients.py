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


def _camera_grad_session():
    """Infinite plane lit ONLY by the rectangular area light via NEE
    (sample_impl=False): radiance varies smoothly with the hit position
    (distance/cosine to the light), so camera parameters have nonzero
    gradients and no visibility edges pollute finite differences. A
    uniform-env uniform-plane scene is translation/zoom INVARIANT — its
    camera gradients are exactly zero and would pass FD checks trivially.

    The camera is TILTED off the plane normal: with a straight-down view
    one lateral axis can land on a tiny badly-conditioned derivative
    (measured: |dL/dx| ~ 1e-3 with FD flipping sign across h — caught
    after the r4 row-0->+up orientation fix re-framed the light)."""
    scene, params, cfg = plane_session(max_bounces=1, env_val=None,
                                       use_area_light=True,
                                       sample_impl=False)
    d = np.array([0.35, -1.0, 0.2])
    d /= np.linalg.norm(d)
    r = np.cross(d, [0.0, 1.0, 0.0])
    r /= np.linalg.norm(r)
    u = np.cross(r, d)
    cam = params.camera.replace(
        dir=jnp.asarray(d, jnp.float32), right=jnp.asarray(r, jnp.float32),
        up=jnp.asarray(u, jnp.float32))
    return scene, params.replace(camera=cam), cfg


def _fd_check_camera(field, x0, h, rtol=3e-2):
    """Central finite difference vs autodiff for one camera scalar/vector
    field (reference surface: Camera inside RenderParams,
    src/geom.h:163-180)."""
    scene, params, cfg = _camera_grad_session()

    def f(x):
        cam = params.camera.replace(**{field: x})
        return render_mean_scalar(scene, params.replace(camera=cam), cfg)

    g = jax.grad(f)(x0)
    assert float(jnp.abs(g).sum()) > 0.0  # structured scene: nonzero grads
    if x0.ndim == 0:
        fd = (f(x0 + h) - f(x0 - h)) / (2 * h)
        np.testing.assert_allclose(float(g), float(fd), rtol=rtol,
                                   atol=1e-5)
    else:
        for axis in range(x0.shape[0]):
            e = jnp.zeros_like(x0).at[axis].set(h)
            fd = (f(x0 + e) - f(x0 - e)) / (2 * h)
            np.testing.assert_allclose(float(g[axis]), float(fd), rtol=rtol,
                                       atol=2e-4)


def test_fd_gradient_camera_fov():
    _fd_check_camera("fov", jnp.float32(60.0), 0.5)


def test_fd_gradient_camera_pos():
    _fd_check_camera("pos", jnp.array([0.0, 3.0, 0.0], jnp.float32), 1e-2)


def test_fd_gradient_camera_focal_aperture():
    """Thin-lens leaves: focal distance + aperture size (DoF path)."""
    scene, params, cfg = _camera_grad_session()
    cam0 = params.camera.replace(aperture_size=jnp.float32(0.02))

    def f(ap, fd_):
        cam = cam0.replace(aperture_size=ap, focal_dist=fd_)
        return render_mean_scalar(scene, params.replace(camera=cam), cfg)

    ap0, fd0 = jnp.float32(0.02), jnp.float32(2.5)
    g = jax.grad(f, argnums=(0, 1))(ap0, fd0)
    h = 1e-3
    fd_ap = (f(ap0 + h, fd0) - f(ap0 - h, fd0)) / (2 * h)
    fd_fd = (f(ap0, fd0 + h) - f(ap0, fd0 - h)) / (2 * h)
    np.testing.assert_allclose(float(g[0]), float(fd_ap), rtol=3e-2,
                               atol=1e-4)
    np.testing.assert_allclose(float(g[1]), float(fd_fd), rtol=3e-2,
                               atol=1e-4)


def test_fd_gradient_ni_glossy():
    """Index-of-refraction gradient through the glossy Fresnel weighting
    (reference: src/glossy.cl:12-22 Ks<->eta derivation; ni feeds
    fresnel_dielectric in eval). Loose tolerance: the Fresnel lobe CHOICE is
    discrete in ni, so FD carries decision-flip noise."""
    from fluctus_tpu.core.types import BXDF_GLOSSY
    from fluctus_tpu.scene.loaders.obj import MtlMaterial
    from helpers import big_quad, make_host_scene
    from fluctus_tpu.core.types import RenderConfig, default_params

    v0, v1, v2 = big_quad(y=0.0, half=500.0)
    glossy = MtlMaterial(name="g", kd=(0.4, 0.4, 0.4), ks=(0.3, 0.3, 0.3),
                         ns=120.0, ni=1.6, bsdf_type=BXDF_GLOSSY)
    env = np.full((32, 64, 3), 1.0, np.float32)
    host = make_host_scene(v0, v1, v2, materials=[glossy], env_image=env)
    host.build_bvh(cache_dir=None, use_sbvh=False)
    scene = host.to_device()
    # sample_impl=False: radiance is then the bounce-0 NEE eval alone (the
    # up-going glossy continuation ray misses the plane and implicit env is
    # off), which is smooth in ni — the Fresnel lobe CHOICE in bsdf_sample
    # is discrete in ni and would add decision-flip noise to the FD
    cfg = RenderConfig(width=24, height=24, max_bounces=1,
                       sample_impl=False,
                       bsdf_types_mask=host.material_types_mask)
    params = default_params(world_radius=host.world_radius())
    cam = params.camera.replace(
        pos=jnp.array([0.0, 3.0, 0.0], jnp.float32),
        dir=jnp.array([0.0, -1.0, 0.0], jnp.float32),
        up=jnp.array([0.0, 0.0, -1.0], jnp.float32),
        right=jnp.array([1.0, 0.0, 0.0], jnp.float32))
    params = params.replace(camera=cam)

    pix = jnp.arange(cfg.width * cfg.height, dtype=jnp.uint32)

    def f(scale):
        mats = scene.materials.replace(ni=scene.materials.ni * scale)
        s = scene.replace(materials=mats)
        return jnp.mean(lockstep.sample_radiance(s, params, cfg, pix,
                                                 jnp.uint32(0)))

    g = jax.grad(f)(jnp.float32(1.0))
    h = 5e-3
    fd = (f(jnp.float32(1.0 + h)) - f(jnp.float32(1.0 - h))) / (2 * h)
    assert np.isfinite(float(g)) and float(g) != 0.0
    np.testing.assert_allclose(float(g), float(fd), rtol=3e-2, atol=1e-5)


def test_loss_fn_camera_and_ni_leaves():
    """loss_fn grafts camera + ni leaves and produces nonzero gradients
    (the config-5 parameter surface; VERDICT r1 item 5)."""
    scene, params, cfg = _camera_grad_session()
    pix = jnp.arange(cfg.width * cfg.height, dtype=jnp.uint32)
    target = lockstep.sample_radiance(scene, params, cfg, pix,
                                      jnp.uint32(0)) * 0.8
    diff = {"kd": scene.materials.kd,
            "ni": scene.materials.ni,
            "cam_pos": params.camera.pos,
            "cam_fov": params.camera.fov,
            "cam_focal_dist": params.camera.focal_dist}
    loss, grads = jax.value_and_grad(loss_fn)(diff, scene, params, cfg,
                                              pix, jnp.uint32(0), target)
    assert np.isfinite(float(loss))
    assert float(jnp.abs(grads["kd"]).sum()) > 0.0
    assert float(jnp.abs(grads["cam_pos"]).sum()) > 0.0
    assert float(jnp.abs(grads["cam_fov"])) > 0.0
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


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


def test_stream_loss_matches_lockstep_loss():
    """The differentiable stream loss computes the SAME value and the SAME
    gradients as the lockstep loss_fn (bit-compatible RNG; restructured
    schedule only)."""
    import jax
    import jax.numpy as jnp
    from fluctus_tpu.integrators import wavefront
    from fluctus_tpu.parallel.mesh import loss_fn, loss_fn_stream

    scene, params, cfg = plane_session(max_bounces=3)
    n_pix = cfg.width * cfg.height
    n = 256
    pix = jnp.arange(n, dtype=jnp.uint32) * (n_pix // n)
    target = jnp.full((n, 3), 0.1, jnp.float32)
    diff = {"kd": scene.materials.kd}
    pool = 64

    k, drained = wavefront.plan_stream_segments(
        scene, params, cfg, pix, jnp.uint32(0), pool)
    n_seg = int(k) + 2
    assert int(drained) == n

    l_ref, g_ref = jax.value_and_grad(loss_fn)(
        diff, scene, params, cfg, pix, jnp.uint32(0), target)

    def ls(d):
        loss, n_done = loss_fn_stream(d, scene, params, cfg, pix,
                                      jnp.uint32(0), target, pool, n_seg)
        return loss, n_done
    (l_st, n_done), g_st = jax.value_and_grad(ls, has_aux=True)(diff)
    assert int(n_done) == n
    np.testing.assert_allclose(float(l_st), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_st["kd"]),
                               np.asarray(g_ref["kd"]), rtol=2e-4,
                               atol=1e-7)

def test_stream_loss_deferred_matches_immediate():
    """The deferred-shadow stream loss (fused ext+shadow traversal, NEE
    resolved one segment late — reference wf_logic.cl:134-156 structure)
    computes the same loss and gradients as the immediate form: same RNG
    streams and MIS weights, only resolve timing and float summation
    order shift."""
    import jax
    import jax.numpy as jnp
    from fluctus_tpu.integrators import wavefront
    from fluctus_tpu.parallel.mesh import loss_fn_stream

    scene, params, cfg = plane_session(max_bounces=3)
    n_pix = cfg.width * cfg.height
    n = 256
    pix = jnp.arange(n, dtype=jnp.uint32) * (n_pix // n)
    target = jnp.full((n, 3), 0.1, jnp.float32)
    diff = {"kd": scene.materials.kd}
    pool = 64

    k_i, dr_i = wavefront.plan_stream_segments(
        scene, params, cfg, pix, jnp.uint32(0), pool)
    k_d, dr_d = wavefront.plan_stream_segments(
        scene, params, cfg, pix, jnp.uint32(0), pool, deferred=True)
    assert int(dr_i) == n
    assert int(dr_d) == n
    # deferral adds exactly the tail resolve segments, at most 2 extra
    assert int(k_i) <= int(k_d) <= int(k_i) + 2

    def li(d):
        return loss_fn_stream(d, scene, params, cfg, pix, jnp.uint32(0),
                              target, pool, int(k_i) + 2)
    def ld(d):
        return loss_fn_stream(d, scene, params, cfg, pix, jnp.uint32(0),
                              target, pool, int(k_d) + 2, deferred=True)
    (l_i, nd_i), g_i = jax.value_and_grad(li, has_aux=True)(diff)
    (l_d, nd_d), g_d = jax.value_and_grad(ld, has_aux=True)(diff)
    assert int(nd_i) == n
    assert int(nd_d) == n
    np.testing.assert_allclose(float(l_d), float(l_i), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_d["kd"]),
                               np.asarray(g_i["kd"]), rtol=2e-4,
                               atol=1e-7)
