"""Wavefront integrator tests: the MK-vs-WF cross-check the reference does
by eye (SURVEY §4 item 3) plus pool-mechanics invariants."""
import jax.numpy as jnp
import numpy as np

from fluctus_tpu.integrators import lockstep, wavefront

from helpers import big_quad, diffuse_material, make_host_scene
from test_integrator import plane_session, RHO_LIN


def test_wavefront_matches_lockstep():
    """Both integrators estimate the same integral on the analytic plane."""
    scene, params, cfg = plane_session()
    cfg = cfg.replace(pool_size=1 << 14)
    wf = float(jnp.mean(wavefront.render(scene, params, cfg, spp=32)))
    ls = float(jnp.mean(lockstep.render(scene, params, cfg, spp=32)))
    np.testing.assert_allclose(wf, RHO_LIN, rtol=0.02)
    np.testing.assert_allclose(ls, RHO_LIN, rtol=0.02)


def test_wavefront_pool_smaller_than_image():
    """Pixel striding must cover the whole image even when the pool is much
    smaller than the pixel count (reference: wf_raygen.cl:25)."""
    scene, params, cfg = plane_session()
    cfg = cfg.replace(pool_size=64)  # 24x24=576 pixels, pool of 64
    img = wavefront.render(scene, params, cfg, spp=2)
    # every pixel must have received samples (no zeros from striding gaps)
    assert float(jnp.min(jnp.mean(img, axis=-1))) > 0.1


def test_wavefront_roulette_terminates():
    """Russian roulette on: renders finish and stay unbiased-ish."""
    scene, params, cfg = plane_session(max_bounces=1)
    cfg = cfg.replace(pool_size=1 << 12, use_roulette=True)
    img = wavefront.render(scene, params, cfg, spp=16, max_iters=600)
    m = float(jnp.mean(img))
    np.testing.assert_allclose(m, RHO_LIN, rtol=0.1)


def test_wavefront_samples_accounted():
    scene, params, cfg = plane_session()
    cfg = cfg.replace(pool_size=1 << 12)
    state = wavefront.init_state(params, cfg)
    fb = jnp.zeros((cfg.width * cfg.height, 4), jnp.float32)
    counters = jnp.zeros((3,), jnp.uint32)
    n_pix = cfg.width * cfg.height
    counters = counters.at[0].set(cfg.pool_size % n_pix)
    counters = counters.at[1].set((cfg.pool_size + n_pix - 1) // n_pix)
    for _ in range(12):
        state, fb, counters = wavefront.wavefront_iteration(
            scene, params, cfg, state, fb, counters)
    # splatted weight total equals the samples_done counter
    assert int(jnp.sum(fb[:, 3])) == int(counters[2])
