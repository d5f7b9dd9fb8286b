"""À-trous denoiser: MSE reduction on a real noisy render + edge
preservation + blend semantics (reference parity target: the OptiX
denoiser path, SURVEY §2.2; this is its TPU-native replacement)."""
import jax.numpy as jnp
import numpy as np

from fluctus_tpu.ops.denoise import atrous_denoise


def _flat_regions():
    """Synthetic two-region image: noisy piecewise-constant radiance with
    an albedo/normal/depth edge down the middle."""
    rng = np.random.default_rng(7)
    h = w = 64
    left = np.zeros((h, w), bool)
    left[:, : w // 2] = True
    clean = np.where(left[..., None], [2.0, 1.0, 0.2], [0.1, 0.4, 1.5])
    noisy = clean * rng.gamma(4.0, 0.25, size=(h, w, 3))  # mean-1 MC noise
    albedo = np.where(left[..., None], [0.8, 0.5, 0.2], [0.2, 0.3, 0.9])
    normal = np.where(left[..., None], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0])
    depth = np.where(left, 0.3, 0.8)
    return (jnp.asarray(noisy, jnp.float32), jnp.asarray(clean, jnp.float32),
            jnp.asarray(albedo, jnp.float32), jnp.asarray(normal, jnp.float32),
            jnp.asarray(depth, jnp.float32), left)


def test_denoise_reduces_mse():
    noisy, clean, albedo, normal, depth, _ = _flat_regions()
    out = atrous_denoise(noisy, albedo, normal, depth, iterations=4)
    mse_in = float(jnp.mean((noisy - clean) ** 2))
    mse_out = float(jnp.mean((out - clean) ** 2))
    assert mse_out < 0.25 * mse_in


def test_denoise_preserves_edges():
    """The mid-image radiance step must survive (guided by normal/depth)."""
    noisy, clean, albedo, normal, depth, left = _flat_regions()
    out = np.asarray(atrous_denoise(noisy, albedo, normal, depth,
                                    iterations=4))
    l_mean = out[:, :28].mean(axis=(0, 1))
    r_mean = out[:, 36:].mean(axis=(0, 1))
    clean_np = np.asarray(clean)
    np.testing.assert_allclose(l_mean, clean_np[0, 0], rtol=0.15)
    np.testing.assert_allclose(r_mean, clean_np[0, -1], rtol=0.15)


def test_denoise_blend():
    noisy, clean, albedo, normal, depth, _ = _flat_regions()
    out0 = atrous_denoise(noisy, albedo, normal, depth, blend=0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(noisy),
                               atol=1e-6)
    out_half = atrous_denoise(noisy, albedo, normal, depth, blend=0.5)
    out_full = atrous_denoise(noisy, albedo, normal, depth, blend=1.0)
    np.testing.assert_allclose(np.asarray(out_half),
                               0.5 * np.asarray(noisy)
                               + 0.5 * np.asarray(out_full), atol=1e-5)


def test_render_denoised_end_to_end():
    """Driver surface: denoised teapot render has lower variance than the
    raw low-spp render while keeping the silhouette."""
    from fluctus_tpu.core.types import RenderConfig
    from fluctus_tpu.render import driver

    cfg = RenderConfig(width=48, height=48, max_bounces=2,
                       use_area_light=False, backend="wide")
    sess = driver.create_session(
        "/root/reference/assets/teapot.ply",
        env_map="/root/reference/assets/env_maps/night.hdr",
        cfg=cfg, use_sbvh=False, cache_dir=None)
    raw = driver.render(sess, spp=2, integrator="lockstep")
    den = driver.render_denoised(sess, spp=2, integrator="lockstep")
    ref = driver.render(sess, spp=64, integrator="lockstep")
    assert den.shape == raw.shape
    mse_raw = float(np.mean((raw - ref) ** 2))
    mse_den = float(np.mean((den - ref) ** 2))
    assert mse_den < 0.6 * mse_raw, (mse_den, mse_raw)
