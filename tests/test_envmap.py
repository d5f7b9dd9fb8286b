import jax.numpy as jnp
import numpy as np

from fluctus_tpu.core.types import EnvMap
from fluctus_tpu.ops import envmap as env_ops
from fluctus_tpu.scene import envmap as env_host


def make_env(image):
    host = env_host.compute_tables(np.asarray(image, np.float32))
    return EnvMap(image=jnp.asarray(host.image),
                  pdf_table=jnp.asarray(host.pdf_table),
                  prob_table=jnp.asarray(host.prob_table),
                  alias_table=jnp.asarray(host.alias_table))


def test_uv_direction_roundtrip():
    u = jnp.linspace(0.05, 0.95, 13)
    v = jnp.linspace(0.05, 0.95, 13)
    uu, vv = jnp.meshgrid(u, v)
    d = env_ops.uv_to_direction(uu.ravel(), vv.ravel())
    uv = env_ops.direction_to_uv(d)
    np.testing.assert_allclose(np.asarray(uv[..., 0]), np.asarray(uu.ravel()),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(uv[..., 1]), np.asarray(vv.ravel()),
                               atol=1e-5)


def test_alias_tables_preserve_distribution():
    """Sampling via alias tables reproduces the pdf (chi² on texel counts)."""
    rng = np.random.default_rng(7)
    img = rng.uniform(0.1, 4.0, (8, 16, 3)).astype(np.float32)
    env = make_env(img)
    n = 1 << 17
    u = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    h, w = 8, 16
    r = u * (w * h)
    i = jnp.minimum(jnp.floor(r).astype(jnp.int32), w * h - 1)
    take_self = (r - i) < env.prob_table[i]
    idx = np.asarray(jnp.where(take_self, i, env.alias_table[i]))
    counts = np.bincount(idx, minlength=w * h)
    expected = np.asarray(env.pdf_table) / (w * h) * n
    chi2 = ((counts - expected) ** 2 / np.maximum(expected, 1)).sum()
    assert chi2 < 2.5 * w * h, chi2


def test_sample_pdf_consistency():
    """pdf returned by sample_alias matches pdf_dir at the sampled dir."""
    rng = np.random.default_rng(3)
    img = rng.uniform(0.1, 4.0, (16, 32, 3)).astype(np.float32)
    env = make_env(img)
    u = jnp.asarray(rng.uniform(size=4096).astype(np.float32))
    L, pdf_s = env_ops.sample_alias(env, u)
    pdf_q = env_ops.pdf_dir(env, L)
    np.testing.assert_allclose(np.asarray(pdf_q), np.asarray(pdf_s),
                               rtol=1e-3, atol=1e-6)


def test_sample_estimates_integral():
    """MC estimate of ∫ Li dω with alias sampling matches the true integral
    (validates pdf normalization incl. the sinθ Jacobian)."""
    rng = np.random.default_rng(11)
    img = rng.uniform(0.2, 2.0, (16, 32, 3)).astype(np.float32)
    env = make_env(img)
    n = 1 << 16
    u = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    L, pdf = env_ops.sample_alias(env, u)
    li = env_ops.eval_dir(env, L)
    est = np.asarray(jnp.mean(
        li / jnp.maximum(pdf, 1e-12)[..., None], axis=0))
    # true integral over sphere: sum texel * sinθ * (2π/W)(π/H)
    h, w = img.shape[:2]
    v = (np.arange(h) + 0.5) / h
    sin_th = np.sin(np.pi * v)[:, None, None]
    true = (img * sin_th).sum((0, 1)) * (2 * np.pi / w) * (np.pi / h)
    np.testing.assert_allclose(est, true, rtol=0.1)


def test_dummy_env():
    env_h = env_host.dummy()
    assert env_h.image.shape == (1, 1, 3)
    assert np.allclose(env_h.pdf_table, 1.0)


def test_hdr_roundtrip(tmp_path):
    from fluctus_tpu.io.hdr import read_hdr, write_hdr
    rng = np.random.default_rng(5)
    img = (rng.uniform(0, 1, (12, 20, 3)) ** 2 * 8).astype(np.float32)
    p = str(tmp_path / "t.hdr")
    write_hdr(p, img)
    back = read_hdr(p)
    assert back.shape == img.shape
    # RGBE shares one 8-bit exponent across channels: absolute error is
    # bounded by the max component / 256 (half-ulp of the shared mantissa)
    tol = img.max(axis=-1, keepdims=True) / 128.0 + 1e-6
    assert (np.abs(back - img) <= tol).all()


def test_reference_night_hdr_loads():
    env = env_host.load("/root/reference/assets/env_maps/night.hdr")
    assert env.image.ndim == 3 and env.image.shape[2] == 3
    assert env.image.min() >= 0.0
    assert np.isfinite(env.image).all()
    # pdf normalized: mean == 1
    np.testing.assert_allclose(env.pdf_table.mean(), 1.0, rtol=1e-3)
