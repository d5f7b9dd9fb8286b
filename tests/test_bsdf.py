import jax.numpy as jnp
import numpy as np
import pytest

from fluctus_tpu.core import rng, vecmath as vm
from fluctus_tpu.core.types import (
    BSDF_ID, BXDF_DIFFUSE, BXDF_GGX_ROUGH_DIELECTRIC,
    BXDF_GGX_ROUGH_REFLECTION, BXDF_GLOSSY, BXDF_IDEAL_DIELECTRIC,
    BXDF_IDEAL_REFLECTION,
)
from fluctus_tpu.ops import bsdf
from fluctus_tpu.ops.fresnel import fresnel_dielectric

N_SAMPLES = 1 << 14


def make_ctx(bxdf_type, n=N_SAMPLES, kd=(0.6, 0.5, 0.4), ks=(0.8, 0.8, 0.8),
             ns=100.0, ni=1.5, backface=False):
    ones = jnp.ones((n,), jnp.float32)
    return bsdf.ShadingCtx(
        n=jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), (n, 3)),
        backface=jnp.full((n,), backface),
        kd=jnp.broadcast_to(jnp.array(kd, jnp.float32), (n, 3)),
        ks=jnp.broadcast_to(jnp.array(ks, jnp.float32), (n, 3)),
        ns=ns * ones,
        ni=ni * ones,
        bsdf_id=jnp.full((n,), BSDF_ID[bxdf_type], jnp.int32),
    )


def make_wi(n=N_SAMPLES, theta_deg=30.0):
    th = np.deg2rad(theta_deg)
    wi = jnp.array([np.sin(th), 0.0, -np.cos(th)], jnp.float32)  # toward surface
    return jnp.broadcast_to(wi, (n, 3))


def draws(n=N_SAMPLES):
    pix = jnp.arange(n, dtype=jnp.uint32)
    u1 = rng.uniform(pix, 0, 0, rng.Streams.BSDF_U)
    u2 = rng.uniform(pix, 0, 0, rng.Streams.BSDF_V)
    ul = rng.uniform(pix, 0, 0, rng.Streams.BSDF_LOBE)
    return u1, u2, ul


def test_diffuse_furnace():
    """E[f·cosθ/pdf] must equal the albedo exactly (cosine sampling)."""
    ctx = make_ctx(BXDF_DIFFUSE)
    u1, u2, ul = draws()
    s = bsdf.bsdf_sample(ctx, make_wi(), u1, u2, ul)
    cos = jnp.maximum(vm.dot(ctx.n, s.wo), 0.0)
    w = s.f * (cos / jnp.maximum(s.pdf, 1e-8))[..., None]
    est = np.asarray(jnp.mean(w, axis=0))
    np.testing.assert_allclose(est, [0.6, 0.5, 0.4], rtol=1e-2)


def test_diffuse_pdf_matches_sample():
    ctx = make_ctx(BXDF_DIFFUSE)
    u1, u2, ul = draws()
    s = bsdf.bsdf_sample(ctx, make_wi(), u1, u2, ul)
    p = bsdf.bsdf_pdf(ctx, make_wi(), s.wo)
    np.testing.assert_allclose(np.asarray(p), np.asarray(s.pdf), atol=1e-5)


@pytest.mark.parametrize("t", [BXDF_GGX_ROUGH_REFLECTION, BXDF_GLOSSY])
def test_sample_pdf_eval_consistency(t):
    """pdf(wi, sampled_wo) == sample.pdf and eval(wi, sampled_wo) == sample.f
    for non-delta, single-lobe-deterministic directions."""
    ctx = make_ctx(t, ns=40.0, ni=0.0 if t == BXDF_GLOSSY else 1.5)
    wi = make_wi()
    u1, u2, ul = draws()
    s = bsdf.bsdf_sample(ctx, wi, u1, u2, ul)
    p = bsdf.bsdf_pdf(ctx, wi, s.wo)
    f = bsdf.bsdf_eval(ctx, wi, s.wo)
    # Compare only lanes with a usable sample: pdf>0 and f>0. Below-horizon
    # samples have f=0 (Smith sidedness) and the H recomputed from (wi, wo)
    # differs from the sampled H there — inconsistent by construction in the
    # reference algorithm too (src/ggx.cl:132-145 vs :100-110).
    good = (np.asarray(s.pdf) > 1e-3) & (np.asarray(s.f).sum(-1) > 0)
    np.testing.assert_allclose(np.asarray(p)[good], np.asarray(s.pdf)[good],
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(f)[good], np.asarray(s.f)[good],
                               rtol=2e-3, atol=1e-4)


def test_ggx_energy_conservation():
    """With Ks=1 and F forced to 1 (ni<=1), reflected energy <= 1."""
    ctx = make_ctx(BXDF_GGX_ROUGH_REFLECTION, ks=(1.0, 1.0, 1.0), ns=10.0,
                   ni=1.0)
    u1, u2, ul = draws()
    s = bsdf.bsdf_sample(ctx, make_wi(theta_deg=45.0), u1, u2, ul)
    cos = jnp.maximum(vm.dot(ctx.n, s.wo), 0.0)
    w = s.f[..., 0] * cos / jnp.maximum(s.pdf, 1e-8)
    w = jnp.where(s.pdf > 1e-6, w, 0.0)
    est = float(jnp.mean(w))
    assert 0.2 < est <= 1.05, est


def test_ideal_reflection_direction():
    ctx = make_ctx(BXDF_IDEAL_REFLECTION, n=4)
    wi = make_wi(n=4, theta_deg=30.0)
    u1, u2, ul = draws(n=4)
    s = bsdf.bsdf_sample(ctx, wi, u1, u2, ul)
    wo = np.asarray(s.wo)[0]
    expect = np.array([np.sin(np.deg2rad(30)), 0.0, np.cos(np.deg2rad(30))])
    np.testing.assert_allclose(wo, expect, atol=1e-6)
    assert np.asarray(s.pdf).min() == 1.0
    # f = ks / cos_o (reference: src/ideal_reflection.cl:22-25)
    np.testing.assert_allclose(np.asarray(s.f)[0, 0],
                               0.8 / np.cos(np.deg2rad(30)), rtol=1e-5)


def test_ideal_dielectric_snell_and_fresnel_split():
    ni = 1.5
    ctx = make_ctx(BXDF_IDEAL_DIELECTRIC, ks=(1.0, 1.0, 1.0), ni=ni)
    wi = make_wi(theta_deg=40.0)
    u1, u2, ul = draws()
    s = bsdf.bsdf_sample(ctx, wi, u1, u2, ul)
    wo = np.asarray(s.wo)
    refl = wo[:, 2] > 0
    frac_refl = refl.mean()
    fr = float(fresnel_dielectric(jnp.cos(jnp.deg2rad(40.0)), 1.0, ni))
    assert abs(frac_refl - fr) < 0.02
    # Snell for the refracted ones: sin_t = sin_i / ni
    wt = wo[~refl]
    sin_t = np.linalg.norm(wt[:, :2], axis=1) / np.linalg.norm(wt, axis=1)
    np.testing.assert_allclose(sin_t, np.sin(np.deg2rad(40)) / ni, atol=1e-5)


def test_ggx_refract_front_reflection_pdf_consistency():
    ctx = make_ctx(BXDF_GGX_ROUGH_DIELECTRIC, ks=(1.0, 1.0, 1.0), ns=80.0,
                   ni=1.5)
    wi = make_wi()
    u1, u2, ul = draws()
    s = bsdf.bsdf_sample(ctx, wi, u1, u2, ul)
    # front-side reflected lanes obey the reflect pdf via bsdf_pdf
    refl = np.asarray(vm.dot(ctx.n, s.wo)) > 0
    p = bsdf.bsdf_pdf(ctx, wi, s.wo)
    good = refl & (np.asarray(s.pdf) > 1e-3)
    np.testing.assert_allclose(np.asarray(p)[good], np.asarray(s.pdf)[good],
                               rtol=2e-3, atol=1e-4)


def test_fresnel_limits():
    # normal incidence: ((n1-n2)/(n1+n2))^2
    f0 = float(fresnel_dielectric(jnp.float32(1.0), 1.0, 1.5))
    np.testing.assert_allclose(f0, ((1 - 1.5) / (1 + 1.5)) ** 2, rtol=1e-6)
    # TIR from dense side
    f_tir = float(fresnel_dielectric(jnp.cos(jnp.deg2rad(80.0)), 1.5, 1.0))
    assert f_tir == 1.0


def test_dispatch_type_pruning():
    """Static type-mask pruning must not change results for present types."""
    ctx = make_ctx(BXDF_DIFFUSE, n=64)
    wi = make_wi(n=64)
    u1, u2, ul = draws(n=64)
    full = bsdf.bsdf_sample(ctx, wi, u1, u2, ul, bsdf.ALL_TYPES_MASK)
    pruned = bsdf.bsdf_sample(ctx, wi, u1, u2, ul, BXDF_DIFFUSE)
    np.testing.assert_array_equal(np.asarray(full.wo), np.asarray(pruned.wo))
    np.testing.assert_array_equal(np.asarray(full.f), np.asarray(pruned.f))


def test_grad_flows_to_material_params():
    """Pixel-gradient groundwork: d(sample.f)/d(kd, ks, ns, ni) exists and is
    finite (BASELINE config 5)."""
    import jax

    def loss(kd_scalar, ns_scalar):
        ctx = make_ctx(BXDF_GLOSSY, n=256, ni=0.0)
        ctx = ctx.replace(kd=ctx.kd * kd_scalar, ns=ctx.ns * ns_scalar)
        u1, u2, ul = draws(n=256)
        s = bsdf.bsdf_sample(ctx, make_wi(n=256), u1, u2, ul)
        cos = jnp.maximum(vm.dot(ctx.n, s.wo), 0.0)
        w = s.f * (cos / jnp.maximum(s.pdf, 1e-6))[..., None]
        return jnp.mean(jnp.where(s.pdf[..., None] > 1e-6, w, 0.0))

    g = jax.grad(loss, argnums=(0, 1))(jnp.float32(1.0), jnp.float32(1.0))
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
    assert abs(float(g[0])) > 1e-6  # kd actually influences the estimator
