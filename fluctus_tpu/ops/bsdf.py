"""The BSDF library: 7-type taxonomy, batched, differentiable.

Behavioral parity with the reference's BSDF set (src/diffuse.cl, src/glossy.cl,
src/ggx.cl, src/ideal_reflection.cl, src/ideal_dielectric.cl, dispatched in
src/bxdf_partial.cl:19-153), redesigned for TPU:

  * Direction convention matches the reference: `wi` is the ray direction and
    points TOWARD the surface; `wo` points away.
  * `ShadingCtx.n` is the shading normal already flipped toward the incoming
    ray (the reference flips in wf_logic.cl:180-184); `backface` records it.
  * Textures are resolved BEFORE dispatch into ctx.kd/ctx.ks (one gather per
    hit instead of per lobe evaluation).
  * Dispatch is compute-all-present-and-select: every material type present in
    the scene (static bitmask, mirroring the per-scene BXDF_USE_* defines of
    src/kernel_impl.hpp:261-266) is evaluated on the whole batch and the
    result selected per lane. BSDF math is pure VPU elementwise work, so this
    SIMD form beats queue-per-material divergence handling on TPU.
  * Stochastic lobe choices consume pre-drawn uniforms (replay-exact).

All sample/eval/pdf functions are differentiable w.r.t. kd/ks/ns/ni (the
inverse-rendering parameter surface).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from flax import struct

from fluctus_tpu.core import vecmath as vm
from fluctus_tpu.core import samplers
from fluctus_tpu.core.types import (
    BSDF_ID, BXDF_DIFFUSE, BXDF_EMISSIVE, BXDF_GGX_ROUGH_DIELECTRIC,
    BXDF_GGX_ROUGH_REFLECTION, BXDF_GLOSSY, BXDF_IDEAL_DIELECTRIC,
    BXDF_IDEAL_REFLECTION,
)
from fluctus_tpu.ops import ggx
from fluctus_tpu.ops.fresnel import fresnel_dielectric

INV_PI = jnp.float32(1.0 / jnp.pi)


@struct.dataclass
class ShadingCtx:
    """Per-lane shading context with textures pre-resolved."""
    n: jnp.ndarray        # (..., 3) shading normal, faces the incoming ray
    backface: jnp.ndarray # (...,) bool — n was flipped
    kd: jnp.ndarray       # (..., 3) resolved albedo (2.2-gamma corrected)
    ks: jnp.ndarray       # (..., 3) resolved specular (linear)
    ns: jnp.ndarray       # (...,)
    ni: jnp.ndarray       # (...,)
    bsdf_id: jnp.ndarray  # (...,) int32 dense id


class BsdfSample(NamedTuple):
    wo: jnp.ndarray      # (..., 3)
    f: jnp.ndarray       # (..., 3) BSDF value
    pdf: jnp.ndarray     # (...,)


# --------------------------------------------------------------------------
# Diffuse (reference: src/diffuse.cl:9-26)

def _diffuse_sample(ctx: ShadingCtx, wi, u1, u2, u_lobe) -> BsdfSample:
    wo, pdf = samplers.cosine_hemisphere(ctx.n, u1, u2)
    return BsdfSample(wo, ctx.kd * INV_PI, pdf)


def _diffuse_eval(ctx: ShadingCtx, wi, wo):
    return jnp.broadcast_to(ctx.kd * INV_PI, ctx.kd.shape)


def _diffuse_pdf(ctx: ShadingCtx, wi, wo):
    return jnp.maximum(vm.dot(ctx.n, wo), 0.0) * INV_PI


# --------------------------------------------------------------------------
# GGX rough reflection (reference: src/ggx.cl:90-145)

def _ggx_reflect_f(ctx, wi_out, wo, h):
    alpha = ggx.phong_to_alpha(ctx.ns)
    i_dot_n = vm.dot(wi_out, ctx.n)
    o_dot_n = vm.dot(wo, ctx.n)
    f_term = jnp.where(ctx.ni > 1.0,
                       fresnel_dielectric(i_dot_n, 1.0, ctx.ni), 1.0)
    d = ggx.d_ggx(alpha, ctx.n, h)
    g = ggx.g_smith(alpha, wi_out, wo, ctx.n, h)
    den = 4.0 * i_dot_n * o_dot_n
    scale = jnp.where(den != 0.0,
                      f_term * g * d / jnp.where(den != 0.0, den, 1.0), 0.0)
    return ctx.ks * scale[..., None]


def _ggx_reflect_sample(ctx: ShadingCtx, wi, u1, u2, u_lobe) -> BsdfSample:
    wi_out = -wi
    alpha = ggx.phong_to_alpha(ctx.ns)
    h = samplers.ggx_sample_half_vector(alpha, ctx.n, u1, u2)
    wo = vm.reflect(wi, h)
    pdf = ggx.pdf_reflect(alpha, wo, ctx.n, h)
    return BsdfSample(wo, _ggx_reflect_f(ctx, wi_out, wo, h), pdf)


def _ggx_reflect_eval(ctx: ShadingCtx, wi, wo):
    wi_out = -wi
    h = vm.normalize(wi_out + wo)
    return _ggx_reflect_f(ctx, wi_out, wo, h)


def _ggx_reflect_pdf(ctx: ShadingCtx, wi, wo):
    wi_out = -wi
    alpha = ggx.phong_to_alpha(ctx.ns)
    h = vm.normalize(wi_out + wo)
    return ggx.pdf_reflect(alpha, wo, ctx.n, h)


# --------------------------------------------------------------------------
# GGX rough dielectric (reflect+refract; reference: src/ggx.cl:159-292)

def _ggx_refract_etas(ctx):
    eta_i = jnp.where(ctx.backface, ctx.ni, 1.0)
    eta_o = jnp.where(ctx.backface, 1.0, ctx.ni)
    return eta_i, eta_o


def _ggx_refract_sample(ctx: ShadingCtx, wi, u1, u2, u_lobe) -> BsdfSample:
    wi_out = -wi
    alpha = ggx.phong_to_alpha(ctx.ns)
    eta_i, eta_o = _ggx_refract_etas(ctx)
    i_dot_n = vm.dot(wi_out, ctx.n)
    h = samplers.ggx_sample_half_vector(alpha, ctx.n, u1, u2)
    fr = fresnel_dielectric(i_dot_n, eta_i, eta_o)
    take_refl = u_lobe < fr

    # Reflection branch
    wo_r = vm.reflect(wi, h)
    pdf_r = ggx.pdf_reflect(alpha, wo_r, ctx.n, h)
    o_dot_n_r = vm.dot(wo_r, ctx.n)
    d_r = ggx.d_ggx(alpha, ctx.n, h)
    g_r = ggx.g_smith(alpha, wi_out, wo_r, ctx.n, h)
    den_r = 4.0 * i_dot_n * o_dot_n_r
    f_r_scalar = jnp.where(den_r != 0.0,
                           fr * g_r * d_r / jnp.where(den_r != 0.0, den_r, 1.0),
                           0.0)
    f_r = jnp.broadcast_to(f_r_scalar[..., None], wi.shape)

    # Refraction branch
    eta = eta_i / jnp.maximum(eta_o, 1e-6)
    wo_t = vm.refract(wi, ctx.n, eta)
    # Recompute H from the refracted pair (eq. 16)
    h_t = vm.normalize(-(wi_out * eta_i[..., None] + wo_t * eta_o[..., None]))
    n_orig = vm.where3(ctx.backface, -ctx.n, ctx.n)
    pdf_t = ggx.pdf_refract(alpha, eta_i, eta_o, wi_out, wo_t, n_orig, h_t)
    i_dot_h = jnp.abs(vm.dot(wi_out, h_t))
    o_dot_h = jnp.abs(vm.dot(wo_t, h_t))
    o_dot_n_t = vm.dot(wo_t, ctx.n)
    focus_den = i_dot_n * o_dot_n_t * (eta_i * i_dot_h + eta_o * o_dot_h) ** 2
    focus = jnp.where(focus_den != 0.0,
                      eta_o * eta_o * i_dot_h * o_dot_h
                      / jnp.where(focus_den != 0.0, focus_den, 1.0), 0.0)
    d_t = ggx.d_ggx(alpha, n_orig, h_t)
    g_t = ggx.g_smith(alpha, wi_out, wo_t, n_orig, h_t)
    # eta^2 for radiance transport + Ks absorption (src/ggx.cl:207-214)
    f_t = ctx.ks * ((1.0 - fr) * d_t * g_t * focus * eta * eta)[..., None]

    wo = vm.where3(take_refl, wo_r, wo_t)
    f = vm.where3(take_refl, f_r, f_t)
    pdf = jnp.where(take_refl, pdf_r, pdf_t)
    return BsdfSample(wo, f, pdf)


def _ggx_refract_eval(ctx: ShadingCtx, wi, wo):
    """reference: src/ggx.cl:227-285 evalGGXRefract — branch on backface:
    frontside pair treated as reflection, backside as refraction."""
    wi_out = -wi
    alpha = ggx.phong_to_alpha(ctx.ns)
    eta_i, eta_o = _ggx_refract_etas(ctx)
    i_dot_n = vm.dot(wi_out, ctx.n)
    o_dot_n = vm.dot(wo, ctx.n)
    fr = fresnel_dielectric(i_dot_n, eta_i, eta_o)

    # Reflection (front) branch
    h_r = vm.normalize(wi_out + wo)
    d_r = ggx.d_ggx(alpha, ctx.n, h_r)
    g_r = ggx.g_smith(alpha, wi_out, wo, ctx.n, h_r)
    den_r = 4.0 * i_dot_n * o_dot_n
    f_r_scalar = jnp.where(den_r != 0.0,
                           fr * g_r * d_r / jnp.where(den_r != 0.0, den_r, 1.0),
                           0.0)
    f_r = jnp.broadcast_to(f_r_scalar[..., None], wi.shape)

    # Refraction (back) branch
    h_t = vm.normalize(-(wi_out * eta_i[..., None] + wo * eta_o[..., None]))
    eta = eta_i / jnp.maximum(eta_o, 1e-6)
    i_dot_h = jnp.abs(vm.dot(wi_out, h_t))
    o_dot_h = jnp.abs(vm.dot(wo, h_t))
    focus_den = i_dot_n * o_dot_n * (eta_i * i_dot_h + eta_o * o_dot_h) ** 2
    focus = jnp.where(focus_den != 0.0,
                      eta_o * eta_o * i_dot_h * o_dot_h
                      / jnp.where(focus_den != 0.0, focus_den, 1.0), 0.0)
    neg_n = -ctx.n
    d_t = ggx.d_ggx(alpha, neg_n, h_t)
    g_t = ggx.g_smith(alpha, wi_out, wo, neg_n, h_t)
    f_t = ctx.ks * ((1.0 - fr) * d_t * g_t * focus * eta * eta)[..., None]

    return vm.where3(ctx.backface, f_t, f_r)


def _ggx_refract_pdf(ctx: ShadingCtx, wi, wo):
    """reference: src/ggx.cl:288-292 pdfGGXRefract."""
    wi_out = -wi
    alpha = ggx.phong_to_alpha(ctx.ns)
    eta_i, eta_o = _ggx_refract_etas(ctx)
    h_r = vm.normalize(wi_out + wo)
    pdf_r = ggx.pdf_reflect(alpha, wo, ctx.n, h_r)
    h_t = vm.normalize(-(wi_out * eta_i[..., None] + wo * eta_o[..., None]))
    pdf_t = ggx.pdf_refract(alpha, eta_i, eta_o, wi_out, wo, -ctx.n, h_t)
    return jnp.where(ctx.backface, pdf_t, pdf_r)


# --------------------------------------------------------------------------
# Glossy: Lambert base + GGX coat, Fresnel lobe selection
# (reference: src/glossy.cl:24-134; LuxRender-style parameter derivation)

def _glossy_derived(ctx: ShadingCtx):
    """Derive (ks, ni) per LuxRender rules: Ni from Ks if unset and vice versa
    (reference: src/glossy.cl:12-22)."""
    k = jnp.clip(jnp.mean(ctx.ks, axis=-1), 0.0, 0.99)
    sqrt_k = jnp.sqrt(k)
    eta_from_ks = (sqrt_k + 1.0) / jnp.maximum(1.0 - sqrt_k, 1e-6)
    ni = jnp.where(ctx.ni > 0.0, ctx.ni, eta_from_ks)
    r = jnp.where(ni > 0.0, (ni - 1.0) / jnp.maximum(ni + 1.0, 1e-6), 0.0)
    ks_from_eta = jnp.broadcast_to((r * r)[..., None], ctx.ks.shape)
    ks = vm.where3(vm.is_zero(ctx.ks), ks_from_eta, ctx.ks)
    return ks, ni


def _glossy_ctx(ctx: ShadingCtx) -> ShadingCtx:
    ks, ni = _glossy_derived(ctx)
    return ctx.replace(ks=ks, ni=ni)


def _glossy_sample(ctx: ShadingCtx, wi, u1, u2, u_lobe) -> BsdfSample:
    c = _glossy_ctx(ctx)
    cos_th = vm.dot(-wi, c.n)
    fr = fresnel_dielectric(cos_th, 1.0, c.ni)
    take_spec = u_lobe < fr

    # Specular lobe sample path
    # Re-scale u_lobe into an independent-ish uniform is unnecessary: the GGX
    # and diffuse lobes consume (u1, u2) only.
    spec = _ggx_reflect_sample(c, wi, u1, u2, u_lobe)
    diff = _diffuse_sample(c, wi, u1, u2, u_lobe)

    wo = vm.where3(take_spec, spec.wo, diff.wo)
    base_f = _diffuse_eval(c, wi, wo)
    base_pdf = _diffuse_pdf(c, wi, wo)
    coat_f = vm.where3(take_spec, spec.f, _ggx_reflect_eval(c, wi, wo))
    coat_pdf = jnp.where(take_spec, spec.pdf, _ggx_reflect_pdf(c, wi, wo))

    pdf = (1.0 - fr) * base_pdf + fr * coat_pdf
    f = base_f * (1.0 - fr)[..., None] + coat_f  # coat contains F
    # Reject below-horizon directions (src/glossy.cl:58-59)
    bad = vm.dot(c.n, wo) < 1e-5
    f = vm.where3(bad, jnp.zeros_like(f), f)
    return BsdfSample(wo, f, pdf)


def _glossy_eval(ctx: ShadingCtx, wi, wo):
    c = _glossy_ctx(ctx)
    cos_th = vm.dot(-wi, c.n)
    fr = fresnel_dielectric(cos_th, 1.0, c.ni)
    base = _diffuse_eval(c, wi, wo)
    coat = _ggx_reflect_eval(c, wi, wo)
    return base * (1.0 - fr)[..., None] + coat


def _glossy_pdf(ctx: ShadingCtx, wi, wo):
    c = _glossy_ctx(ctx)
    cos_th = vm.dot(-wi, c.n)
    fr = fresnel_dielectric(cos_th, 1.0, c.ni)
    return (1.0 - fr) * _diffuse_pdf(c, wi, wo) + fr * _ggx_reflect_pdf(c, wi, wo)


# --------------------------------------------------------------------------
# Ideal (delta) reflection — mirror (reference: src/ideal_reflection.cl:9-34)

def _ideal_reflection_sample(ctx: ShadingCtx, wi, u1, u2, u_lobe) -> BsdfSample:
    wo = vm.reflect(wi, ctx.n)
    cos_o = vm.dot(wo, ctx.n)
    f = ctx.ks * jnp.where(cos_o != 0.0,
                           1.0 / jnp.where(cos_o != 0.0, cos_o, 1.0),
                           0.0)[..., None]
    return BsdfSample(wo, f, jnp.ones_like(cos_o))


# Ideal dielectric (reference: src/ideal_dielectric.cl:10-57)

def _ideal_dielectric_sample(ctx: ShadingCtx, wi, u1, u2, u_lobe) -> BsdfSample:
    cos_i = vm.dot(-wi, ctx.n)
    n1 = jnp.where(ctx.backface, ctx.ni, 1.0)
    n2 = jnp.where(ctx.backface, 1.0, ctx.ni)
    eta = n1 / jnp.maximum(n2, 1e-6)
    fr = fresnel_dielectric(cos_i, n1, n2)
    take_refl = u_lobe < fr
    wo_r = vm.reflect(wi, ctx.n)
    wo_t = vm.refract(wi, ctx.n, eta)
    wo = vm.where3(take_refl, wo_r, wo_t)
    # (1-fr)/fr cancel between pdf and BSDF weight
    bsdf = jnp.where(take_refl[..., None],
                     jnp.ones_like(ctx.ks),
                     ctx.ks * (eta * eta)[..., None])
    cos_o = vm.dot(wo, ctx.n)
    f = bsdf * jnp.where(cos_o != 0.0,
                         1.0 / jnp.where(cos_o != 0.0, cos_o, 1.0),
                         0.0)[..., None]
    return BsdfSample(wo, f, jnp.ones_like(cos_o))


def _delta_zero_eval(ctx, wi, wo):
    return jnp.zeros_like(ctx.kd)


def _delta_zero_pdf(ctx, wi, wo):
    return jnp.zeros(ctx.ns.shape, ctx.ns.dtype)


# Emissive: tagged material; bounce terminates (the reference's emissive
# sample returns f=(1,1,1) with an UNSET pdf — src/bxdf_partial.cl:74-77; we
# define pdf=0 so T becomes 0 and the path terminates deterministically).

def _emissive_sample(ctx: ShadingCtx, wi, u1, u2, u_lobe) -> BsdfSample:
    return BsdfSample(vm.reflect(wi, ctx.n), jnp.ones_like(ctx.kd),
                      jnp.zeros(ctx.ns.shape, ctx.ns.dtype))


def _emissive_eval(ctx, wi, wo):
    return jnp.ones_like(ctx.kd)


# --------------------------------------------------------------------------
# Dispatch (reference: src/bxdf_partial.cl bxdfSample/bxdfEval/bxdfPdf)

_SAMPLERS = {
    BXDF_DIFFUSE: _diffuse_sample,
    BXDF_GLOSSY: _glossy_sample,
    BXDF_GGX_ROUGH_REFLECTION: _ggx_reflect_sample,
    BXDF_IDEAL_REFLECTION: _ideal_reflection_sample,
    BXDF_GGX_ROUGH_DIELECTRIC: _ggx_refract_sample,
    BXDF_IDEAL_DIELECTRIC: _ideal_dielectric_sample,
    BXDF_EMISSIVE: _emissive_sample,
}

_EVALS = {
    BXDF_DIFFUSE: _diffuse_eval,
    BXDF_GLOSSY: _glossy_eval,
    BXDF_GGX_ROUGH_REFLECTION: _ggx_reflect_eval,
    BXDF_IDEAL_REFLECTION: _delta_zero_eval,
    BXDF_GGX_ROUGH_DIELECTRIC: _ggx_refract_eval,
    BXDF_IDEAL_DIELECTRIC: _delta_zero_eval,
    BXDF_EMISSIVE: _emissive_eval,
}

_PDFS = {
    BXDF_DIFFUSE: _diffuse_pdf,
    BXDF_GLOSSY: _glossy_pdf,
    BXDF_GGX_ROUGH_REFLECTION: _ggx_reflect_pdf,
    BXDF_IDEAL_REFLECTION: _delta_zero_pdf,
    BXDF_GGX_ROUGH_DIELECTRIC: _ggx_refract_pdf,
    BXDF_IDEAL_DIELECTRIC: _delta_zero_pdf,
    BXDF_EMISSIVE: _delta_zero_pdf,
}

ALL_TYPES_MASK = (BXDF_DIFFUSE | BXDF_GLOSSY | BXDF_GGX_ROUGH_REFLECTION
                  | BXDF_IDEAL_REFLECTION | BXDF_GGX_ROUGH_DIELECTRIC
                  | BXDF_IDEAL_DIELECTRIC | BXDF_EMISSIVE)


def _present(types_mask: int):
    return [t for t in _SAMPLERS if types_mask & t]


def _gate_ctx(ctx: ShadingCtx, mask: jnp.ndarray) -> ShadingCtx:
    """Replace parameters on non-selected lanes with safe dummies.

    Compute-all-and-select evaluates every present lobe on the whole batch;
    a lane whose actual material is diffuse may carry ni=0, which would make
    the (discarded) dielectric branch produce inf/NaN forward values that
    poison reverse-mode AD through the 0-cotangent path (0·NaN = NaN)."""
    return ctx.replace(
        ni=jnp.where(mask, ctx.ni, jnp.float32(1.5)),
        ns=jnp.where(mask, ctx.ns, jnp.float32(100.0)),
    )


def is_singular(bsdf_id: jnp.ndarray) -> jnp.ndarray:
    """BXDF_IS_SINGULAR analogue on dense ids (reference: src/bxdf_types.h:12)."""
    return ((bsdf_id == BSDF_ID[BXDF_IDEAL_REFLECTION])
            | (bsdf_id == BSDF_ID[BXDF_IDEAL_DIELECTRIC]))


def bsdf_sample(ctx: ShadingCtx, wi, u1, u2, u_lobe,
                types_mask: int = ALL_TYPES_MASK) -> BsdfSample:
    """Sample a continuation direction. `types_mask` is a STATIC bitmask of
    material types present (unused types generate no code, like the
    reference's per-scene BXDF_USE_* defines)."""
    present = _present(types_mask)
    wo = jnp.zeros_like(wi)
    f = jnp.zeros_like(ctx.kd)
    pdf = jnp.zeros(ctx.ns.shape, ctx.ns.dtype)
    for t in present:
        m = ctx.bsdf_id == BSDF_ID[t]
        s = _SAMPLERS[t](_gate_ctx(ctx, m), wi, u1, u2, u_lobe)
        wo = vm.where3(m, s.wo, wo)
        f = vm.where3(m, s.f, f)
        pdf = jnp.where(m, s.pdf, pdf)
    return BsdfSample(wo, f, pdf)


def bsdf_eval(ctx: ShadingCtx, wi, wo,
              types_mask: int = ALL_TYPES_MASK) -> jnp.ndarray:
    present = _present(types_mask)
    f = jnp.zeros_like(ctx.kd)
    for t in present:
        m = ctx.bsdf_id == BSDF_ID[t]
        f = vm.where3(m, _EVALS[t](_gate_ctx(ctx, m), wi, wo), f)
    return f


def bsdf_pdf(ctx: ShadingCtx, wi, wo,
             types_mask: int = ALL_TYPES_MASK) -> jnp.ndarray:
    present = _present(types_mask)
    pdf = jnp.zeros(ctx.ns.shape, ctx.ns.dtype)
    for t in present:
        m = ctx.bsdf_id == BSDF_ID[t]
        pdf = jnp.where(m, _PDFS[t](_gate_ctx(ctx, m), wi, wo), pdf)
    return pdf
