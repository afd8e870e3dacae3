"""Device-side BSDF engine: closed-set lobes over wavefront hit batches.

Replaces the reference's virtual BxDF stack (reference core/reflection.
{h,cpp}: BSDF :153, Lambertian :355, OrenNayar :369, SpecularReflection
:306, SpecularTransmission :328, Microfacet+Blinn/Anisotropic :399-461,
FresnelBlend :463) with a fixed set of five canonical lobes evaluated
masked over the batch:

  1. diffuse reflection  (Lambertian / Oren-Nayar by sigma)
  2. diffuse transmission (translucent)
  3. glossy microfacet   (Blinn or Anisotropic; dielectric/conductor F)
  4. specular reflection (dielectric / conductor / no-op F)
  5. specular transmission (dielectric, with the student Cauchy
     dispersion: eta(lambda) = A + B/lambda_um^2,
     B = 0.52345 (eta-1)/Vn, A = eta - B/0.34522792 — reference
     core/reflection.cpp:155-162)

Each MaterialRecord kind maps onto these lobes in `material_lobes`.
Sampling picks a lobe by luminance-importance (an improvement over the
reference's uniform lobe choice), then returns the combined f, pdf and
flags, mirroring pbrt's Sample_f contract (specular lobes return their
own weight; non-specular return summed f over same-side lobes with
averaged pdf).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.core.geometry import dot, normalize
from pbrt_tpu.core.sampling import (
    INV_PI,
    concentric_sample_disk,
    cosine_sample_hemisphere,
)
from pbrt_tpu.materials.registry import KIND_ID

S = spec.N_BINS

# fresnel kinds for the glossy/specular slots
F_NONE, F_DIELECTRIC, F_CONDUCTOR = 0, 1, 2


class BsdfParams(NamedTuple):
    """Per-hit material record, [H] leading axis. Slot reuse per kind is
    documented in material_lobes."""

    kind: jnp.ndarray       # [H] int32 (materials.registry.KIND_ID)
    kd: jnp.ndarray         # [H, S]
    ks: jnp.ndarray         # [H, S]
    kr: jnp.ndarray         # [H, S]
    kt: jnp.ndarray         # [H, S]
    opacity: jnp.ndarray    # [H, S]
    rough_u: jnp.ndarray    # [H]
    rough_v: jnp.ndarray    # [H]
    eta: jnp.ndarray        # [H]
    vn: jnp.ndarray         # [H] Abbe number (glass dispersion)
    sigma: jnp.ndarray      # [H] oren-nayar sigma (degrees)
    meas_id: jnp.ndarray = None    # [H] int32 measured-table index (-1 none)
    meas_tables: jnp.ndarray = None  # [T,TH,TD,PD,3] shared half-angle tables
    mix2: "BsdfParams" = None      # second constituent (mix material)
    mix_amt: jnp.ndarray = None    # [H, S] spectral blend amount

    @staticmethod
    def none(h):
        z = jnp.zeros((h, S), jnp.float32)
        zf = jnp.zeros((h,), jnp.float32)
        return BsdfParams(jnp.zeros((h,), jnp.int32), z, z, z, z, z, zf, zf,
                          jnp.ones((h,), jnp.float32), zf, zf)


class Lobes(NamedTuple):
    """The canonical lobe set derived from BsdfParams."""

    diff_r: jnp.ndarray     # [H, S]
    diff_t: jnp.ndarray     # [H, S]
    sigma: jnp.ndarray      # [H]
    gloss: jnp.ndarray      # [H, S] glossy coefficient
    gloss_t: jnp.ndarray    # [H, S] translucent glossy transmission
    gloss_f_kind: jnp.ndarray  # [H] int32 fresnel kind for glossy
    gloss_eta: jnp.ndarray  # [H] dielectric ior for glossy fresnel
    gloss_eta_s: jnp.ndarray  # [H, S] conductor eta
    gloss_k_s: jnp.ndarray  # [H, S] conductor k
    blinn_e: jnp.ndarray    # [H] blinn exponent
    aniso: jnp.ndarray      # [H] bool: use aniso distribution
    aniso_ex: jnp.ndarray   # [H]
    aniso_ey: jnp.ndarray   # [H]
    fb: jnp.ndarray         # [H] bool: FresnelBlend (substrate)
    spec_r: jnp.ndarray     # [H, S]
    spec_r_f_kind: jnp.ndarray  # [H] int32
    spec_r_eta_s: jnp.ndarray   # [H, S] conductor eta for spec refl
    spec_r_k_s: jnp.ndarray     # [H, S]
    spec_t: jnp.ndarray     # [H, S]
    eta: jnp.ndarray        # [H]
    vn: jnp.ndarray         # [H]
    meas_id: jnp.ndarray = None     # [H] int32 (-1 none)
    meas_tables: jnp.ndarray = None  # [T,TH,TD,PD,3]
    # true mix material (reference materials/mixmat.cpp:62 MixMaterial:
    # BOTH constituent BSDFs evaluated, scaled by amount / 1-amount):
    # second constituent's full lobe set + spectral blend amount
    mix2: "Lobes" = None            # Lobes of the second constituent
    mix_amt: jnp.ndarray = None     # [H, S] scale on constituent 1


def fresnel_dielectric(cos_i, eta_i, eta_t):
    """Unpolarized dielectric Fresnel; cos_i may be signed (entering if >0).

    Returns reflectance in [0, 1]. (reference core/reflection.cpp FrDiel)
    """
    entering = cos_i > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    ci = jnp.abs(cos_i)
    sint = ei / et * jnp.sqrt(jnp.maximum(0.0, 1.0 - ci * ci))
    tir = sint >= 1.0
    cost = jnp.sqrt(jnp.maximum(0.0, 1.0 - sint * sint))
    r_par = (et * ci - ei * cost) / jnp.maximum(et * ci + ei * cost, 1e-12)
    r_per = (ei * ci - et * cost) / jnp.maximum(ei * ci + et * cost, 1e-12)
    fr = 0.5 * (r_par * r_par + r_per * r_per)
    return jnp.where(tir, 1.0, fr)


def fresnel_conductor(cos_i, eta, k):
    """Conductor Fresnel (spectral eta/k [.., S]; cos_i [..]) -> [.., S]."""
    ci = jnp.abs(cos_i)[..., None]
    tmp = (eta * eta + k * k) * ci * ci
    r_par2 = (tmp - 2.0 * eta * ci + 1.0) / jnp.maximum(tmp + 2.0 * eta * ci + 1.0, 1e-12)
    tmp_f = eta * eta + k * k
    r_per2 = (tmp_f - 2.0 * eta * ci + ci * ci) / jnp.maximum(
        tmp_f + 2.0 * eta * ci + ci * ci, 1e-12
    )
    return 0.5 * (r_par2 + r_per2)


def fresnel_approx_eta(r):
    """Reflectance -> synthetic eta (reference core/reflection.h FresnelApproxEta)."""
    r = jnp.clip(r, 0.0, 0.999)
    return (1.0 + jnp.sqrt(r)) / (1.0 - jnp.sqrt(r))


def fresnel_approx_k(r):
    r = jnp.clip(r, 0.0, 0.999)
    return 2.0 * jnp.sqrt(r / (1.0 - r))


def cauchy_eta(eta, vn, lam_nm):
    """Student dispersion fit (reference core/reflection.cpp:155-162).

    lam_nm in nanometers; the reference converts to micrometers.
    """
    b = 0.52345 * (eta - 1.0) / jnp.maximum(vn, 1e-6)
    a = eta - b / 0.34522792
    lam_um = lam_nm * 1e-3
    return a + b / jnp.maximum(lam_um * lam_um, 1e-12)


def material_lobes(p: BsdfParams) -> Lobes:
    """Expand the per-hit material record into canonical lobes (masked).

    Mix materials carry a second BsdfParams (p.mix2) + spectral amount:
    both constituents expand to full lobe sets and every bsdf_* entry
    point below evaluates/blends them (reference materials/mixmat.cpp:62
    scaled-BxDF concatenation)."""
    lb = _material_lobes_one(p)
    if getattr(p, "mix2", None) is not None:
        lb2 = _material_lobes_one(p.mix2)
        lb = lb._replace(mix2=lb2, mix_amt=p.mix_amt)
    return lb


def _material_lobes_one(p: BsdfParams) -> Lobes:
    k = p.kind
    h = k.shape[0]
    zs = jnp.zeros((h, S), jnp.float32)
    zf = jnp.zeros((h,), jnp.float32)

    def is_(name):
        return (k == KIND_ID[name])[:, None]

    def is_f(name):
        return k == KIND_ID[name]

    op = jnp.where(is_("uber"), p.opacity, 1.0)

    diff_r = (
        jnp.where(is_("matte") | is_("measured"), p.kd, 0.0)
        + jnp.where(is_("plastic"), p.kd, 0.0)
        + jnp.where(is_("translucent"), p.kd * p.kr, 0.0)  # kr slot = reflect
        + jnp.where(is_("uber"), p.kd * op, 0.0)
        + jnp.where(is_("kdsubsurface"), zs, 0.0)
        # substrate: Kd lives in the diff slot for the FresnelBlend
        # (consumed by _fb_f; the plain lambertian path zeroes fb lanes)
        + jnp.where(is_("substrate"), p.kd, 0.0)
    )
    diff_t = jnp.where(is_("translucent"), p.kd * p.kt, 0.0)  # kt slot = transmit

    gloss = (
        jnp.where(is_("plastic"), p.ks, 0.0)
        + jnp.where(is_("translucent"), p.ks * p.kr, 0.0)
        + jnp.where(is_("uber"), p.ks * op, 0.0)
        + jnp.where(is_("metal") | is_("shinymetal"), jnp.ones((h, S)), 0.0)
        + jnp.where(is_("substrate"), p.ks, 0.0)
    )
    gloss_t = jnp.where(is_("translucent"), p.ks * p.kt, 0.0)

    gloss_f_kind = jnp.where(
        is_f("metal") | is_f("shinymetal"),
        F_CONDUCTOR,
        jnp.where(is_f("plastic") | is_f("translucent") | is_f("uber"), F_DIELECTRIC, F_NONE),
    ).astype(jnp.int32)
    gloss_eta = jnp.where(is_f("plastic") | is_f("translucent"), 1.5, p.eta)
    # metal: kd slot holds spectral eta, ks-slot... we stored eta in kd, k in ks
    gloss_eta_s = jnp.where(is_("metal"), p.kd, fresnel_approx_eta(p.ks))
    gloss_k_s = jnp.where(is_("metal"), p.ks, fresnel_approx_k(p.ks))

    rough = jnp.maximum(p.rough_u, 1e-4)
    blinn_e = 1.0 / rough
    aniso = is_f("substrate") & (p.rough_u != p.rough_v)
    aniso_ex = 1.0 / jnp.maximum(p.rough_u, 1e-4)
    aniso_ey = 1.0 / jnp.maximum(p.rough_v, 1e-4)
    fb = is_f("substrate")

    spec_r = (
        jnp.where(is_("glass") | is_("mirror"), p.kr, 0.0)
        + jnp.where(is_("uber"), p.kr * op, 0.0)
        + jnp.where(is_("shinymetal"), p.kr, 0.0)
        + jnp.where(is_("subsurface") | is_("kdsubsurface"), p.kr, 0.0)
    )
    spec_r_f_kind = jnp.where(
        is_f("mirror"),
        F_NONE,
        jnp.where(is_f("shinymetal"), F_CONDUCTOR, F_DIELECTRIC),
    ).astype(jnp.int32)
    spec_r_eta_s = fresnel_approx_eta(p.kr)
    spec_r_k_s = fresnel_approx_k(p.kr)

    # uber: transmission through (1-opacity) is a pass-through specular
    # transmission with eta=1 (reference materials/uber.cpp opacity logic)
    passthrough = jnp.where(is_("uber"), (1.0 - p.opacity), 0.0)
    spec_t = jnp.where(is_("glass"), p.kt, 0.0) + jnp.where(is_("uber"), p.kt * op, 0.0) + passthrough
    eta = jnp.where(is_f("uber") & (jnp.sum(p.kt, -1) <= 0), 1.0, p.eta)
    # pass-through lanes must not refract: treated via eta=1 when kt==0

    return Lobes(
        diff_r=diff_r, diff_t=diff_t, sigma=p.sigma,
        gloss=gloss, gloss_t=gloss_t, gloss_f_kind=gloss_f_kind,
        gloss_eta=gloss_eta, gloss_eta_s=gloss_eta_s, gloss_k_s=gloss_k_s,
        blinn_e=blinn_e, aniso=aniso, aniso_ex=aniso_ex, aniso_ey=aniso_ey,
        fb=fb, spec_r=spec_r, spec_r_f_kind=spec_r_f_kind,
        spec_r_eta_s=spec_r_eta_s, spec_r_k_s=spec_r_k_s,
        spec_t=spec_t, eta=p.eta, vn=p.vn,
        meas_id=p.meas_id, meas_tables=p.meas_tables,
    )


# ---------------------------------------------------------------------------
# Shading frame

class Frame(NamedTuple):
    """Orthonormal shading frame: ss/ts tangent/bitangent, ns shading
    normal, ng geometric normal (reference core/reflection.h:153 BSDF)."""

    ss: jnp.ndarray
    ts: jnp.ndarray
    ns: jnp.ndarray
    ng: jnp.ndarray

    def to_local(self, v):
        return jnp.stack([dot(v, self.ss), dot(v, self.ts), dot(v, self.ns)], axis=-1)

    def to_world(self, v):
        return (
            v[..., 0:1] * self.ss + v[..., 1:2] * self.ts + v[..., 2:3] * self.ns
        )


def _cos_theta(w):
    return w[..., 2]


def _abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def _sin_theta2(w):
    return jnp.maximum(0.0, 1.0 - w[..., 2] * w[..., 2])


def _same_hemisphere(w, wp):
    return w[..., 2] * wp[..., 2] > 0.0


# ---------------------------------------------------------------------------
# Lobe evaluation (local frame). All return ([H, S] f, [H] pdf).

def _oren_nayar_terms(sigma_deg):
    s = jnp.deg2rad(sigma_deg)
    s2 = s * s
    a = 1.0 - s2 / (2.0 * (s2 + 0.33))
    b = 0.45 * s2 / (s2 + 0.09)
    return a, b


def _diffuse_f(coeff, sigma, wo, wi):
    """Lambertian or Oren-Nayar by sigma (reference reflection.cpp:369)."""
    a, b = _oren_nayar_terms(sigma)
    sinto2, sinti2 = _sin_theta2(wo), _sin_theta2(wi)
    sinto, sinti = jnp.sqrt(sinto2), jnp.sqrt(sinti2)
    # cos(phi_i - phi_o) via projections
    denom = jnp.maximum(sinti * sinto, 1e-7)
    dcos = jnp.clip((wi[..., 0] * wo[..., 0] + wi[..., 1] * wo[..., 1]) / denom, -1.0, 1.0)
    maxcos = jnp.where((sinti > 1e-4) & (sinto > 1e-4), jnp.maximum(0.0, dcos), 0.0)
    acto, acti = _abs_cos_theta(wo), _abs_cos_theta(wi)
    big = jnp.maximum(acto, acti)
    small = jnp.minimum(acto, acti)
    sinalpha = jnp.sqrt(jnp.maximum(0.0, 1.0 - big * big))
    tanbeta = jnp.sqrt(jnp.maximum(0.0, 1.0 - small * small)) / jnp.maximum(small, 1e-7)
    on = a + b * maxcos * sinalpha * tanbeta
    lam = sigma <= 0.0
    factor = jnp.where(lam, 1.0, on)
    return coeff * (INV_PI * factor)[..., None]


def _blinn_d(cos_h, e):
    return (e + 2.0) * (0.5 * INV_PI) * jnp.power(jnp.maximum(cos_h, 1e-7), e)


def _aniso_d(wh, ex, ey):
    cth = _abs_cos_theta(wh)
    d = 1.0 - cth * cth
    safe_d = jnp.maximum(d, 1e-7)
    expo = (ex * wh[..., 0] * wh[..., 0] + ey * wh[..., 1] * wh[..., 1]) / safe_d
    val = jnp.sqrt((ex + 2.0) * (ey + 2.0)) * (0.5 * INV_PI) * jnp.power(
        jnp.maximum(cth, 1e-7), expo
    )
    return jnp.where(d <= 1e-7, 0.0, val)


def _microfacet_g(wo, wi, wh):
    ndoth = _abs_cos_theta(wh)
    ndoto = _abs_cos_theta(wo)
    ndoti = _abs_cos_theta(wi)
    odoth = jnp.maximum(jnp.abs(dot(wo, wh)), 1e-7)
    return jnp.minimum(
        1.0, jnp.minimum(2.0 * ndoth * ndoto / odoth, 2.0 * ndoth * ndoti / odoth)
    )


def _glossy_f(lb: Lobes, wo, wi):
    """Torrance-Sparrow microfacet (reflection only)."""
    cto, cti = _abs_cos_theta(wo), _abs_cos_theta(wi)
    wh = wo + wi
    wh_len = jnp.sqrt(jnp.sum(wh * wh, -1))
    ok = (wh_len > 1e-7) & (cto > 1e-7) & (cti > 1e-7) & _same_hemisphere(wo, wi)
    wh = wh / jnp.maximum(wh_len, 1e-7)[..., None]
    d_blinn = _blinn_d(_abs_cos_theta(wh), lb.blinn_e)
    d_aniso = _aniso_d(wh, lb.aniso_ex, lb.aniso_ey)
    d = jnp.where(lb.aniso, d_aniso, d_blinn)
    g = _microfacet_g(wo, wi, wh)
    cos_ih = dot(wi, wh)
    f_diel = fresnel_dielectric(cos_ih, 1.0, lb.gloss_eta)[..., None]
    f_cond = fresnel_conductor(cos_ih, lb.gloss_eta_s, lb.gloss_k_s)
    fr = jnp.where(
        (lb.gloss_f_kind == F_CONDUCTOR)[..., None],
        f_cond,
        jnp.where((lb.gloss_f_kind == F_DIELECTRIC)[..., None], f_diel, 1.0),
    )
    denom = jnp.maximum(4.0 * cto * cti, 1e-7)
    f = lb.gloss * (d * g / denom)[..., None] * fr
    return jnp.where(ok[..., None], f, 0.0)


def _glossy_pdf(lb: Lobes, wo, wi):
    wh = normalize(wo + wi)
    cos_h = _abs_cos_theta(wh)
    dot_oh = jnp.maximum(jnp.abs(dot(wo, wh)), 1e-7)
    pdf_blinn = ((lb.blinn_e + 1.0) * jnp.power(jnp.maximum(cos_h, 1e-7), lb.blinn_e)) / (
        2.0 * jnp.pi * 4.0 * dot_oh
    )
    d_aniso = _aniso_d(wh, lb.aniso_ex, lb.aniso_ey)
    pdf_aniso = d_aniso * cos_h / jnp.maximum(4.0 * dot_oh, 1e-7) / jnp.maximum(cos_h, 1e-7)
    # aniso pdf: D(wh)*cosh normalized; pbrt uses D(wh)/(4 dot(wo,wh)) with
    # wh sampled prop. to D * cos
    pdf = jnp.where(lb.aniso, pdf_aniso, pdf_blinn)
    return jnp.where(_same_hemisphere(wo, wi), pdf, 0.0)


def _fb_f(lb: Lobes, wo, wi):
    """FresnelBlend (Ashikhmin-Shirley, reference reflection.cpp:463)."""
    cto, cti = _abs_cos_theta(wo), _abs_cos_theta(wi)
    ok = (cto > 1e-7) & (cti > 1e-7) & _same_hemisphere(wo, wi)
    rd, rs = lb.diff_r, lb.gloss  # substrate stores Kd in diff slot, Ks in gloss
    diffuse = (28.0 / (23.0 * jnp.pi)) * rd * (1.0 - rs) * (
        (1.0 - jnp.power(1.0 - 0.5 * cti, 5.0)) * (1.0 - jnp.power(1.0 - 0.5 * cto, 5.0))
    )[..., None]
    wh = wo + wi
    wh_len = jnp.sqrt(jnp.sum(wh * wh, -1))
    wh = wh / jnp.maximum(wh_len, 1e-7)[..., None]
    d_blinn = _blinn_d(_abs_cos_theta(wh), lb.blinn_e)
    d_aniso = _aniso_d(wh, lb.aniso_ex, lb.aniso_ey)
    d = jnp.where(lb.aniso, d_aniso, d_blinn)
    dot_ih = jnp.abs(dot(wi, wh))
    schlick = rs + jnp.power(1.0 - dot_ih, 5.0)[..., None] * (1.0 - rs)
    specular = (
        d / jnp.maximum(4.0 * dot_ih * jnp.maximum(cti, cto), 1e-7)
    )[..., None] * schlick
    return jnp.where((ok & (wh_len > 1e-7))[..., None], diffuse + specular, 0.0)


# ---------------------------------------------------------------------------
# Public BSDF interface over world-space directions

def _active_weights(lb: Lobes):
    """Per-lobe scalar weights for lobe selection (luminance)."""
    w_diff = spec.y(lb.diff_r) + spec.y(lb.diff_t)
    w_gloss = spec.y(lb.gloss) + spec.y(lb.gloss_t)
    w_spec_r = spec.y(lb.spec_r)
    w_spec_t = spec.y(lb.spec_t)
    # substrate folds its diffuse into the fb lobe (handled inside _fb_f);
    # avoid double counting by zeroing diff for fb lanes
    w_diff = jnp.where(lb.fb, 0.0, w_diff)
    return w_diff, w_gloss, w_spec_r, w_spec_t


def bsdf_f(lb: Lobes, frame: Frame, wo_w, wi_w):
    """Non-specular f(wo, wi), world-space directions. [H, S]. Mix
    lanes evaluate BOTH constituents and blend spectrally by amount
    (reference mixmat.cpp:62)."""
    f = _bsdf_f_one(lb, frame, wo_w, wi_w)
    if lb.mix2 is not None:
        f2 = _bsdf_f_one(lb.mix2, frame, wo_w, wi_w)
        f = lb.mix_amt * f + (1.0 - lb.mix_amt) * f2
    return f


def _bsdf_f_one(lb: Lobes, frame: Frame, wo_w, wi_w):
    wo = frame.to_local(wo_w)
    wi = frame.to_local(wi_w)
    # use geometric normal to classify reflect vs transmit (pbrt BSDF::f)
    reflect = dot(wi_w, frame.ng) * dot(wo_w, frame.ng) > 0.0
    same = _same_hemisphere(wo, wi)
    f = jnp.zeros(wo.shape[:-1] + (S,), jnp.float32)
    # diffuse
    dr = _diffuse_f(jnp.where(lb.fb[..., None], 0.0, lb.diff_r), lb.sigma, wo, wi)
    # measured half-angle table replaces the lambertian value on measured
    # lanes (sampled like diffuse: cosine hemisphere; reference
    # core/reflection.cpp RegularHalfangleBRDF::f has no Sample_f override)
    if lb.meas_tables is not None:
        from pbrt_tpu.materials.measured import eval_measured

        f_meas = eval_measured(lb.meas_tables, lb.meas_id, wo, wi)
        dr = jnp.where((lb.meas_id >= 0)[..., None], f_meas, dr)
    dt = _diffuse_f(lb.diff_t, lb.sigma, wo, wi)
    f = f + jnp.where((reflect & same)[..., None], dr, 0.0)
    f = f + jnp.where((~reflect)[..., None], dt, 0.0)
    # glossy reflection
    gf = _glossy_f(lb._replace(gloss=jnp.where(lb.fb[..., None], 0.0, lb.gloss)), wo, wi)
    f = f + jnp.where(reflect[..., None], gf, 0.0)
    # translucent glossy transmission: evaluate with wi flipped
    wi_flip = wi * jnp.asarray([1.0, 1.0, -1.0])
    gt = _glossy_f(lb._replace(gloss=lb.gloss_t), wo, wi_flip)
    f = f + jnp.where((~reflect)[..., None], gt, 0.0)
    # fresnel blend
    fbv = _fb_f(lb, wo, wi)
    f = f + jnp.where((lb.fb & reflect)[..., None], fbv, 0.0)
    return f


def bsdf_pdf(lb: Lobes, frame: Frame, wo_w, wi_w):
    """pdf of sampling wi given wo over non-specular lobes, weighted by
    the same lobe-selection probabilities as bsdf_sample. Mix lanes:
    the one-sample mixture pdf, children weighted by amount luminance."""
    p = _bsdf_pdf_one(lb, frame, wo_w, wi_w)
    if lb.mix2 is not None:
        p2 = _bsdf_pdf_one(lb.mix2, frame, wo_w, wi_w)
        ya = jnp.clip(spec.y(lb.mix_amt), 0.0, 1.0)
        p = ya * p + (1.0 - ya) * p2
    return p


def _bsdf_pdf_one(lb: Lobes, frame: Frame, wo_w, wi_w):
    wo = frame.to_local(wo_w)
    wi = frame.to_local(wi_w)
    w_diff, w_gloss, w_spec_r, w_spec_t = _active_weights(lb)
    w_fb = jnp.where(lb.fb, spec.y(lb.diff_r) + spec.y(lb.gloss), 0.0)
    w_gloss = jnp.where(lb.fb, 0.0, w_gloss)
    total = w_diff + w_gloss + w_spec_r + w_spec_t + w_fb
    same = _same_hemisphere(wo, wi)
    pdf_diff = jnp.where(same, _abs_cos_theta(wi) * INV_PI, _abs_cos_theta(wi) * INV_PI)
    # diffuse lobe splits its prob between refl and trans by their luminance
    wdr, wdt = spec.y(lb.diff_r), spec.y(lb.diff_t)
    wd_tot = jnp.maximum(wdr + wdt, 1e-12)
    p_diff = pdf_diff * jnp.where(same, wdr / wd_tot, wdt / wd_tot)
    p_gloss_r = _glossy_pdf(lb, wo, wi)
    wi_flip = wi * jnp.asarray([1.0, 1.0, -1.0])
    p_gloss_t = _glossy_pdf(lb, wo, wi_flip)
    wgr = spec.y(lb.gloss)
    wgt = spec.y(lb.gloss_t)
    wg_tot = jnp.maximum(wgr + wgt, 1e-12)
    p_gloss = jnp.where(same, p_gloss_r * wgr / wg_tot, p_gloss_t * wgt / wg_tot)
    # fresnel blend pdf: 0.5 cos-hemisphere + 0.5 blinn
    p_fb = jnp.where(same, 0.5 * (_abs_cos_theta(wi) * INV_PI) + 0.5 * p_gloss_r, 0.0)
    tot = jnp.maximum(total, 1e-12)
    return (
        w_diff / tot * p_diff + w_gloss / tot * p_gloss + w_fb / tot * p_fb
    )


class BsdfSample(NamedTuple):
    wi: jnp.ndarray          # [H, 3] world
    f: jnp.ndarray           # [H, S] BSDF value (for specular: weight f such
                             # that throughput *= f * |cos| / pdf works)
    pdf: jnp.ndarray         # [H]
    is_specular: jnp.ndarray  # [H] bool
    did_transmit: jnp.ndarray  # [H] bool (entered specular transmission)
    valid: jnp.ndarray       # [H] bool


def bsdf_sample(lb: Lobes, frame: Frame, wo_w, u_lobe, u1, u2, u3=None,
                lam_nm=None, u_pick=None) -> BsdfSample:
    """Sample an outgoing direction. u_lobe/u1/u2/u3: [H] uniforms (u3
    drives sub-lobe choices). lam_nm: [H] wavelength (nm) carried by the
    lane for dispersion (or <0 for dense-spectrum lanes). u_pick: [H]
    uniform driving the mix-constituent choice — pass an independent
    sampler dimension; the fallback scramble of u_lobe correlates the
    constituent pick with the lobe pick under low-discrepancy samplers.

    Mix lanes pick a constituent with probability = amount luminance
    and sample a direction from it. For NON-specular picks the returned
    (f, pdf) are the FULL blend amt*f1+(1-amt)*f2 and the mixture pdf
    ya*p1+(1-ya)*p2 — the same density bsdf_pdf reports, so both MIS
    strategies weight with one consistent pdf (reference BSDF::Sample_f
    over ScaledBxDFs, core/reflection.cpp:534-564, behaves this way:
    f sums all matching BxDFs, pdf averages them). Specular picks keep
    the single-constituent form (delta lobes cannot be cross-evaluated)."""
    if lb.mix2 is None:
        return _bsdf_sample_one(lb, frame, wo_w, u_lobe, u1, u2, u3, lam_nm)
    ya = jnp.clip(spec.y(lb.mix_amt), 0.0, 1.0)
    if u_pick is None:
        u_pick = (u_lobe * 811.0) % 1.0
    choose1 = u_pick < ya
    lb1 = lb._replace(mix2=None, mix_amt=None)
    s1 = _bsdf_sample_one(lb1, frame, wo_w, u_lobe, u1, u2, u3, lam_nm)
    s2 = _bsdf_sample_one(lb.mix2, frame, wo_w, u_lobe, u1, u2, u3, lam_nm)

    def sel(a, b):
        m = choose1.reshape(choose1.shape + (1,) * (a.ndim - choose1.ndim))
        return jnp.where(m, a, b)

    amt_c = jnp.where(choose1[..., None], lb.mix_amt, 1.0 - lb.mix_amt)
    pick_p = jnp.where(choose1, ya, 1.0 - ya)
    wi_sel = sel(s1.wi, s2.wi)
    is_spec = sel(s1.is_specular, s2.is_specular)
    # non-specular picks: blended f + mixture pdf at the sampled wi
    # (consistent with bsdf_f/bsdf_pdf; specular lobes contribute 0 to
    # both evaluators, matching the reference's delta handling)
    f_mix = (lb.mix_amt * _bsdf_f_one(lb1, frame, wo_w, wi_sel)
             + (1.0 - lb.mix_amt) * _bsdf_f_one(lb.mix2, frame, wo_w, wi_sel))
    p_mix = (ya * _bsdf_pdf_one(lb1, frame, wo_w, wi_sel)
             + (1.0 - ya) * _bsdf_pdf_one(lb.mix2, frame, wo_w, wi_sel))
    return BsdfSample(
        wi=wi_sel,
        f=jnp.where(is_spec[..., None], amt_c * sel(s1.f, s2.f), f_mix),
        pdf=jnp.where(is_spec, pick_p * sel(s1.pdf, s2.pdf), p_mix),
        is_specular=is_spec,
        did_transmit=sel(s1.did_transmit, s2.did_transmit),
        valid=sel(s1.valid, s2.valid) & (pick_p > 1e-6),
    )


def _bsdf_sample_one(lb: Lobes, frame: Frame, wo_w, u_lobe, u1, u2,
                     u3=None, lam_nm=None) -> BsdfSample:
    wo = frame.to_local(wo_w)
    h = wo.shape[0]
    if lam_nm is None:
        lam_nm = jnp.full((h,), -1.0, jnp.float32)
    if u3 is None:
        u3 = jnp.clip((u_lobe * 997.0) % 1.0, 0.0, 1.0)

    w_diff, w_gloss, w_spec_r, w_spec_t = _active_weights(lb)
    w_fb = jnp.where(lb.fb, spec.y(lb.diff_r) + spec.y(lb.gloss), 0.0)
    w_gloss_sel = jnp.where(lb.fb, 0.0, w_gloss)
    ws = jnp.stack([w_diff, w_gloss_sel + w_fb, w_spec_r, w_spec_t], axis=-1)
    total = jnp.sum(ws, -1)
    probs = ws / jnp.maximum(total[..., None], 1e-12)
    cdf = jnp.cumsum(probs, -1)
    lobe_idx = jnp.sum((u_lobe[..., None] > cdf).astype(jnp.int32), -1)
    lobe_idx = jnp.clip(lobe_idx, 0, 3)
    pick_prob = jnp.take_along_axis(probs, lobe_idx[..., None], -1)[..., 0]

    # --- candidate 0: diffuse (cosine hemisphere; maybe transmissive side)
    wi_diff = cosine_sample_hemisphere(u1, u2)
    wdr, wdt = spec.y(lb.diff_r), spec.y(lb.diff_t)
    wd_tot = jnp.maximum(wdr + wdt, 1e-12)
    # transmit only when a diffuse-transmission lobe actually exists —
    # an all-zero diffuse slot must not flip the candidate under the
    # horizon (it burned half the FresnelBlend samples pre-round-5)
    diff_transmit = (wdt > 1e-9) & (u3 > (wdr / wd_tot))
    wi_diff = jnp.where(diff_transmit[..., None], wi_diff * jnp.asarray([1.0, 1.0, -1.0]), wi_diff)
    wi_diff = jnp.where((wo[..., 2] < 0)[..., None], wi_diff * jnp.asarray([1.0, 1.0, -1.0]), wi_diff)

    # --- candidate 1: glossy (blinn / aniso / fresnelblend half-half)
    e = lb.blinn_e
    cos_h = jnp.power(jnp.maximum(u1, 1e-9), 1.0 / (e + 1.0))
    sin_h = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_h * cos_h))
    phi_h = 2.0 * jnp.pi * u2
    # anisotropic first-quadrant sampling (reference reflection.cpp
    # Anisotropic::Sample_f), mapped to four quadrants by u2
    u2q = (u2 * 4.0) % 1.0
    quad = jnp.clip((u2 * 4.0).astype(jnp.int32), 0, 3)
    phi_a = jnp.arctan(
        jnp.sqrt((lb.aniso_ex + 1.0) / (lb.aniso_ey + 1.0)) * jnp.tan(jnp.pi * u2q * 0.5)
    )
    phi_a = jnp.where(quad == 1, jnp.pi - phi_a, phi_a)
    phi_a = jnp.where(quad == 2, jnp.pi + phi_a, phi_a)
    phi_a = jnp.where(quad == 3, 2.0 * jnp.pi - phi_a, phi_a)
    cphi, sphi = jnp.cos(phi_a), jnp.sin(phi_a)
    cos_ha = jnp.power(
        jnp.maximum(u1, 1e-9),
        1.0 / (lb.aniso_ex * cphi * cphi + lb.aniso_ey * sphi * sphi + 1.0),
    )
    sin_ha = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_ha * cos_ha))
    wh = jnp.where(
        lb.aniso[..., None],
        jnp.stack([sin_ha * cphi, sin_ha * sphi, cos_ha], -1),
        jnp.stack([sin_h * jnp.cos(phi_h), sin_h * jnp.sin(phi_h), cos_h], -1),
    )
    wh = jnp.where((wo[..., 2] < 0)[..., None], wh * jnp.asarray([1.0, 1.0, -1.0]), wh)
    wi_gloss = -wo + 2.0 * dot(wo, wh)[..., None] * wh
    # fresnelblend: half the samples go diffuse
    fb_use_diff = lb.fb & (u3 < 0.5)
    wi_gloss = jnp.where(fb_use_diff[..., None], wi_diff, wi_gloss)

    # --- candidate 2: specular reflection
    wi_spec_r = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)

    # --- candidate 3: specular transmission (with dispersion)
    eta_lane = jnp.where(
        (lb.vn > 0.0) & (lam_nm > 0.0), cauchy_eta(lb.eta, lb.vn, lam_nm), lb.eta
    )
    entering = _cos_theta(wo) > 0.0
    ei = jnp.where(entering, 1.0, eta_lane)
    et = jnp.where(entering, eta_lane, 1.0)
    sini2 = _sin_theta2(wo)
    eta_ratio = ei / et
    sint2 = eta_ratio * eta_ratio * sini2
    tir = sint2 >= 1.0
    cost = jnp.sqrt(jnp.maximum(0.0, 1.0 - sint2))
    cost = jnp.where(entering, -cost, cost)
    sint_over_sini = eta_ratio
    wi_spec_t = jnp.stack(
        [sint_over_sini * -wo[..., 0], sint_over_sini * -wo[..., 1], cost], -1
    )

    wi = jnp.where(
        (lobe_idx == 0)[..., None], wi_diff,
        jnp.where((lobe_idx == 1)[..., None], wi_gloss,
                  jnp.where((lobe_idx == 2)[..., None], wi_spec_r, wi_spec_t)),
    )
    is_specular = lobe_idx >= 2
    did_transmit = (lobe_idx == 3) & ~tir

    wi_w = frame.to_world(wi)

    # --- weights / pdfs
    # non-specular: combined f and pdf over all non-spec lobes
    f_ns = _bsdf_f_one(lb, frame, wo_w, wi_w)
    pdf_ns = _bsdf_pdf_one(lb, frame, wo_w, wi_w)

    # specular reflection weight
    cos_o = _cos_theta(wo)
    fr_d = fresnel_dielectric(cos_o, 1.0, eta_lane)[..., None]
    fr_c = fresnel_conductor(cos_o, lb.spec_r_eta_s, lb.spec_r_k_s)
    fr_s = jnp.where(
        (lb.spec_r_f_kind == F_CONDUCTOR)[..., None], fr_c,
        jnp.where((lb.spec_r_f_kind == F_DIELECTRIC)[..., None], fr_d, 1.0),
    )
    aci = jnp.maximum(_abs_cos_theta(wi_spec_r), 1e-7)
    f_spec_r = lb.spec_r * fr_s / aci[..., None]

    # specular transmission weight: (1-Fr) * T * (ei/et)^2 / |cos|
    fr_t = fresnel_dielectric(cos_o, 1.0, eta_lane)
    act = jnp.maximum(jnp.abs(cost), 1e-7)
    f_spec_t = lb.spec_t * ((1.0 - fr_t) * (ei * ei) / (et * et) / act)[..., None]
    f_spec_t = jnp.where(tir[..., None], 0.0, f_spec_t)

    f = jnp.where(
        (lobe_idx <= 1)[..., None], f_ns,
        jnp.where((lobe_idx == 2)[..., None], f_spec_r, f_spec_t),
    )
    pdf = jnp.where(lobe_idx <= 1, pdf_ns, pick_prob)
    valid = (total > 0) & (pdf > 1e-12) & ~(is_specular & (lobe_idx == 3) & tir)
    return BsdfSample(wi=wi_w, f=f, pdf=pdf, is_specular=is_specular,
                      did_transmit=did_transmit, valid=valid)


def has_transmissive(lb: Lobes):
    """Lane has any transmissive lobe (dispersion trigger check,
    reference photonshooter.cpp:141-145)."""
    h = (jnp.sum(lb.spec_t, -1) > 0) | (jnp.sum(lb.diff_t, -1) > 0) | (
        jnp.sum(lb.gloss_t, -1) > 0
    )
    if lb.mix2 is not None:
        h = h | has_transmissive(lb.mix2)
    return h


def has_specular(lb: Lobes):
    h = (jnp.sum(lb.spec_r, -1) > 0) | (jnp.sum(lb.spec_t, -1) > 0)
    if lb.mix2 is not None:
        h = h | has_specular(lb.mix2)
    return h


def has_non_specular(lb: Lobes):
    h = (
        (jnp.sum(lb.diff_r, -1) > 0) | (jnp.sum(lb.diff_t, -1) > 0)
        | (jnp.sum(lb.gloss, -1) > 0) | (jnp.sum(lb.gloss_t, -1) > 0)
    )
    if lb.mix2 is not None:
        h = h | has_non_specular(lb.mix2)
    return h


def rho_proxies(lb: Lobes):
    """(rho_r, rho_t) reflectance proxies for density estimates
    (photon-map LPhoton rho(wo)*INV_PI, reference photonmap.cpp:88-103),
    mix-aware."""
    rr = lb.diff_r + lb.gloss
    rt = lb.diff_t + lb.gloss_t
    if lb.mix2 is not None:
        rr2, rt2 = rho_proxies(lb.mix2)
        rr = lb.mix_amt * rr + (1.0 - lb.mix_amt) * rr2
        rt = lb.mix_amt * rt + (1.0 - lb.mix_amt) * rt2
    return rr, rt
