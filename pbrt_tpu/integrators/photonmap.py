"""Photon-mapping surface integrator.

Replaces reference integrators/photonmap.cpp: direct lighting + caustic
photon density estimate + (final-gathered or direct) indirect estimate
+ specular recursion. The kNN heap becomes the sorted-grid top-k
(pbrt_tpu.photon.map); the density kernel is the reference's Simpson
kernel k(d) = 3/pi (1 - d2/r2)^2 / r2 (photonmap.cpp LPhoton).
"""
from __future__ import annotations

import jax.numpy as jnp

from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.core.geometry import Ray, dot, normalize
from pbrt_tpu.integrators.surface import (
    BIG,
    RAY_EPS,
    estimate_direct,
    make_frame,
    PathState,
    _add_hit_emission,
    _add_escape_emission,
)
from pbrt_tpu.materials.bsdf import (
    bsdf_f,
    bsdf_sample,
    has_non_specular,
    material_lobes,
)
from pbrt_tpu.photon.map import knn_lookup
from pbrt_tpu.samplers.samplers import integrator_uniform as iu
from pbrt_tpu.scene.compile import CompiledScene, eval_bsdf_params

S = spec.N_BINS
INV_PI = 1.0 / jnp.pi


def _simpson_kernel(d2, r2):
    s = jnp.maximum(0.0, 1.0 - d2 / jnp.maximum(r2, 1e-12))
    return 3.0 * INV_PI * s * s / jnp.maximum(r2, 1e-12)


def lphoton_surface(pm, lobes, frame, p, wo, n_used: int, max_dist2: float):
    """Surface radiance estimate from a photon map (reference
    photonmap.cpp LPhoton). [N, S]."""
    if pm is None:
        return jnp.zeros(p.shape[:-1] + (S,), jnp.float32)
    res = knn_lookup(pm, p, n_used, max_dist2)
    K = res.dist2.shape[1]
    kern = _simpson_kernel(res.dist2, res.r2_max[:, None])  # [N, K]
    # diffuse form: flux arriving in the upper hemisphere * rho/pi
    same_hemi = dot(res.wi, frame.ns[:, None, :]) * dot(wo, frame.ns)[:, None] > 0.0
    w = jnp.where(res.valid & same_hemi, kern, 0.0)
    flux = jnp.sum(res.alpha * w[..., None], axis=1)  # [N, S]
    rho = lobes.diff_r + lobes.gloss  # reflectance proxy for the estimate
    return flux * rho * INV_PI


def li_photonmap(scene: CompiledScene, ctx, ray: Ray, pixel, sidx,
                 max_depth: int = 5, seed: int = 0, transmittance_fn=None):
    """Eye-side evaluation: direct + caustic + indirect + specular
    recursion (reference photonmap.cpp:159-331)."""
    N = ray.o.shape[0]
    st = PathState(
        ray_o=ray.o, ray_d=ray.d,
        throughput=jnp.ones((N, S), jnp.float32),
        L=jnp.zeros((N, S), jnp.float32),
        alive=jnp.ones((N,), bool),
        prev_bsdf_pdf=jnp.zeros((N,), jnp.float32),
        prev_specular=jnp.ones((N,), bool),
        lam_nm=jnp.full((N,), -1.0, jnp.float32),
        bounces=jnp.zeros((N,), jnp.int32),
    )
    zf = jnp.zeros((N,), jnp.float32)
    tm = ray.time
    for depth in range(max_depth + 1):
        hit = scene.intersect(Ray(st.ray_o, st.ray_d, zf, jnp.full((N,), BIG), tm))
        st = st._replace(L=_add_hit_emission(scene, st, hit, depth == 0))
        escaped = st.alive & ~hit.valid
        st = st._replace(L=_add_escape_emission(scene, st, escaped, True))
        alive = st.alive & hit.valid
        if depth == max_depth:
            break
        params = eval_bsdf_params(scene, hit)
        lobes = material_lobes(params)
        frame = make_frame(hit)
        wo = -normalize(st.ray_d)
        has_ns = has_non_specular(lobes)

        Ld = estimate_direct(
            scene, lobes, frame, hit.p, wo,
            iu(pixel, sidx, depth, 0, seed), iu(pixel, sidx, depth, 1, seed),
            iu(pixel, sidx, depth, 2, seed), alive & has_ns,
            transmittance_fn=transmittance_fn, time=tm,
        )
        Lc = lphoton_surface(ctx.caustic, lobes, frame, hit.p, wo,
                             ctx.n_used, ctx.max_dist2)
        if ctx.final_gather and ctx.indirect is not None:
            Li_ind = _final_gather(scene, ctx, lobes, frame, hit.p, wo,
                                   pixel, sidx, depth, seed)
        else:
            Li_ind = lphoton_surface(ctx.indirect, lobes, frame, hit.p, wo,
                                     ctx.n_used, ctx.max_dist2)
        add = (Ld + Lc + Li_ind) * st.throughput
        st = st._replace(L=st.L + jnp.where((alive & has_ns)[..., None], add,
                                            jnp.where(alive[..., None], Ld * st.throughput, 0.0)))

        # specular-only recursion (reference photonmap.cpp SpecularReflect/
        # Transmit chain)
        bs = bsdf_sample(
            lobes, frame, wo,
            iu(pixel, sidx, depth, 4, seed), iu(pixel, sidx, depth, 5, seed),
            iu(pixel, sidx, depth, 6, seed), iu(pixel, sidx, depth, 7, seed),
            lam_nm=st.lam_nm,
        )
        cos_i = jnp.abs(dot(bs.wi, frame.ns))
        tp_new = st.throughput * bs.f * (cos_i / jnp.maximum(bs.pdf, 1e-12))[..., None]
        alive = alive & bs.valid & bs.is_specular & ~spec.is_black(tp_new)
        st = PathState(
            ray_o=hit.p + bs.wi * RAY_EPS, ray_d=bs.wi,
            throughput=jnp.where(alive[..., None], tp_new, 0.0),
            L=st.L, alive=alive,
            prev_bsdf_pdf=bs.pdf, prev_specular=jnp.ones((N,), bool),
            lam_nm=st.lam_nm, bounces=st.bounces + 1,
        )
    return st.L


def _final_gather(scene, ctx, lobes, frame, p, wo, pixel, sidx, depth, seed):
    """Final gather: BSDF-sampled rays whose hits are shaded from the
    photon maps (reference photonmap.cpp:183-296, BSDF-sampling
    strategy; the photon-cone second strategy is approximated by the
    same estimator since both integrate the same incident field)."""
    from pbrt_tpu.core.sampling import cosine_sample_hemisphere

    N = p.shape[0]
    n_g = max(1, ctx.gather_samples // 8)  # wavefront gather is per-lane
    acc = jnp.zeros((N, S), jnp.float32)
    for g in range(n_g):
        u1 = iu(pixel, sidx, depth, 50 + 3 * g, seed)
        u2 = iu(pixel, sidx, depth, 51 + 3 * g, seed)
        wl = cosine_sample_hemisphere(u1, u2)
        # flip into wo hemisphere
        flip = (dot(wo, frame.ns) < 0)
        wl = jnp.where(flip[..., None], wl * jnp.asarray([1.0, 1.0, -1.0]), wl)
        wi = frame.to_world(wl)
        gray = Ray(p + wi * RAY_EPS, wi, jnp.zeros((N,), jnp.float32),
                   jnp.full((N,), BIG), jnp.zeros((N,), jnp.float32))
        ghit = scene.intersect(gray)
        gparams = eval_bsdf_params(scene, ghit)
        globes = material_lobes(gparams)
        gframe = make_frame(ghit)
        # radiance leaving the gather hit toward -wi, from photon maps
        Lr = (
            lphoton_surface(ctx.indirect, globes, gframe, ghit.p, -wi,
                            ctx.n_used, ctx.max_dist2 * 4.0)
            + lphoton_surface(ctx.direct, globes, gframe, ghit.p, -wi,
                              ctx.n_used, ctx.max_dist2 * 4.0)
            + lphoton_surface(ctx.caustic, globes, gframe, ghit.p, -wi,
                              ctx.n_used, ctx.max_dist2)
        )
        f = bsdf_f(lobes, frame, wo, wi)
        cos_i = jnp.abs(dot(wi, frame.ns))
        pdf = cos_i * INV_PI
        contrib = f * Lr * (cos_i / jnp.maximum(pdf, 1e-9))[..., None]
        acc = acc + jnp.where(ghit.valid[..., None], contrib, 0.0)
    return acc / n_g
