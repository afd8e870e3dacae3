"""Wavefront surface integrators.

Replaces the recursive Li integrators (reference integrators/path.cpp
:52-123, whitted.cpp:40, directlighting.cpp, ambientocclusion.cpp) with
fixed-depth iterative loops over ray batches with alive masks
(SURVEY.md section 7 "recursive Li -> wavefront").

MIS structure: per vertex we light-sample (one light by the power CDF)
and reuse the BSDF continuation sample as the second MIS strategy — Le
found at the *next* vertex is weighted by power_heuristic(bsdf_pdf,
light_pdf). This is the standard wavefront factoring of pbrt's
UniformSampleOneLight + hit-emission logic and integrates to the same
estimator.

Spectral dispersion: lanes carry lam_nm (< 0 means dense spectrum).
The first dispersive specular transmission importance-samples ONE
wavelength bin from the throughput (unbiased, spectrum.sample_bin)
instead of enumerating 30 monochromatic rays like the CPU
splitSpectrum (reference core/photonshooter.cpp:141-145).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.core.geometry import Ray, dot, normalize
from pbrt_tpu.core.sampling import power_heuristic
from pbrt_tpu.accel.intersect import Hit, intersect, intersect_p
from pbrt_tpu.lights.lighting import (
    L_AREA,
    L_INFINITE,
    area_emission,
    area_tri_pdf,
    env_le,
    light_pdf,
    sample_light,
)
from pbrt_tpu.materials.bsdf import (
    Frame,
    Lobes,
    bsdf_f,
    bsdf_pdf,
    bsdf_sample,
    has_non_specular,
    material_lobes,
)
from pbrt_tpu.samplers.samplers import integrator_uniform as iu
from pbrt_tpu.scene.compile import CompiledScene, eval_bsdf_params

S = spec.N_BINS
BIG = 1e30
RAY_EPS = 1e-3


def shading_frame(scene, hit: Hit) -> Frame:
    """make_frame + bump mapping when the scene uses bump textures."""
    from pbrt_tpu.scene.compile import eval_bump

    return eval_bump(scene, hit, make_frame(hit))


def make_frame(hit: Hit) -> Frame:
    ss = normalize(hit.dpdu)
    # re-orthogonalize against ns
    ss = normalize(ss - hit.ns * dot(ss, hit.ns)[..., None])
    degen = jnp.sum(ss * ss, -1) < 0.5
    from pbrt_tpu.core.geometry import coordinate_system

    fb1, _ = coordinate_system(hit.ns)
    ss = jnp.where(degen[..., None], fb1, ss)
    ts = jnp.cross(hit.ns, ss)
    return Frame(ss=ss, ts=ts, ns=hit.ns, ng=hit.ng)


def _occluded(scene: CompiledScene, p, wi, dist, valid, time=None):
    """Shadow-ray query toward a light sample (at the camera ray's time
    so moving occluders are sampled consistently)."""
    R = p.shape[0]
    tmax = jnp.where(dist >= BIG, jnp.full_like(dist, BIG), dist * (1.0 - 1e-3))
    ray = Ray(
        o=p + wi * RAY_EPS,
        d=wi,
        tmin=jnp.zeros((R,), jnp.float32),
        tmax=jnp.where(valid, tmax, -1.0),  # invalid lanes: empty interval
        time=jnp.zeros((R,), jnp.float32) if time is None else time,
    )
    # shadow beams (clustered origins, light-convergent directions)
    # traverse with the frustum cull
    return scene.intersect_p(ray, coherent=True)


def estimate_direct(scene: CompiledScene, lobes: Lobes, frame: Frame,
                    p, wo, u_light, u1, u2, active, transmittance_fn=None,
                    time=None, mis: bool = True):
    """One-light direct illumination with light-sampling MIS half.

    Returns [N, S]. The BSDF half of the MIS pair is folded into the
    path loop's next-hit emission (see module docstring); callers that
    do NOT add that half (bidirectional MLT, integrators/bidir.py) pass
    mis=False to use the complete light-sampling-only estimator.
    transmittance_fn(p, wi, dist) -> [N, S] volumetric attenuation
    applied to the light sample (None = vacuum).
    """
    if scene.lights is None:
        return jnp.zeros(p.shape[:-1] + (S,), jnp.float32)
    light_idx, pick_pmf = scene.light_dist.sample_discrete(u_light)
    light_idx = light_idx.astype(jnp.int32)
    ls = sample_light(scene.lights, scene.envs, light_idx, p, u1, u2)
    f = bsdf_f(lobes, frame, wo, ls.wi)
    cos_i = jnp.abs(dot(ls.wi, frame.ns))
    usable = active & (cos_i > 0) & (ls.pdf > 1e-9) & ~spec.is_black(ls.L) & ~spec.is_black(f)
    occluded = _occluded(scene, p, ls.wi, ls.dist, usable, time=time)
    usable = usable & ~occluded
    # MIS weight (light strategy): delta lights get weight 1
    if mis:
        bpdf = bsdf_pdf(lobes, frame, wo, ls.wi)
        w = jnp.where(ls.is_delta, 1.0, power_heuristic(1.0, ls.pdf * pick_pmf, 1.0, bpdf))
    else:
        w = jnp.ones(cos_i.shape, jnp.float32)
    contrib = f * ls.L * (cos_i * w / jnp.maximum(ls.pdf * pick_pmf, 1e-12))[..., None]
    if transmittance_fn is not None:
        contrib = contrib * transmittance_fn(p, ls.wi, ls.dist)
    return jnp.where(usable[..., None], contrib, 0.0)


class PathState(NamedTuple):
    ray_o: jnp.ndarray
    ray_d: jnp.ndarray
    throughput: jnp.ndarray    # [N, S]
    L: jnp.ndarray             # [N, S]
    alive: jnp.ndarray         # [N]
    prev_bsdf_pdf: jnp.ndarray  # [N] pdf of the sample that produced this ray
    prev_specular: jnp.ndarray  # [N] previous bounce was specular
    lam_nm: jnp.ndarray        # [N] carried wavelength (<0: dense)
    bounces: jnp.ndarray       # [N] int32


def _add_hit_emission(scene: CompiledScene, st: PathState, hit: Hit, first: bool):
    """Emission picked up by the continuation/camera ray, MIS-weighted."""
    L = st.L
    if scene.lights is None:
        return L
    wo = -normalize(st.ray_d)
    le = area_emission(scene.lights, jnp.maximum(hit.light, 0), hit.ng, wo)
    emissive = hit.valid & (hit.light >= 0)
    if first:
        w = jnp.ones(hit.t.shape, jnp.float32)
    else:
        # light pdf of having sampled this direction toward the area light
        d = hit.p - st.ray_o
        dist2 = jnp.maximum(jnp.sum(d * d, -1), 1e-12)
        cos_l = dot(hit.ng, wo)
        lpdf = area_tri_pdf(scene.lights, jnp.maximum(hit.light, 0), dist2, cos_l)
        pick = scene.light_dist.pdf_discrete(jnp.maximum(hit.light, 0))
        w = jnp.where(
            st.prev_specular,
            1.0,
            power_heuristic(1.0, st.prev_bsdf_pdf, 1.0, lpdf * pick),
        )
    add = st.throughput * le * w[..., None]
    return L + jnp.where((emissive & st.alive)[..., None], add, 0.0)


def _add_escape_emission(scene: CompiledScene, st: PathState, escaped, first: bool):
    """Env-map radiance for rays that left the scene."""
    if scene.lights is None or not scene.envs:
        return st.L
    le = env_le(scene.lights, scene.envs, st.ray_d)
    if first:
        w = jnp.ones(escaped.shape, jnp.float32)
    else:
        lp = jnp.zeros(escaped.shape, jnp.float32)
        for env in scene.envs:
            li = jnp.full(escaped.shape, env.light_idx, jnp.int32)
            lp_e = light_pdf(scene.lights, scene.envs, li, st.ray_o, normalize(st.ray_d))
            pick = scene.light_dist.pdf_discrete(li)
            lp = lp + lp_e * pick
        w = jnp.where(st.prev_specular, 1.0, power_heuristic(1.0, st.prev_bsdf_pdf, 1.0, lp))
    add = st.throughput * le * w[..., None]
    return st.L + jnp.where((escaped & st.alive)[..., None], add, 0.0)


def li_path(scene: CompiledScene, ray: Ray, pixel, sidx,
            max_depth: int = 5, seed: int = 0, rr_start: int = 3,
            transmittance_fn=None):
    """Path-traced radiance for a ray batch (reference integrators/
    path.cpp:52-123: MIS one-light, RR after bounce 3). Returns [N, S]."""

    def u_fn(depth, dim):
        return iu(pixel, sidx, depth, dim, seed)

    return _li_path_impl(scene, ray, u_fn, max_depth, rr_start, transmittance_fn)


def li_path_psamples(scene: CompiledScene, ray: Ray, u, max_depth: int = 5,
                     transmittance_fn=None):
    """Path radiance driven by an explicit primary-sample vector
    u [N, D] (Kelemen MLT, reference renderers/metropolis.cpp MLTSample:
    the psample stream IS the path). 10 dims per bounce; RR disabled so
    the path is a deterministic function of u."""
    DPB = 10

    def u_fn(depth, dim):
        d = depth * DPB + (dim % DPB)
        d = min(d, u.shape[1] - 1)
        return u[:, d]

    return _li_path_impl(scene, ray, u_fn, max_depth, max_depth + 1,
                         transmittance_fn)


def _li_path_impl(scene: CompiledScene, ray: Ray, u_fn, max_depth: int,
                  rr_start: int, transmittance_fn):
    N = ray.o.shape[0]
    st = PathState(
        ray_o=ray.o, ray_d=ray.d,
        throughput=jnp.ones((N, S), jnp.float32),
        L=jnp.zeros((N, S), jnp.float32),
        alive=jnp.ones((N,), bool),
        prev_bsdf_pdf=jnp.zeros((N,), jnp.float32),
        prev_specular=jnp.zeros((N,), bool),
        lam_nm=jnp.full((N,), -1.0, jnp.float32),
        bounces=jnp.zeros((N,), jnp.int32),
    )

    tm = ray.time  # shutter time, constant along the path

    # Depth loop is a Python unroll: each bounce evaluates the (small)
    # closed material set; XLA fuses the per-bounce bodies.
    for depth in range(max_depth + 1):
        # dead lanes get an empty [0, -1] interval: the accelerators
        # skip them entirely (the packet pipeline sorts them into
        # all-dead tiles that trace nothing)
        hit = scene.intersect(Ray(st.ray_o, st.ray_d,
                                  jnp.zeros((N,), jnp.float32),
                                  jnp.where(st.alive, BIG, -1.0), tm),
                              coherent=depth == 0)
        first = depth == 0
        L = _add_hit_emission(scene, st, hit, first)
        st = st._replace(L=L)
        escaped = st.alive & ~hit.valid
        st = st._replace(L=_add_escape_emission(scene, st, escaped, first))
        alive = st.alive & hit.valid
        if depth == max_depth:
            st = st._replace(alive=jnp.zeros_like(alive))
            break

        params = eval_bsdf_params(scene, hit)
        lobes = material_lobes(params)
        frame = shading_frame(scene, hit)
        wo = -normalize(st.ray_d)

        # direct lighting at non-specular vertices
        has_ns = has_non_specular(lobes)
        Ld = estimate_direct(
            scene, lobes, frame, hit.p, wo,
            u_fn(depth, 0), u_fn(depth, 1),
            u_fn(depth, 2), alive & has_ns,
            transmittance_fn=transmittance_fn, time=tm,
        )
        # apply carried-wavelength band filter to new light (monochromatic lanes)
        mono = st.lam_nm > 0.0
        Ld = jnp.where(mono[..., None], spec.band_filter(Ld, st.lam_nm), Ld)
        st = st._replace(L=st.L + st.throughput * Ld * alive[..., None])

        # continuation: BSDF sample (with dispersion wavelength pick)
        is_disp = jnp.take(
            jnp.concatenate([scene.material_dispersive.astype(jnp.int32),
                             jnp.zeros((1,), jnp.int32)]),
            jnp.clip(hit.mat, 0, scene.material_dispersive.shape[0]),
        ) > 0
        # Candidate wavelength for dispersive hits; it is only COMMITTED
        # when the sampled lobe is actually specular transmission —
        # reflection off glass does not disperse, so monochroming those
        # lanes would be pure extra variance (the reference gates its
        # splitSpectrum on the transmissive flag the same way,
        # core/photonshooter.cpp:141-145).
        need_lambda = is_disp & (st.lam_nm < 0.0) & alive
        u_bin = u_fn(depth, 3)
        bin_idx, bin_w = spec.sample_bin(st.throughput, u_bin)
        new_lam = spec.bin_wavelength(bin_idx)
        oh = spec.one_hot(bin_idx)
        lam_cand = jnp.where(need_lambda, new_lam, st.lam_nm)

        bs = bsdf_sample(
            lobes, frame, wo,
            u_fn(depth, 4), u_fn(depth, 5),
            u_fn(depth, 6), u_fn(depth, 7),
            lam_nm=lam_cand, u_pick=u_fn(depth, 9),
        )
        commit_lambda = need_lambda & bs.did_transmit
        tp = jnp.where(
            commit_lambda[..., None],
            st.throughput * oh * bin_w[..., None],
            st.throughput,
        )
        lam = jnp.where(commit_lambda, new_lam, st.lam_nm)
        cos_i = jnp.abs(dot(bs.wi, frame.ns))
        tp_new = tp * bs.f * (cos_i / jnp.maximum(bs.pdf, 1e-12))[..., None]
        alive = alive & bs.valid & ~spec.is_black(tp_new)

        # Russian roulette (reference path.cpp: after bounce 3)
        if depth >= rr_start:
            q = jnp.clip(spec.y(tp_new) / jnp.maximum(spec.y(tp), 1e-9), 0.05, 1.0)
            u_rr = u_fn(depth, 8)
            survive = u_rr < q
            tp_new = tp_new / jnp.maximum(q, 1e-9)[..., None]
            alive = alive & survive

        st = PathState(
            ray_o=hit.p + bs.wi * RAY_EPS,
            ray_d=bs.wi,
            throughput=jnp.where(alive[..., None], tp_new, 0.0),
            L=st.L,
            alive=alive,
            prev_bsdf_pdf=bs.pdf,
            prev_specular=bs.is_specular,
            lam_nm=lam,
            bounces=st.bounces + 1,
        )
    return st.L


def li_direct(scene: CompiledScene, ray: Ray, pixel, sidx,
              max_depth: int = 5, seed: int = 0, strategy: str = "all",
              transmittance_fn=None):
    """Direct lighting integrator (reference integrators/directlighting
    .cpp; strategy "all" sums every light, "one" samples one). Specular
    reflection/transmission is followed up to max_depth."""
    return _li_direct_or_whitted(scene, ray, pixel, sidx, max_depth, seed,
                                 strategy, transmittance_fn, whitted=False)


def li_whitted(scene: CompiledScene, ray: Ray, pixel, sidx,
               max_depth: int = 5, seed: int = 0, transmittance_fn=None):
    """Whitted integrator (reference integrators/whitted.cpp:40):
    all-light direct + specular recursion."""
    return _li_direct_or_whitted(scene, ray, pixel, sidx, max_depth, seed,
                                 "all", transmittance_fn, whitted=True)


def _li_direct_or_whitted(scene, ray, pixel, sidx, max_depth, seed, strategy,
                          transmittance_fn, whitted):
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
    tm = ray.time
    for depth in range(max_depth + 1):
        # dead lanes get an empty [0, -1] interval: the accelerators
        # skip them entirely (the packet pipeline sorts them into
        # all-dead tiles that trace nothing)
        hit = scene.intersect(Ray(st.ray_o, st.ray_d,
                                  jnp.zeros((N,), jnp.float32),
                                  jnp.where(st.alive, BIG, -1.0), tm),
                              coherent=depth == 0)
        st = st._replace(L=_add_hit_emission(scene, st, hit, depth == 0))
        escaped = st.alive & ~hit.valid
        st = st._replace(L=_add_escape_emission(scene, st, escaped, True))
        alive = st.alive & hit.valid
        if depth == max_depth:
            break
        params = eval_bsdf_params(scene, hit)
        lobes = material_lobes(params)
        frame = shading_frame(scene, hit)
        wo = -normalize(st.ray_d)

        n_lights = scene.n_lights
        Ld = jnp.zeros((N, S), jnp.float32)
        if n_lights > 0:
            if strategy == "all":
                for li in range(n_lights):
                    lidx = jnp.full((N,), li, jnp.int32)
                    ls = sample_light(scene.lights, scene.envs, lidx, hit.p,
                                      iu(pixel, sidx, depth, 10 + 3 * li, seed),
                                      iu(pixel, sidx, depth, 11 + 3 * li, seed))
                    f = bsdf_f(lobes, frame, wo, ls.wi)
                    cos_i = jnp.abs(dot(ls.wi, frame.ns))
                    ok = alive & (ls.pdf > 1e-9) & ~spec.is_black(ls.L) & ~spec.is_black(f)
                    occ = _occluded(scene, hit.p, ls.wi, ls.dist, ok, time=tm)
                    ok = ok & ~occ
                    c = f * ls.L * (cos_i / jnp.maximum(ls.pdf, 1e-12))[..., None]
                    if transmittance_fn is not None:
                        c = c * transmittance_fn(hit.p, ls.wi, ls.dist)
                    Ld = Ld + jnp.where(ok[..., None], c, 0.0)
            else:
                Ld = estimate_direct(
                    scene, lobes, frame, hit.p, wo,
                    iu(pixel, sidx, depth, 0, seed), iu(pixel, sidx, depth, 1, seed),
                    iu(pixel, sidx, depth, 2, seed), alive,
                    transmittance_fn=transmittance_fn, time=tm,
                )
        st = st._replace(L=st.L + st.throughput * Ld * alive[..., None])

        # specular continuation only
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


def li_ao(scene: CompiledScene, ray: Ray, pixel, sidx,
          n_samples: int = 4, max_dist: float = BIG, seed: int = 0):
    """Ambient occlusion (reference integrators/ambientocclusion.cpp
    :65-66: nsamples cosine rays, maxdist)."""
    from pbrt_tpu.core.sampling import cosine_sample_hemisphere

    N = ray.o.shape[0]
    hit = scene.intersect(ray)
    frame = make_frame(hit)
    ns = jnp.where(
        (dot(frame.ns, -ray.d) < 0)[..., None], -frame.ns, frame.ns
    )
    frame = frame._replace(ns=ns)
    acc = jnp.zeros((N,), jnp.float32)
    for i in range(n_samples):
        u1 = iu(pixel, sidx, i, 0, seed)
        u2 = iu(pixel, sidx, i, 1, seed)
        w_local = cosine_sample_hemisphere(u1, u2)
        wi = frame.to_world(w_local)
        dist = jnp.full((N,), max_dist, jnp.float32)
        occ = _occluded(scene, hit.p, wi, dist, hit.valid, time=ray.time)
        acc = acc + jnp.where(hit.valid & ~occ, 1.0, 0.0)
    vis = acc / n_samples
    return jnp.where(hit.valid[..., None], vis[..., None] * jnp.ones((N, S)), 0.0)
