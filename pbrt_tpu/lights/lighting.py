"""Device-side light table + sampling over wavefront batches.

Replaces the reference's virtual Light hierarchy (reference core/light.h
:48-153, lights/*.cpp) with a closed-set table (kind + transforms +
spectrum + params) evaluated masked, plus python-level side structures
for image-driven lights (infinite env maps, goniometric, projection)
whose count is static per scene.

Light kinds and their param layout (params [L, 12]):
  POINT:      (reference lights/point.cpp)            -
  SPOT:       [0]=cosTotalWidth [1]=cosFalloffStart   (lights/spot.cpp:79)
  GONIO:      image side-structure                    (goniometric.cpp:74)
  PROJECTION: [0]=cosTotalWidth, screen bounds [1..4], [5]=znear(hither)
  DISTANT:    [0:3]=world direction                   (distant.cpp:68)
  INFINITE:   env map side-structure                  (infinite.cpp:85-245)
  AREA:       [0]=total area [1]=is_sphere [2:5]=center [5]=radius
              [6]=tri_start [7]=tri_count              (diffuse.cpp:61)

Area lights sample their triangle soup by area-weighted CDF (deterministic
segment layout, no KdTree); sphere area lights sample the subtended cone
analytically (reference shapes/sphere.cpp Sample).
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.core.geometry import (
    coordinate_system,
    cross,
    distance,
    dot,
    length,
    normalize,
    spherical_phi,
    spherical_theta,
)
from pbrt_tpu.core.sampling import (
    Distribution2D,
    INV_PI,
    INV_TWOPI,
    concentric_sample_disk,
    cosine_sample_hemisphere,
    uniform_cone_pdf,
    uniform_sample_cone,
    uniform_sample_sphere,
    uniform_sample_triangle,
)
from pbrt_tpu.core.transform import xform_point_affine, xform_vector

L_POINT, L_SPOT, L_GONIO, L_PROJECTION, L_DISTANT, L_INFINITE, L_AREA = range(7)

S = spec.N_BINS
BIG = 1e30


class EnvMap(NamedTuple):
    """Image-driven light side structure (host-built, device arrays)."""

    light_idx: int
    image: jnp.ndarray      # [h, w, S] radiance spectra
    dist: Distribution2D    # importance over (u, v), luminance * sin(theta)


class LightsT(NamedTuple):
    kind: jnp.ndarray       # [L] int32
    l2w: jnp.ndarray        # [L, 4, 4]
    w2l: jnp.ndarray        # [L, 4, 4]
    spectra: jnp.ndarray    # [L, S] intensity / radiance
    params: jnp.ndarray     # [L, 12]
    power: jnp.ndarray      # [L, S]
    n_samples: jnp.ndarray  # [L] int32
    # area-light triangle soup (subset copy of scene triangles)
    al_v0: jnp.ndarray      # [AT, 3]
    al_e1: jnp.ndarray
    al_e2: jnp.ndarray
    al_cdf: jnp.ndarray     # [AT] per-light prefix CDF over triangle area

    @property
    def n_lights(self):
        return self.kind.shape[0]


class LightSample(NamedTuple):
    L: jnp.ndarray          # [H, S] incident radiance (before visibility)
    wi: jnp.ndarray         # [H, 3]
    pdf: jnp.ndarray        # [H] (solid angle; delta lights use 1)
    dist: jnp.ndarray       # [H] distance to light point (BIG for inf/distant)
    is_delta: jnp.ndarray   # [H] bool


def _gather(arr, idx):
    return jnp.take(arr, idx, axis=0)


def spot_falloff(cos_t, cos_width, cos_falloff):
    """reference lights/spot.cpp Falloff."""
    d = jnp.clip(
        (cos_t - cos_width) / jnp.maximum(cos_falloff - cos_width, 1e-9), 0.0, 1.0
    )
    inside = cos_t > cos_falloff
    outside = cos_t < cos_width
    return jnp.where(outside, 0.0, jnp.where(inside, 1.0, (d * d) * (d * d)))


def _env_lookup(env: EnvMap, u, v):
    h, w = env.image.shape[0], env.image.shape[1]
    x = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    yv = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    return env.image[yv, x]


def env_le(lights: LightsT, envs: List[EnvMap], d_world):
    """Background radiance for escaped rays: sum over infinite lights.
    d_world: [R, 3] (need not be normalized)."""
    out = jnp.zeros(d_world.shape[:-1] + (S,), jnp.float32)
    for env in envs:
        li = env.light_idx
        if int(np.asarray(lights.kind)[li]) != L_INFINITE:
            continue
        w2l = lights.w2l[li]
        d = normalize(xform_vector(w2l, d_world))
        u = spherical_phi(d) * INV_TWOPI
        v = spherical_theta(d) * INV_PI
        out = out + lights.spectra[li] * _env_lookup(env, u, v)
    return out


def sample_light(lights: LightsT, envs: List[EnvMap], light_idx, p, u1, u2):
    """Sample an incident direction from light light_idx [H] at points p.

    Returns LightSample; visibility is the caller's job (shadow ray from
    p toward wi with tmax=dist).
    """
    H = p.shape[0]
    kind = _gather(lights.kind, light_idx)
    l2w = _gather(lights.l2w, light_idx)
    w2l = _gather(lights.w2l, light_idx)
    spectra = _gather(lights.spectra, light_idx)
    params = _gather(lights.params, light_idx)

    light_pos = l2w[..., :3, 3]
    d_to_light = light_pos - p
    dist2 = jnp.maximum(jnp.sum(d_to_light * d_to_light, -1), 1e-12)
    dist = jnp.sqrt(dist2)
    wi_point = d_to_light / dist[..., None]

    # POINT / SPOT / GONIO / PROJECTION share position falloff
    L_pt = spectra / dist2[..., None]

    # SPOT falloff about light -z... pbrt spot points +z in light space
    wl = normalize(xform_vector(w2l, -wi_point))
    falloff = spot_falloff(wl[..., 2], params[..., 0], params[..., 1])

    # PROJECTION: project into screen window
    # params [1..4] = screen x0 x1 y0 y1 scaled at z=1, [5]=hither
    px = wl[..., 0] / jnp.maximum(wl[..., 2], 1e-9)
    py = wl[..., 1] / jnp.maximum(wl[..., 2], 1e-9)
    in_proj = (
        (wl[..., 2] > 0)
        & (px >= params[..., 1]) & (px <= params[..., 2])
        & (py >= params[..., 3]) & (py <= params[..., 4])
    )
    proj_scale = jnp.where(in_proj, 1.0, 0.0)

    # DISTANT
    wi_dist = normalize(params[..., 0:3])
    L_distant = spectra

    # INFINITE: importance-sample the env map
    wi_inf = jnp.zeros((H, 3), jnp.float32)
    L_inf = jnp.zeros((H, S), jnp.float32)
    pdf_inf = jnp.zeros((H,), jnp.float32)
    for env in envs:
        (u, v), pdf_uv = env.dist.sample_continuous(u1, u2)
        theta = v * jnp.pi
        phi = u * 2.0 * jnp.pi
        sin_t = jnp.sin(theta)
        d_l = jnp.stack(
            [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), jnp.cos(theta)], axis=-1
        )
        wi_e = normalize(xform_vector(_gather(lights.l2w, jnp.full((H,), env.light_idx)), d_l))
        pdf_e = pdf_uv / jnp.maximum(2.0 * jnp.pi * jnp.pi * sin_t, 1e-9)
        Le = lights.spectra[env.light_idx] * _env_lookup(env, u, v)
        sel = light_idx == env.light_idx
        wi_inf = jnp.where(sel[..., None], wi_e, wi_inf)
        L_inf = jnp.where(sel[..., None], Le, L_inf)
        pdf_inf = jnp.where(sel, pdf_e, pdf_inf)

    # AREA: sample triangle soup by CDF or sphere cone
    tri_start = params[..., 6].astype(jnp.int32)
    tri_count = params[..., 7].astype(jnp.int32)
    AT = lights.al_v0.shape[0]
    if AT > 0:
        # per-lane binary-search in the light's cdf segment via masked scan
        # (triangle counts are small; do a masked linear pass over MAX range)
        cdf = lights.al_cdf  # [AT] normalized within each light segment
        # pick: smallest j in [start, start+count) with cdf[j] >= u1'
        idxs = jnp.arange(AT)
        in_seg = (idxs[None, :] >= tri_start[:, None]) & (
            idxs[None, :] < (tri_start + tri_count)[:, None]
        )
        passed = in_seg & (cdf[None, :] >= u1[:, None] * 0.9999999)
        first = jnp.argmax(passed, axis=-1)
        any_seg = jnp.any(passed, axis=-1)
        tri_j = jnp.where(any_seg, first, tri_start)
        v0 = _gather(lights.al_v0, tri_j)
        e1 = _gather(lights.al_e1, tri_j)
        e2 = _gather(lights.al_e2, tri_j)
        # fresh stratified coords within the chosen triangle: reuse (u1, u2)
        # remapped — u1 was consumed by the CDF pick; decorrelate:
        b0, b1 = uniform_sample_triangle(u2, jnp.clip((u1 * 4096.0) % 1.0, 0.0, 1.0))
        p_l = v0 + b0[..., None] * e1 + b1[..., None] * e2
        ng_l = cross(e1, e2)
        area2 = length(ng_l)
        ng_l = ng_l / jnp.maximum(area2, 1e-12)[..., None]
        d_al = p_l - p
        dist2_a = jnp.maximum(jnp.sum(d_al * d_al, -1), 1e-12)
        dist_a = jnp.sqrt(dist2_a)
        wi_area = d_al / dist_a[..., None]
        cos_l = jnp.abs(dot(ng_l, -wi_area))
        total_area = jnp.maximum(params[..., 0], 1e-12)
        pdf_area = dist2_a / jnp.maximum(cos_l * total_area, 1e-9)
        # one-sided emission (unless the shape is two-sided — pbrt area
        # lights emit from the side of the normal)
        emits = dot(ng_l, -wi_area) > 0.0
        L_area_tri = jnp.where(emits[..., None], spectra, 0.0)
    else:
        wi_area = jnp.zeros((H, 3), jnp.float32)
        pdf_area = jnp.zeros((H,), jnp.float32)
        dist_a = jnp.full((H,), BIG)
        L_area_tri = jnp.zeros((H, S), jnp.float32)

    # AREA sphere: cone sampling (reference sphere.cpp Sample(p, u1, u2))
    center = params[..., 2:5]
    radius = params[..., 5]
    dc = center - p
    dc2 = jnp.maximum(jnp.sum(dc * dc, -1), 1e-12)
    sin2_max = radius * radius / dc2
    outside = sin2_max < 1.0
    cos_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_max))
    wz = dc / jnp.sqrt(dc2)[..., None]
    wx, wy = coordinate_system(wz)
    dir_cone_local = uniform_sample_cone(u1, u2, cos_max)
    wi_sph = (
        dir_cone_local[..., 0:1] * wx + dir_cone_local[..., 1:2] * wy
        + dir_cone_local[..., 2:3] * wz
    )
    pdf_sph = uniform_cone_pdf(cos_max)
    # inside the sphere: uniform area sampling fallback
    sph_dir = uniform_sample_sphere(u1, u2)
    p_on = center + radius[..., None] * sph_dir
    d_in = p_on - p
    dist_in = jnp.maximum(length(d_in), 1e-9)
    wi_in = d_in / dist_in[..., None]
    cos_in = jnp.abs(dot(sph_dir, -wi_in))
    area_sph = 4.0 * jnp.pi * radius * radius
    pdf_in = dist_in * dist_in / jnp.maximum(cos_in * area_sph, 1e-9)
    wi_sphere = jnp.where(outside[..., None], wi_sph, wi_in)
    pdf_sphere = jnp.where(outside, pdf_sph, pdf_in)
    # distance to sphere surface along wi (for shadow ray)
    b_q = dot(wi_sphere, -dc)
    c_q = dc2 - radius * radius
    disc = b_q * b_q - c_q
    t_sph = -b_q - jnp.sqrt(jnp.maximum(disc, 0.0))
    t_sph = jnp.where(disc > 0, jnp.maximum(t_sph, 1e-4), jnp.sqrt(dc2))

    is_sphere = params[..., 1] > 0.5
    wi_a = jnp.where(is_sphere[..., None], wi_sphere, wi_area)
    pdf_a = jnp.where(is_sphere, pdf_sphere, pdf_area)
    dist_area = jnp.where(is_sphere, t_sph, dist_a)
    L_area = jnp.where(is_sphere[..., None], spectra, L_area_tri)

    # --- combine by kind
    is_pt = kind == L_POINT
    is_spot = kind == L_SPOT
    is_gonio = kind == L_GONIO
    is_proj = kind == L_PROJECTION
    is_distant = kind == L_DISTANT
    is_inf = kind == L_INFINITE
    is_area = kind == L_AREA

    # goniometric scale from image
    gonio_scale = jnp.ones((H,), jnp.float32)
    for env in envs:
        if int(np.asarray(lights.kind)[env.light_idx]) != L_GONIO:
            continue
        d_l = normalize(xform_vector(w2l, -wi_point))
        u = spherical_phi(d_l) * INV_TWOPI
        v = spherical_theta(d_l) * INV_PI
        g = spec.y(_env_lookup(env, u, v))
        gonio_scale = jnp.where(light_idx == env.light_idx, g, gonio_scale)
    proj_img_scale = jnp.ones((H, S), jnp.float32)
    for env in envs:
        if int(np.asarray(lights.kind)[env.light_idx]) != L_PROJECTION:
            continue
        x0, x1, y0, y1 = (params[..., 1], params[..., 2], params[..., 3], params[..., 4])
        u = (px - x0) / jnp.maximum(x1 - x0, 1e-9)
        v = (py - y0) / jnp.maximum(y1 - y0, 1e-9)
        val = _env_lookup(env, jnp.clip(u, 0, 1), jnp.clip(v, 0, 1))
        proj_img_scale = jnp.where((light_idx == env.light_idx)[..., None], val, proj_img_scale)

    L = (
        jnp.where(is_pt[..., None], L_pt, 0.0)
        + jnp.where(is_spot[..., None], L_pt * falloff[..., None], 0.0)
        + jnp.where(is_gonio[..., None], L_pt * gonio_scale[..., None], 0.0)
        + jnp.where(is_proj[..., None], L_pt * proj_scale[..., None] * proj_img_scale, 0.0)
        + jnp.where(is_distant[..., None], L_distant, 0.0)
        + jnp.where(is_inf[..., None], L_inf, 0.0)
        + jnp.where(is_area[..., None], L_area, 0.0)
    )
    wi = jnp.where(
        is_distant[..., None], wi_dist,
        jnp.where(is_inf[..., None], wi_inf,
                  jnp.where(is_area[..., None], wi_a, wi_point)),
    )
    pdf = jnp.where(is_inf, pdf_inf, jnp.where(is_area, pdf_a, 1.0))
    dist_out = jnp.where(
        is_distant | is_inf, jnp.full((H,), BIG), jnp.where(is_area, dist_area, dist)
    )
    is_delta = ~(is_inf | is_area)
    L = jnp.where((pdf > 1e-12)[..., None], L, 0.0)
    return LightSample(L=L, wi=wi, pdf=jnp.maximum(pdf, 1e-12), dist=dist_out,
                       is_delta=is_delta)


def light_pdf(lights: LightsT, envs: List[EnvMap], light_idx, p, wi):
    """Solid-angle pdf of sampling direction wi from light_idx at p
    (for MIS with BSDF sampling). Delta lights return 0."""
    H = p.shape[0]
    kind = _gather(lights.kind, light_idx)
    params = _gather(lights.params, light_idx)
    pdf = jnp.zeros((H,), jnp.float32)
    # infinite
    for env in envs:
        if int(np.asarray(lights.kind)[env.light_idx]) != L_INFINITE:
            continue
        w2l = lights.w2l[env.light_idx]
        d = normalize(xform_vector(w2l, wi))
        theta = spherical_theta(d)
        phi = spherical_phi(d)
        sin_t = jnp.maximum(jnp.sin(theta), 1e-9)
        p_uv = env.dist.pdf(phi * INV_TWOPI, theta * INV_PI)
        p_inf = p_uv / (2.0 * jnp.pi * jnp.pi * sin_t)
        pdf = jnp.where(light_idx == env.light_idx, p_inf, pdf)
    # area sphere: cone pdf
    center = params[..., 2:5]
    radius = params[..., 5]
    dc = center - p
    dc2 = jnp.maximum(jnp.sum(dc * dc, -1), 1e-12)
    sin2_max = radius * radius / dc2
    cos_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_max))
    p_cone = uniform_cone_pdf(cos_max)
    is_sphere_area = (kind == L_AREA) & (params[..., 1] > 0.5)
    pdf = jnp.where(is_sphere_area & (sin2_max < 1.0), p_cone, pdf)
    # area tri: the caller computes dist2/(cos * area) from the actual hit —
    # see integrators (this path needs the hit geometry, not just wi).
    return pdf


def area_tri_pdf(lights: LightsT, light_idx, dist2, cos_theta):
    """Solid-angle pdf for hitting a triangle area light with a BSDF ray."""
    params = _gather(lights.params, light_idx)
    total_area = jnp.maximum(params[..., 0], 1e-12)
    return dist2 / jnp.maximum(jnp.abs(cos_theta) * total_area, 1e-9)


def area_emission(lights: LightsT, light_idx, ng, wo):
    """L_e leaving an emissive surface toward wo (reference
    core/light.h:135 DiffuseAreaLight::L)."""
    spectra = _gather(lights.spectra, light_idx)
    emits = dot(ng, wo) > 0.0
    return jnp.where((emits & (light_idx >= 0))[..., None], spectra, 0.0)


class LightRaySample(NamedTuple):
    """Emitted-ray sample (the reference's second Sample_L overload,
    core/light.h:70: Sample_L(scene, ls, u1, u2, time, ray, Ns, pdf))."""

    o: jnp.ndarray       # [H, 3] origin
    d: jnp.ndarray       # [H, 3] unit direction
    alpha: jnp.ndarray   # [H, S] L / (pdf * pick_pmf-not-included)
    valid: jnp.ndarray   # [H]


def sample_light_ray(lights: LightsT, envs: List[EnvMap], light_idx,
                     world_c, world_rad,
                     u1, u2, u3, u4) -> LightRaySample:
    """Sample an emitted photon ray from light light_idx per lane.

    alpha already includes L/pdf for the light's own sampling; the
    caller divides by the pick pmf (reference photonshooter.cpp:262
    alpha = Le / (pdf * lightPdf))."""
    H = light_idx.shape[0]
    kind = _gather(lights.kind, light_idx)
    l2w = _gather(lights.l2w, light_idx)
    spectra = _gather(lights.spectra, light_idx)
    params = _gather(lights.params, light_idx)
    light_pos = l2w[..., :3, 3]

    # POINT / GONIO: uniform sphere, pdf = 1/4pi  (lights/point.cpp)
    d_sph = uniform_sample_sphere(u1, u2)
    a_point = spectra * (4.0 * jnp.pi)

    # SPOT: uniform cone around light +z, pdf = cone (lights/spot.cpp)
    cos_width = params[..., 0]
    d_cone_l = uniform_sample_cone(u1, u2, cos_width)
    zl = l2w[..., :3, 2]
    xl = l2w[..., :3, 0]
    yl = l2w[..., :3, 1]
    d_spot = (d_cone_l[..., 0:1] * xl + d_cone_l[..., 1:2] * yl
              + d_cone_l[..., 2:3] * zl)
    cos_t = d_cone_l[..., 2]
    fall = spot_falloff(cos_t, params[..., 0], params[..., 1])
    a_spot = spectra * fall[..., None] / uniform_cone_pdf(cos_width)[..., None]

    # DISTANT: disk of world radius, fixed direction (lights/distant.cpp)
    wi_dist = normalize(params[..., 0:3])   # direction TOWARD the light
    v1, v2 = coordinate_system(wi_dist)
    dx, dy = concentric_sample_disk(u1, u2)
    p_disk = (world_c + world_rad *
              (dx[..., None] * v1 + dy[..., None] * v2 + wi_dist))
    d_distant = -wi_dist
    a_distant = spectra * (jnp.pi * world_rad * world_rad)

    # AREA: triangle CDF point + cosine hemisphere (lights/diffuse.cpp)
    AT = lights.al_v0.shape[0]
    tri_start = params[..., 6].astype(jnp.int32)
    tri_count = params[..., 7].astype(jnp.int32)
    if AT > 0:
        idxs = jnp.arange(AT)
        in_seg = (idxs[None, :] >= tri_start[:, None]) & (
            idxs[None, :] < (tri_start + tri_count)[:, None])
        passed = in_seg & (lights.al_cdf[None, :] >= u3[:, None] * 0.9999999)
        first = jnp.argmax(passed, axis=-1)
        tri_j = jnp.where(jnp.any(passed, -1), first, tri_start)
        v0t = _gather(lights.al_v0, tri_j)
        e1t = _gather(lights.al_e1, tri_j)
        e2t = _gather(lights.al_e2, tri_j)
        b0, b1 = uniform_sample_triangle(u1, u2)
        p_tri = v0t + b0[..., None] * e1t + b1[..., None] * e2t
        n_tri = cross(e1t, e2t)
        n_tri = n_tri / jnp.maximum(length(n_tri), 1e-12)[..., None]
    else:
        p_tri = jnp.zeros((H, 3), jnp.float32)
        n_tri = jnp.concatenate(
            [jnp.zeros((H, 2), jnp.float32), jnp.ones((H, 1), jnp.float32)], -1)
    # sphere-shaped area lights: uniform point on sphere
    center = params[..., 2:5]
    radius = params[..., 5]
    sph_n = uniform_sample_sphere(u1, u2)
    p_sph = center + radius[..., None] * sph_n
    is_sphere = params[..., 1] > 0.5
    p_area = jnp.where(is_sphere[..., None], p_sph, p_tri)
    n_area = jnp.where(is_sphere[..., None], sph_n, n_tri)
    d_cos = cosine_sample_hemisphere(u3, u4)
    ax1, ax2 = coordinate_system(n_area)
    d_area = (d_cos[..., 0:1] * ax1 + d_cos[..., 1:2] * ax2
              + d_cos[..., 2:3] * n_area)
    area = jnp.maximum(params[..., 0], 1e-12)
    # pdf = (1/area) * (cos/pi); alpha = L / pdf = L * area * pi / cos,
    # cos cancels against the emitted-power cosine: net L * area * pi
    a_area = spectra * (jnp.pi * area)[..., None]

    # INFINITE: importance-sampled direction, disk origin at world edge
    d_inf = -d_sph  # fallback uniform
    a_inf = spectra * (4.0 * jnp.pi * jnp.pi * world_rad * world_rad)
    for env in envs:
        if int(np.asarray(lights.kind)[env.light_idx]) != L_INFINITE:
            continue
        (uu, vv), pdf_uv = env.dist.sample_continuous(u1, u2)
        theta = vv * jnp.pi
        phi = uu * 2.0 * jnp.pi
        sin_t = jnp.maximum(jnp.sin(theta), 1e-6)
        d_l = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi),
                         jnp.cos(theta)], -1)
        l2w_e = lights.l2w[env.light_idx]
        w_to = normalize(xform_vector(l2w_e, d_l))   # toward the light
        pdf_dir = pdf_uv / (2.0 * jnp.pi * jnp.pi * sin_t)
        Le = lights.spectra[env.light_idx] * _env_lookup(env, uu, vv)
        sel = (light_idx == env.light_idx)
        d_inf = jnp.where(sel[..., None], -w_to, d_inf)
        a_inf = jnp.where(
            sel[..., None],
            Le * (jnp.pi * world_rad * world_rad
                  / jnp.maximum(pdf_dir, 1e-12))[..., None],
            a_inf,
        )
    v1i, v2i = coordinate_system(-d_inf)
    dxi, dyi = concentric_sample_disk(u3, u4)
    p_inf = (world_c + world_rad *
             (dxi[..., None] * v1i + dyi[..., None] * v2i - d_inf))

    is_pt = (kind == L_POINT) | (kind == L_GONIO) | (kind == L_PROJECTION)
    is_spot = kind == L_SPOT
    is_distant = kind == L_DISTANT
    is_inf = kind == L_INFINITE
    is_area = kind == L_AREA

    o = jnp.where(
        is_distant[..., None], p_disk,
        jnp.where(is_inf[..., None], p_inf,
                  jnp.where(is_area[..., None], p_area, light_pos)))
    d = jnp.where(
        is_spot[..., None], d_spot,
        jnp.where(is_distant[..., None], d_distant,
                  jnp.where(is_inf[..., None], d_inf,
                            jnp.where(is_area[..., None], d_area, d_sph))))
    alpha = (
        jnp.where(is_pt[..., None], a_point, 0.0)
        + jnp.where(is_spot[..., None], a_spot, 0.0)
        + jnp.where(is_distant[..., None], a_distant, 0.0)
        + jnp.where(is_inf[..., None], a_inf, 0.0)
        + jnp.where(is_area[..., None], a_area, 0.0)
    )
    return LightRaySample(o=o, d=normalize(d), alpha=alpha,
                          valid=jnp.ones((H,), bool))
