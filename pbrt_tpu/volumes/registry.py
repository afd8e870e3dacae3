"""Volume regions as a closed-set device table.

Replaces the reference's VolumeRegion hierarchy (reference core/volume.h
:53-115, volumes/{homogeneous,volumegrid,exponential,rainbow}.cpp) with
one table evaluated masked over ray-march sample batches. Multiple
Volume statements aggregate by summation where regions overlap
(reference core/volume.h:105 AggregateVolume).

Kinds and params layout (params [V, 8]):
  HOMOGENEOUS: (reference volumes/homogeneous.h)         -
  GRID:        density side-structure index in [0]       (volumegrid.cpp:63)
  EXPONENTIAL: [0]=a [1]=b [2:5]=updir                   (exponential.cpp:42)
  RAINBOW:     homogeneous + angle->wavelength transfer  (rainbow.cpp:41-78)

Phase function ids follow reference core/volume.h:47-52.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.core.error import warning
from pbrt_tpu.core.geometry import dot, normalize
from pbrt_tpu.core.sampling import (
    phase_hg,
    phase_mie_hazy,
)
from pbrt_tpu.core.transform import Transform, xform_point_affine, xform_vector
from pbrt_tpu.scene.records import VolumeRecord

V_HOMOGENEOUS, V_GRID, V_EXPONENTIAL, V_RAINBOW = range(4)

S = spec.N_BINS


class VolumeT(NamedTuple):
    """Device volume-region table. D = max grid voxel count (padded)."""

    kind: jnp.ndarray      # [V] int32
    w2v: jnp.ndarray       # [V, 4, 4] world-to-volume
    lo: jnp.ndarray        # [V, 3] volume-space bbox
    hi: jnp.ndarray        # [V, 3]
    sigma_a: jnp.ndarray   # [V, S]
    sigma_s: jnp.ndarray   # [V, S]
    le: jnp.ndarray        # [V, S]
    g: jnp.ndarray         # [V] HG asymmetry
    params: jnp.ndarray    # [V, 8]
    grid: jnp.ndarray      # [V, D] flattened densities (zeros if not grid)
    grid_dims: jnp.ndarray  # [V, 3] int32 (nx, ny, nz)

    @property
    def n_volumes(self):
        return self.kind.shape[0]


def build_volumes(records: List[VolumeRecord]) -> Optional[VolumeT]:
    """Lower Volume records to the device table (host side)."""
    if not records:
        return None
    kinds, w2v, lo, hi, sa, ss, le, g, params, grids, dims = (
        [], [], [], [], [], [], [], [], [], [], []
    )
    for rec in records:
        p = rec.params
        name = rec.kind
        if name == "homogeneous" or name == "rainbow":
            kind = V_RAINBOW if name == "rainbow" else V_HOMOGENEOUS
            pr = np.zeros(8, np.float32)
            grid = np.zeros(0, np.float32)
            gd = (0, 0, 0)
        elif name == "volumegrid":
            kind = V_GRID
            nx = p.find_one_int("nx", 1)
            ny = p.find_one_int("ny", 1)
            nz = p.find_one_int("nz", 1)
            data = p.find_float("density")
            if data is None:
                warning("No \"density\" values provided for volume grid?")
                continue
            if len(data) != nx * ny * nz:
                warning(
                    f"VolumeGridDensity has {len(data)} density values but nx*ny*nz = {nx*ny*nz}"
                )
                continue
            grid = np.asarray(data, np.float32)
            gd = (nx, ny, nz)
            pr = np.zeros(8, np.float32)
        elif name == "exponential":
            kind = V_EXPONENTIAL
            pr = np.zeros(8, np.float32)
            pr[0] = p.find_one_float("a", 1.0)
            pr[1] = p.find_one_float("b", 1.0)
            up = np.asarray(p.find_one_vector("updir", [0.0, 1.0, 0.0]), np.float32)
            nrm = np.linalg.norm(up)
            pr[2:5] = up / max(nrm, 1e-12)
            grid = np.zeros(0, np.float32)
            gd = (0, 0, 0)
        else:
            warning(f'Volume "{name}" unknown.')
            continue
        p0 = np.asarray(p.find_one_point("p0", [0.0, 0.0, 0.0]), np.float32)
        p1 = np.asarray(p.find_one_point("p1", [1.0, 1.0, 1.0]), np.float32)
        sig_a = p.find_one_spectrum("sigma_a", spec.from_rgb(np.ones(3, np.float32)))
        sig_s = p.find_one_spectrum("sigma_s", spec.from_rgb(np.ones(3, np.float32)))
        lev = p.find_one_spectrum("Le", spec.from_rgb(np.zeros(3, np.float32)))
        gv = p.find_one_float("g", 0.0)
        p.report_unused(f'in volume "{name}"')
        kinds.append(kind)
        w2v.append(rec.v2w.inverse().m.astype(np.float32))
        lo.append(np.minimum(p0, p1))
        hi.append(np.maximum(p0, p1))
        sa.append(np.asarray(sig_a, np.float32))
        ss.append(np.asarray(sig_s, np.float32))
        le.append(np.asarray(lev, np.float32))
        g.append(gv)
        params.append(pr)
        grids.append(grid)
        dims.append(gd)
    if not kinds:
        return None
    dmax = max(1, max(gr.size for gr in grids))
    grid_arr = np.zeros((len(kinds), dmax), np.float32)
    for i, gr in enumerate(grids):
        grid_arr[i, : gr.size] = gr
    return VolumeT(
        kind=jnp.asarray(kinds, jnp.int32),
        w2v=jnp.asarray(np.stack(w2v)),
        lo=jnp.asarray(np.stack(lo)),
        hi=jnp.asarray(np.stack(hi)),
        sigma_a=jnp.asarray(np.stack(sa)),
        sigma_s=jnp.asarray(np.stack(ss)),
        le=jnp.asarray(np.stack(le)),
        g=jnp.asarray(g, jnp.float32),
        params=jnp.asarray(np.stack(params)),
        grid=jnp.asarray(grid_arr),
        grid_dims=jnp.asarray(dims, jnp.int32).reshape(len(kinds), 3),
    )


# ---------------------------------------------------------------------------
# Device-side evaluation (all [P]-batched over sample points)

def _density(vol: VolumeT, vi: int, pv):
    """Density multiplier of region vi at volume-space points pv [P, 3].

    kind/grid_dims are indexed on the HOST (np.asarray of the concrete
    table) so the per-region branch stays static under jit.
    """
    kind = int(np.asarray(vol.kind)[vi])
    lo, hi = vol.lo[vi], vol.hi[vi]
    inside = jnp.all((pv >= lo) & (pv <= hi), axis=-1)
    if kind == V_GRID:
        dims = np.asarray(vol.grid_dims)
        nx, ny, nz = int(dims[vi, 0]), int(dims[vi, 1]), int(dims[vi, 2])
        ext = jnp.maximum(hi - lo, 1e-12)
        # grid coords with trilinear interp (reference volumegrid.cpp Density)
        gp = (pv - lo) / ext * jnp.asarray([nx, ny, nz], jnp.float32) - 0.5
        gx = jnp.clip(gp[..., 0], 0.0, nx - 1.0)
        gy = jnp.clip(gp[..., 1], 0.0, ny - 1.0)
        gz = jnp.clip(gp[..., 2], 0.0, nz - 1.0)
        x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, max(nx - 2, 0))
        y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, max(ny - 2, 0))
        z0 = jnp.clip(jnp.floor(gz).astype(jnp.int32), 0, max(nz - 2, 0))
        tx, ty, tz = gx - x0, gy - y0, gz - z0
        flat = vol.grid[vi]

        def d(ix, iy, iz):
            idx = (iz * ny + iy) * nx + ix
            return jnp.take(flat, jnp.clip(idx, 0, nx * ny * nz - 1))

        x1 = jnp.minimum(x0 + 1, nx - 1)
        y1 = jnp.minimum(y0 + 1, ny - 1)
        z1 = jnp.minimum(z0 + 1, nz - 1)
        d00 = d(x0, y0, z0) * (1 - tx) + d(x1, y0, z0) * tx
        d10 = d(x0, y1, z0) * (1 - tx) + d(x1, y1, z0) * tx
        d01 = d(x0, y0, z1) * (1 - tx) + d(x1, y0, z1) * tx
        d11 = d(x0, y1, z1) * (1 - tx) + d(x1, y1, z1) * tx
        d0 = d00 * (1 - ty) + d10 * ty
        d1 = d01 * (1 - ty) + d11 * ty
        dens = d0 * (1 - tz) + d1 * tz
    elif kind == V_EXPONENTIAL:
        a, b = vol.params[vi, 0], vol.params[vi, 1]
        up = vol.params[vi, 2:5]
        h = dot(pv - lo, up)
        dens = a * jnp.exp(-b * h)
    else:
        dens = jnp.ones(pv.shape[:-1], jnp.float32)
    return jnp.where(inside, dens, 0.0)


def sigma_at(vol: VolumeT, p_world):
    """(sigma_a, sigma_s, Le, g_eff) summed over regions at world points
    p_world [P, 3]. g_eff is density-weighted (single-region scenes exact)."""
    P = p_world.shape[0]
    sa = jnp.zeros((P, S), jnp.float32)
    ss = jnp.zeros((P, S), jnp.float32)
    le = jnp.zeros((P, S), jnp.float32)
    g_num = jnp.zeros((P,), jnp.float32)
    g_den = jnp.zeros((P,), jnp.float32)
    for vi in range(vol.n_volumes):
        pv = xform_point_affine(vol.w2v[vi], p_world)
        dens = _density(vol, vi, pv)
        sa = sa + dens[..., None] * vol.sigma_a[vi]
        ss = ss + dens[..., None] * vol.sigma_s[vi]
        le = le + dens[..., None] * vol.le[vi]
        g_num = g_num + dens * vol.g[vi]
        g_den = g_den + dens
    g_eff = g_num / jnp.maximum(g_den, 1e-12)
    return sa, ss, le, g_eff


def intersect_p(vol: VolumeT, ray_o, ray_d, tmin, tmax):
    """Union of region bbox spans along the ray: (hit, t0, t1). [R]-batched."""
    R = ray_o.shape[0]
    t0 = jnp.full((R,), jnp.inf, jnp.float32)
    t1 = jnp.full((R,), -jnp.inf, jnp.float32)
    any_hit = jnp.zeros((R,), bool)
    for vi in range(vol.n_volumes):
        o = xform_point_affine(vol.w2v[vi], ray_o)
        d = xform_vector(vol.w2v[vi], ray_d)
        inv_d = 1.0 / d
        tl = (vol.lo[vi] - o) * inv_d
        th = (vol.hi[vi] - o) * inv_d
        tn = jnp.maximum(jnp.max(jnp.minimum(tl, th), axis=-1), tmin)
        tf = jnp.minimum(jnp.min(jnp.maximum(tl, th), axis=-1), tmax)
        hit = tn <= tf
        t0 = jnp.where(hit, jnp.minimum(t0, tn), t0)
        t1 = jnp.where(hit, jnp.maximum(t1, tf), t1)
        any_hit = any_hit | hit
    return any_hit, jnp.where(any_hit, t0, 0.0), jnp.where(any_hit, t1, 0.0)


def tau(vol: VolumeT, ray_o, ray_d, t0, t1, n_steps: int, u_offset):
    """Optical thickness integral along [t0, t1]. Returns [R, S].

    All-homogeneous scenes (incl. rainbow) get the CLOSED FORM the
    reference's HomogeneousVolumeDensity::tau uses (volumes/
    homogeneous.h: sigma_t * clipped segment length) — exact, and it
    removes the n_steps sub-march that otherwise runs INSIDE every
    outer march step (the reference only ray-marches tau for
    DensityRegion subclasses, core/volume.cpp).

    u_offset [R] jitters the first sample of the marched fallback
    (matches the reference's sample-driven offset). Step count is
    static for jit.
    """
    kinds = np.asarray(vol.kind)
    if all(int(k) in (V_HOMOGENEOUS, V_RAINBOW) for k in kinds):
        acc = jnp.zeros(ray_o.shape[:-1] + (S,), jnp.float32)
        for vi in range(vol.n_volumes):
            o = xform_point_affine(vol.w2v[vi], ray_o)
            d = xform_vector(vol.w2v[vi], ray_d)
            inv_d = 1.0 / d
            tl = (vol.lo[vi] - o) * inv_d
            th = (vol.hi[vi] - o) * inv_d
            tn = jnp.maximum(jnp.max(jnp.minimum(tl, th), axis=-1), t0)
            tf = jnp.minimum(jnp.min(jnp.maximum(tl, th), axis=-1), t1)
            seg = jnp.maximum(tf - tn, 0.0)
            acc = acc + seg[..., None] * (vol.sigma_a[vi] + vol.sigma_s[vi])
        return acc

    length = jnp.maximum(t1 - t0, 0.0)
    dt = length / n_steps

    def body(i, acc):
        t = t0 + (i + u_offset) * dt
        p = ray_o + t[..., None] * ray_d
        sa, ss, _, _ = sigma_at(vol, p)
        return acc + (sa + ss)

    acc = jax.lax.fori_loop(
        0, n_steps, body, jnp.zeros(ray_o.shape[:-1] + (S,), jnp.float32))
    return acc * dt[..., None]


def phase(vol_g, w, wi):
    """HG phase between unit directions (g=0 -> isotropic)."""
    return phase_hg(dot(w, wi), vol_g)


# ---------------------------------------------------------------------------
# RainbowVolume transfer function (reference volumes/rainbow.cpp:41-78)

def rainbow_reflection(spectrum_in, w, wi):
    """Angle->wavelength rainbow transfer.

    spectrum_in [P, S]: incident light spectrum; w: outgoing (eye) dir,
    wi: incident (light) dir; both unit, pbrt convention
    rainbowReflection(L, ray.d, wo) with theta = angle(wi, -w).
    Returns the scattered spectrum. Constants from the reference:
    primary bow 40.4-42.3deg -> 400-700nm at 0.92; secondary 51-54.4deg
    reversed at 42% of that; mist floor 8%; inner-glow ramp 40.4->40.45.
    """
    cos_t = jnp.clip(dot(wi, -w), -1.0, 1.0)
    theta = jnp.rad2deg(jnp.arccos(cos_t))
    base_i = phase_mie_hazy(cos_t)

    # inner glow: 1.0 below 40.4, ramp 1.0->0.9 across [40.4, 40.45]
    ramp = 1.0 - 0.1 * jnp.clip((theta - 40.4) / 0.05, 0.0, 1.0)
    intensity = base_i * ramp

    in_primary = (theta >= 40.4) & (theta <= 42.3)
    in_secondary = (theta >= 51.0) & (theta <= 54.4)
    lam_p = 400.0 + (theta - 40.4) / (42.3 - 40.4) * 300.0
    lam_s = 700.0 - (theta - 51.0) / (54.4 - 51.0) * 300.0
    lam = jnp.where(in_primary, lam_p, lam_s)
    rainbow_i = jnp.where(
        in_primary, 0.92, jnp.where(in_secondary, 0.42 * 0.92, 0.0)
    )
    filtered = spec.band_filter(spectrum_in, lam)
    out = intensity[..., None] * (
        0.08 * spectrum_in + rainbow_i[..., None] * filtered
    )
    return out


def has_rainbow(records: List[VolumeRecord]) -> bool:
    return any(r.kind == "rainbow" for r in records)
