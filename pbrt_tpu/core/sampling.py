"""Monte Carlo sampling substrate, vectorized over wavefront batches.

Replaces reference core/montecarlo.{h,cpp}: Distribution1D/2D,
hemisphere/sphere/cone/disk/triangle sampling, stratified & Latin
hypercube patterns, Halton / (0,2)-sequence low-discrepancy points,
Henyey-Greenstein phase sampling, and the balance/power MIS heuristics.
All functions are pure jnp and broadcast over leading axes; RNG is JAX
threefry keys (counter-based) instead of the reference's per-task
Mersenne Twister (reference core/rng.h) — reproducible and splittable
across devices by construction.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pbrt_tpu.core.geometry import spherical_direction

INV_PI = 1.0 / jnp.pi
INV_TWOPI = 1.0 / (2.0 * jnp.pi)
INV_FOURPI = 1.0 / (4.0 * jnp.pi)


# ---------------------------------------------------------------------------
# Distribution1D / Distribution2D (reference montecarlo.h:54,142)

class Distribution1D(NamedTuple):
    """Piecewise-constant 1D distribution over [0,1].

    func: [..., n] nonneg, cdf: [..., n+1], func_int: [...].
    """

    func: jnp.ndarray
    cdf: jnp.ndarray
    func_int: jnp.ndarray

    @staticmethod
    def make(func):
        func = jnp.asarray(func, jnp.float32)
        n = func.shape[-1]
        integ = jnp.cumsum(func, axis=-1) / n
        func_int = integ[..., -1]
        zero = jnp.zeros(func.shape[:-1] + (1,), func.dtype)
        # uniform fallback if the function integrates to zero
        safe = func_int[..., None] > 0
        cdf = jnp.where(
            safe,
            jnp.concatenate([zero, integ], axis=-1) / jnp.maximum(func_int[..., None], 1e-30),
            jnp.linspace(0.0, 1.0, n + 1),
        )
        return Distribution1D(func, cdf, func_int)

    @property
    def count(self):
        return self.func.shape[-1]

    def sample_continuous(self, u):
        """u: [...] -> (x in [0,1), pdf, offset int)."""
        n = self.count
        # find interval: cdf[off] <= u < cdf[off+1]
        off = jnp.clip(
            jnp.searchsorted(self.cdf, u[..., None], side="right")[..., 0] - 1
            if self.cdf.ndim == 1
            else jnp.sum((u[..., None] >= self.cdf[..., 1:]).astype(jnp.int32), axis=-1),
            0,
            n - 1,
        )
        c0 = jnp.take_along_axis(
            jnp.broadcast_to(self.cdf, u.shape + (n + 1,)), off[..., None], axis=-1
        )[..., 0]
        c1 = jnp.take_along_axis(
            jnp.broadcast_to(self.cdf, u.shape + (n + 1,)), off[..., None] + 1, axis=-1
        )[..., 0]
        f = jnp.take_along_axis(
            jnp.broadcast_to(self.func, u.shape + (n,)), off[..., None], axis=-1
        )[..., 0]
        du = jnp.where(c1 > c0, (u - c0) / jnp.maximum(c1 - c0, 1e-30), 0.0)
        x = (off + du) / n
        pdf = f / jnp.maximum(self.func_int, 1e-30)
        return x, pdf, off

    def sample_discrete(self, u):
        """u: [...] -> (offset, pmf)."""
        n = self.count
        off = jnp.clip(
            jnp.sum((u[..., None] >= self.cdf[..., 1:]).astype(jnp.int32), axis=-1), 0, n - 1
        )
        f = jnp.take_along_axis(
            jnp.broadcast_to(self.func, u.shape + (n,)), off[..., None], axis=-1
        )[..., 0]
        pmf = f / jnp.maximum(self.func_int * n, 1e-30)
        return off, pmf

    def pdf_discrete(self, off):
        f = jnp.take(self.func, off) if self.func.ndim == 1 else jnp.take_along_axis(
            self.func, off[..., None], axis=-1
        )[..., 0]
        return f / jnp.maximum(self.func_int * self.count, 1e-30)


class Distribution2D(NamedTuple):
    """2D piecewise-constant distribution (for env-map importance sampling).

    cond: Distribution1D over u (per v row, func [nv, nu]),
    marg: Distribution1D over v (func [nv]).
    """

    cond: Distribution1D
    marg: Distribution1D

    @staticmethod
    def make(func):
        func = jnp.asarray(func, jnp.float32)  # [nv, nu]
        cond = Distribution1D.make(func)
        marg = Distribution1D.make(cond.func_int)
        return Distribution2D(cond, marg)

    def sample_continuous(self, u0, u1):
        """-> ((u, v), pdf)."""
        v, pdf_v, iv = self.marg.sample_continuous(u1)
        nv, nu = self.cond.func.shape
        row_cdf = jnp.take(self.cond.cdf, iv, axis=0)  # [..., nu+1]
        row_f = jnp.take(self.cond.func, iv, axis=0)  # [..., nu]
        row_int = jnp.take(self.cond.func_int, iv, axis=0)
        off = jnp.clip(
            jnp.sum((u0[..., None] >= row_cdf[..., 1:]).astype(jnp.int32), axis=-1), 0, nu - 1
        )
        c0 = jnp.take_along_axis(row_cdf, off[..., None], axis=-1)[..., 0]
        c1 = jnp.take_along_axis(row_cdf, off[..., None] + 1, axis=-1)[..., 0]
        f = jnp.take_along_axis(row_f, off[..., None], axis=-1)[..., 0]
        du = jnp.where(c1 > c0, (u0 - c0) / jnp.maximum(c1 - c0, 1e-30), 0.0)
        u = (off + du) / nu
        pdf_u = f / jnp.maximum(row_int, 1e-30)
        return (u, v), pdf_u * pdf_v

    def pdf(self, u, v):
        nv, nu = self.cond.func.shape
        iu = jnp.clip((u * nu).astype(jnp.int32), 0, nu - 1)
        iv = jnp.clip((v * nv).astype(jnp.int32), 0, nv - 1)
        f = self.cond.func[iv, iu]
        return f / jnp.maximum(self.marg.func_int, 1e-30)


# ---------------------------------------------------------------------------
# Shape sampling (reference montecarlo.h:117-141 and .cpp)

def uniform_sample_hemisphere(u1, u2):
    z = u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sample_sphere(u1, u2):
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sample_cone(u1, u2, cos_theta_max):
    cos_t = (1.0 - u1) + u1 * cos_theta_max
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * u2
    return spherical_direction(sin_t, cos_t, phi)


def uniform_cone_pdf(cos_theta_max):
    return 1.0 / (2.0 * jnp.pi * jnp.maximum(1.0 - cos_theta_max, 1e-8))


def concentric_sample_disk(u1, u2):
    """Shirley-Chiu concentric map, branch-free."""
    sx = 2.0 * u1 - 1.0
    sy = 2.0 * u2 - 1.0
    r = jnp.where(jnp.abs(sx) > jnp.abs(sy), jnp.abs(sx), jnp.abs(sy))
    # theta via the 8-octant formula
    use_x = jnp.abs(sx) > jnp.abs(sy)
    safe_sx = jnp.where(jnp.abs(sx) < 1e-12, 1e-12, sx)
    safe_sy = jnp.where(jnp.abs(sy) < 1e-12, 1e-12, sy)
    theta = jnp.where(
        use_x,
        (jnp.pi / 4.0) * (sy / safe_sx),
        (jnp.pi / 2.0) - (jnp.pi / 4.0) * (sx / safe_sy),
    )
    theta = jnp.where(use_x & (sx < 0), theta + jnp.pi, theta)
    theta = jnp.where(~use_x & (sy < 0), theta + jnp.pi, theta)
    zero = (sx == 0.0) & (sy == 0.0)
    r = jnp.where(zero, 0.0, r)
    return r * jnp.cos(theta), r * jnp.sin(theta)


def cosine_sample_hemisphere(u1, u2):
    x, y_ = concentric_sample_disk(u1, u2)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y_ * y_))
    return jnp.stack([x, y_, z], axis=-1)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta * INV_PI


def uniform_sample_triangle(u1, u2):
    su1 = jnp.sqrt(u1)
    return 1.0 - su1, u2 * su1  # barycentric (b0, b1)


# ---------------------------------------------------------------------------
# Phase functions (reference core/volume.h:47-52) — args are unit w, wi

def phase_isotropic():
    return INV_FOURPI


def phase_rayleigh(cos_t):
    return 3.0 / (16.0 * jnp.pi) * (1.0 + cos_t * cos_t)


def phase_mie_hazy(cos_t):
    return (0.5 + 4.5 * ((1.0 + cos_t) / 2.0) ** 8) * INV_FOURPI


def phase_mie_murky(cos_t):
    return (0.5 + 16.5 * ((1.0 + cos_t) / 2.0) ** 32) * INV_FOURPI


def phase_hg(cos_t, g):
    g2 = g * g
    denom = 1.0 + g2 + 2.0 * g * cos_t
    return INV_FOURPI * (1.0 - g2) / jnp.maximum(denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12)


def phase_schlick(cos_t, g):
    k = 1.55 * g - 0.55 * g * g * g
    kc = 1.0 + k * cos_t
    return INV_FOURPI * (1.0 - k * k) / jnp.maximum(kc * kc, 1e-12)


def sample_hg(w, u1, u2, g):
    """Sample wi from the HG phase around unit w; pdf equals phase_hg(w.wi, g).

    pbrt convention: the phase function argument is the angle between the
    two directions as passed (reference core/montecarlo.h SampleHG).
    """
    g = jnp.broadcast_to(jnp.asarray(g, jnp.float32), u1.shape)
    iso = jnp.abs(g) < 1e-3
    safe_g = jnp.where(iso, 1.0, g)
    sqr = (1.0 - g * g) / jnp.maximum(1.0 - g + 2.0 * g * u1, 1e-8)
    cost = jnp.where(
        iso, 1.0 - 2.0 * u1, (1.0 + g * g - sqr * sqr) / (2.0 * safe_g)
    )
    cost = jnp.clip(cost, -1.0, 1.0)
    sint = jnp.sqrt(jnp.maximum(0.0, 1.0 - cost * cost))
    phi = 2.0 * jnp.pi * u2
    from pbrt_tpu.core.geometry import coordinate_system

    v1, v2 = coordinate_system(w)
    return (
        (sint * jnp.cos(phi))[..., None] * v1
        + (sint * jnp.sin(phi))[..., None] * v2
        + cost[..., None] * w
    )


# ---------------------------------------------------------------------------
# MIS heuristics (reference montecarlo.h:253-265)

def balance_heuristic(nf, f_pdf, ng, g_pdf):
    return (nf * f_pdf) / jnp.maximum(nf * f_pdf + ng * g_pdf, 1e-30)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    f = nf * f_pdf
    g = ng * g_pdf
    return (f * f) / jnp.maximum(f * f + g * g, 1e-30)


# ---------------------------------------------------------------------------
# Low-discrepancy points (reference montecarlo.h:221-319)

def radical_inverse(n, base):
    """Scalar/batched radical inverse in arbitrary integer base (Halton)."""
    n = jnp.asarray(n, jnp.int32)

    def body(_, carry):
        n_, val, inv_bi = carry
        d = n_ % base
        val = val + d.astype(jnp.float32) * inv_bi
        return n_ // base, val, inv_bi / base

    # 32 digits covers any 32-bit index for base >= 2
    n_, val, _ = jax.lax.fori_loop(
        0, 32, body, (n, jnp.zeros(n.shape, jnp.float32), jnp.float32(1.0 / base))
    )
    return val


def reverse_bits32(n):
    n = jnp.asarray(n, jnp.uint32)
    n = (n << 16) | (n >> 16)
    n = ((n & jnp.uint32(0x00FF00FF)) << 8) | ((n & jnp.uint32(0xFF00FF00)) >> 8)
    n = ((n & jnp.uint32(0x0F0F0F0F)) << 4) | ((n & jnp.uint32(0xF0F0F0F0)) >> 4)
    n = ((n & jnp.uint32(0x33333333)) << 2) | ((n & jnp.uint32(0xCCCCCCCC)) >> 2)
    n = ((n & jnp.uint32(0x55555555)) << 1) | ((n & jnp.uint32(0xAAAAAAAA)) >> 1)
    return n


def van_der_corput(n, scramble):
    """Base-2 radical inverse with bit-xor scramble (montecarlo.h:246)."""
    bits = reverse_bits32(n) ^ jnp.asarray(scramble, jnp.uint32)
    return (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))


def sobol2(n, scramble):
    """Second dimension of the (0,2)-sequence (montecarlo.h Sobol2)."""
    n = jnp.asarray(n, jnp.uint32)
    scramble = jnp.asarray(scramble, jnp.uint32)

    def body(i, carry):
        n_, v, result = carry
        result = jnp.where((n_ & 1) > 0, result ^ v, result)
        return n_ >> 1, v ^ (v >> 1), result

    _, _, r = jax.lax.fori_loop(
        0,
        32,
        body,
        (n, jnp.broadcast_to(jnp.uint32(1 << 31), n.shape), jnp.broadcast_to(scramble, n.shape)),
    )
    return (r >> 8).astype(jnp.float32) * (1.0 / (1 << 24))


def sample02(n, scramble_xy):
    """(0,2)-sequence sample n with 2D scramble -> (x, y)."""
    return van_der_corput(n, scramble_xy[..., 0]), sobol2(n, scramble_xy[..., 1])


_PRIMES = jnp.asarray(
    [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67, 71,
     73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131], jnp.int32
)


def halton_nd(n, dim: int):
    """First `dim` Halton dimensions of index batch n -> [..., dim]."""
    outs = [radical_inverse(n, int(_PRIMES[d])) for d in range(dim)]
    return jnp.stack(outs, axis=-1)


# ---------------------------------------------------------------------------
# Pixel sample patterns

def stratified_2d(key, nx: int, ny: int, jitter: bool = True):
    """[nx*ny, 2] stratified samples."""
    ij = jnp.stack(
        jnp.meshgrid(jnp.arange(nx), jnp.arange(ny), indexing="ij"), axis=-1
    ).reshape(-1, 2)
    if jitter:
        u = jax.random.uniform(key, (nx * ny, 2))
    else:
        u = jnp.full((nx * ny, 2), 0.5)
    return (ij + u) / jnp.asarray([nx, ny], jnp.float32)


def stratified_1d(key, n: int, jitter: bool = True):
    i = jnp.arange(n, dtype=jnp.float32)
    u = jax.random.uniform(key, (n,)) if jitter else jnp.full((n,), 0.5)
    return (i + u) / n


def latin_hypercube(key, n: int, dim: int):
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (n, dim))
    samples = (jnp.arange(n)[:, None] + u) / n
    # independent permutation per dimension
    perms = jnp.stack(
        [jax.random.permutation(jax.random.fold_in(k2, d), n) for d in range(dim)], axis=1
    )
    return jnp.take_along_axis(samples, perms, axis=0)
