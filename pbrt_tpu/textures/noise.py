"""Perlin gradient noise + FBm/turbulence, vectorized (jnp).

From-scratch replacement for reference core/texture.cpp Noise/FBm/
Turbulence: classic Perlin noise over a hashed integer lattice with a
fixed permutation table (generated from a seeded shuffle rather than
copying pbrt's table — the textures are procedural patterns, so only the
statistics matter, not the exact lattice hash).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_NOISE_PERM_SIZE = 256
_rng = np.random.RandomState(1071)
_perm = _rng.permutation(_NOISE_PERM_SIZE)
NOISE_PERM = jnp.asarray(np.concatenate([_perm, _perm]).astype(np.int32))


def _grad(x, y, z, dx, dy, dz):
    h = x & 15
    u = jnp.where(h < 8, dx, dy)
    v = jnp.where(h < 4, dy, jnp.where((h == 12) | (h == 14), dx, dz))
    u = jnp.where((h & 1) > 0, -u, u)
    v = jnp.where((h & 2) > 0, -v, v)
    return u + v


def _noise_weight(t):
    t3 = t * t * t
    t4 = t3 * t
    return 6.0 * t4 * t - 15.0 * t4 + 10.0 * t3


def noise(p):
    """Perlin noise at points p [..., 3] -> [...] in roughly [-1, 1]."""
    pi = jnp.floor(p).astype(jnp.int32)
    d = p - pi
    ix, iy, iz = pi[..., 0] & 255, pi[..., 1] & 255, pi[..., 2] & 255
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]

    def hsh(x, y, z):
        return NOISE_PERM[NOISE_PERM[NOISE_PERM[x] + y] + z]

    w000 = _grad(hsh(ix, iy, iz), 0, 0, dx, dy, dz)
    w100 = _grad(hsh(ix + 1, iy, iz), 0, 0, dx - 1, dy, dz)
    w010 = _grad(hsh(ix, iy + 1, iz), 0, 0, dx, dy - 1, dz)
    w110 = _grad(hsh(ix + 1, iy + 1, iz), 0, 0, dx - 1, dy - 1, dz)
    w001 = _grad(hsh(ix, iy, iz + 1), 0, 0, dx, dy, dz - 1)
    w101 = _grad(hsh(ix + 1, iy, iz + 1), 0, 0, dx - 1, dy, dz - 1)
    w011 = _grad(hsh(ix, iy + 1, iz + 1), 0, 0, dx, dy - 1, dz - 1)
    w111 = _grad(hsh(ix + 1, iy + 1, iz + 1), 0, 0, dx - 1, dy - 1, dz - 1)

    wx, wy, wz = _noise_weight(dx), _noise_weight(dy), _noise_weight(dz)
    x00 = (1 - wx) * w000 + wx * w100
    x10 = (1 - wx) * w010 + wx * w110
    x01 = (1 - wx) * w001 + wx * w101
    x11 = (1 - wx) * w011 + wx * w111
    y0 = (1 - wy) * x00 + wy * x10
    y1 = (1 - wy) * x01 + wy * x11
    return (1 - wz) * y0 + wz * y1


def fbm(p, dpdx_len, dpdy_len, omega: float, max_octaves: int):
    """Fractional Brownian motion with antialiased octave clamping."""
    s2 = jnp.maximum(dpdx_len, dpdy_len) ** 2
    foctaves = jnp.clip(-1.0 - 0.5 * jnp.log2(jnp.maximum(s2, 1e-30)), 0.0, max_octaves)
    octaves = jnp.floor(foctaves).astype(jnp.int32)
    total = jnp.zeros(p.shape[:-1], p.dtype)
    lam, o = 1.0, 1.0
    for i in range(max_octaves):
        active = i < octaves
        total = total + jnp.where(active, o * noise(lam * p), 0.0)
        # partial octave
        partial = i == octaves
        t = foctaves - octaves
        smooth = t * t * (3.0 - 2.0 * t)
        total = total + jnp.where(partial, o * smooth * noise(lam * p), 0.0)
        lam *= 1.99
        o *= omega
    return total


def turbulence(p, dpdx_len, dpdy_len, omega: float, max_octaves: int):
    s2 = jnp.maximum(dpdx_len, dpdy_len) ** 2
    foctaves = jnp.clip(-1.0 - 0.5 * jnp.log2(jnp.maximum(s2, 1e-30)), 0.0, max_octaves)
    octaves = jnp.floor(foctaves).astype(jnp.int32)
    total = jnp.zeros(p.shape[:-1], p.dtype)
    lam, o = 1.0, 1.0
    for i in range(max_octaves):
        active = i < octaves
        total = total + jnp.where(active, o * jnp.abs(noise(lam * p)), 0.0)
        partial = i == octaves
        t = foctaves - octaves
        smooth = t * t * (3.0 - 2.0 * t)
        total = total + jnp.where(partial, o * smooth * jnp.abs(noise(lam * p)), 0.0)
        lam *= 1.99
        o *= omega
    return total
