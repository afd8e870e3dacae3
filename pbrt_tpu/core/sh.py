"""Real spherical harmonics: evaluation, projection, convolution.

Replaces reference core/sh.{h,cpp} (~700 LoC): SHTerms/SHIndex,
SHEvaluate (real SH basis via the standard recurrences), matrix-free
cosine-lobe convolution (lambda_l), and Monte Carlo projection of
environment maps / incident radiance. The z-axis rotation and the
full rotation matrices of shrots.cpp are replaced where consumed
(glossyprt) by re-projection, which vectorizes better than banded
rotation matrices on TPU.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def sh_terms(lmax: int) -> int:
    return (lmax + 1) * (lmax + 1)


def sh_index(l: int, m: int) -> int:
    return l * l + l + m


def _legendre_p(lmax: int, z):
    """Associated Legendre P_l^m(z) for all l<=lmax, m>=0.
    Returns dict[(l, m)] -> array like z. Standard recurrences
    (reference core/sh.cpp legendrep)."""
    P = {}
    P[(0, 0)] = jnp.ones_like(z)
    if lmax == 0:
        return P
    z2 = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    for m in range(0, lmax + 1):
        if m > 0:
            P[(m, m)] = (1.0 - 2.0 * m) * z2 * P[(m - 1, m - 1)]
        if m + 1 <= lmax:
            P[(m + 1, m)] = z * (2.0 * m + 1.0) * P[(m, m)]
        for l in range(m + 2, lmax + 1):
            P[(l, m)] = (
                (2.0 * l - 1.0) * z * P[(l - 1, m)]
                - (l + m - 1.0) * P[(l - 2, m)]
            ) / (l - m)
    return P


def _K(l: int, m: int) -> float:
    from math import factorial, pi, sqrt

    return sqrt((2.0 * l + 1.0) * factorial(l - abs(m))
                / (4.0 * pi * factorial(l + abs(m))))


def sh_evaluate(w, lmax: int):
    """Real SH basis values at unit directions w [..., 3] ->
    [..., sh_terms(lmax)] (reference core/sh.h:55 SHEvaluate)."""
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    P = _legendre_p(lmax, z)
    phi = jnp.arctan2(y, x)
    out = []
    sqrt2 = np.sqrt(2.0)
    for l in range(lmax + 1):
        for m in range(-l, l + 1):
            if m == 0:
                out.append(_K(l, 0) * P[(l, 0)])
            elif m > 0:
                out.append(sqrt2 * _K(l, m) * jnp.cos(m * phi) * P[(l, m)])
            else:
                out.append(sqrt2 * _K(l, m) * jnp.sin(-m * phi) * P[(l, -m)])
    return jnp.stack(out, axis=-1)


def lambda_l(lmax: int) -> np.ndarray:
    """Cosine-lobe convolution coefficients A_l (Ramamoorthi-Hanrahan),
    expanded per (l, m): E(n) = sum A_l c_lm Y_lm(n)
    (reference core/sh.cpp SHConvolveCosTheta). A_0 = pi, A_1 = 2pi/3,
    A_2 = pi/4, odd l > 1 vanish."""
    from math import factorial, pi

    coeffs = np.zeros(sh_terms(lmax))
    for l in range(lmax + 1):
        if l == 0:
            a = pi
        elif l == 1:
            a = 2.0 * pi / 3.0
        elif l % 2 == 1:
            a = 0.0
        else:
            a = (2.0 * pi * (-1.0) ** (l // 2 - 1)
                 / ((l + 2) * (l - 1))
                 * factorial(l) / (2 ** l * factorial(l // 2) ** 2))
        for m in range(-l, l + 1):
            coeffs[sh_index(l, m)] = a
    return coeffs


def project_function(fn_vals, dirs, weights, lmax: int):
    """MC/quadrature projection: sum_i w_i f_i Y(w_i).

    fn_vals [N, C], dirs [N, 3], weights [N] -> [terms, C]."""
    Y = sh_evaluate(dirs, lmax)  # [N, T]
    return jnp.einsum("nt,nc->tc", Y * weights[:, None], fn_vals)


def sphere_quadrature(n_theta: int = 32, n_phi: int = 64):
    """Product quadrature over the sphere -> (dirs [N,3], weights [N])."""
    th = (np.arange(n_theta) + 0.5) / n_theta * np.pi
    ph = (np.arange(n_phi) + 0.5) / n_phi * 2.0 * np.pi
    T, PH = np.meshgrid(th, ph, indexing="ij")
    st = np.sin(T)
    dirs = np.stack([st * np.cos(PH), st * np.sin(PH), np.cos(T)], -1).reshape(-1, 3)
    w = (st * (np.pi / n_theta) * (2.0 * np.pi / n_phi)).reshape(-1)
    return jnp.asarray(dirs, jnp.float32), jnp.asarray(w, jnp.float32)
