"""Sampled spectra as `[..., N_BINS]` arrays (default 30 bins, 400-700nm).

TPU-native replacement for the reference's `SampledSpectrum`
(reference: core/spectrum.h:44-46 picks 30 bins over [400,700);
core/pbrt.h:157 makes it the active Spectrum type). A spectrum here is
just a jnp array whose last axis has N_BINS entries, so whole wavefronts
of spectra are 2D tensors and all ops are vectorized.

Color science is built from scratch:
- CIE x/y/z matching curves from the multi-lobe Gaussian fits of
  Wyman, Sloan & Shirley, "Simple Analytic Approximations to the CIE XYZ
  Color Matching Functions", JCGT 2013 (public closed forms).
- RGB->spectrum uses a linear 30x3 basis computed once at import by a
  smoothness-regularized least squares (minimize ||D2 s||^2 subject to
  spectrum_to_rgb(s) = rgb). This is linear, smooth and exactly
  round-trips RGB before clipping, replacing the reference's Smits-style
  tables (reference core/spectrum.cpp RGBRefl2Spect*).

Student dispersion extensions (reference core/spectrum.h:253-324) map to
wavefront-friendly forms:
- splitSpectrum -> `sample_bin` (importance-pick ONE wavelength bin per
  lane, unbiased: value/pdf) and `split_all` (dense [N_BINS] one-hots).
- extractLambda -> carrying an explicit `lambda_idx` int lane field.
- filter(lambda) -> `band_filter` (identical 2-bin linear band-pass).
- intensityAt / toMonochromatic -> `intensity_at` / one-hot synthesis.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

N_BINS = 30
LAMBDA_START = 400.0
LAMBDA_END = 700.0

# Bin edges and representative wavelengths. The reference indexes bins with
# lambda_i = start + i*(end-start)/(n-1) in splitSpectrum (spectrum.h:254)
# and start + i*(end-start)/n in filter() (spectrum.h:307); we use bin
# midpoints for radiometry and mirror each quirk where behavior matters.
BIN_WIDTH = (LAMBDA_END - LAMBDA_START) / N_BINS
LAMBDAS_EDGE = np.linspace(LAMBDA_START, LAMBDA_END, N_BINS + 1)
LAMBDAS = 0.5 * (LAMBDAS_EDGE[:-1] + LAMBDAS_EDGE[1:])  # midpoints [30]
LAMBDAS_SPLIT = LAMBDA_START + np.arange(N_BINS) * (LAMBDA_END - LAMBDA_START) / (N_BINS - 1)


def _cie_gauss(lam, alpha, mu, s1, s2):
    s = np.where(lam < mu, s1, s2)
    return alpha * np.exp(-0.5 * ((lam - mu) / s) ** 2)


def _cie_xyz_bar(lam):
    lam = np.asarray(lam, np.float64)
    x = (
        _cie_gauss(lam, 1.056, 599.8, 37.9, 31.0)
        + _cie_gauss(lam, 0.362, 442.0, 16.0, 26.7)
        + _cie_gauss(lam, -0.065, 501.1, 20.4, 26.2)
    )
    y = _cie_gauss(lam, 0.821, 568.8, 46.9, 40.5) + _cie_gauss(lam, 0.286, 530.9, 16.3, 31.1)
    z = _cie_gauss(lam, 1.217, 437.0, 11.8, 36.0) + _cie_gauss(lam, 0.681, 459.0, 26.0, 13.8)
    return np.stack([x, y, z], axis=0)


def _integrate_bins(fn, n_sub: int = 16) -> np.ndarray:
    """Average fn(lambda) over each bin -> [..., N_BINS]."""
    out = []
    for i in range(N_BINS):
        sub = np.linspace(LAMBDAS_EDGE[i], LAMBDAS_EDGE[i + 1], n_sub)
        out.append(np.mean(fn(sub), axis=-1))
    return np.stack(out, axis=-1)


# CIE matching curves averaged per bin: [3, 30]
CIE_XYZ_BINS = _integrate_bins(_cie_xyz_bar)
# Normalization: integral of ybar over the visible range (scaled to our window)
CIE_Y_INT = float(np.sum(CIE_XYZ_BINS[1]) * BIN_WIDTH)

# sRGB (linear) <-> XYZ, D65 white
XYZ_TO_RGB = np.array(
    [
        [3.2404542, -1.5371385, -0.4985314],
        [-0.9692660, 1.8760108, 0.0415560],
        [0.0556434, -0.2040259, 1.0572252],
    ]
)
RGB_TO_XYZ = np.linalg.inv(XYZ_TO_RGB)

# spectrum -> rgb matrix, normalized so a constant-1 spectrum has Y=1
_S2XYZ = CIE_XYZ_BINS * BIN_WIDTH / CIE_Y_INT  # [3, 30]
S2RGB = XYZ_TO_RGB @ _S2XYZ  # [3, 30]


def _solve_rgb_basis() -> np.ndarray:
    """30x3 basis B with S2RGB @ B = I and minimal curvature.

    Minimize ||D2 s||^2 + eps ||s||^2 s.t. M s = e_k for each primary:
    closed-form via KKT.  Returns B (columns are r/g/b basis spectra).
    """
    M = S2RGB  # [3, 30]
    n = N_BINS
    D2 = np.zeros((n - 2, n))
    for i in range(n - 2):
        D2[i, i], D2[i, i + 1], D2[i, i + 2] = 1.0, -2.0, 1.0
    Q = D2.T @ D2 + 1e-6 * np.eye(n)
    # KKT: [Q M^T; M 0] [s; mu] = [0; e]
    K = np.block([[Q, M.T], [M, np.zeros((3, 3))]])
    rhs = np.vstack([np.zeros((n, 3)), np.eye(3)])
    sol = np.linalg.solve(K, rhs)
    return sol[:n]  # [30, 3]


RGB_BASIS = _solve_rgb_basis()  # [30, 3]

# jnp copies (float32) for device use
S2RGB_J = jnp.asarray(S2RGB, jnp.float32)
RGB_BASIS_J = jnp.asarray(RGB_BASIS, jnp.float32)
LAMBDAS_J = jnp.asarray(LAMBDAS, jnp.float32)
LAMBDAS_SPLIT_J = jnp.asarray(LAMBDAS_SPLIT, jnp.float32)


# ---------------------------------------------------------------------------
# Conversions

def to_xyz(s):
    return s @ jnp.asarray(_S2XYZ, s.dtype).T if isinstance(s, jnp.ndarray) else s @ _S2XYZ.T


def to_rgb(s):
    m = S2RGB_J if isinstance(s, jnp.ndarray) else S2RGB
    return s @ m.T


def y(s):
    """Luminance (CIE Y) of spectrum batch."""
    m = _S2XYZ[1]
    m = jnp.asarray(m, s.dtype) if isinstance(s, jnp.ndarray) else m
    return s @ m


def from_rgb(rgb, kind: str = "reflectance"):
    """RGB [..., 3] -> spectrum [..., 30]; linear basis, clipped at 0."""
    b = RGB_BASIS_J if isinstance(rgb, jnp.ndarray) else RGB_BASIS
    return jnp.clip(rgb @ b.T, 0.0, None) if isinstance(rgb, jnp.ndarray) else np.clip(rgb @ b.T, 0.0, None)


def from_sampled(lambdas, values) -> np.ndarray:
    """Piecewise-linear SPD samples -> binned spectrum (host, NumPy).

    Averages the linear interpolant over each bin (reference
    core/spectrum.cpp AverageSpectrumSamples).
    """
    lam = np.asarray(lambdas, np.float64)
    val = np.asarray(values, np.float64)
    order = np.argsort(lam)
    lam, val = lam[order], val[order]

    out = np.empty(N_BINS, np.float64)
    for i in range(N_BINS):
        sub = np.linspace(LAMBDAS_EDGE[i], LAMBDAS_EDGE[i + 1], 64)
        out[i] = np.mean(np.interp(sub, lam, val))
    return out.astype(np.float32)


def constant(v, shape=()):
    return jnp.full(shape + (N_BINS,), v, jnp.float32)


def blackbody(temp_k: float) -> np.ndarray:
    """Planck blackbody SPD binned (host), normalized to max 1."""
    h, c, kb = 6.62607015e-34, 2.99792458e8, 1.380649e-23
    lam_m = LAMBDAS * 1e-9
    le = (2 * h * c * c) / (lam_m ** 5 * (np.exp(h * c / (lam_m * kb * temp_k)) - 1.0))
    return (le / le.max()).astype(np.float32)


# ---------------------------------------------------------------------------
# Student dispersion extensions, wavefront form

def intensity_at(s, lam):
    """Linear interp of bin values at wavelength lam (spectrum.h:281-291).

    Uses the reference's (n-1) grid: index = (lam-400)/ (300/29).
    """
    delta = (LAMBDA_END - LAMBDA_START) / (N_BINS - 1)
    iw = (lam - LAMBDA_START) / delta
    i0 = jnp.clip(jnp.floor(iw).astype(jnp.int32), 0, N_BINS - 2)
    t = iw - i0
    v0 = jnp.take_along_axis(s, i0[..., None], axis=-1)[..., 0]
    v1 = jnp.take_along_axis(s, (i0 + 1)[..., None], axis=-1)[..., 0]
    return (1.0 - t) * v0 + t * v1


def band_filter(s, lam):
    """2-bin linear band-pass at lam (reference spectrum.h filter()).

    Out-of-range lam -> zero spectrum. Mirrors the reference's weights:
    bin i gets c[i]*t, bin i+1 gets c[i+1]*(1-t) with
    i = floor((lam-400)/(300/n)).
    """
    delta = (LAMBDA_END - LAMBDA_START) / N_BINS
    iw = (lam - LAMBDA_START) / delta
    idx = jnp.floor(iw).astype(jnp.int32)
    t = iw - idx
    valid = (lam >= LAMBDA_START) & (lam < LAMBDA_END)
    idx = jnp.clip(idx, 0, N_BINS - 1)
    bins = jnp.arange(N_BINS)
    w = jnp.where(bins == idx[..., None], t[..., None], 0.0)
    w = w + jnp.where(bins == (idx + 1)[..., None], (1.0 - t)[..., None], 0.0)
    return jnp.where(valid[..., None], s * w, 0.0)


def one_hot(idx, value=1.0):
    """Monochromatic spectrum: one-hot at bin idx scaled by value."""
    oh = (jnp.arange(N_BINS) == idx[..., None]).astype(jnp.float32)
    return oh * jnp.asarray(value)[..., None]


def bin_wavelength(idx):
    """Wavelength carried by bin idx, matching splitSpectrum's grid."""
    return jnp.take(LAMBDAS_SPLIT_J, idx)


def sample_bin(s, u):
    """Importance-sample ONE wavelength bin per lane: returns (idx, weight).

    weight = total/pdf adjustment such that one_hot(idx)*s[idx]/pdf is an
    unbiased estimator of the dense spectrum. This replaces the
    reference's splitSpectrum 1->k enumeration (photonshooter.cpp:141-145)
    with fixed lane count for the wavefront.
    """
    tot = jnp.sum(s, axis=-1)
    p = s / jnp.maximum(tot[..., None], 1e-20)
    cdf = jnp.cumsum(p, axis=-1)
    idx = jnp.sum((u[..., None] > cdf).astype(jnp.int32), axis=-1)
    idx = jnp.clip(idx, 0, N_BINS - 1)
    pdf = jnp.take_along_axis(p, idx[..., None], axis=-1)[..., 0]
    return idx, jnp.where(tot > 0, 1.0 / jnp.maximum(pdf, 1e-20), 0.0)


def is_black(s):
    return jnp.all(s <= 0.0, axis=-1)
