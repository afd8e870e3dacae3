"""Photon maps as sorted spatial-hash grids with top-k queries.

Replaces the reference's KdTree<Photon> + ClosePhoton max-heap kNN
(reference core/kdtree.h:63-186, core/photonshooter.h:186-203). The
TPU form (SURVEY.md section 7): photons sorted by uniform-grid cell id;
cell start offsets by binary search; a kNN lookup gathers the 3x3x3
neighbor cells (capped per cell), computes squared distances and
top-k's them — fixed shapes, no heap, fully batched over query points.

The density estimate contract matches LPhoton: the caller receives the
k nearest (alpha, wi, dist2, valid) and reduces them itself
(integrators/photonmap.py, photonvolume.py).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.core import spectrum as spec

S = spec.N_BINS


class PhotonMap(NamedTuple):
    pos: jnp.ndarray         # [P, 3] sorted by cell id
    alpha: jnp.ndarray       # [P, S]
    wi: jnp.ndarray          # [P, 3]
    cell_start: jnp.ndarray  # [C + 1] int32 prefix offsets
    grid_lo: jnp.ndarray     # [3]
    inv_cell: jnp.ndarray    # [3] 1 / cell_size
    dims: Tuple[int, int, int]  # static grid dims
    count: int               # number of photons (static)


def build_photon_map(pos: np.ndarray, alpha: np.ndarray, wi: np.ndarray,
                     cell_size: float,
                     target_k: int = 0) -> Optional[PhotonMap]:
    """Host build: bucket photons on a uniform grid of `cell_size`
    (pick ~ the query maxdist so a 3x3x3 neighborhood covers the
    search radius).

    target_k > 0 enables density-adaptive sizing: the cell is grown so
    a 3x3x3 neighborhood holds >= ~2*target_k photons on average, which
    keeps kNN queries for large `nused` (pinkfloyd's 500) serviceable
    from the fixed 27-cell gather. Total cell count is bounded (not the
    per-axis dims) so huge maps can't blow up cell_start memory."""
    P = len(pos)
    if P == 0:
        return None
    pos = np.asarray(pos, np.float32)
    lo = pos.min(0) - 1e-4
    hi = pos.max(0) + 1e-4
    cell = max(float(cell_size), 1e-6)
    if target_k > 0:
        vol = float(np.prod(np.maximum(hi - lo, 1e-6)))
        # 27 c^3 (P/V) >= 2k  =>  c >= (2 k V / (27 P))^(1/3)
        c_dens = (2.0 * target_k * vol / (27.0 * max(P, 1))) ** (1.0 / 3.0)
        cell = max(cell, c_dens)
    dims = np.maximum(1, np.ceil((hi - lo) / cell)).astype(np.int64)
    # bound TOTAL cells (cell_start memory), not per-axis dims
    max_cells = 1 << 24
    while int(np.prod(dims)) > max_cells:
        dims = np.maximum(1, dims // 2)
    inv_cell = dims / np.maximum(hi - lo, 1e-12)  # cells per unit
    cx = np.clip(((pos - lo) * inv_cell).astype(np.int64), 0, dims - 1)
    cid = (cx[:, 2] * dims[1] + cx[:, 1]) * dims[0] + cx[:, 0]
    order = np.argsort(cid, kind="stable")
    cid_s = cid[order]
    C = int(dims[0] * dims[1] * dims[2])
    cell_start = np.searchsorted(cid_s, np.arange(C + 1)).astype(np.int32)
    return PhotonMap(
        pos=jnp.asarray(pos[order]),
        alpha=jnp.asarray(np.asarray(alpha, np.float32)[order]),
        wi=jnp.asarray(np.asarray(wi, np.float32)[order]),
        cell_start=jnp.asarray(cell_start),
        grid_lo=jnp.asarray(lo, jnp.float32),
        inv_cell=jnp.asarray(inv_cell, jnp.float32),
        dims=(int(dims[0]), int(dims[1]), int(dims[2])),
        count=P,
    )


def _gather_candidates(pm, q, per_cell_cap: int):
    """Candidate photon indices from the 3x3x3 cell neighborhood of
    each query: ([Q, 27*cap] indices, [Q, 27*cap] validity)."""
    nx, ny, nz = pm.dims
    cq = ((q - pm.grid_lo) * pm.inv_cell)
    cxi = jnp.clip(jnp.floor(cq[..., 0]).astype(jnp.int32), 0, nx - 1)
    cyi = jnp.clip(jnp.floor(cq[..., 1]).astype(jnp.int32), 0, ny - 1)
    czi = jnp.clip(jnp.floor(cq[..., 2]).astype(jnp.int32), 0, nz - 1)

    cand_idx = []
    cand_ok = []
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                x = cxi + dx
                y = cyi + dy
                z = czi + dz
                inb = (x >= 0) & (x < nx) & (y >= 0) & (y < ny) & (z >= 0) & (z < nz)
                xc = jnp.clip(x, 0, nx - 1)
                yc = jnp.clip(y, 0, ny - 1)
                zc = jnp.clip(z, 0, nz - 1)
                cid = (zc * ny + yc) * nx + xc
                start = pm.cell_start[cid]
                end = pm.cell_start[cid + 1]
                offs = jnp.arange(per_cell_cap, dtype=jnp.int32)
                idx = start[:, None] + offs[None, :]
                ok = inb[:, None] & (idx < end[:, None])
                cand_idx.append(jnp.clip(idx, 0, pm.count - 1))
                cand_ok.append(ok)
    return jnp.concatenate(cand_idx, axis=1), jnp.concatenate(cand_ok, axis=1)


class KnnResult(NamedTuple):
    alpha: jnp.ndarray   # [Q, K, S]
    wi: jnp.ndarray      # [Q, K, 3]
    dist2: jnp.ndarray   # [Q, K]
    valid: jnp.ndarray   # [Q, K]
    r2_max: jnp.ndarray  # [Q] squared radius of the found set (kth or maxdist2)


def knn_lookup(pm: PhotonMap, q: jnp.ndarray, k: int, max_dist2: float,
               per_cell_cap: int = 0) -> KnnResult:
    """k nearest photons within sqrt(max_dist2) of each query point.

    q: [Q, 3]. Gathers 27 neighbor cells x per_cell_cap candidates.
    Deterministic; lanes beyond a cell's population are masked.
    per_cell_cap defaults to enough candidates that the 27-cell gather
    can actually return k photons (>= 2k total candidates), so large
    `nused` values (pinkfloyd's 500) are not silently starved.
    """
    if per_cell_cap <= 0:
        per_cell_cap = max(16, -(-2 * k // 27))
    idx, ok = _gather_candidates(pm, q, per_cell_cap)
    ppos = pm.pos[idx]                         # [Q, M, 3]
    d2 = jnp.sum((ppos - q[:, None, :]) ** 2, -1)
    d2 = jnp.where(ok & (d2 <= max_dist2), d2, jnp.inf)
    k_eff = min(k, d2.shape[1])
    neg_top, top_i = jax.lax.top_k(-d2, k_eff)
    d2k = -neg_top
    valid = jnp.isfinite(d2k)
    gi = jnp.take_along_axis(idx, top_i, axis=1)
    r2 = jnp.max(jnp.where(valid, d2k, 0.0), axis=1)
    r2 = jnp.where(jnp.any(valid, 1), r2, max_dist2)
    return KnnResult(
        alpha=pm.alpha[gi],
        wi=pm.wi[gi],
        dist2=jnp.where(valid, d2k, 0.0),
        valid=valid,
        r2_max=jnp.maximum(r2, 1e-12),
    )


def ephoton(pm: Optional[PhotonMap], q, n, k: int, max_dist2: float):
    """Irradiance estimate at (q, n) from a photon map (reference
    core/photonshooter.cpp EPhoton :17-35): sum of alpha over the k
    nearest photons with dot(n, wi) > 0, divided by (md2 * pi) — the
    map's alphas are already 1/nshot-normalized at build. [Q, S]."""
    if pm is None:
        return jnp.zeros(q.shape[:-1] + (S,), jnp.float32)
    res = knn_lookup(pm, q, k, max_dist2)
    front = jnp.sum(res.wi * n[:, None, :], -1) > 0.0
    e = jnp.sum(jnp.where((res.valid & front)[..., None], res.alpha, 0.0), axis=1)
    return e / (res.r2_max[..., None] * jnp.pi)


class RadianceMap(NamedTuple):
    """Radiance photons (reference photonshooter.h:30-37 RadiancePhoton
    {p, n, Lo}) on the same sorted-grid layout; queried by
    nearest-with-matching-hemisphere (RadiancePhotonProcess,
    photonshooter.h:63-77)."""

    pos: jnp.ndarray         # [P, 3] sorted by cell id
    lo_rad: jnp.ndarray      # [P, S] precomputed outgoing radiance Lo
    n: jnp.ndarray           # [P, 3] surface normal
    cell_start: jnp.ndarray  # [C + 1]
    grid_lo: jnp.ndarray
    inv_cell: jnp.ndarray
    dims: Tuple[int, int, int]
    count: int


def build_radiance_map(pos: np.ndarray, lo_rad: np.ndarray, n: np.ndarray,
                       cell_size: float) -> Optional[RadianceMap]:
    base = build_photon_map(pos, lo_rad, n, cell_size)
    if base is None:
        return None
    return RadianceMap(pos=base.pos, lo_rad=base.alpha, n=base.wi,
                       cell_start=base.cell_start, grid_lo=base.grid_lo,
                       inv_cell=base.inv_cell, dims=base.dims,
                       count=base.count)


def radiance_lookup(rm: Optional[RadianceMap], q, n,
                    per_cell_cap: int = 16):
    """Nearest radiance photon whose normal faces the query hemisphere
    (reference RadiancePhotonProcess, photonshooter.h:63-77: nearest
    candidate with dot(rp.n, n) > 0 — the hemisphere test is applied
    BEFORE choosing the nearest). The reference searches an unbounded
    radius through the kd-tree; the grid form searches the 27-cell
    neighborhood. Returns (Lo [Q, S], found [Q])."""
    if rm is None:
        Q = q.shape[0]
        return jnp.zeros((Q, S), jnp.float32), jnp.zeros((Q,), bool)
    idx, ok = _gather_candidates(rm, q, per_cell_cap)
    ppos = rm.pos[idx]                              # [Q, M, 3]
    d2 = jnp.sum((ppos - q[:, None, :]) ** 2, -1)
    front = jnp.sum(rm.n[idx] * n[:, None, :], -1) > 0.0
    d2 = jnp.where(ok & front, d2, jnp.inf)
    best = jnp.argmin(d2, axis=1)                   # [Q]
    found = jnp.isfinite(jnp.take_along_axis(d2, best[:, None], 1)[:, 0])
    sel = jnp.take_along_axis(idx, best[:, None], 1)[:, 0]
    lo_sel = jnp.where(found[:, None], rm.lo_rad[sel], 0.0)
    return lo_sel, found
