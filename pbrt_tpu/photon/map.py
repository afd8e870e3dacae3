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
                     cell_size: float) -> Optional[PhotonMap]:
    """Host build: bucket photons on a uniform grid of `cell_size`
    (pick ~ the query maxdist so a 3x3x3 neighborhood covers the
    search radius)."""
    P = len(pos)
    if P == 0:
        return None
    pos = np.asarray(pos, np.float32)
    lo = pos.min(0) - 1e-4
    hi = pos.max(0) + 1e-4
    cell = max(float(cell_size), 1e-6)
    dims = np.maximum(1, np.minimum(256, np.ceil((hi - lo) / cell))).astype(np.int64)
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


class KnnResult(NamedTuple):
    alpha: jnp.ndarray   # [Q, K, S]
    wi: jnp.ndarray      # [Q, K, 3]
    dist2: jnp.ndarray   # [Q, K]
    valid: jnp.ndarray   # [Q, K]
    r2_max: jnp.ndarray  # [Q] squared radius of the found set (kth or maxdist2)


def knn_lookup(pm: PhotonMap, q: jnp.ndarray, k: int, max_dist2: float,
               per_cell_cap: int = 16) -> KnnResult:
    """k nearest photons within sqrt(max_dist2) of each query point.

    q: [Q, 3]. Gathers 27 neighbor cells x per_cell_cap candidates.
    Deterministic; lanes beyond a cell's population are masked.
    """
    Q = q.shape[0]
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
    idx = jnp.concatenate(cand_idx, axis=1)   # [Q, 27*cap]
    ok = jnp.concatenate(cand_ok, axis=1)

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
