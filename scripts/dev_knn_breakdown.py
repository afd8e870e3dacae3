"""Dev probe: where does a live kNN block spend its time at k=500?

Legs, all on one live block population (beam queries):
  A. full knn_weighted_flux (top_k + wi gather + alpha_t column gather + einsum)
  B. knn_dirs (top_k + wi row gather, NO spectra)     -> isolates alpha gather
  C. topk only (distances)                            -> isolates top_k
  D. variant: alpha stored as [P, 32] rows, row gather + einsum
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.photon.map import (build_photon_map, knn_weighted_flux,
                                 knn_dirs, _topk_phase, _block_map,
                                 _default_cap)

rng = np.random.RandomState(0)
P = 5_000_000
t = rng.rand(P).astype(np.float32)
axis_a = np.array([-2.5, -0.5, 0.0], np.float32)
axis_b = np.array([2.5, 1.5, 0.5], np.float32)
pos = axis_a + t[:, None] * (axis_b - axis_a)
pos += rng.normal(0, 0.05, (P, 3)).astype(np.float32)
alpha = (rng.rand(P, 30).astype(np.float32) * 1e-6)
wi = rng.normal(size=(P, 3)).astype(np.float32)
wi /= np.linalg.norm(wi, axis=-1, keepdims=True)

pm = build_photon_map(pos, alpha, wi, cell_size=0.05, target_k=500)
alpha_rows = np.zeros((P, 32), np.float32)
alpha_rows[:, :30] = alpha
# sorted order must match the map
from pbrt_tpu.photon.map import photon_map_structure
st = photon_map_structure(pos, 0.05, 500)
alpha_rows = jnp.asarray(alpha_rows[st.order])

Q = 65536
tq = rng.rand(Q).astype(np.float32)
qn = axis_a + tq[:, None] * (axis_b - axis_a)
qn += rng.normal(0, 0.05, (Q, 3)).astype(np.float32)
q = jnp.asarray(qn)

K = 500
MD2 = 0.16
CAP = _default_cap(K)
BLOCK = 1024


def timeit(name, f, *args):
    f(*args)[0].block_until_ready() if isinstance(f(*args), tuple) else f(*args).block_until_ready()
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        r = f(*args)
        (r[0] if isinstance(r, tuple) else r).block_until_ready()
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.1f} ms  val={float((r[0] if isinstance(r, tuple) else r)):.4g}")
    return dt


@jax.jit
def legA(pm, q):
    res = knn_weighted_flux(pm, q, K, MD2,
                            lambda wx, wy, wz, d2, valid, r2: jnp.ones_like(d2))
    return res.flux.sum()


@jax.jit
def legB(pm, q):
    wx, wy, wz, valid = knn_dirs(pm, q, K, MD2)
    return (wx * wy * wz).sum()


@jax.jit
def legC(pm, q):
    def blk(qb):
        gi, d2k, valid, r2n, r2f, nf, invf = _topk_phase(pm, qb, K, MD2, CAP)
        return d2k.sum(axis=1) + gi.sum(axis=1)
    out = _block_map(blk, q, (), BLOCK)
    return out.sum()


@jax.jit
def legD(pm, alpha_rows, q):
    def blk(qb):
        gi, d2k, valid, r2n, r2f, nf, invf = _topk_phase(pm, qb, K, MD2, CAP)
        w = jnp.where(valid, invf, 0.0)
        A = jnp.take(alpha_rows, gi, axis=0)       # [B, K, 32] rows
        return jnp.einsum("bks,bk->bs", A, w)
    out = _block_map(blk, q, (), BLOCK)
    return out.sum()


timeit("A full flux (alpha_t col gather)", legA, pm, q)
timeit("B dirs only (no spectra)", legB, pm, q)
timeit("C topk only", legC, pm, q)
timeit("D flux via [P,32] row gather", legD, pm, alpha_rows, q)
