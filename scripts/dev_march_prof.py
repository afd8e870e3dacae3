"""Dev probe: photonvolume march cost breakdown at pinkfloyd scale.

Builds a beam-localized 5M-photon map (pinkfloyd's structure: photons
concentrated in a thin prism beam inside a much larger volume box),
then times, at 256^2 lanes x k=500:
  1. the fused kNN leg alone, compact on/off
  2. the full march body (shadow + transmittance + kNN) per step
Run on an otherwise idle chip.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.photon.map import build_photon_map, knn_weighted_flux

rng = np.random.RandomState(0)
P = 5_000_000
# beam: a thin tilted cylinder through a [-3,3]^3 box
t = rng.rand(P).astype(np.float32)
axis_a = np.array([-2.5, -0.5, 0.0], np.float32)
axis_b = np.array([2.5, 1.5, 0.5], np.float32)
pos = axis_a + t[:, None] * (axis_b - axis_a)
pos += rng.normal(0, 0.05, (P, 3)).astype(np.float32)
alpha = (rng.rand(P, 30).astype(np.float32) * 1e-6)
wi = rng.normal(size=(P, 3)).astype(np.float32)
wi /= np.linalg.norm(wi, axis=-1, keepdims=True)

t0 = time.perf_counter()
pm = build_photon_map(pos, alpha, wi, cell_size=0.05, target_k=500)
print(f"build 5M map: {time.perf_counter()-t0:.2f}s dims={pm.dims} count={pm.count}")

# queries: march samples across the whole box — most far from the beam
Q = 256 * 256
q_np = rng.uniform(-3, 3, (Q, 3)).astype(np.float32)
q = jnp.asarray(q_np)

# fraction of queries with nonempty neighborhoods
from pbrt_tpu.photon.map import _candidate_count
cnt = np.asarray(_candidate_count(pm, q))
print(f"live queries: {(cnt > 0).mean():.3f}")

K = 500
MD2 = 0.16


def mk(compact):
    @jax.jit
    def f(pm, q):
        res = knn_weighted_flux(
            pm, q, K, MD2,
            lambda wx, wy, wz, d2, valid, r2: jnp.ones_like(d2),
            compact=compact)
        return res.flux.sum()
    return lambda q, f=f: f(pm, q)


for compact in (False, True):
    f = mk(compact)
    f(q).block_until_ready()
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        f(q).block_until_ready()
    dt = (time.perf_counter() - t0) / n
    print(f"kNN k=500 Q=65536 compact={compact}: {dt*1e3:.1f} ms "
          f"({Q/dt/1e6:.2f} M lookups/s)")

# all-live: queries on the beam itself
tq = rng.rand(Q).astype(np.float32)
qb_np = axis_a + tq[:, None] * (axis_b - axis_a)
qb_np += rng.normal(0, 0.05, (Q, 3)).astype(np.float32)
qb = jnp.asarray(qb_np)
cnt = np.asarray(_candidate_count(pm, qb))
print(f"beam queries live: {(cnt > 0).mean():.3f} mean_cand={cnt.mean():.0f}")
for compact in (False, True):
    f = mk(compact)
    f(qb).block_until_ready()
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        f(qb).block_until_ready()
    dt = (time.perf_counter() - t0) / n
    print(f"kNN BEAM k=500 Q=65536 compact={compact}: {dt*1e3:.1f} ms "
          f"({Q/dt/1e6:.2f} M lookups/s)")
