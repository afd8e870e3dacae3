"""Probe TPU layout padding cost for [N, 30] spectral ops vs [30, N].

TPU tiles (8 sublanes, 128 lanes) pad a [N, 30] f32 array's minor dim
to 128 (4.27x waste) at fusion boundaries. If real, spectra should be
[S, N]. This measures an elementwise chain + a reduce in both layouts.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

N = 1 << 20
S = 30


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@jax.jit
def chain_ns(a, b, c):
    # a,b,c: [N, S]; mimic a bounce's spectral arithmetic with several
    # fusion boundaries (optimization barriers to force materialization)
    x = a * b + c
    x = jax.lax.optimization_barrier(x)
    y = x * 0.9 + a
    y = jax.lax.optimization_barrier(y)
    z = jnp.where(y > 0.5, y * c, y + b)
    z = jax.lax.optimization_barrier(z)
    return z.sum(-1)  # [N]


@jax.jit
def chain_sn(a, b, c):
    x = a * b + c
    x = jax.lax.optimization_barrier(x)
    y = x * 0.9 + a
    y = jax.lax.optimization_barrier(y)
    z = jnp.where(y > 0.5, y * c, y + b)
    z = jax.lax.optimization_barrier(z)
    return z.sum(0)   # [N]


key = jax.random.PRNGKey(0)
a = jax.random.uniform(key, (N, S))
b = jax.random.uniform(key, (N, S)) + 0.1
c = jax.random.uniform(key, (N, S))
at, bt, ct = a.T.copy(), b.T.copy(), c.T.copy()

t_ns = timeit(chain_ns, a, b, c)
t_sn = timeit(chain_sn, at, bt, ct)
print(f"[N,30] chain: {t_ns*1e3:7.2f} ms")
print(f"[30,N] chain: {t_sn*1e3:7.2f} ms  (ratio {t_ns/t_sn:.2f}x)")

# also: [N,3] vector math vs split components
@jax.jit
def vec_n3(p, q):
    x = p * 2.0 + q
    x = jax.lax.optimization_barrier(x)
    y = jnp.cross(x, q)
    y = jax.lax.optimization_barrier(y)
    return (y * p).sum(-1)


@jax.jit
def vec_split(px, py, pz, qx, qy, qz):
    xx, xy, xz = px * 2 + qx, py * 2 + qy, pz * 2 + qz
    xx = jax.lax.optimization_barrier(xx)
    cx = xy * qz - xz * qy
    cy = xz * qx - xx * qz
    cz = xx * qy - xy * qx
    cx = jax.lax.optimization_barrier(cx)
    return cx * px + cy * py + cz * pz


p = jax.random.uniform(key, (N, 3))
q = jax.random.uniform(key, (N, 3))
t_n3 = timeit(vec_n3, p, q)
t_sp = timeit(vec_split, p[:, 0].copy(), p[:, 1].copy(), p[:, 2].copy(),
              q[:, 0].copy(), q[:, 1].copy(), q[:, 2].copy())
print(f"[N,3] vec:    {t_n3*1e3:7.2f} ms")
print(f"split vec:    {t_sp*1e3:7.2f} ms  (ratio {t_n3/t_sp:.2f}x)")
