import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import bench_scene
from pbrt_tpu.accel.wide_bvh import build_wide_bvh, TILE, MAX_L
from pbrt_tpu.ops import bvh_pallas as BP

scene = bench_scene.make_bench_scene()
wb = scene.accel.wide
res = 1024
ray = bench_scene.camera_rays(res)
n = res * res
tmin = jnp.zeros(n); tmax = jnp.full((n,), jnp.inf)

o, d = ray.o, ray.d
T = n // TILE
live = tmax > tmin

@jax.jit
def sort_only(o, d):
    return BP._coherence_sort(o, d, wb.world_lo, wb.world_hi)

@jax.jit
def phase_a_only(o, d, tmin, tmax):
    order = BP._coherence_sort(o, d, wb.world_lo, wb.world_hi)
    o_s, d_s = o[order], d[order]
    tmin_s, tmax_s = tmin[order], tmax[order]
    live_s = (tmax_s > tmin_s)
    frus = BP._frusta(o_s, d_s, tmin_s, tmax_s, live_s, T)
    skips = jnp.zeros((T,), jnp.int32)
    lst, nl, done = BP._dense_cull(wb, frus, skips)
    return done, nl, lst

def timeit(f, *a, iters=5):
    out = f(*a); jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters, out

dt, _ = timeit(sort_only, o, d)
print(f"sort: {dt*1e3:.1f} ms")
dt, (sp, nl, lst) = timeit(phase_a_only, o, d, tmin, tmax)
nl_np = np.asarray(nl); sp_np = np.asarray(sp)
print(f"phaseA(first wave): {dt*1e3:.1f} ms; pairs={nl_np.sum()} "
      f"nl mean/max={nl_np.mean():.1f}/{nl_np.max()} not_done={int((~sp_np).sum())}")
# full pass timing for reference
f = jax.jit(lambda o, d: BP.wide_t_pass(wb, o, d, tmin, tmax))
dt, _ = timeit(f, o, d)
print(f"full: {dt*1e3:.1f} ms -> {n/dt/1e6:.2f} M rays/s")
