import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "scripts")
import time
import numpy as np
import jax
import jax.numpy as jnp
import bench_scene
from pbrt_tpu.accel.wide_bvh import build_wide_bvh, TILE, MAX_L
from pbrt_tpu.ops import bvh_pallas as BP
import pickle

CACHE = "/root/repo/.scratch_wb.pkl"
if os.path.exists(CACHE):
    with open(CACHE, "rb") as f:
        wbn = pickle.load(f)
    wb = jax.tree.map(jnp.asarray, wbn[0])
    from pbrt_tpu.accel.wide_bvh import WideBVH
    wb = WideBVH(*wb[:-1], n_blocks=wbn[1])
else:
    scene = bench_scene.make_bench_scene()
    wb = build_wide_bvh(scene.accel.bvh, scene.geom)
    with open(CACHE, "wb") as f:
        pickle.dump((jax.tree.map(np.asarray, tuple(wb[:-1])) + (None,), wb.n_blocks), f)
res = 1024
ray = bench_scene.camera_rays(res)
n = res * res
T = n // TILE
o, d = ray.o, ray.d
tmin = jnp.zeros(n); tmax = jnp.full((n,), jnp.inf)
order = BP._coherence_sort(o, d, wb.world_lo, wb.world_hi)
o_s, d_s = o[order], d[order]
tmin_s, tmax_s = tmin[order], tmax[order]
frus = BP._frusta(o_s, d_s, tmin_s, tmax_s, tmax_s > tmin_s, T)
frus = jax.tree.map(jnp.asarray, frus)
skips = jnp.zeros((T,), jnp.int32)

@jax.jit
def hits_only(frus):
    olo, ohi, ilo, ihi, tmin_t, tmax_t, alive = frus
    B = wb.block_lo.shape[0]
    blo = wb.block_lo[None, :, :]
    bhi = wb.block_hi[None, :, :]
    u1 = blo - ohi[:, None, :]; u2 = blo - olo[:, None, :]
    v1 = bhi - ohi[:, None, :]; v2 = bhi - olo[:, None, :]
    il = ilo[:, None, :]; ih = ihi[:, None, :]
    p = (u1*il, u1*ih, u2*il, u2*ih, v1*il, v1*ih, v2*il, v2*ih)
    e_min = p[0]; x_max = p[0]
    for q in p[1:]:
        e_min = jnp.minimum(e_min, q); x_max = jnp.maximum(x_max, q)
    L = jnp.maximum(jnp.max(e_min, -1), tmin_t[:, None])
    U = jnp.min(x_max, -1)
    hit = (L <= U * 1.0001) & (L <= tmax_t[:, None]) & alive[:, None]
    return jnp.sum(hit)

@jax.jit
def cull_full(frus, skips):
    tmax_t = jnp.full((T,), 1e30)
    swept = jnp.zeros((T, wb.block_lo.shape[0]), bool)
    lst, nl, swept, done = BP._dense_cull(wb, frus, tmax_t, swept)
    return nl.sum(), lst

def timeit(f, *a, iters=20):
    out = f(*a); jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters

print(f"hits only:  {timeit(hits_only, frus)*1e3:.2f} ms")
print(f"cull full:  {timeit(cull_full, frus, skips)*1e3:.2f} ms")

@jax.jit
def sort_gather(o, d, tmin, tmax):
    order = BP._coherence_sort(o, d, wb.world_lo, wb.world_hi)
    return o[order], d[order], tmin[order], tmax[order]

@jax.jit
def sort_key_only(o, d):
    on = jnp.clip((o - wb.world_lo) / jnp.maximum(wb.world_hi - wb.world_lo, 1e-12), 0.0, 1.0)
    qo = (on * 31.0).astype(jnp.uint32)
    mo = BP._morton3(qo, 5)
    oct_ = ((d[:, 0] < 0).astype(jnp.uint32)
            | ((d[:, 1] < 0).astype(jnp.uint32) << 1)
            | ((d[:, 2] < 0).astype(jnp.uint32) << 2))
    qd = (jnp.clip(d * 0.5 + 0.5, 0.0, 1.0) * 15.0).astype(jnp.uint32)
    md = BP._morton3(qd, 4)
    return (mo << 15) | (oct_ << 12) | md

@jax.jit
def argsort_only(key):
    return jnp.argsort(key, stable=True)

key = sort_key_only(o, d)
print(f"key build:   {timeit(sort_key_only, o, d)*1e3:.2f} ms")
print(f"argsort:     {timeit(argsort_only, key)*1e3:.2f} ms")
print(f"sort+gather: {timeit(sort_gather, o, d, tmin, tmax)*1e3:.2f} ms")

@jax.jit
def frusta_j(o_s, d_s, tmin_s, tmax_s):
    return BP._frusta(o_s, d_s, tmin_s, tmax_s, tmax_s > tmin_s, T)
print(f"frusta:      {timeit(frusta_j, o_s, d_s, tmin_s, tmax_s)*1e3:.2f} ms")

# --- sweep step cost ---
Tn = T
rays8p = jnp.zeros(((Tn + 1) * TILE, 8), jnp.float32)
t3 = jnp.full((Tn + 1, 8, TILE // 8), 1e30, jnp.float32)
p3 = jnp.full((Tn + 1, 8, TILE // 8), -1, jnp.int32)
PC = BP.PAIR_CHUNK
# pairs: 8 consecutive pairs per tile (tile changes every 8 steps)
pt = jnp.asarray(np.repeat(np.arange(PC // 8) % Tn, 8).astype(np.int32))
pb = jnp.asarray((np.arange(PC) % wb.n_blocks).astype(np.int32))

f_sweep = jax.jit(lambda *a: BP._sweep_pairs(*a))
dt = timeit(f_sweep, pt, pb, rays8p, t3, p3, wb.tris16, iters=10)
print(f"sweep chunk ({PC} pairs): {dt*1e3:.2f} ms -> {dt/PC*1e6:.2f} us/step")
# all-sentinel pairs (pure overhead)
pt0 = jnp.full((PC,), Tn, jnp.int32)
pb0 = jnp.full((PC,), wb.n_blocks, jnp.int32)
dt = timeit(f_sweep, pt0, pb0, rays8p, t3, p3, wb.tris16, iters=10)
print(f"sweep chunk sentinel:    {dt*1e3:.2f} ms -> {dt/PC*1e6:.2f} us/step")
