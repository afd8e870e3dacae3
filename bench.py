"""Benchmark: ray-cast + path-trace throughput on a mesh-heavy scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (VERDICT.md round-2 item 3): ~135k-triangle tessellated mesh
over a ground plane at 1024x1024, traced through the TPU packet
pipeline (accel/wide_bvh.py + ops/bvh_pallas.py: coherence sort,
dense frustum cull, Pallas Moller-Trumbore sweep).

Headline metric: camera-ray casts/second through the accelerated
t-pass — the reference's hottest loop (accelerators/bvh.cpp:585-687).
The reference publishes no numbers (BASELINE.md); the anchor is the
same fixed 1e6 rays/s CPU-class figure recorded in BENCH_r01/r02, so
vs_baseline stays comparable across rounds. The JSON also carries the
full path-trace throughput (depth 5, live-lane ray casts) as "extra".
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_RAYS_PER_S = 1.0e6
RES = 1024
DEPTH = 5


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from scripts.bench_scene import make_bench_scene, camera_rays
    from pbrt_tpu.core.geometry import Ray
    from pbrt_tpu.integrators.surface import li_path

    scene = make_bench_scene()
    n = RES * RES
    ray = camera_rays(RES)
    pixel = jnp.arange(n, dtype=jnp.int32)
    sidx = jnp.zeros(n, jnp.int32)

    @jax.jit
    def tpass(o, d):
        # camera beams carry the coherent hint, as the render driver does
        r = Ray(o, d, jnp.zeros(n), jnp.full((n,), jnp.inf), jnp.zeros(n))
        t, prim = scene.accel._t_pass(r, coherent=True)
        return t, prim

    @jax.jit
    def forward(o, d):
        r = Ray(o, d, jnp.zeros(n), jnp.full((n,), jnp.inf), jnp.zeros(n))
        return li_path(scene, r, pixel, sidx, max_depth=DEPTH, seed=0)

    # --- hot-path ray-cast throughput (the headline) ---
    t, prim = tpass(ray.o, ray.d)
    t.block_until_ready()
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        t, prim = tpass(ray.o, ray.d)
    t.block_until_ready()
    cast_dt = (time.perf_counter() - t0) / iters
    cast_rays_per_s = n / cast_dt

    # --- shadow-ray (any-hit early-out) throughput: rays from the
    # primary hit points toward a light — the estimate_direct workload
    hit_p = ray.o + jnp.where(jnp.isfinite(t), t, 0.0)[:, None] * ray.d
    lpos = jnp.asarray([0.0, 6.0, 0.0])
    sd = lpos[None, :] - hit_p
    sdist = jnp.sqrt(jnp.sum(sd * sd, -1))
    sdir = sd / jnp.maximum(sdist, 1e-9)[:, None]
    s_tmax = jnp.where(prim >= 0, sdist * 0.999, -1.0)

    @jax.jit
    def shadow(o, d, tmax):
        r = Ray(o + d * 1e-3, d, jnp.zeros(n), tmax, jnp.zeros(n))
        return scene.accel._t_pass(r, any_hit=True, coherent=True)[1] >= 0

    occ = shadow(hit_p, sdir, s_tmax)
    occ.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        occ = shadow(hit_p, sdir, s_tmax)
    occ.block_until_ready()
    shadow_dt = (time.perf_counter() - t0) / iters

    # --- incoherent-ray throughput: scrambled origins/directions (the
    # worst case for the packet sort/cull; honest secondary-bounce cost)
    import numpy as _np

    rng = _np.random.RandomState(0)
    lo = _np.asarray(scene.world_lo)
    hi = _np.asarray(scene.world_hi)
    io_ = jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(_np.float32))
    dirs = rng.normal(size=(n, 3)).astype(_np.float32)
    dirs /= _np.linalg.norm(dirs, axis=-1, keepdims=True)
    id_ = jnp.asarray(dirs)

    @jax.jit
    def tpass_inc(o, d):
        # no coherent hint: the per-ray slab cull path secondary
        # bounces take
        r = Ray(o, d, jnp.zeros(n), jnp.full((n,), jnp.inf), jnp.zeros(n))
        return scene.accel._t_pass(r)

    ti, pi_ = tpass_inc(io_, id_)
    ti.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        ti, pi_ = tpass_inc(io_, id_)
    ti.block_until_ready()
    incoh_dt = (time.perf_counter() - t0) / iters

    # --- full render throughput (path tracer, depth 5) ---
    out = forward(ray.o, ray.d)
    out.block_until_ready()
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(ray.o, ray.d)
    out.block_until_ready()
    path_dt = (time.perf_counter() - t0) / iters
    cam_rays_per_s = n / path_dt

    print(json.dumps({
        "metric": "bvh_ray_casts_per_s",
        "value": round(cast_rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(cast_rays_per_s / BASELINE_RAYS_PER_S, 3),
        "extra": {
            "scene_tris": int(scene.geom.n_tris),
            "resolution": RES,
            "path_depth": DEPTH,
            "path_cam_rays_per_s": round(cam_rays_per_s, 1),
            "tpass_ms": round(cast_dt * 1e3, 1),
            "render_ms": round(path_dt * 1e3, 1),
            "hit_frac": round(float((prim >= 0).mean()), 4),
            "shadow_rays_per_s": round(n / shadow_dt, 1),
            "incoherent_rays_per_s": round(n / incoh_dt, 1),
        },
    }))


if __name__ == "__main__":
    main()
