"""Mesh-heavy benchmark scene builder (shared by bench.py and tests).

Builds the scene the round-3 bench measures: a finely tessellated UV
sphere (>=100k triangles) over a two-triangle ground plane, one point
light, matte + mirror materials — the workload class of the reference's
mesh scenes (SURVEY.md section 6) at real scale, so the benched path is
the BVH/Pallas traversal, not the quadric fallback.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def uv_sphere(n_theta: int, n_phi: int, radius=1.0, center=(0.0, 0.0, 0.0)):
    """-> (P [V,3] float32, indices [T*3] int32) with 2*n_theta*n_phi tris."""
    th = np.linspace(0.0, np.pi, n_theta + 1)
    ph = np.linspace(0.0, 2.0 * np.pi, n_phi + 1)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    x = np.sin(tt) * np.cos(pp)
    y = np.cos(tt)
    z = np.sin(tt) * np.sin(pp)
    P = np.stack([x, y, z], -1).reshape(-1, 3) * radius + np.asarray(center)
    idx = []
    W = n_phi + 1
    for i in range(n_theta):
        for j in range(n_phi):
            a = i * W + j
            b = a + 1
            c = a + W
            d = c + 1
            idx.append((a, c, b))
            idx.append((b, c, d))
    return P.astype(np.float32), np.asarray(idx, np.int32).reshape(-1)


def make_bench_scene(n_theta: int = 260, n_phi: int = 260):
    """Compiled scene: ~2*n_theta*n_phi sphere tris + 2 floor tris."""
    from pbrt_tpu.scene import api
    from pbrt_tpu.scene.paramset import ParamSet
    from pbrt_tpu.scene.compile import compile_scene

    api._state.__init__()
    api.pbrt_init({"quiet": True})
    api.pbrt_look_at([0, 1.2, -4], [0, 0.4, 0], [0, 1, 0])
    cam = ParamSet()
    cam.add("float", "fov", [45.0])
    api.pbrt_camera("perspective", cam)
    api.pbrt_world_begin()

    lp = ParamSet()
    lp.add("point", "from", [3.0, 6.0, -4.0])
    lp.add("rgb", "I", [60.0, 60.0, 60.0])
    api.pbrt_light_source("point", lp)

    mp = ParamSet()
    mp.add("rgb", "Kd", [0.45, 0.35, 0.65])
    api.pbrt_material("matte", mp)
    P, vi = uv_sphere(n_theta, n_phi, radius=1.0, center=(0.0, 0.4, 0.0))
    sp = ParamSet()
    sp.add("point", "P", P.reshape(-1).tolist())
    sp.add("integer", "indices", vi.tolist())
    api.pbrt_shape("trianglemesh", sp)

    m2 = ParamSet()
    m2.add("rgb", "Kd", [0.55, 0.55, 0.5])
    api.pbrt_material("matte", m2)
    fp = ParamSet()
    s = 12.0
    fP = np.array([[-s, -0.6, -s], [s, -0.6, -s], [s, -0.6, s], [-s, -0.6, s]],
                  np.float32)
    fp.add("point", "P", fP.reshape(-1).tolist())
    fp.add("integer", "indices", [0, 2, 1, 0, 3, 2])
    api.pbrt_shape("trianglemesh", fp)

    ro = api.get_state().render_options
    scene = compile_scene(ro)
    api._state.__init__()
    return scene


def camera_rays(res: int):
    """[res*res] primary rays through the bench camera (z-forward grid)."""
    import jax.numpy as jnp
    from pbrt_tpu.core.geometry import Ray

    xs = np.linspace(-0.55, 0.55, res, dtype=np.float32)
    gx, gy = np.meshgrid(xs, xs[::-1], indexing="xy")
    d = np.stack([gx.ravel(), gy.ravel() + 0.18, np.ones(res * res, np.float32)],
                 -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile(np.array([[0.0, 1.2, -4.0]], np.float32), (res * res, 1))
    return Ray.make(jnp.asarray(o), jnp.asarray(d))


if __name__ == "__main__":
    import time
    import jax

    scene = make_bench_scene()
    geom = scene.geom
    print("tris:", geom.n_tris, "quads:", geom.n_quads,
          "accel:", type(scene.accel).__name__,
          "bvh:", None if getattr(scene.accel, "bvh", None) is None
          else scene.accel.bvh.n_nodes)

    res = 1024
    ray = camera_rays(res)

    import jax.numpy as jnp

    @jax.jit
    def tpass(o, d):
        from pbrt_tpu.core.geometry import Ray as R
        r = R(o, d, jnp.zeros(o.shape[0]), jnp.full((o.shape[0],), jnp.inf),
              jnp.zeros(o.shape[0]))
        return scene.accel._t_pass(r)

    t0 = time.perf_counter()
    t, prim = tpass(ray.o, ray.d)
    t.block_until_ready()
    print(f"compile+run: {time.perf_counter()-t0:.2f}s; hit frac:",
          float((prim >= 0).mean()))
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        t, prim = tpass(ray.o, ray.d)
    t.block_until_ready()
    dt = time.perf_counter() - t0
    n = res * res
    print(f"t-pass: {n*iters/dt/1e6:.2f} M rays/s  ({dt/iters*1e3:.1f} ms/pass)")


def _wide_timing():
    import time
    import jax
    import jax.numpy as jnp
    from pbrt_tpu.accel.wide_bvh import build_wide_bvh
    from pbrt_tpu.ops.bvh_pallas import wide_t_pass

    scene = make_bench_scene()
    accel = scene.accel
    wb = accel.wide
    print("blocks:", wb.n_blocks)
    res = 1024
    ray = camera_rays(res)
    n = res * res
    tmin = jnp.zeros(n)
    tmax = jnp.full((n,), jnp.inf)

    f = jax.jit(lambda o, d: wide_t_pass(wb, o, d, tmin, tmax))
    t0 = time.perf_counter()
    t, prim = f(ray.o, ray.d)
    t.block_until_ready()
    print(f"compile+run: {time.perf_counter()-t0:.2f}s; hit frac:",
          float((prim >= 0).mean()))
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        t, prim = f(ray.o, ray.d)
    t.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"wide t-pass: {n*iters/dt/1e6:.2f} M rays/s ({dt/iters*1e3:.1f} ms)")

    # incoherent ray benchmark (bounce-ray proxy)
    import numpy as np
    rng = np.random.RandomState(0)
    o2 = jnp.asarray(rng.rand(n, 3).astype(np.float32) * 6 - 3)
    d2 = rng.randn(n, 3).astype(np.float32)
    d2 = jnp.asarray(d2 / np.linalg.norm(d2, axis=-1, keepdims=True))
    t, prim = f(o2, d2)
    t.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        t, prim = f(o2, d2)
    t.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"wide t-pass (incoherent): {n*iters/dt/1e6:.2f} M rays/s "
          f"({dt/iters*1e3:.1f} ms)")
