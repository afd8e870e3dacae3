import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "scripts")
import time
import numpy as np
import jax
import jax.numpy as jnp
import bench_scene

scene = bench_scene.make_bench_scene()
print("accel wide:", scene.accel.wide is not None)
from pbrt_tpu.integrators.surface import li_path
from pbrt_tpu.core.geometry import Ray

res = 1024
n = res * res
ray = bench_scene.camera_rays(res)
pixel = jnp.arange(n, dtype=jnp.int32)
sidx = jnp.zeros(n, jnp.int32)
MAXD = 5

@jax.jit
def forward(o, d):
    r = Ray(o, d, jnp.zeros(n), jnp.full((n,), jnp.inf), jnp.zeros(n))
    return li_path(scene, r, pixel, sidx, max_depth=MAXD, seed=0)

t0 = time.perf_counter()
out = forward(ray.o, ray.d)
out.block_until_ready()
print(f"compile+run: {time.perf_counter()-t0:.1f}s")
iters = 3
t0 = time.perf_counter()
for _ in range(iters):
    out = forward(ray.o, ray.d)
out.block_until_ready()
dt = (time.perf_counter() - t0) / iters
# ray casts: intersect + shadow per depth iteration
casts = n * MAXD * 2
print(f"li_path d{MAXD}: {dt*1e3:.0f} ms -> {n/dt/1e6:.2f} M cam-rays/s, "
      f"{casts/dt/1e6:.2f} M casts/s")
