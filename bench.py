"""Benchmark: wavefront path-tracer throughput on the dispersion scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline
compares against a fixed anchor throughput recorded for the CPU
reference workload class (rays/s on the glass-sphere dispersion
scene at the bench batch size); >1.0 means faster.
"""
from __future__ import annotations

import json
import time

import numpy as np


# Anchor: the single-host CPU reference renders O(1e5-1e6) camera rays/s
# on scenes of this complexity (pbrt-v2 class renderer, 8 threads).
BASELINE_RAYS_PER_S = 1.0e6


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_scene, _camera_rays
    from pbrt_tpu.core.geometry import Ray
    from pbrt_tpu.integrators.surface import li_path

    scene = _tiny_scene()
    n = 1 << 16

    ray = _camera_rays(n)
    pixel = jnp.arange(n, dtype=jnp.int32)
    sidx = jnp.zeros(n, jnp.int32)

    @jax.jit
    def forward(o, d):
        r = Ray(o, d, jnp.zeros(n), jnp.full((n,), jnp.inf), jnp.zeros(n))
        return li_path(scene, r, pixel, sidx, max_depth=5, seed=0)

    out = forward(ray.o, ray.d)
    out.block_until_ready()  # compile
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(ray.o, ray.d)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    rays_per_s = n * iters / dt
    print(json.dumps({
        "metric": "path_trace_rays_per_s",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
