"""Pallas TPU kernel: blocked ray-triangle intersection (t-pass).

The hottest loop of the renderer (reference accelerators/bvh.cpp
:585-687 + shapes/trianglemesh.cpp Moller-Trumbore) as a TPU kernel:

  grid = (ray_tiles, tri_blocks); each program computes the [TR, TB]
  candidate-t matrix for one ray tile against one triangle block on the
  VPU (rays on sublanes, triangles on lanes), reduces it to the
  per-ray block minimum, and folds it into the running (t, prim)
  accumulator for that ray tile. Triangle data is laid out [9, T]
  (component-major) so a block row lands on the lane dimension with no
  relayout; rays are [R, 8] component-minor (tiny loads, big compute).

The kernel is used by BvhScene for scenes below the BVH threshold and
by the BVH leaf sweep when leaves are widened; the pure-jnp
t_pass_brute remains the portable fallback (CPU tests, interpret mode).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

BIG = 1e30
TR = 1024  # rays per tile (outputs reshape to (8, 128) sublane x lane)
TB = 256   # triangles per block (lane dimension, multiple of 128)


def _round_up(n, m):
    return (n + m - 1) // m * m


def _tri_kernel(ray_ref, tri_ref, tbest_ref, pbest_ref):
    """One (ray tile, tri block) step; folds block minimum into the
    running accumulator (grid dim 1 iterates tri blocks serially)."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        tbest_ref[:] = jnp.full_like(tbest_ref, BIG)
        pbest_ref[:] = jnp.full_like(pbest_ref, -1)

    rays = ray_ref[:]            # [TR, 8]
    tris = tri_ref[:]            # [9, TB]
    ox = rays[:, 0:1]
    oy = rays[:, 1:2]
    oz = rays[:, 2:3]
    dx = rays[:, 3:4]
    dy = rays[:, 4:5]
    dz = rays[:, 5:6]
    tmin = rays[:, 6:7]
    tmax = rays[:, 7:8]
    v0x, v0y, v0z = tris[0:1, :], tris[1:2, :], tris[2:3, :]
    e1x, e1y, e1z = tris[3:4, :], tris[4:5, :], tris[5:6, :]
    e2x, e2y, e2z = tris[6:7, :], tris[7:8, :], tris[8:9, :]

    # Moller-Trumbore on the [TR, TB] outer product
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvx = ox - v0x
    tvy = oy - v0y
    tvz = oz - v0z
    b1 = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    b2 = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    valid = (
        (jnp.abs(det) > 1e-12)
        & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
        & (t > tmin) & (t < tmax)
    )
    t = jnp.where(valid, t, BIG)
    t_blk = jnp.min(t, axis=1).reshape(1, 8, TR // 8)
    idx_blk = jnp.argmin(t, axis=1).astype(jnp.int32).reshape(1, 8, TR // 8)
    prim_blk = j * TB + idx_blk
    better = t_blk < tbest_ref[:]
    tbest_ref[:] = jnp.where(better, t_blk, tbest_ref[:])
    pbest_ref[:] = jnp.where(better, prim_blk, pbest_ref[:])


@functools.partial(jax.jit, static_argnames=("n_tris",))
def _tri_t_pass(rays8, tris9, n_tris: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = rays8.shape[0]
    T = tris9.shape[1]
    grid = (R // TR, T // TB)
    return pl.pallas_call(
        _tri_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, TB), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, TR // 8), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TR // 8), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R // TR, 8, TR // 8), jnp.float32),
            jax.ShapeDtypeStruct((R // TR, 8, TR // 8), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(rays8, tris9)


class TriSoA:
    """Host-prepared component-major triangle table for the kernel."""

    def __init__(self, tri_v0, tri_e1, tri_e2):
        v0 = np.asarray(tri_v0)
        e1 = np.asarray(tri_e1)
        e2 = np.asarray(tri_e2)
        self.n = len(v0)
        Tpad = max(TB, _round_up(self.n, TB))
        data = np.zeros((9, Tpad), np.float32)
        if self.n:
            data[0:3, : self.n] = v0.T
            data[3:6, : self.n] = e1.T
            data[6:9, : self.n] = e2.T
        # padded lanes: degenerate (all-zero) triangles never hit
        self.tris9 = jnp.asarray(data)


def tri_t_pass_pallas(soa: TriSoA, ray_o, ray_d, tmin, tmax):
    """[R] rays vs all triangles -> (t, prim) with prim = -1 on miss.
    Pads the ray batch to a TR multiple."""
    R = ray_o.shape[0]
    Rpad = max(TR, _round_up(R, TR))
    rays8 = jnp.zeros((Rpad, 8), jnp.float32)
    rays8 = rays8.at[:R, 0:3].set(ray_o)
    rays8 = rays8.at[:R, 3:6].set(ray_d)
    rays8 = rays8.at[:R, 6].set(tmin)
    rays8 = rays8.at[:R, 7].set(jnp.where(jnp.isfinite(tmax), tmax, BIG))
    t, prim = _tri_t_pass(rays8, soa.tris9, soa.n)
    t = t.reshape(-1)[:R]
    prim = prim.reshape(-1)[:R]
    miss = (prim < 0) | (prim >= soa.n) | (t >= BIG)
    return jnp.where(miss, BIG, t), jnp.where(miss, -1, prim)


def pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
