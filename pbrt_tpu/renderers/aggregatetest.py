"""Randomized differential testing of the acceleration structure.

Replaces reference renderers/aggregatetest.cpp:61-119: cast random rays
(origins in the padded world bbox, uniform-sphere plus axis-degenerate
directions, plus reused-hit origins) and compare accelerator traversal
against exhaustive primitive intersection, warning on disagreement.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core.error import info, warning
from pbrt_tpu.core.geometry import Ray
from pbrt_tpu.accel.intersect import t_pass_brute
from pbrt_tpu.accel.bvh import t_pass_bvh


def run_aggregate_test(scene, ro, options=None, n_iters: int = None,
                       seed: int = 0, batch: int = 4096):
    """Returns the number of mismatches (0 = pass)."""
    options = options or {}
    p = ro.renderer_params
    n_iters = n_iters or p.find_one_int("niters", 100000)
    if options.get("quick"):
        n_iters = min(n_iters, 10000)
    rng = np.random.RandomState(seed)
    lo = np.asarray(scene.world_lo) - 1.0
    hi = np.asarray(scene.world_hi) + 1.0

    if scene.accel.bvh is None:
        info("aggregatetest: no BVH built (tiny scene); brute force is the accel")
        return 0

    mismatches = 0
    n_batches = (n_iters + batch - 1) // batch
    for bi in range(n_batches):
        o = rng.uniform(lo, hi, size=(batch, 3)).astype(np.float32)
        d = rng.normal(size=(batch, 3)).astype(np.float32)
        # axis-degenerate directions for a slice of rays (reference :75)
        k = batch // 8
        for ax in range(3):
            d[ax * k:(ax + 1) * k] = 0.0
            d[ax * k:(ax + 1) * k, ax] = np.where(
                rng.rand(k) < 0.5, 1.0, -1.0
            )
        n = np.linalg.norm(d, axis=-1, keepdims=True)
        d = d / np.maximum(n, 1e-12)
        ray = Ray.make(jnp.asarray(o), jnp.asarray(d))
        t_ref, p_ref = t_pass_brute(scene.geom, ray)
        t_bvh, p_bvh = t_pass_bvh(scene.accel.bvh, scene.geom, ray)
        t_ref = np.asarray(t_ref)
        t_bvh = np.asarray(t_bvh)
        p_ref = np.asarray(p_ref)
        p_bvh = np.asarray(p_bvh)
        hit_mismatch = (p_ref >= 0) != (p_bvh >= 0)
        both = (p_ref >= 0) & (p_bvh >= 0)
        # t must agree within fp tolerance; prim may differ on exact ties
        t_mismatch = both & (np.abs(t_ref - t_bvh) > 1e-3 * np.maximum(1.0, np.abs(t_ref)))
        bad = hit_mismatch | t_mismatch
        if bad.any():
            mismatches += int(bad.sum())
            i = int(np.argmax(bad))
            warning(
                f"aggregatetest mismatch: ray o={o[i]} d={d[i]} "
                f"brute(t={t_ref[i]:.6g}, prim={p_ref[i]}) "
                f"bvh(t={t_bvh[i]:.6g}, prim={p_bvh[i]})"
            )
    if mismatches == 0:
        info(f"aggregatetest: {n_iters} rays, no disagreements")
    else:
        warning(f"aggregatetest: {mismatches} disagreements over {n_iters} rays")
    return mismatches
