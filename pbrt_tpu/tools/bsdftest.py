"""bsdftest: Monte Carlo white-furnace estimates for the BSDF set.

Replaces reference tools/bsdftest.cpp:52-110: estimate outgoing
radiance under a uniform unit environment for a matrix of BSDFs x
sampling strategies; under white furnace conditions the estimate must
equal the hemispherical reflectance (<= 1, == albedo for ideal lobes).
"""
from __future__ import annotations

import sys

import numpy as np


def bsdftest(argv=None) -> int:
    import jax.numpy as jnp

    from pbrt_tpu.core import spectrum as spec
    from pbrt_tpu.materials.bsdf import (
        BsdfParams,
        Frame,
        bsdf_f,
        bsdf_pdf,
        bsdf_sample,
        material_lobes,
    )
    from pbrt_tpu.materials.registry import KIND_ID
    from pbrt_tpu.samplers.samplers import integrator_uniform as iu

    argv = list(sys.argv[1:] if argv is None else argv)
    n = int(argv[0]) if argv else 1 << 14
    S = spec.N_BINS

    def make_params(kind, rough=0.1, kd=0.5, ks=0.5):
        p = BsdfParams.none(n)
        kset = jnp.full((n,), KIND_ID[kind], jnp.int32)
        full = lambda v: jnp.full((n, S), v, jnp.float32)
        return p._replace(
            kind=kset, kd=full(kd), ks=full(ks), kr=full(ks), kt=full(ks),
            rough_u=jnp.full((n,), rough), rough_v=jnp.full((n,), rough),
            eta=jnp.full((n,), 1.5),
        )

    wo_angles = [10.0, 45.0, 80.0]
    cases = [("matte", 0.0), ("plastic", 0.1), ("plastic", 0.01),
             ("substrate", 0.1), ("mirror", 0.0), ("glass", 0.0)]
    frame = Frame(
        ss=jnp.broadcast_to(jnp.asarray([1.0, 0, 0]), (n, 3)),
        ts=jnp.broadcast_to(jnp.asarray([0, 1.0, 0]), (n, 3)),
        ns=jnp.broadcast_to(jnp.asarray([0, 0, 1.0]), (n, 3)),
        ng=jnp.broadcast_to(jnp.asarray([0, 0, 1.0]), (n, 3)),
    )
    lane = jnp.arange(n, dtype=jnp.int32)
    zero = jnp.zeros((n,), jnp.int32)
    ok = True
    for kind, rough in cases:
        p = make_params(kind, rough)
        lobes = material_lobes(p)
        for ang in wo_angles:
            th = np.deg2rad(ang)
            wo = jnp.broadcast_to(
                jnp.asarray([np.sin(th), 0.0, np.cos(th)], jnp.float32), (n, 3))
            # BSDF-sampling estimator of rho(wo) under unit environment
            bs = bsdf_sample(lobes, frame, wo,
                             iu(lane, zero, 0, 0), iu(lane, zero, 0, 1),
                             iu(lane, zero, 0, 2), iu(lane, zero, 0, 3))
            cos_i = jnp.abs(bs.wi[..., 2])
            est = jnp.where(
                (bs.pdf > 1e-9)[:, None] & bs.valid[:, None],
                bs.f * (cos_i / jnp.maximum(bs.pdf, 1e-9))[:, None], 0.0)
            rho = float(spec.y(jnp.mean(est, 0)))
            status = "ok" if rho < 1.05 else "ENERGY VIOLATION"
            if rho >= 1.05:
                ok = False
            print(f"{kind:10s} rough={rough:<5g} wo={ang:4.0f}deg  "
                  f"rho = {rho:.4f}  [{status}]")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(bsdftest())
