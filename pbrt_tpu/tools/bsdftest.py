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
    specular_only = {"mirror", "glass"}
    ok = True

    def est_bsdf(lobes, wo):
        """Strategy 1: BSDF importance sampling (the only strategy that
        can hit delta lobes)."""
        bs = bsdf_sample(lobes, frame, wo,
                         iu(lane, zero, 0, 0), iu(lane, zero, 0, 1),
                         iu(lane, zero, 0, 2), iu(lane, zero, 0, 3))
        cos_i = jnp.abs(bs.wi[..., 2])
        est = jnp.where(
            (bs.pdf > 1e-9)[:, None] & bs.valid[:, None],
            bs.f * (cos_i / jnp.maximum(bs.pdf, 1e-9))[:, None], 0.0)
        return float(spec.y(jnp.mean(est, 0)))

    def est_uniform(lobes, wo):
        """Strategy 2: uniform-hemisphere sampling, pdf = 1/2pi."""
        u1 = iu(lane, zero, 1, 0)
        u2 = iu(lane, zero, 1, 1)
        cz = u1
        sz = jnp.sqrt(jnp.maximum(0.0, 1.0 - cz * cz))
        ph = 2.0 * jnp.pi * u2
        wi = jnp.stack([sz * jnp.cos(ph), sz * jnp.sin(ph), cz], -1)
        f = bsdf_f(lobes, frame, wo, wi)
        est = f * (cz * 2.0 * jnp.pi)[:, None]
        return float(spec.y(jnp.mean(est, 0)))

    def est_cosine(lobes, wo):
        """Strategy 3: cosine-hemisphere sampling, pdf = cos/pi."""
        from pbrt_tpu.core.sampling import cosine_sample_hemisphere

        wi = cosine_sample_hemisphere(iu(lane, zero, 2, 0),
                                      iu(lane, zero, 2, 1))
        f = bsdf_f(lobes, frame, wo, wi)
        est = f * jnp.pi
        return float(spec.y(jnp.mean(est, 0)))

    # BSDFs x sampling strategies (reference tools/bsdftest.cpp:52-110
    # crosses its BSDF inventory with the sampling-strategy inventory;
    # every strategy must estimate the same rho for sampleable lobes)
    print(f"{'bsdf':10s} {'rough':>6s} {'wo':>5s}  "
          f"{'rho[bsdf]':>9s} {'rho[unif]':>9s} {'rho[cos]':>9s}")
    for kind, rough in cases:
        p = make_params(kind, rough)
        lobes = material_lobes(p)
        for ang in wo_angles:
            th = np.deg2rad(ang)
            wo = jnp.broadcast_to(
                jnp.asarray([np.sin(th), 0.0, np.cos(th)], jnp.float32), (n, 3))
            r_b = est_bsdf(lobes, wo)
            if kind in specular_only:
                print(f"{kind:10s} {rough:>6g} {ang:4.0f}d  {r_b:9.4f} "
                      f"{'(delta)':>9s} {'(delta)':>9s}"
                      + ("  [ENERGY VIOLATION]" if r_b >= 1.05 else ""))
                ok = ok and r_b < 1.05
                continue
            r_u = est_uniform(lobes, wo)
            r_c = est_cosine(lobes, wo)
            # 8%: the cosine estimator of microfacet terms is noisy at
            # grazing wo (1/max(cos) spikes when wh nears the horizon)
            agree = (abs(r_u - r_b) < 0.08 * max(r_b, 0.05)
                     and abs(r_c - r_b) < 0.08 * max(r_b, 0.05))
            bad = r_b >= 1.05 or not agree
            tag = ("ENERGY VIOLATION" if r_b >= 1.05
                   else ("STRATEGY MISMATCH" if not agree else "ok"))
            if bad:
                ok = False
            print(f"{kind:10s} {rough:>6g} {ang:4.0f}d  {r_b:9.4f} "
                  f"{r_u:9.4f} {r_c:9.4f}  [{tag}]")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(bsdftest())
