"""createprobes renderer: SH radiance probes on a regular grid.

Replaces reference renderers/createprobes.cpp (:79-352): at each probe
cell, shoot rays over the sphere, evaluate path radiance, project into
SH, and write the probe file consumed by the useprobes integrator. The
per-probe task fan-out becomes one wavefront over (probes x dirs).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import sh as shm
from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.core.error import info
from pbrt_tpu.core.geometry import Ray


def render_create_probes(scene, ro, options=None):
    options = options or {}
    p = ro.renderer_params
    lmax = p.find_one_int("lmax", 4)
    nindir = p.find_one_int("indirectsamples", 512)
    fn = p.find_one_string("filename", "probes.npz")
    nprobes = p.find_int("nprobes")
    dims = (3, 3, 3)
    if nprobes is not None and len(nprobes) == 3:
        dims = (int(nprobes[0]), int(nprobes[1]), int(nprobes[2]))
    p.report_unused('in renderer "createprobes"')
    if options.get("quick"):
        nindir = min(nindir, 64)

    lo = np.asarray(scene.world_lo, np.float64)
    hi = np.asarray(scene.world_hi, np.float64)
    nx, ny, nz = dims
    xs = lo[0] + (np.arange(nx) + 0.5) / nx * (hi[0] - lo[0])
    ys = lo[1] + (np.arange(ny) + 0.5) / ny * (hi[1] - lo[1])
    zs = lo[2] + (np.arange(nz) + 0.5) / nz * (hi[2] - lo[2])
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    centers = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)  # [P,3]
    P = len(centers)
    T = shm.sh_terms(lmax)

    from pbrt_tpu.integrators.surface import li_path

    # quadrature dirs (shared across probes)
    n_th = max(4, int(np.sqrt(nindir / 2)))
    dirs, w = shm.sphere_quadrature(n_th, 2 * n_th)
    D = dirs.shape[0]
    coeffs = np.zeros((P, T, spec.N_BINS), np.float32)
    import jax

    @jax.jit
    def probe_batch(origins):
        o = jnp.repeat(origins, D, 0)
        d = jnp.tile(dirs, (origins.shape[0], 1))
        ray = Ray(o, d, jnp.zeros(o.shape[0]), jnp.full((o.shape[0],), 1e30),
                  jnp.zeros(o.shape[0]))
        pixel = jnp.arange(o.shape[0], dtype=jnp.int32)
        sidx = jnp.zeros(o.shape[0], jnp.int32)
        L = li_path(scene, ray, pixel, sidx, max_depth=2,
                    seed=int(options.get("seed", 0)))
        Y = shm.sh_evaluate(d, lmax)
        c = jnp.einsum("nt,ns,n->nts", Y, L, jnp.tile(w, (origins.shape[0],)))
        return c.reshape(origins.shape[0], D, T, spec.N_BINS).sum(1)

    B = max(1, 4096 // D)
    for i in range(0, P, B):
        batch = jnp.asarray(centers[i: i + B])
        coeffs[i: i + B] = np.asarray(probe_batch(batch))
    np.savez(fn, lo=lo.astype(np.float32), hi=hi.astype(np.float32),
             dims=np.asarray(dims, np.int32), lmax=lmax,
             coeffs=coeffs.reshape(nx, ny, nz, T, spec.N_BINS).transpose(2, 1, 0, 3, 4))
    info(f"Wrote {P} SH probes (lmax={lmax}) to {fn}")
    return {"probes": P, "file": fn}


def load_probes(fn: str):
    from pbrt_tpu.integrators.extra import ProbeGrid

    z = np.load(fn)
    dims = tuple(int(x) for x in z["dims"])
    return ProbeGrid(
        lo=jnp.asarray(z["lo"]), hi=jnp.asarray(z["hi"]), dims=dims,
        coeffs=jnp.asarray(z["coeffs"]), lmax=int(z["lmax"]),
    )
