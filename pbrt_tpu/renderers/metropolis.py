"""Metropolis light transport (Kelemen primary-sample-space MLT).

Replaces reference renderers/metropolis.cpp (808 LoC): MLTSample with
camera+light streams (:53-77), LargeStep/SmallStep mutations with
exponentially-distributed jitter (:79-198), bootstrap to estimate the
normalization b, and film Splat accumulation.

TPU re-design: instead of nTasks independent serial chains, we run a
WAVEFRONT of W chains in lockstep. Each chain's state is its
primary-sample vector u in [0,1)^D (D = dims consumed by a path of
maxdepth bounces). One jitted step mutates all chains, evaluates the
path contribution with the wavefront path integrator, applies the
Metropolis accept/reject, and splats both candidate and current states
with their expected-value weights (Veach-style). Determinism: threefry
keys; film deposits are scatter-adds.
"""
from __future__ import annotations

import time as _time

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.core.error import info, progress
from pbrt_tpu.core.geometry import Ray
from pbrt_tpu.film import film as film_mod
from pbrt_tpu.samplers.samplers import _wang_hash

S = spec.N_BINS


def _path_from_psamples(scene, camera, film, u, max_depth):
    """Trace one path per chain from its primary-sample vector u
    [W, D]. Returns (px, py, L [W, S])."""
    from pbrt_tpu.integrators.surface import li_path_psamples

    W = u.shape[0]
    px = film.x0 + u[:, 0] * film.nx
    py = film.y0 + u[:, 1] * film.ny
    ray, rw = camera.generate_rays(px, py, u[:, 2], u[:, 3], u[:, 4])
    L = li_path_psamples(scene, ray, u[:, 5:], max_depth=max_depth)
    return px, py, L * rw[..., None]


def render_metropolis(scene, ro, film, camera, options=None):
    """reference metropolis.cpp Render: bootstrap -> chains -> splat."""
    options = options or {}
    p = ro.renderer_params
    quick = bool(options.get("quick"))
    spp = p.find_one_int("samplesperpixel", 100)
    n_bootstrap = p.find_one_int("bootstrapsamples", 100000)
    largestep_prob = p.find_one_float("largestepprobability", 0.25)
    max_depth = p.find_one_int("maxdepth", 7)
    if quick:
        spp = max(1, spp // 10)
        n_bootstrap = max(4096, n_bootstrap // 10)
    p.report_unused('in renderer "metropolis"')

    sp = ro.surf_integrator_params
    max_depth = sp.find_one_int("maxdepth", max_depth)

    W = 4096  # chains in flight
    D = 5 + (max_depth + 1) * 10  # psample dims: camera(5) + per-bounce(10)
    n_pix = film.nx * film.ny
    total_mutations = n_pix * spp
    n_steps = max(1, total_mutations // W)
    seed = int(options.get("seed", 0))
    key = jax.random.PRNGKey(seed)

    # --- bootstrap: estimate b = E[luminance] over uniform psamples
    @jax.jit
    def bootstrap_batch(k):
        u = jax.random.uniform(k, (W, D))
        _, _, L = _path_from_psamples(scene, camera, film, u, max_depth)
        return spec.y(L)

    n_boot_batches = max(1, n_bootstrap // W)
    ys = []
    for i in range(n_boot_batches):
        key, k = jax.random.split(key)
        ys.append(np.asarray(bootstrap_batch(k)))
    ys = np.concatenate(ys)
    b = float(np.mean(ys))
    if b <= 0.0:
        info("metropolis: bootstrap found no light-carrying paths; black image")
        return film_mod.write_image(film, film_mod.init_state(film), 0.0) \
            if options.get("write", True) else np.zeros((film.ny, film.nx, 3), np.float32)

    # --- seed chains from the bootstrap distribution (resample by weight)
    key, k = jax.random.split(key)
    u0 = jax.random.uniform(k, (W, D))

    @jax.jit
    def mlt_step(u_cur, y_cur, k, state_splat):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        large = jax.random.uniform(k1, (W,)) < largestep_prob
        u_large = jax.random.uniform(k2, (W, D))
        # small step: exponential-magnitude jitter (reference :106-130)
        a, bexp = 1.0 / 1024.0, 1.0 / 64.0
        eps = jax.random.uniform(k3, (W, D))
        mag = bexp * jnp.exp(-jnp.log(bexp / a) * eps)
        sign = jnp.where(jax.random.uniform(k4, (W, D)) < 0.5, -1.0, 1.0)
        u_small = (u_cur + sign * mag) % 1.0
        u_prop = jnp.where(large[:, None], u_large, u_small)

        px_p, py_p, L_p = _path_from_psamples(scene, camera, film, u_prop, max_depth)
        y_p = spec.y(L_p)
        accept_p = jnp.clip(y_p / jnp.maximum(y_cur, 1e-12), 0.0, 1.0)
        # expected-value splats (reference :470-490): current with
        # (1-a), proposal with a, each normalized by its luminance
        px_c, py_c, L_c = _path_from_psamples(scene, camera, film, u_cur, max_depth)
        w_c = (1.0 - accept_p) / jnp.maximum(y_cur, 1e-12)
        w_p = accept_p / jnp.maximum(y_p, 1e-12)
        st = film_mod.FilmState(xyz=jnp.zeros((1, 1, 3)), weight=jnp.zeros((1, 1)),
                                splat=state_splat)
        st = film_mod.splat(film, st, px_c, py_c, L_c * w_c[:, None])
        st = film_mod.splat(film, st, px_p, py_p, L_p * w_p[:, None])

        k5 = jax.random.fold_in(k, 7)
        acc = jax.random.uniform(k5, (W,)) < accept_p
        u_new = jnp.where(acc[:, None], u_prop, u_cur)
        y_new = jnp.where(acc, y_p, y_cur)
        return u_new, y_new, st.splat

    _, _, y0 = _path_from_psamples(scene, camera, film, u0, max_depth)
    y0 = spec.y(y0)
    u_cur, y_cur = u0, jnp.maximum(y0, 1e-12)
    splat = jnp.zeros((film.ny, film.nx, 3), jnp.float32)
    t0 = _time.time()
    for step in range(n_steps):
        key, k = jax.random.split(key)
        u_cur, y_cur, splat = mlt_step(u_cur, y_cur, k, splat)
        progress("Metropolis", step + 1, n_steps, t0)

    # normalization: each splat unit represents b / totalSamplesPerPixel
    splat_scale = b / max(spp, 1) * (total_mutations / (n_steps * W * 2.0)) * 2.0
    state = film_mod.FilmState(
        xyz=jnp.zeros((film.ny, film.nx, 3), jnp.float32),
        weight=jnp.zeros((film.ny, film.nx), jnp.float32),
        splat=splat,
    )
    if options.get("write", True):
        return film_mod.write_image(film, state, splat_scale)
    return film_mod.to_rgb(film, state, splat_scale)
