"""Wavefront volume integrators: emission + single scattering.

Replaces reference integrators/emission.cpp:64-110 and single.cpp
:66-140. The CPU code marches each ray with a dynamic step count
ceil((t1-t0)/stepsize); under jit the trip count must be static, so we
march a fixed N_STEPS with per-ray dt = (t1-t0)/N_STEPS. N_STEPS is
chosen at scene-compile time from the volume extent / stepsize so the
expected step length matches the reference's.

The recurrence Lv = sigma_a*Lve*dt + sigma_s*Ld*dt + Tr*Lv (reference
photonvolume.cpp:215) is a linear scan — differentiable in the medium
coefficients by construction.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.core.geometry import Ray, dot, normalize
from pbrt_tpu.samplers.samplers import integrator_uniform as iu
from pbrt_tpu.scene.compile import CompiledScene
from pbrt_tpu.volumes.registry import (
    VolumeT,
    intersect_p as vol_intersect_p,
    phase,
    rainbow_reflection,
    sigma_at,
    tau as vol_tau,
)

S = spec.N_BINS
BIG = 1e30


def pick_n_steps(vol: VolumeT, step_size: float, cap: int = 128) -> int:
    """Static march count ~ volume diagonal / stepsize (clamped)."""
    diag = float(np.max(np.linalg.norm(np.asarray(vol.hi - vol.lo), axis=-1)))
    return int(np.clip(np.ceil(diag / max(step_size, 1e-6)), 4, cap))


def transmittance(vol: Optional[VolumeT], p, w, dist, n_steps: int, u):
    """Beam transmittance between p and p + w*dist (reference
    emission.cpp Transmittance -> Exp(-tau)). [N, S]."""
    if vol is None:
        return jnp.ones(p.shape[:-1] + (S,), jnp.float32)
    d = normalize(w)
    dd = jnp.where(dist >= BIG, 1e7, dist)
    hit, t0, t1 = vol_intersect_p(vol, p, d, jnp.zeros_like(dd), dd)
    t = vol_tau(vol, p, d, t0, t1, n_steps, u)
    return jnp.where(hit[..., None], jnp.exp(-t), 1.0)


class VolResult(NamedTuple):
    L: jnp.ndarray   # [N, S] in-scattered/emitted radiance
    Tr: jnp.ndarray  # [N, S] transmittance along the surface-hit span


def li_emission(vol: Optional[VolumeT], ray: Ray, t_surf, pixel, sidx,
                n_steps: int, seed: int = 0) -> VolResult:
    """Emission-only integrator (reference emission.cpp:64-110)."""
    N = ray.o.shape[0]
    ones = jnp.ones((N, S), jnp.float32)
    if vol is None:
        return VolResult(L=jnp.zeros((N, S), jnp.float32), Tr=ones)
    d = normalize(ray.d)
    scale = jnp.sqrt(jnp.maximum(jnp.sum(ray.d * ray.d, -1), 1e-20))
    t_end = jnp.where(jnp.isfinite(t_surf), t_surf * scale, 1e7)
    hit, t0, t1 = vol_intersect_p(vol, ray.o, d, jnp.zeros((N,), jnp.float32), t_end)
    dt = jnp.maximum(t1 - t0, 0.0) / n_steps
    u0 = iu(pixel, sidx, 0, 40, seed)

    def body(i, carry):
        L, tau_acc = carry
        t = t0 + (i + u0) * dt
        p = ray.o + t[..., None] * d
        sa, ss, le, _ = sigma_at(vol, p)
        tau_acc = tau_acc + (sa + ss) * dt[..., None]
        tr = jnp.exp(-tau_acc)
        L = L + tr * sa * le * dt[..., None]
        return L, tau_acc

    L, tau_acc = jax.lax.fori_loop(
        0, n_steps, body,
        (jnp.zeros((N, S), jnp.float32), jnp.zeros((N, S), jnp.float32)),
    )
    Tr = jnp.where(hit[..., None], jnp.exp(-tau_acc), ones)
    return VolResult(L=jnp.where(hit[..., None], L, 0.0), Tr=Tr)


def li_single(scene: CompiledScene, ray: Ray, t_surf, pixel, sidx,
              n_steps: int, seed: int = 0) -> VolResult:
    """Single-scattering integrator (reference single.cpp:66-140):
    march; per step accumulate emission + sigma_s * phase * Ld from one
    sampled light, attenuated by transmittance to the light."""
    from pbrt_tpu.accel.intersect import intersect_p as geom_intersect_p
    from pbrt_tpu.lights.lighting import sample_light

    vol = scene.volume
    N = ray.o.shape[0]
    ones = jnp.ones((N, S), jnp.float32)
    if vol is None:
        return VolResult(L=jnp.zeros((N, S), jnp.float32), Tr=ones)
    d = normalize(ray.d)
    scale = jnp.sqrt(jnp.maximum(jnp.sum(ray.d * ray.d, -1), 1e-20))
    t_end = jnp.where(jnp.isfinite(t_surf), t_surf * scale, 1e7)
    hit, t0, t1 = vol_intersect_p(vol, ray.o, d, jnp.zeros((N,), jnp.float32), t_end)
    dt = jnp.maximum(t1 - t0, 0.0) / n_steps
    u0 = iu(pixel, sidx, 0, 40, seed)
    n_lights = scene.n_lights

    # One compiled march body shared by every step (lax.fori_loop):
    # the body holds a light sample + shadow traversal + transmittance
    # sub-march, so unrolling it n_steps times would multiply the XLA
    # program by the whole traversal kernel.
    def body(i, carry):
        L, tau_acc = carry
        t = t0 + (i + u0) * dt
        p = ray.o + t[..., None] * d
        sa, ss, le, g = sigma_at(vol, p)
        tau_acc = tau_acc + (sa + ss) * dt[..., None]
        tr = jnp.exp(-tau_acc)
        L = L + tr * sa * le * dt[..., None]
        if n_lights > 0:
            u_pick = iu(pixel, sidx, i, 41, seed)
            u1 = iu(pixel, sidx, i, 42, seed)
            u2 = iu(pixel, sidx, i, 43, seed)
            light_idx, pmf = scene.light_dist.sample_discrete(u_pick)
            ls = sample_light(scene.lights, scene.envs, light_idx.astype(jnp.int32),
                              p, u1, u2)
            # occlusion by surfaces + attenuation through the medium
            occ = _shadow(scene, p, ls.wi, ls.dist, hit)
            u_tr = iu(pixel, sidx, i, 44, seed)
            tr_light = transmittance(vol, p, ls.wi, ls.dist, max(4, n_steps // 4), u_tr)
            ph = phase(g, -d, ls.wi)
            contrib = (
                ss * tr * tr_light * ls.L
                * (ph / jnp.maximum(ls.pdf * pmf, 1e-12))[..., None]
                * dt[..., None]
            )
            L = L + jnp.where((hit & ~occ)[..., None], contrib, 0.0)
        return L, tau_acc

    L, tau_acc = jax.lax.fori_loop(
        0, n_steps, body,
        (jnp.zeros((N, S), jnp.float32), jnp.zeros((N, S), jnp.float32)))
    Tr = jnp.where(hit[..., None], jnp.exp(-tau_acc), ones)
    return VolResult(L=jnp.where(hit[..., None], L, 0.0), Tr=Tr)


def _shadow(scene: CompiledScene, p, wi, dist, valid):
    from pbrt_tpu.accel.intersect import intersect_p as geom_intersect_p

    N = p.shape[0]
    tmax = jnp.where(dist >= BIG, jnp.full_like(dist, BIG), dist * (1.0 - 1e-3))
    ray = Ray(o=p + wi * 1e-3, d=wi, tmin=jnp.zeros((N,), jnp.float32),
              tmax=jnp.where(valid, tmax, -1.0), time=jnp.zeros((N,), jnp.float32))
    return scene.intersect_p(ray, coherent=True)
