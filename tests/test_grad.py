"""Differentiable rendering: finite-difference-validated gradients.

BASELINE.json's bwd metric and SURVEY.md §7 stages 5/7 demand scene-
parameter gradients through the path integrator, the volume march, and
the photon splat. Each test compares jax.grad against central finite
differences of the SAME estimator (fixed RNG, so discrete decisions —
lobe picks, Woodcock acceptance, RR — are identical on both FD sides
and the comparison isolates the continuous factors the AD carries).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.core.geometry import Ray
from pbrt_tpu.diff import (
    DiffParams,
    apply_params,
    diff_photon_ctx,
    freeze_photon_shoot,
)

S = spec.N_BINS


def _scene(with_floor=True, sigma_s=0.6):
    """Point light above a scattering homogeneous cube over a matte
    floor (programmatic; the api state machine, no WorldEnd render)."""
    from pbrt_tpu.scene import api
    from pbrt_tpu.scene.paramset import ParamSet
    from pbrt_tpu.scene.compile import compile_scene

    api._state.__init__()
    api.pbrt_init({"quiet": True})
    api.pbrt_look_at([0, 0.5, -4], [0, 0, 0], [0, 1, 0])
    cam_p = ParamSet()
    cam_p.add("float", "fov", [45.0])
    api.pbrt_camera("perspective", cam_p)
    api.pbrt_world_begin()
    lp = ParamSet()
    lp.add("point", "from", [0.0, 2.5, 0.0])
    lp.add("rgb", "I", [30.0, 30.0, 30.0])
    api.pbrt_light_source("point", lp)
    if with_floor:
        api.pbrt_attribute_begin()
        api.pbrt_translate(0.0, -1.4, 0.0)
        api.pbrt_rotate(-90.0, 1.0, 0.0, 0.0)
        m2 = ParamSet()
        m2.add("rgb", "Kd", [0.6, 0.45, 0.3])
        api.pbrt_material("matte", m2)
        d = ParamSet()
        d.add("float", "radius", [6.0])
        api.pbrt_shape("disk", d)
        api.pbrt_attribute_end()
    vp = ParamSet()
    vp.add("point", "p0", [-1.5, -1.2, -1.5])
    vp.add("point", "p1", [1.5, 1.8, 1.5])
    vp.add("rgb", "sigma_a", [0.08, 0.08, 0.08])
    vp.add("rgb", "sigma_s", [sigma_s] * 3)
    api.pbrt_volume("homogeneous", vp)
    scene = compile_scene(api.get_state().render_options)
    api._state.__init__()
    return scene


def _rays(n_side=8, z=-4.0, y=0.5):
    xs = np.linspace(-0.45, 0.45, n_side, dtype=np.float32)
    gx, gy = np.meshgrid(xs, xs, indexing="xy")
    n = n_side * n_side
    d = np.stack([gx.ravel(), gy.ravel(), np.ones(n, np.float32)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile(np.array([[0.0, y, z]], np.float32), (n, 1))
    return Ray(jnp.asarray(o), jnp.asarray(d), jnp.zeros(n),
               jnp.full((n,), jnp.inf), jnp.zeros(n))


def _fd_check(loss_fn, theta0, h, rtol, atol=1e-6):
    """Central-difference check of d loss / d theta at theta0 (scalar)."""
    g_ad = float(jax.grad(loss_fn)(theta0))
    lp = float(loss_fn(theta0 + h))
    lm = float(loss_fn(theta0 - h))
    g_fd = (lp - lm) / (2.0 * h)
    assert np.isfinite(g_ad) and np.isfinite(g_fd)
    assert abs(g_ad) > 0.0, "AD gradient is exactly zero — graph severed"
    np.testing.assert_allclose(g_ad, g_fd, rtol=rtol, atol=atol)
    return g_ad, g_fd


def test_grad_sigma_a_through_march_fd():
    """d/d(sigma_a scale) of an emission+single-scatter march image."""
    from pbrt_tpu.integrators.volume import li_single

    scene = _scene()
    ray = _rays(6)
    n = ray.o.shape[0]
    pixel = jnp.arange(n, dtype=jnp.int32)
    sidx = jnp.zeros(n, jnp.int32)
    base_sa = jnp.asarray(scene.volume.sigma_a)

    @jax.jit
    def loss(s):
        p = DiffParams(sigma_a=base_sa * s)
        sc = apply_params(scene, p)
        vr = li_single(sc, ray, jnp.full((n,), jnp.inf), pixel, sidx,
                       n_steps=8, seed=0)
        return jnp.mean(vr.L) + jnp.mean(vr.Tr)

    _fd_check(loss, jnp.float32(1.0), h=1e-2, rtol=2e-2)


def test_grad_kd_through_path_fd():
    """d/d(albedo scale) of a 2-bounce path-traced image (no RR at
    depth 2, so the FD sides follow identical discrete paths)."""
    from pbrt_tpu.integrators.surface import li_path

    scene = _scene()
    ray = _rays(6, y=-0.2)
    n = ray.o.shape[0]
    pixel = jnp.arange(n, dtype=jnp.int32)
    sidx = jnp.zeros(n, jnp.int32)
    M = len(scene.materials)

    @jax.jit
    def loss(s):
        p = DiffParams(kd_scale=jnp.full((M, S), 1.0, jnp.float32) * s)
        sc = apply_params(scene, p)
        return jnp.mean(li_path(sc, ray, pixel, sidx, max_depth=2, seed=0))

    _fd_check(loss, jnp.float32(1.0), h=1e-2, rtol=2e-2)


@pytest.fixture(scope="module")
def frozen_setup():
    scene = _scene(sigma_s=0.9)
    frozen = freeze_photon_shoot(scene, n_paths=2048, vol_quota=1,
                                 seed=3, max_depth=5, n_used=20,
                                 max_dist=0.5, vol_n_used=20,
                                 vol_max_dist=0.7)
    assert frozen.classes.get(4) is not None, "no volume photons frozen"
    return scene, frozen


def test_grad_light_power_through_photon_splat_fd(frozen_setup):
    """The flagship: d/d(light power) THROUGH the photon map — shooting
    re-traced with traced power, deposits gathered at frozen indices,
    kNN density estimate differentiated. The reference's photon maps
    (core/photonshooter.cpp) have no gradient path at all; here the
    splat is part of the autodiff graph."""
    scene, frozen = frozen_setup
    from pbrt_tpu.integrators.photonvolume import lphoton_volume

    q = jnp.asarray(np.array([[0.0, 0.6, 0.0], [0.2, 0.2, 0.2],
                              [-0.3, 1.0, 0.1], [0.0, 1.4, -0.2]],
                             np.float32))
    w = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (4, 1))
    g = jnp.zeros((4,), jnp.float32)

    @jax.jit
    def loss(s):
        p = DiffParams(light_scale=jnp.ones((scene.n_lights,)) * s)
        sc = apply_params(scene, p)
        ctx = diff_photon_ctx(sc, frozen)
        flux, enough = lphoton_volume(ctx.volume, q, w, g,
                                      ctx.vol_n_used, ctx.vol_max_dist2)
        return jnp.mean(flux)

    # photon alpha is LINEAR in light power: AD must match FD tightly
    g_ad, g_fd = _fd_check(loss, jnp.float32(1.0), h=1e-2, rtol=1e-3)
    # and linearity pins the value: loss(s) = s * loss(1)
    np.testing.assert_allclose(g_ad, float(loss(jnp.float32(1.0))),
                               rtol=1e-4)


def test_grad_sigma_s_through_photonvolume_march_fd(frozen_setup):
    """d/d(sigma_s scale) through the FULL photonvolume eye march —
    per-step transmittance, single scattering, and the photon-map
    multiple-scatter term (reference recurrence photonvolume.cpp:215,
    scan-differentiated)."""
    scene, frozen = frozen_setup
    from pbrt_tpu.integrators.photonvolume import li_photonvolume

    ray = _rays(4)
    n = ray.o.shape[0]
    pixel = jnp.arange(n, dtype=jnp.int32)
    sidx = jnp.zeros(n, jnp.int32)
    base_ss = jnp.asarray(scene.volume.sigma_s)

    @jax.jit
    def loss(s):
        p = DiffParams(sigma_s=base_ss * s)
        sc = apply_params(scene, p)
        ctx = diff_photon_ctx(sc, frozen)
        vr = li_photonvolume(sc, ctx, ray, jnp.full((n,), jnp.inf),
                             pixel, sidx, n_steps=8, seed=0)
        return jnp.mean(vr.L) + 0.1 * jnp.mean(vr.Tr)

    # Woodcock acceptances inside the re-traced shoot are discrete in
    # sigma; with fixed RNG they are identical at s = 1 +- h for this
    # h, so FD and AD agree on the continuous factors
    _fd_check(loss, jnp.float32(1.0), h=5e-3, rtol=5e-2)
