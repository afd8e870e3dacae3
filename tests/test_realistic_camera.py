"""Realistic lens camera + autofocus (reference cameras/realistic.cpp
:135-424). The reference ships no lens data, so the fixture is a
synthetic biconvex singlet with a closed-form focal length to test
against (tests/fixtures/biconvex.dat)."""
import os
import types

import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.cameras.realistic import (
    make_realistic_camera,
    realistic_generate_rays,
    sml,
)
from pbrt_tpu.core.transform import Transform
from pbrt_tpu.scene.paramset import ParamSet

LENS = os.path.join(os.path.dirname(__file__), "fixtures", "biconvex.dat")

# thick-lens theory for the fixture: n=1.5, R1=50, R2=-50, d=5
N_GLASS, R1, R2, D_TH = 1.5, 50.0, -50.0, 5.0
INV_F = (N_GLASS - 1.0) * (1.0 / R1 - 1.0 / R2
                           + (N_GLASS - 1.0) * D_TH / (N_GLASS * R1 * R2))
F_THEORY = 1.0 / INV_F                       # ~50.85 mm
BFD_THEORY = F_THEORY * (1.0 - (N_GLASS - 1.0) * D_TH / (N_GLASS * R1))


def _camera(film_dist, res=64, ap=6.0):
    p = ParamSet()
    p.add("string", "specfile", [LENS])
    p.add("float", "filmdistance", [film_dist])
    p.add("float", "aperture_diameter", [ap])
    p.add("float", "filmdiag", [40.0])
    return make_realistic_camera(p, Transform(), res, res, 0.0, 1.0)


def _axis_rays(cam, n=256):
    """Rays from the central film point through n lens samples."""
    rng = np.random.RandomState(0)
    px = jnp.full((n,), cam.width / 2.0, jnp.float32)
    py = jnp.full((n,), cam.height / 2.0, jnp.float32)
    u1 = jnp.asarray(rng.rand(n), jnp.float32)
    u2 = jnp.asarray(rng.rand(n), jnp.float32)
    ray, w = realistic_generate_rays(cam, px, py, u1, u2,
                                     jnp.zeros((n,), jnp.float32))
    return np.asarray(ray.d), np.asarray(w)


def _collimation_error(film_dist):
    """Angular spread of the exit beam for the on-axis film point —
    minimized when the film sits at the lens's back focal distance."""
    d, w = _axis_rays(_camera(film_dist))
    ok = w > 0
    assert ok.sum() > 50, "lens passes too few rays"
    dxy = d[ok][:, :2]
    return float(np.sqrt((dxy ** 2).sum(-1)).mean())


def test_back_focal_distance_matches_theory():
    """Scanning film distance, exit-beam collimation must peak at the
    thick-lens back focal distance (closed form, ~49.2mm) — validating
    the element-by-element sphere intersection + Snell refraction."""
    cands = np.linspace(0.85 * BFD_THEORY, 1.15 * BFD_THEORY, 13)
    errs = [_collimation_error(float(fd)) for fd in cands]
    best = float(cands[int(np.argmin(errs))])
    assert abs(best - BFD_THEORY) / BFD_THEORY < 0.05, (
        best, BFD_THEORY, errs)
    # and defocus must be clearly worse than focus
    assert max(errs) > 3.0 * min(errs), errs


def test_exit_rays_point_into_scene_with_weight():
    d, w = _axis_rays(_camera(BFD_THEORY))
    ok = w > 0
    # camera space looks +z; all passed rays leave the front element
    assert np.all(d[ok][:, 2] > 0.5)
    # reference weight pi (A/2)^2 cos^4 / fd^2 (realistic.cpp:170);
    # A = rear ELEMENT aperture from the lens file (8mm) — the
    # aperture_diameter param only overrides stop rows (radius 0)
    a2 = 8.0 / 2.0
    w_max = np.pi * a2 * a2 / (BFD_THEORY * BFD_THEORY)
    assert np.all(w[ok] <= w_max * 1.001)
    assert np.all(w[ok] > 0.5 * w_max)  # cos^4 ~ 1 on-axis


def _plane_scene(dist):
    """High-contrast checkered quad at z=+dist, head-on distant light."""
    from pbrt_tpu.scene import api
    from pbrt_tpu.scene.compile import compile_scene

    api._state.__init__()
    api.pbrt_init({"quiet": True})
    cam_p = ParamSet()
    cam_p.add("float", "fov", [40.0])
    api.pbrt_camera("perspective", cam_p)
    api.pbrt_world_begin()
    lp = ParamSet()
    lp.add("point", "from", [0.0, 0.0, -10.0])
    lp.add("point", "to", [0.0, 0.0, 0.0])
    lp.add("rgb", "L", [6.0, 6.0, 6.0])
    api.pbrt_light_source("distant", lp)
    tp = ParamSet()
    tp.add("float", "uscale", [24.0])
    tp.add("float", "vscale", [24.0])
    tp.add("rgb", "tex1", [0.9, 0.9, 0.9])
    tp.add("rgb", "tex2", [0.05, 0.05, 0.05])
    api.pbrt_texture("checks", "color", "checkerboard", tp)
    mp = ParamSet()
    mp.add("texture", "Kd", ["checks"])
    api.pbrt_material("matte", mp)
    sp = ParamSet()
    ext = dist * 0.8
    sp.add("integer", "indices", [0, 1, 2, 2, 3, 0])
    sp.add("point", "P", [-ext, -ext, dist, ext, -ext, dist,
                          ext, ext, dist, -ext, ext, dist])
    sp.add("float", "uv", [0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0])
    api.pbrt_shape("trianglemesh", sp)
    ro = api.get_state().render_options
    scene = compile_scene(ro)
    api._state.__init__()
    return scene, ro


def _zone_sharpness(scene, li_fn, cam, fd, res=48, spp=2):
    """Render a central crop at film distance fd, return SML."""
    from pbrt_tpu.core import spectrum as spec

    xs = np.arange(res // 4, 3 * res // 4)
    gx, gy = np.meshgrid(xs, xs, indexing="xy")
    rng = np.random.RandomState(1)
    acc = np.zeros((len(xs), len(xs), 3), np.float32)
    for s in range(spp):
        px = jnp.asarray((gx + rng.rand(*gx.shape)).ravel(), jnp.float32)
        py = jnp.asarray((gy + rng.rand(*gy.shape)).ravel(), jnp.float32)
        u1 = jnp.asarray(rng.rand(px.shape[0]), jnp.float32)
        u2 = jnp.asarray(rng.rand(px.shape[0]), jnp.float32)
        ray, w = realistic_generate_rays(cam, px, py, u1, u2,
                                         jnp.zeros_like(px), film_dist=fd)
        pixel = jnp.arange(px.shape[0], dtype=jnp.int32)
        L = li_fn(ray, pixel, jnp.full_like(pixel, s), 0)
        acc += np.asarray(spec.to_rgb(
            L * w[..., None])).reshape(len(xs), len(xs), 3)
    return sml(acc / spp)


def test_autofocus_converges_to_sharpness_peak():
    """AF must drive the film distance to (near) the distance that
    maximizes SML sharpness on a textured plane (reference AutoFocus
    hill-climb + log-parabola fit, realistic.cpp:370-424)."""
    from pbrt_tpu.cameras.realistic import autofocus
    from pbrt_tpu.renderers.driver import build_li_fn

    OBJ = 500.0
    scene, ro = _plane_scene(OBJ)
    li_fn = build_li_fn(scene, ro, {"quiet": True})
    res = 48

    # empirical sharpness curve over film distance. The thin-lens
    # image distance is measured from the rear principal plane; the
    # camera measures film_dist from the rear VERTEX, and spherical
    # aberration shifts best focus further in — scan a wide bracket.
    fd_img = 1.0 / (INV_F - 1.0 / OBJ)     # ~56.6 mm
    cands = np.linspace(0.78 * fd_img, 1.2 * fd_img, 10)
    cam = _camera(fd_img, res=res)
    curve = [_zone_sharpness(scene, li_fn, cam, float(fd), res=res)
             for fd in cands]
    fd_peak = float(cands[int(np.argmax(curve))])
    assert max(curve) > 1.5 * min(curve), curve  # focus actually matters

    # autofocus from a deliberately wrong start: it must climb at
    # least 40% of the way toward the measured sharpness peak
    start = fd_peak * 1.12
    cam2 = _camera(start, res=res)
    cam2.lens.af_zones = [(0.3, 0.7, 0.3, 0.7)]
    film = types.SimpleNamespace(xres=res, yres=res)
    autofocus(scene, cam2, film, li_fn, seed=0, spp=2)
    final = cam2.lens.film_dist
    assert abs(final - fd_peak) < 0.6 * abs(start - fd_peak), (
        final, fd_peak, start, curve)
