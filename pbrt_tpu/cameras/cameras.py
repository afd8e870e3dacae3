"""Projective + environment cameras: batched ray generation.

Replaces reference cameras/{perspective,orthographic,environment}.cpp
with pure-jnp ray-gen over CameraSample batches. The realistic lens
camera lives in pbrt_tpu.cameras.realistic. Conventions follow pbrt:
camera space looks down +z, raster (0,0) is the upper-left film corner,
screen window defaults to [-1,1] on the short axis.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core.error import warning
from pbrt_tpu.core.geometry import Ray, normalize
from pbrt_tpu.core.sampling import concentric_sample_disk
from pbrt_tpu.core.transform import Transform, xform_point_affine, xform_vector
from pbrt_tpu.scene.paramset import ParamSet

CAM_PERSPECTIVE, CAM_ORTHOGRAPHIC, CAM_ENVIRONMENT, CAM_REALISTIC = range(4)


@dataclass
class Camera:
    """Host camera record; generate_rays is jit-safe (closes over arrays)."""

    kind: int
    cam_to_world: np.ndarray      # [4, 4]
    raster_to_camera: np.ndarray  # [4, 4]
    lens_radius: float = 0.0
    focal_distance: float = 1e30
    shutter_open: float = 0.0
    shutter_close: float = 1.0
    # environment
    width: int = 0
    height: int = 0
    # realistic-camera side structure (set by cameras.realistic)
    lens: object = None

    def generate_rays(self, px, py, u_lens1, u_lens2, u_time) -> Tuple[Ray, jnp.ndarray]:
        """CameraSample batch -> (Ray [N], weight [N]).

        px/py: raster coords (continuous); u_*: [0,1) uniforms.
        reference cameras/perspective.cpp:60-100 GenerateRay.
        """
        if self.kind == CAM_REALISTIC:
            from pbrt_tpu.cameras.realistic import realistic_generate_rays

            return realistic_generate_rays(self, px, py, u_lens1, u_lens2, u_time)
        n = px.shape[0]
        r2c = jnp.asarray(self.raster_to_camera, jnp.float32)
        c2w = jnp.asarray(self.cam_to_world, jnp.float32)
        p_ras = jnp.stack([px, py, jnp.zeros_like(px)], axis=-1)
        time = self.shutter_open + u_time * (self.shutter_close - self.shutter_open)

        if self.kind == CAM_PERSPECTIVE:
            p_cam = xform_point_affine(r2c[None], p_ras)
            o = jnp.zeros((n, 3), jnp.float32)
            d = normalize(p_cam)
            if self.lens_radius > 0.0:
                lx, ly = concentric_sample_disk(u_lens1, u_lens2)
                lx, ly = lx * self.lens_radius, ly * self.lens_radius
                ft = self.focal_distance / jnp.maximum(d[..., 2], 1e-9)
                p_focus = d * ft[..., None]
                o = jnp.stack([lx, ly, jnp.zeros_like(lx)], axis=-1)
                d = normalize(p_focus - o)
        elif self.kind == CAM_ORTHOGRAPHIC:
            p_cam = xform_point_affine(r2c[None], p_ras)
            o = p_cam
            d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
            if self.lens_radius > 0.0:
                lx, ly = concentric_sample_disk(u_lens1, u_lens2)
                lx, ly = lx * self.lens_radius, ly * self.lens_radius
                ft = jnp.full((n,), self.focal_distance, jnp.float32)
                p_focus = o + d * ft[..., None]
                o = o + jnp.stack([lx, ly, jnp.zeros_like(lx)], axis=-1)
                d = normalize(p_focus - o)
        else:  # ENVIRONMENT: equirectangular (reference environment.cpp:36-53)
            theta = jnp.pi * py / self.height
            phi = 2.0 * jnp.pi * px / self.width
            st, ct = jnp.sin(theta), jnp.cos(theta)
            d = jnp.stack([st * jnp.cos(phi), ct, st * jnp.sin(phi)], axis=-1)
            o = jnp.zeros((n, 3), jnp.float32)

        o_w = xform_point_affine(c2w[None], o)
        d_w = xform_vector(c2w[None], d)
        ray = Ray(o=o_w, d=d_w, tmin=jnp.zeros((n,), jnp.float32),
                  tmax=jnp.full((n,), jnp.inf, jnp.float32), time=time)
        return ray, jnp.ones((n,), jnp.float32)


def _screen_window(params: ParamSet, aspect: float):
    if aspect > 1.0:
        screen = [-aspect, aspect, -1.0, 1.0]
    else:
        screen = [-1.0, 1.0, -1.0 / aspect, 1.0 / aspect]
    sw = params.find_float("screenwindow")
    if sw is not None and len(sw) == 4:
        screen = [float(x) for x in sw]
    return screen


def make_camera(name: str, params: ParamSet, cam_to_world: Transform,
                xres: int, yres: int, shutter_open: float = 0.0,
                shutter_close: float = 1.0) -> Camera:
    """reference core/api.cpp:606-629 MakeCamera + each Create*Camera."""
    aspect = float(xres) / float(yres)
    sopen = params.find_one_float("shutteropen", shutter_open)
    sclose = params.find_one_float("shutterclose", shutter_close)
    lensradius = params.find_one_float("lensradius", 0.0)
    focaldistance = params.find_one_float("focaldistance", 1e30)

    if name == "perspective":
        fov = params.find_one_float("fov", 90.0)
        halffov = params.find_one_float("halffov", -1.0)
        if halffov > 0.0:
            fov = 2.0 * halffov
        screen = _screen_window(params, aspect)
        cam_proj = Transform.perspective(fov, 1e-2, 1000.0)
        kind = CAM_PERSPECTIVE
    elif name == "orthographic":
        screen = _screen_window(params, aspect)
        cam_proj = Transform.orthographic(0.0, 1.0)
        kind = CAM_ORTHOGRAPHIC
    elif name == "environment":
        params.report_unused('in camera "environment"')
        return Camera(
            kind=CAM_ENVIRONMENT, cam_to_world=cam_to_world.m.astype(np.float32),
            raster_to_camera=np.eye(4, dtype=np.float32),
            shutter_open=sopen, shutter_close=sclose, width=xres, height=yres,
        )
    elif name == "realistic":
        from pbrt_tpu.cameras.realistic import make_realistic_camera

        return make_realistic_camera(params, cam_to_world, xres, yres, sopen, sclose)
    else:
        warning(f'Camera "{name}" unknown; using "perspective".')
        return make_camera("perspective", params, cam_to_world, xres, yres,
                           shutter_open, shutter_close)

    x0, x1, y0, y1 = screen
    screen_to_raster = (
        Transform.scale(xres, yres, 1.0)
        * Transform.scale(1.0 / (x1 - x0), 1.0 / (y0 - y1), 1.0)
        * Transform.translate([-x0, -y1, 0.0])
    )
    raster_to_screen = screen_to_raster.inverse()
    raster_to_camera = cam_proj.inverse() * raster_to_screen
    params.report_unused(f'in camera "{name}"')
    return Camera(
        kind=kind,
        cam_to_world=cam_to_world.m.astype(np.float32),
        raster_to_camera=raster_to_camera.m.astype(np.float32),
        lens_radius=lensradius, focal_distance=focaldistance,
        shutter_open=sopen, shutter_close=sclose, width=xres, height=yres,
    )
