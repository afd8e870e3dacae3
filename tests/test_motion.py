"""Motion blur: animated CTMs sampled during intersection.

Reference analog: TransformedPrimitive + AnimatedTransform
(core/primitive.h:115-117, core/transform.h:299); here two-keyframe
linear vertex/transform motion evaluated at ray.time.
"""
import textwrap

import numpy as np

from pbrt_tpu.scene import api, parser


def _render(tmp_path, scene_text, **options):
    path = tmp_path / "scene.pbrt"
    path.write_text(textwrap.dedent(scene_text))
    api.pbrt_init({"quiet": True, "write": False, **options})
    try:
        parser.parse_file(str(path))
        return api._state.output
    finally:
        api._state.__init__()


HEAD = """
Film "image" "integer xresolution" [48] "integer yresolution" [32]
Sampler "stratified" "integer xsamples" [3] "integer ysamples" [3]
LookAt 0 0 -5  0 0 0  0 1 0
Camera "perspective" "float fov" [50]
    "float shutteropen" [0] "float shutterclose" [1]
TransformTimes 0 1
"""

BODY = """
SurfaceIntegrator "directlighting"
WorldBegin
LightSource "distant" "point from" [0 0 -10] "point to" [0 0 0] "rgb L" [3 3 3]
TransformBegin
  ActiveTransform EndTime
  Translate {dx} 0 0
  ActiveTransform All
  Material "matte" "rgb Kd" [.8 .8 .8]
  Shape "sphere" "float radius" [0.6]
TransformEnd
WorldEnd
"""


def test_motion_blur_smears_sphere(tmp_path):
    moving = _render(tmp_path, HEAD + BODY.format(dx=2.0))
    static = _render(tmp_path, HEAD + BODY.format(dx=0.0))
    assert moving.shape == (32, 48, 3)
    assert np.all(np.isfinite(moving))
    # static sphere: only the central columns are lit
    lum_s = static.mean(-1).mean(0)
    lum_m = moving.mean(-1).mean(0)
    assert lum_s.max() > 0.01
    # moving sphere covers strictly more columns than the static one
    cols_s = (lum_s > 1e-4).sum()
    cols_m = (lum_m > 1e-4).sum()
    assert cols_m > cols_s + 3, (cols_s, cols_m)
    # energy appears on the +x side (screen side of the end keyframe)
    # that is black in the static render
    right = lum_m[int(0.75 * 48):].sum()
    right_s = lum_s[int(0.75 * 48):].sum()
    assert right > right_s + 1e-4


def test_motion_time_extremes(tmp_path):
    """Rays at time 0 hit the start position; rays at time 1 the end."""
    import jax.numpy as jnp

    from pbrt_tpu.core.geometry import Ray
    from pbrt_tpu.scene.records import RenderOptions, ShapeRecord
    from pbrt_tpu.scene.paramset import ParamSet
    from pbrt_tpu.scene.compile import compile_scene
    from pbrt_tpu.core.transform import AnimatedTransform, Transform

    t0 = Transform.translate([0.0, 0.0, 0.0])
    t1 = Transform.translate([3.0, 0.0, 0.0])
    ps = ParamSet()
    ps.add("float", "radius", [1.0])
    srec = ShapeRecord(kind="sphere", params=ps, o2w=t0, w2o=t0.inverse(),
                       reverse_orientation=False, material=None,
                       animated=AnimatedTransform(t0, 0.0, t1, 1.0))
    ro = RenderOptions()
    ro.shapes = [srec]
    scene = compile_scene(ro)
    assert scene.geom.has_motion

    n = 4
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -5.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    times = jnp.asarray([0.0, 1.0, 0.0, 1.0])
    ray = Ray(o=o, d=d, tmin=jnp.zeros(n), tmax=jnp.full((n,), jnp.inf),
              time=times)
    hit = scene.intersect(ray)
    h = np.asarray(hit.valid)
    # a ray down +z through the origin hits at t=0 (sphere at origin) but
    # misses at t=1 (sphere moved to x=3)
    assert bool(h[0]) and not bool(h[1])

    o2 = jnp.tile(jnp.asarray([[3.0, 0.0, -5.0]]), (n, 1))
    ray2 = Ray(o=o2, d=d, tmin=jnp.zeros(n), tmax=jnp.full((n,), jnp.inf),
               time=times)
    hit2 = scene.intersect(ray2)
    h2 = np.asarray(hit2.valid)
    assert not bool(h2[0]) and bool(h2[1])
