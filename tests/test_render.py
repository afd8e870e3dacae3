"""End-to-end render smoke tests (tiny resolutions, CPU jit).

Modeled on the reference's image-regression practice (SURVEY.md
section 4: exrdiff tolerance checks + aggregatetest); here we check
physical invariants of small renders rather than golden files.
"""
import os
import textwrap

import numpy as np
import pytest

from pbrt_tpu.scene import api, parser


def _render(tmp_path, scene_text, **options):
    path = tmp_path / "scene.pbrt"
    path.write_text(textwrap.dedent(scene_text))
    api.pbrt_init({"quiet": True, "write": False, **options})
    try:
        parser.parse_file(str(path))
        out = api.get_state()
        return api._state.output if api._state.output is not None else out.output
    finally:
        api._state.__init__()  # reset for next test


BASE = """
Film "image" "integer xresolution" [32] "integer yresolution" [32]
Sampler "lowdiscrepancy" "integer pixelsamples" [2]
LookAt 0 0 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [50]
"""


def test_direct_sphere_point_light(tmp_path):
    rgb = _render(tmp_path, BASE + """
    SurfaceIntegrator "directlighting"
    WorldBegin
    LightSource "point" "point from" [0 3 -3] "rgb I" [30 30 30]
    Material "matte" "rgb Kd" [.7 .7 .7]
    Shape "sphere" "float radius" [1]
    WorldEnd
    """)
    assert rgb.shape == (32, 32, 3)
    assert np.all(np.isfinite(rgb))
    # lit sphere visible: center pixels nonzero, corners (background) zero
    assert rgb[16, 16].max() > 0.01
    assert rgb[0, 0].max() == 0.0
    # light is above: upper hemisphere brighter than lower
    assert rgb[10, 16].mean() > rgb[22, 16].mean()


def test_path_area_light_mis(tmp_path):
    rgb = _render(tmp_path, BASE + """
    SurfaceIntegrator "path" "integer maxdepth" [3]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "rgb L" [8 8 8]
      Translate 0 2.2 0
      Rotate 90 1 0 0
      Shape "disk" "float radius" [1]
    AttributeEnd
    AttributeBegin
      Translate 0 -1 0
      Rotate -90 1 0 0
      Material "matte" "rgb Kd" [.6 .6 .6]
      Shape "disk" "float radius" [8]
    AttributeEnd
    WorldEnd
    """)
    assert np.all(np.isfinite(rgb))
    assert rgb.max() > 0.05  # floor is lit by the area light


def test_mesh_and_glass_dispersion_runs(tmp_path):
    rgb = _render(tmp_path, BASE + """
    SurfaceIntegrator "path" "integer maxdepth" [4]
    WorldBegin
    LightSource "distant" "point from" [0 5 -5] "point to" [0 0 0] "rgb L" [3 3 3]
    AttributeBegin
      Material "glass" "float index" [1.52] "float Vn" [36.4]
      Shape "sphere" "float radius" [0.8]
    AttributeEnd
    AttributeBegin
      Material "matte" "rgb Kd" [.5 .5 .5]
      Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
        "point P" [-3 -1.2 -3  3 -1.2 -3  3 -1.2 3  -3 -1.2 3]
    AttributeEnd
    WorldEnd
    """)
    assert np.all(np.isfinite(rgb))
    assert rgb.max() > 0.0


def test_emission_volume(tmp_path):
    rgb = _render(tmp_path, BASE + """
    SurfaceIntegrator "directlighting"
    VolumeIntegrator "emission" "float stepsize" [0.25]
    WorldBegin
    LightSource "point" "point from" [0 3 -3] "rgb I" [10 10 10]
    Volume "homogeneous" "point p0" [-1 -1 -1] "point p1" [1 1 1]
      "rgb sigma_a" [.5 .5 .5] "rgb sigma_s" [0 0 0] "rgb Le" [1 1 1]
    WorldEnd
    """)
    assert np.all(np.isfinite(rgb))
    # the glowing box fills the view center
    assert rgb[16, 16].mean() > 0.05
    assert rgb[16, 16].mean() > rgb[0, 0].mean()


def test_whitted_mirror(tmp_path):
    rgb = _render(tmp_path, BASE + """
    SurfaceIntegrator "whitted" "integer maxdepth" [3]
    WorldBegin
    LightSource "point" "point from" [0 3 -3] "rgb I" [30 30 30]
    AttributeBegin
      Material "mirror"
      Shape "sphere" "float radius" [0.7]
    AttributeEnd
    AttributeBegin
      Translate 0 -1 0
      Rotate -90 1 0 0
      Material "matte" "rgb Kd" [.8 .2 .2]
      Shape "disk" "float radius" [6]
    AttributeEnd
    WorldEnd
    """)
    assert np.all(np.isfinite(rgb))
    # mirror sphere reflects the red floor: red channel dominates somewhere
    center = rgb[14:20, 12:22]
    assert center.max() > 0.0


def test_alpha_texture_masking():
    """Reference shapes/trianglemesh.cpp:379-437: hits where the alpha
    texture evaluates to 0 are discarded (the ray passes through)."""
    import jax.numpy as jnp
    from pbrt_tpu.scene import api
    from pbrt_tpu.scene.paramset import ParamSet
    from pbrt_tpu.scene.compile import compile_scene
    from pbrt_tpu.core.geometry import Ray

    def build(alpha_value):
        api._state.__init__()
        api.pbrt_init({"quiet": True})
        api.pbrt_world_begin()
        # front quad at z=1 with alpha, back quad at z=2 opaque
        mp = ParamSet()
        mp.add("rgb", "Kd", [0.5, 0.5, 0.5])
        api.pbrt_material("matte", mp)
        front = ParamSet()
        front.add("point", "P", [-1, -1, 1, 1, -1, 1, 1, 1, 1, -1, 1, 1])
        front.add("integer", "indices", [0, 1, 2, 0, 2, 3])
        if alpha_value is not None:
            front.add("float", "alpha", [alpha_value])
        api.pbrt_shape("trianglemesh", front)
        back = ParamSet()
        back.add("point", "P", [-1, -1, 2, 1, -1, 2, 1, 1, 2, -1, 1, 2])
        back.add("integer", "indices", [0, 1, 2, 0, 2, 3])
        api.pbrt_shape("trianglemesh", back)
        scene = compile_scene(api.get_state().render_options)
        api._state.__init__()
        return scene

    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    ray = Ray(o, d, jnp.zeros(1), jnp.full((1,), jnp.inf), jnp.zeros(1))

    hit_opaque = build(None).intersect(ray)
    assert float(hit_opaque.t[0]) == pytest.approx(1.0, abs=1e-3)

    hit_masked = build(0.0).intersect(ray)
    assert bool(hit_masked.valid[0])
    assert float(hit_masked.t[0]) == pytest.approx(2.0, abs=1e-3), \
        "alpha=0 front surface must be skipped"

    hit_kept = build(1.0).intersect(ray)
    assert float(hit_kept.t[0]) == pytest.approx(1.0, abs=1e-3)

    # intersect_p follows the same rule (reference IntersectP alpha test)
    assert bool(build(0.0).intersect_p(
        Ray(o, d, jnp.zeros(1), jnp.full((1,), 1.5), jnp.zeros(1)))) is False


def test_adaptive_contrast_veto_unit():
    import jax.numpy as jnp
    from pbrt_tpu.samplers.samplers import adaptive_needs

    # pixel 0: flat -> keep min samples; pixel 1: one outlier -> veto
    y = jnp.asarray([0.5, 0.5, 0.5, 0.5,
                     0.5, 0.5, 0.5, 5.0], jnp.float32)
    needs = np.asarray(adaptive_needs(y, 2, 4))
    assert needs.tolist() == [False, True]
    # black pixels never supersample
    yb = jnp.zeros((4,), jnp.float32)
    assert not np.asarray(adaptive_needs(yb, 1, 4)).any()


def test_adaptive_shapeid_veto_unit():
    import jax.numpy as jnp
    from pbrt_tpu.samplers.samplers import adaptive_needs_shapeid

    # pixel 0: all samples hit prim 7 -> keep; pixel 1: edge (7 vs 9)
    # -> veto; pixel 2: hit/miss mix -> veto; pixel 3: all miss -> keep
    prim = jnp.asarray([7, 7, 7, 7,
                        7, 9, 7, 7,
                        3, 3, -1, 3,
                        -1, -1, -1, -1], jnp.int32)
    needs = np.asarray(adaptive_needs_shapeid(prim, 4, 4))
    assert needs.tolist() == [False, True, True, False]


def test_adaptive_shapeid_render(tmp_path):
    """The shapeid method through the full driver (reference
    samplers/adaptive.cpp:182-185): silhouette pixels supersample."""
    src = """
    Film "image" "integer xresolution" [24] "integer yresolution" [24]
    Sampler "adaptive" "integer minsamples" [2] "integer maxsamples" [8]
      "string method" ["shapeid"]
    LookAt 0 0 -4  0 0 0  0 1 0
    Camera "perspective" "float fov" [40]
    WorldBegin
    LightSource "distant" "point from" [0 0 -4] "point to" [0 0 0]
      "rgb L" [8 8 8]
    Material "matte" "rgb Kd" [.8 .8 .8]
    Shape "sphere" "float radius" [1]
    WorldEnd
    """
    img = _render(tmp_path, src)
    assert np.all(np.isfinite(img))
    assert img.max() > 0.01


def test_adaptive_render_varies_spp(tmp_path):
    """The adaptive sampler's veto loop must actually fire: a scene with
    a hard silhouette gets supersampled edge pixels and min-sampled flat
    pixels (reference samplers/adaptive.cpp ReportResults contract)."""
    src = """
    Film "image" "integer xresolution" [32] "integer yresolution" [32]
    Sampler "adaptive" "integer minsamples" [2] "integer maxsamples" [8]
    LookAt 0 0 -4  0 0 0  0 1 0
    Camera "perspective" "float fov" [40]
    WorldBegin
    LightSource "distant" "point from" [0 0 -4] "point to" [0 0 0]
      "rgb L" [8 8 8]
    Material "matte" "rgb Kd" [.8 .8 .8]
    Shape "sphere" "float radius" [1]
    WorldEnd
    """
    img = _render(tmp_path, src)
    assert np.all(np.isfinite(img))
    assert img.max() > 0.01


def test_bestcandidate_table_sampler():
    import jax.numpy as jnp
    from pbrt_tpu.samplers.samplers import (
        SamplerSpec, S_BESTCANDIDATE, camera_samples, _bc_buckets)

    w, buckets = _bc_buckets(4)
    assert buckets.shape[1] == 4 and buckets.shape[0] == w * w
    b = np.asarray(buckets)
    assert (b >= 0).all() and (b < 1).all()

    spec = SamplerSpec(S_BESTCANDIDATE, 4)
    px = jnp.asarray([3, 4], jnp.int32)
    py = jnp.asarray([5, 5], jnp.int32)
    cs = camera_samples(spec, px, py, 64)
    sx = np.asarray(cs.px)
    # samples stay inside their pixel
    assert (sx[:4] >= 3).all() and (sx[:4] < 4).all()
    assert (sx[4:] >= 4).all() and (sx[4:] < 5).all()
    # adjacent pixels draw different table cells
    assert not np.allclose(sx[:4] - 3, sx[4:] - 4)
