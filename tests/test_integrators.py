"""Smoke coverage for the long-tail integrators and renderers."""
import textwrap

import numpy as np
import pytest

from pbrt_tpu.scene import api, parser


def _render(tmp_path, scene_text, **options):
    path = tmp_path / "scene.pbrt"
    path.write_text(textwrap.dedent(scene_text))
    api.pbrt_init({"quiet": True, "write": False, "quick": True, **options})
    try:
        parser.parse_file(str(path))
        return api.get_state().output
    finally:
        api._state.__init__()


BASE = """
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Sampler "lowdiscrepancy" "integer pixelsamples" [1]
LookAt 0 1 -3  0 0 0  0 1 0
Camera "perspective" "float fov" [50]
"""

WORLD = """
WorldBegin
LightSource "point" "point from" [0 3 -2] "rgb I" [25 25 25]
AttributeBegin
  Material "matte" "rgb Kd" [.6 .6 .6]
  Shape "sphere" "float radius" [0.8]
AttributeEnd
AttributeBegin
  Translate 0 -1 0
  Rotate -90 1 0 0
  Material "matte" "rgb Kd" [.5 .5 .5]
  Shape "disk" "float radius" [5]
AttributeEnd
WorldEnd
"""


@pytest.mark.parametrize("integ", [
    '"igi" "integer nlights" [16] "integer nsets" [2]',
    '"irradiancecache" "integer nsamples" [512]',
    '"ambientocclusion" "integer nsamples" [8]',
    '"diffuseprt" "integer lmax" [2]',
    '"glossyprt" "integer lmax" [2]',
])
def test_long_tail_integrators(tmp_path, integ):
    rgb = _render(tmp_path, BASE + f"SurfaceIntegrator {integ}\n" + WORLD)
    assert rgb is not None
    assert np.all(np.isfinite(rgb))


def test_dipole_subsurface(tmp_path):
    rgb = _render(tmp_path, BASE + """
    SurfaceIntegrator "dipolesubsurface" "float minsampledistance" [0.4]
    WorldBegin
    LightSource "point" "point from" [0 3 -2] "rgb I" [25 25 25]
    Material "subsurface" "string name" ["Marble"]
    Shape "sphere" "float radius" [0.8]
    WorldEnd
    """)
    assert rgb is not None
    assert np.all(np.isfinite(rgb))
    assert rgb.max() > 0.0  # diffusion glow visible


def test_surfacepoints_and_probes_roundtrip(tmp_path):
    out = _render(tmp_path, BASE + f"""
    Renderer "surfacepoints" "float minsampledistance" [0.4]
      "string filename" ["{tmp_path}/sp.npz"]
    """ + WORLD)
    assert out["points"] > 0
    out2 = _render(tmp_path, BASE + f"""
    Renderer "createprobes" "integer lmax" [2]
      "string filename" ["{tmp_path}/probes.npz"]
    """ + WORLD)
    assert out2["probes"] > 0
    rgb = _render(tmp_path, BASE + f"""
    SurfaceIntegrator "useprobes" "string filename" ["{tmp_path}/probes.npz"]
    """ + WORLD)
    assert rgb is not None and np.all(np.isfinite(rgb))


def test_metropolis_smoke(tmp_path):
    rgb = _render(tmp_path, BASE + """
    Renderer "metropolis" "integer samplesperpixel" [4]
      "integer bootstrapsamples" [4096]
    """ + WORLD)
    assert rgb is not None
    assert np.all(np.isfinite(rgb))
    assert rgb.max() > 0.0


def test_metropolis_matches_sampler_statistically(tmp_path):
    """The reference QA pattern for MLT (renderers/metropolis.cpp:514-
    521 is tuned so the splat-scaled mean matches the sampler
    renderer's estimate): render the SAME scene through both renderers
    and require the mean images to agree within MC tolerance — a
    mutation/bootstrap bug (wrong b, broken accept ratio, bad stream
    split) shifts total energy and fails this where a finite-and-
    nonzero smoke test would pass."""
    scene_body = """
    Film "image" "integer xresolution" [24] "integer yresolution" [24]
    LookAt 0 1 -3  0 0 0  0 1 0
    Camera "perspective" "float fov" [50]
    """
    world = WORLD
    path = tmp_path / "mlt.pbrt"

    def run(renderer_line, sampler_line):
        path.write_text(textwrap.dedent(
            scene_body + sampler_line + renderer_line + world))
        api.pbrt_init({"quiet": True, "write": False})
        try:
            parser.parse_file(str(path))
            return np.asarray(api.get_state().output)
        finally:
            api._state.__init__()

    ref = run("", 'Sampler "lowdiscrepancy" "integer pixelsamples" [8]\n')
    mlt = run('Renderer "metropolis" "integer samplesperpixel" [16]\n'
              '  "integer bootstrapsamples" [8192]\n'
              '  "bool dodirectseparately" ["true"]\n', "")
    assert ref.shape == mlt.shape
    level = max(float(ref.mean()), 1e-6)
    # total energy: tight systematic agreement
    assert abs(float(mlt.mean()) - level) / level < 0.15, (
        mlt.mean(), ref.mean())
    # spatial distribution: 6x6 block means agree within MC noise
    rb = ref.reshape(4, 6, 4, 6, -1).mean(axis=(1, 3, 4))
    mb = mlt.reshape(4, 6, 4, 6, -1).mean(axis=(1, 3, 4))
    rel = np.abs(mb - rb) / np.maximum(rb, 0.1 * level)
    assert float(rel.mean()) < 0.35, rel


def test_aggregatetest_renderer(tmp_path):
    mismatches = _render(tmp_path, BASE + """
    Renderer "aggregatetest" "integer niters" [2000]
    WorldBegin
    LightSource "point" "point from" [0 3 -2] "rgb I" [25 25 25]
    Material "matte"
    Shape "heightfield" "integer nu" [10] "integer nv" [10]
      "float Pz" [0 .2 0 .2 0 .2 0 .2 0 .2  .2 0 .2 0 .2 0 .2 0 .2 0  0 .2 0 .2 0 .2 0 .2 0 .2  .2 0 .2 0 .2 0 .2 0 .2 0  0 .2 0 .2 0 .2 0 .2 0 .2  .2 0 .2 0 .2 0 .2 0 .2 0  0 .2 0 .2 0 .2 0 .2 0 .2  .2 0 .2 0 .2 0 .2 0 .2 0  0 .2 0 .2 0 .2 0 .2 0 .2  .2 0 .2 0 .2 0 .2 0 .2 0]
    WorldEnd
    """)
    assert mismatches == 0
