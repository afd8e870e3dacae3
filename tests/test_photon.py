"""Photon subsystem: map queries, shooting, rainbow transfer, and the
photonvolume integrator end-to-end."""
import textwrap

import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.photon.map import build_photon_map, knn_lookup
from pbrt_tpu.volumes.registry import rainbow_reflection
from pbrt_tpu.core import spectrum as spec


def test_knn_matches_bruteforce():
    rng = np.random.RandomState(0)
    P = 500
    pos = rng.uniform(-1, 1, (P, 3)).astype(np.float32)
    alpha = rng.rand(P, spec.N_BINS).astype(np.float32)
    wi = rng.normal(size=(P, 3)).astype(np.float32)
    pm = build_photon_map(pos, alpha, wi, cell_size=0.25)
    q = rng.uniform(-1, 1, (16, 3)).astype(np.float32)
    k = 8
    max_d2 = 0.25 * 0.25
    res = knn_lookup(pm, jnp.asarray(q), k, max_d2)
    d2_found = np.sort(np.where(np.asarray(res.valid), np.asarray(res.dist2), np.inf), -1)
    for i in range(len(q)):
        d2_all = np.sum((pos - q[i]) ** 2, -1)
        d2_ref = np.sort(d2_all[d2_all <= max_d2])[:k]
        got = d2_found[i][: len(d2_ref)]
        np.testing.assert_allclose(got[: len(d2_ref)], d2_ref, rtol=1e-4, atol=1e-6)


def test_rainbow_transfer_bands():
    # reference volumes/rainbow.cpp: primary bow 40.4-42.3deg maps 400->700nm
    white = jnp.ones((1, spec.N_BINS))

    def at_angle(deg):
        th = np.deg2rad(deg)
        w = jnp.asarray([[0.0, 0.0, 1.0]])          # eye ray direction
        wi = jnp.asarray([[0.0, np.sin(th), -np.cos(th)]])  # angle(wi, -w)=deg
        return np.asarray(rainbow_reflection(white, w, wi))[0]

    # at 41deg (primary, blue end ~495nm): spectrum peaked below 550nm
    s41 = at_angle(41.0)
    peak41 = spec.LAMBDAS[np.argmax(s41)]
    assert 420 <= peak41 <= 560
    # at 42.2deg: red end
    s422 = at_angle(42.2)
    peak422 = spec.LAMBDAS[np.argmax(s422)]
    assert peak422 > peak41
    # mist region (30deg): flat, small
    s30 = at_angle(30.0)
    assert s30.max() < s41.max()
    # secondary bow reversed: at 51.5deg peak is red; at 54deg blue
    s515 = at_angle(51.5)
    s54 = at_angle(54.0)
    assert spec.LAMBDAS[np.argmax(s515)] > spec.LAMBDAS[np.argmax(s54)]


def test_photonvolume_scene(tmp_path):
    from pbrt_tpu.scene import api, parser

    path = tmp_path / "pv.pbrt"
    path.write_text(textwrap.dedent("""
    Film "image" "integer xresolution" [24] "integer yresolution" [24]
    Sampler "lowdiscrepancy" "integer pixelsamples" [1]
    LookAt 0 0 -4  0 0 0  0 1 0
    Camera "perspective" "float fov" [50]
    SurfaceIntegrator "path" "integer maxdepth" [2]
    VolumeIntegrator "photonvolume" "float stepsize" [0.5]
      "integer volumephotons" [300] "integer nused" [20] "float maxdist" [0.6]
    WorldBegin
    LightSource "point" "point from" [0 3 0] "rgb I" [40 40 40]
    Volume "homogeneous" "point p0" [-1.5 -1.5 -1.5] "point p1" [1.5 1.5 1.5]
      "rgb sigma_a" [.1 .1 .1] "rgb sigma_s" [.6 .6 .6]
    WorldEnd
    """))
    api.pbrt_init({"quiet": True, "quick": True, "write": False})
    try:
        parser.parse_file(str(path))
        rgb = api.get_state().output
    finally:
        api._state.__init__()
    assert rgb is not None
    assert np.all(np.isfinite(rgb))
    # scattering medium glows around the embedded light
    assert rgb.max() > 0.0


def test_shooter_quotas(tmp_path):
    """Photon shooting fills caustic/indirect maps on a glass-over-floor
    scene (the reference's signature configuration)."""
    from pbrt_tpu.scene import api, parser
    from pbrt_tpu.scene.compile import compile_scene
    from pbrt_tpu.photon.shooter import build_photon_maps
    from pbrt_tpu.scene.paramset import ParamSet

    path = tmp_path / "ph.pbrt"
    path.write_text(textwrap.dedent("""
    WorldBegin
    LightSource "point" "point from" [0 3 0] "rgb I" [40 40 40]
    AttributeBegin
      Material "glass" "float index" [1.5] "float Vn" [64.2]
      Shape "sphere" "float radius" [0.8]
    AttributeEnd
    AttributeBegin
      Translate 0 -1.5 0
      Rotate -90 1 0 0
      Material "matte" "rgb Kd" [.7 .7 .7]
      Shape "disk" "float radius" [5]
    AttributeEnd
    WorldEnd
    """))
    api.pbrt_init({"quiet": True})
    try:
        parser.parse_file(str(path))
    except Exception:
        pass
    ro = api.get_state().render_options
    api._state.__init__()
    scene = compile_scene(ro)
    sp = ParamSet()
    sp.add("integer", "causticphotons", [200])
    sp.add("integer", "indirectphotons", [200])
    sp.add("bool", "finalgather", ["false"])
    maps = build_photon_maps(scene, sp, ParamSet(), {"quiet": True})
    assert maps.indirect is not None and maps.indirect.count > 0
    assert maps.caustic is not None and maps.caustic.count > 0
    # caustic photons concentrate under the glass sphere (transmitted
    # light focused downward onto the floor near x,z ~ 0, y ~ -1.5)
    cpos_y = np.asarray(maps.caustic.pxyz[:, 1])
    on_floor = np.abs(cpos_y + 1.5) < 1e-2
    assert on_floor.mean() > 0.5
