"""True mix material: both constituent BSDFs blended by amount.

reference materials/mixmat.cpp:62 MixMaterial::GetBSDF concatenates
BOTH children's BxDFs scaled by amount / (1 - amount). The round-3
parameter-blend approximation collapsed to the dominant child's lobe
shape — a matte+mirror mix lost its specular lobe entirely. These
tests pin the true-mix behavior analytically.
"""
import textwrap

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.scene import api, parser
from pbrt_tpu.scene.compile import compile_scene, eval_bsdf_params
from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.core.geometry import Ray
from pbrt_tpu.materials.bsdf import (
    bsdf_f,
    bsdf_pdf,
    bsdf_sample,
    has_non_specular,
    has_specular,
    material_lobes,
)
from pbrt_tpu.integrators.surface import make_frame

AMT = 0.4


def _mix_scene_lobes(tmp_path):
    path = tmp_path / "mix.pbrt"
    path.write_text(textwrap.dedent(f"""
    WorldBegin
    LightSource "point" "point from" [0 3 0] "rgb I" [10 10 10]
    MakeNamedMaterial "white" "string type" "matte" "rgb Kd" [1 1 1]
        "float sigma" [0]
    MakeNamedMaterial "mirr" "string type" "mirror" "rgb Kr" [1 1 1]
    Material "mix" "string namedmaterial1" "white"
        "string namedmaterial2" "mirr" "float amount" [{AMT}]
    Shape "sphere" "float radius" [1]
    WorldEnd
    """))
    api.pbrt_init({"quiet": True, "write": False})
    try:
        parser.parse_file(str(path))
    except Exception:
        pass
    ro = api.get_state().render_options
    api._state.__init__()
    scene = compile_scene(ro)
    n = 8
    o = np.tile(np.array([[0.0, 0.0, -3.0]], np.float32), (n, 1))
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    ray = Ray(jnp.asarray(o), jnp.asarray(d), jnp.zeros(n),
              jnp.full((n,), 1e30), jnp.zeros(n))
    hit = scene.intersect(ray)
    assert bool(np.all(np.asarray(hit.valid)))
    lobes = material_lobes(eval_bsdf_params(scene, hit))
    frame = make_frame(hit)
    return lobes, frame, hit


def test_mix_keeps_both_lobes(tmp_path):
    """matte+mirror mix must expose BOTH a diffuse and a specular lobe
    (the parameter blend had no specular at amount=0.4)."""
    lobes, frame, hit = _mix_scene_lobes(tmp_path)
    assert lobes.mix2 is not None
    assert bool(np.all(np.asarray(has_non_specular(lobes))))
    assert bool(np.all(np.asarray(has_specular(lobes))))


def test_mix_f_is_scaled_blend(tmp_path):
    """f of the mix = amount * f_matte (mirror adds nothing non-spec):
    Lambertian Kd/pi scaled by amount, exactly."""
    lobes, frame, hit = _mix_scene_lobes(tmp_path)
    wo = -jnp.asarray(np.tile(np.array([[0.0, 0.0, 1.0]], np.float32),
                              (hit.p.shape[0], 1)))
    # reflect wo about the normal-ish direction for a same-hemisphere wi
    n = hit.ns
    wi = 2.0 * jnp.sum(wo * n, -1, keepdims=True) * n - wo
    f = np.asarray(bsdf_f(lobes, frame, wo, wi))
    expect = AMT * 1.0 / np.pi
    # 1% slack: "white" Kd goes through the RGB->30-bin spectrum
    # roundtrip (reflectance ~0.998, not exactly 1)
    np.testing.assert_allclose(f, expect, rtol=1e-2)


def test_mix_sampling_covers_both(tmp_path):
    """One-sample mixture: specular picks occur with prob ~ (1-amount),
    and the f/pdf pair is consistent for the diffuse picks."""
    lobes, frame, hit = _mix_scene_lobes(tmp_path)
    H = hit.p.shape[0]
    wo = -jnp.asarray(np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (H, 1)))
    rng = np.random.RandomState(7)
    spec_frac = []
    for trial in range(64):
        u = [jnp.asarray(rng.rand(H).astype(np.float32)) for _ in range(4)]
        s = bsdf_sample(lobes, frame, wo, u[0], u[1], u[2], u[3])
        spec_frac.append(np.asarray(s.is_specular))
        ok = np.asarray(s.valid)
        assert ok.any()
        # diffuse picks: pdf equals mixture pdf restriction = ya * pdf1
        nsm = ok & ~np.asarray(s.is_specular)
        if nsm.any():
            pdfs = np.asarray(s.pdf)[nsm]
            assert (pdfs > 0).all()
    frac = np.mean(np.stack(spec_frac))
    assert 0.4 < frac < 0.8, f"specular pick fraction {frac} vs ~{1-AMT}"
