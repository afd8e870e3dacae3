"""EWA anisotropic texture filtering (reference core/mipmap.h:50-97 —
EWA is the reference's default; trilinear only when requested)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.textures.registry import ImageMapTexture, ShadingGeom, UVMapping2D


def _stripe_tex(trilinear):
    """128x128 horizontal stripes: value depends only on t (8 periods)."""
    h = w = 128
    tgrid = (np.arange(h) + 0.5) / h
    stripes = (np.sin(2 * np.pi * 8 * tgrid) * 0.5 + 0.5).astype(np.float32)
    img = np.repeat(stripes[:, None], w, axis=1)[..., None]
    img = np.repeat(img, 3, axis=-1)
    ImageMapTexture._cache[("__stripes__", 1.0)] = img
    return ImageMapTexture(UVMapping2D(), "__stripes__", spectral=False,
                           trilinear=trilinear)


def _sg(s, t, long_s):
    """Footprint long (0.25) along s, thin (1/256) along t."""
    n = len(s)
    p = np.zeros((n, 3), np.float32)
    uv = np.stack([s, t], -1).astype(np.float32)
    duvdx = np.tile(np.asarray([[long_s, 0.0]], np.float32), (n, 1))
    duvdy = np.tile(np.asarray([[0.0, 1.0 / 256.0]], np.float32), (n, 1))
    z3 = np.zeros((n, 3), np.float32)
    return ShadingGeom(jnp.asarray(p), jnp.asarray(uv), jnp.asarray(z3),
                       jnp.asarray(z3), jnp.asarray(duvdx),
                       jnp.asarray(duvdy))


def test_ewa_beats_trilinear_on_anisotropic_footprints():
    """A footprint long along s on stripes varying in t: EWA keeps the
    stripe signal (level from the MINOR axis) while trilinear's
    max-width level selection washes it out toward the global mean."""
    rng = np.random.RandomState(1)
    s = rng.rand(64).astype(np.float32)
    t = rng.rand(64).astype(np.float32)
    sg = _sg(s, t, long_s=0.25)
    # ground truth: the texture is constant along s, so the footprint
    # average is just the stripe value at t (thin t-extent)
    truth = (np.sin(2 * np.pi * 8 * t) * 0.5 + 0.5)

    ewa = np.asarray(_stripe_tex(trilinear=False).eval(sg))
    tri = np.asarray(_stripe_tex(trilinear=True).eval(sg))

    err_ewa = float(np.abs(ewa - truth).mean())
    err_tri = float(np.abs(tri - truth).mean())
    assert err_ewa < 0.5 * err_tri, (err_ewa, err_tri)
    assert err_ewa < 0.12, err_ewa


def test_ewa_isotropic_matches_trilinear():
    """With an isotropic footprint the two filters agree closely."""
    rng = np.random.RandomState(2)
    s = rng.rand(32).astype(np.float32)
    t = rng.rand(32).astype(np.float32)
    n = len(s)
    p = np.zeros((n, 3), np.float32)
    uv = np.stack([s, t], -1).astype(np.float32)
    d_iso = np.tile(np.asarray([[1.0 / 128.0, 0.0]], np.float32), (n, 1))
    d_iso2 = np.tile(np.asarray([[0.0, 1.0 / 128.0]], np.float32), (n, 1))
    z3 = np.zeros((n, 3), np.float32)
    sg = ShadingGeom(jnp.asarray(p), jnp.asarray(uv), jnp.asarray(z3),
                     jnp.asarray(z3), jnp.asarray(d_iso), jnp.asarray(d_iso2))
    ewa = np.asarray(_stripe_tex(trilinear=False).eval(sg))
    tri = np.asarray(_stripe_tex(trilinear=True).eval(sg))
    np.testing.assert_allclose(ewa, tri, atol=0.06)


def test_trilinear_param_honored():
    tex = _stripe_tex(trilinear=True)
    assert tex.trilinear is True
    tex2 = _stripe_tex(trilinear=False)
    assert tex2.trilinear is False
