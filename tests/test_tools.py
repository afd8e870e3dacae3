"""Tools + IO + SH unit tests."""
import numpy as np
import pytest

from pbrt_tpu.io.image import (
    read_exr, read_pfm, read_png, read_tga,
    write_exr, write_pfm, write_png, write_tga,
)


def test_image_roundtrips(tmp_path):
    img = np.random.RandomState(0).rand(23, 41, 3).astype(np.float32) * 3
    write_exr(str(tmp_path / "t.exr"), img)
    np.testing.assert_allclose(read_exr(str(tmp_path / "t.exr")), img, atol=0)
    write_pfm(str(tmp_path / "t.pfm"), img)
    np.testing.assert_allclose(read_pfm(str(tmp_path / "t.pfm")), img, atol=0)
    c = np.clip(img / 3, 0, 1)
    write_png(str(tmp_path / "t.png"), c)
    np.testing.assert_allclose(read_png(str(tmp_path / "t.png")), c, atol=0.006)
    write_tga(str(tmp_path / "t.tga"), c)
    np.testing.assert_allclose(read_tga(str(tmp_path / "t.tga")), c, atol=0.006)


def test_tiff_roundtrip(tmp_path):
    from pbrt_tpu.tools.exrtools import read_tiff, write_tiff

    img = np.random.RandomState(1).rand(17, 29, 3).astype(np.float32)
    write_tiff(str(tmp_path / "t.tiff"), img)
    np.testing.assert_allclose(read_tiff(str(tmp_path / "t.tiff")), img, atol=0.006)


def test_exrdiff_cli(tmp_path, capsys):
    from pbrt_tpu.tools.exrtools import exrdiff

    a = np.random.RandomState(2).rand(8, 8, 3).astype(np.float32)
    write_exr(str(tmp_path / "a.exr"), a)
    write_exr(str(tmp_path / "b.exr"), a * 1.5)
    assert exrdiff([str(tmp_path / "a.exr"), str(tmp_path / "a.exr")]) == 0
    assert exrdiff([str(tmp_path / "a.exr"), str(tmp_path / "b.exr")]) == 1


def test_obj_ply_converters(tmp_path):
    from pbrt_tpu.tools.converters import obj2pbrt, ply2pbrt

    obj = tmp_path / "m.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 4 3\n")
    out = tmp_path / "m.pbrt"
    assert obj2pbrt([str(obj), str(out)]) == 0
    text = out.read_text()
    assert '"integer indices"' in text and text.count("trianglemesh") == 1

    ply = tmp_path / "m.ply"
    ply.write_text(
        "ply\nformat ascii 1.0\nelement vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n")
    out2 = tmp_path / "m2.pbrt"
    assert ply2pbrt([str(ply), str(out2)]) == 0
    assert "trianglemesh" in out2.read_text()


def test_sh_orthonormal():
    """SH basis must be orthonormal under sphere quadrature."""
    import jax.numpy as jnp

    from pbrt_tpu.core import sh as shm

    dirs, w = shm.sphere_quadrature(48, 96)
    Y = shm.sh_evaluate(dirs, 3)  # [N, 16]
    gram = np.asarray(jnp.einsum("nt,nu,n->tu", Y, Y, w))
    np.testing.assert_allclose(gram, np.eye(16), atol=2e-2)


def test_sh_cosine_lobe():
    """lambda_l-convolved SH of a constant env reproduces E = pi."""
    import jax.numpy as jnp

    from pbrt_tpu.core import sh as shm

    dirs, w = shm.sphere_quadrature(32, 64)
    ones = jnp.ones((dirs.shape[0], 1))
    c = shm.project_function(ones, dirs, w, 2)  # [T, 1]
    lam = shm.lambda_l(2)
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    Yn = shm.sh_evaluate(n, 2)
    E = float((Yn[0] * lam) @ c[:, 0])
    assert abs(E - np.pi) < 0.05


def test_native_bvh_matches_python():
    from pbrt_tpu.native import native_build_bvh

    rng = np.random.RandomState(3)
    c = rng.uniform(-2, 2, (500, 3)).astype(np.float32)
    lo, hi = c - 0.05, c + 0.05
    for method in ("sah", "middle", "equal", "aac"):
        r = native_build_bvh(lo, hi, method)
        if r is None:
            pytest.skip("native builder unavailable")
        node_lo, node_hi, meta, order = r
        assert sorted(order.tolist()) == list(range(500))
        # every leaf's prims inside its bounds
        for ni in range(len(meta)):
            if meta[ni, 1] > 0:
                for k in range(meta[ni, 1]):
                    pid = order[meta[ni, 0] + k]
                    assert np.all(lo[pid] >= node_lo[ni] - 1e-4)
                    assert np.all(hi[pid] <= node_hi[ni] + 1e-4)


def test_bsdftest_strategy_matrix():
    """White-furnace energy check across BSDFs x sampling strategies
    (reference tools/bsdftest.cpp:52-110): all three estimators (BSDF /
    uniform-hemisphere / cosine-hemisphere sampling) must agree on rho
    for sampleable lobes and never exceed unit energy. Exit code 0 =
    no violation, no strategy mismatch."""
    from pbrt_tpu.tools.bsdftest import bsdftest

    assert bsdftest(["8192"]) == 0
