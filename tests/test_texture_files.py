"""imagemap texture file-loading coverage (round-2 regression class).

A crash in the texture import path shipped invisibly in round 2 because
no test ever loaded a texture from disk. These tests write real TGA and
PNG files, reference them from an `imagemap` texture in a parsed scene,
and check the shaded result — covering io decode -> mip pyramid ->
uv lookup -> material eval end-to-end (reference textures/imagemap.cpp
+ core/targa.c / stb PNG path, imageio.cpp:107-200).
"""
import os
import textwrap

import numpy as np
import pytest

from pbrt_tpu.io.image import read_image, write_image
from pbrt_tpu.scene import api, parser


def _render_plane_with_texture(tmp_path, tex_filename):
    """Orthographic-ish view of a textured quad filling the image."""
    scene = tmp_path / "tex.pbrt"
    scene.write_text(textwrap.dedent(f"""
    Film "image" "integer xresolution" [32] "integer yresolution" [32]
    Sampler "lowdiscrepancy" "integer pixelsamples" [1]
    LookAt 0 0 -3  0 0 0  0 1 0
    Camera "perspective" "float fov" [40]
    SurfaceIntegrator "directlighting"
    WorldBegin
    LightSource "distant" "point from" [0 0 -5] "point to" [0 0 0]
      "rgb L" [3.14159 3.14159 3.14159]
    Texture "pic" "color" "imagemap" "string filename" ["{tex_filename}"]
    Material "matte" "texture Kd" "pic"
    Shape "trianglemesh" "integer indices" [0 1 2 2 3 0]
      "point P" [-2 -2 0  2 -2 0  2 2 0  -2 2 0]
      "float uv" [0 0  1 0  1 1  0 1]
    WorldEnd
    """))
    api.pbrt_init({"quiet": True, "write": False})
    try:
        parser.parse_file(str(scene))
        return np.asarray(api._state.output)
    finally:
        api._state.__init__()


@pytest.mark.parametrize("ext", ["tga", "png"])
def test_imagemap_file_roundtrip(tmp_path, ext):
    """A half-red / half-green texture file must shade the plane
    red on one side and green on the other."""
    tex = np.zeros((8, 8, 3), np.float32)
    tex[:, :4, 0] = 1.0   # left half red
    tex[:, 4:, 1] = 1.0   # right half green
    fn = os.path.join(tmp_path, f"t.{ext}")
    write_image(fn, tex)
    back = read_image(fn)
    assert back.shape[-1] == 3
    img = _render_plane_with_texture(tmp_path, fn.replace("\\", "/"))
    assert np.all(np.isfinite(img))
    h, w, _ = img.shape
    left = img[h // 2, 4: w // 2 - 4]
    right = img[h // 2, w // 2 + 4: w - 4]
    # distant head-on light, albedo-dominated: red side has R >> G
    assert float(left[:, 0].mean()) > 2.0 * float(left[:, 1].mean() + 1e-6)
    assert float(right[:, 1].mean()) > 2.0 * float(right[:, 0].mean() + 1e-6)


def test_imagemap_missing_file_white_fallback(tmp_path):
    """A missing texture file must warn and shade with a white texel
    (reference imagemap.cpp:78-80), not crash — the rainbow corpus
    scene references an absent lines.tga."""
    img = _render_plane_with_texture(tmp_path, "/nonexistent/nope.tga")
    assert np.all(np.isfinite(img))
    mid = img[16, 16]
    assert 0.5 < float(mid.mean()) < 1.5
