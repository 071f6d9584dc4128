"""CLI driver + scene-file assembly smoke tests."""

import os
import sys

import numpy as np

import main as cli
from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.engine.render import render_image
from tpu_pathtracer.models.mesh import (load_staircase_scene,
                                        procedural_staircase_mesh,
                                        procedural_staircase_scene)
from tpu_pathtracer.ops.bvh import build_bvh, save_bvh_file


def test_cli_render_png(tmp_path, capsys):
    out = str(tmp_path / "o.png")
    cli.main(["--scene", "three-sphere", "--nx", "24", "--ny", "16",
              "--ns", "2", "--max-depth", "4", "-o", out,
              "--engine", "plain"])
    assert os.path.getsize(out) > 0


def test_cli_store_and_check_ref(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    args = ["--scene", "three-sphere", "--nx", "20", "--ny", "12",
            "--ns", "2", "--max-depth", "4", "--engine", "plain"]
    cli.main(args + ["--store-ref"])
    assert os.path.exists("f20-12.ref")
    cli.main(args + ["--rmse"])  # must load and compare without raising


def test_cli_stats(capsys):
    cli.main(["--scene", "three-sphere", "--nx", "16", "--ny", "8",
              "--ns", "1", "--max-depth", "3", "--stats",
              "--engine", "plain"])
    err = capsys.readouterr().err
    assert "primary" in err and "took" in err


def test_load_texture_png_semantics(tmp_path):
    """load_texture on a real PNG file must reproduce
    stbi_set_flip_vertically_on_load(true) + forced 3 channels + /255
    (staircase_scene.h:103–118)."""
    from PIL import Image

    from tpu_pathtracer.ops.texture import load_texture

    rng = np.random.RandomState(7)
    u8 = rng.randint(0, 256, (5, 3, 3), dtype=np.uint8)
    p = str(tmp_path / "t.png")
    Image.fromarray(u8, "RGB").save(p)
    arr = load_texture(p)
    assert arr.dtype == np.float32
    np.testing.assert_allclose(arr, u8[::-1].astype(np.float32) / 255.0)

    # RGBA source: alpha dropped (stbi forced 3-channel load)
    u8a = rng.randint(0, 256, (4, 6, 4), dtype=np.uint8)
    pa = str(tmp_path / "ta.png")
    Image.fromarray(u8a, "RGBA").save(pa)
    arra = load_texture(pa)
    assert arra.shape == (4, 6, 3)
    np.testing.assert_allclose(
        arra, u8a[::-1, :, :3].astype(np.float32) / 255.0)


def test_scene_from_bvh_and_texture_dir(tmp_path):
    """The full file-based assembly path — .bvh + 9 texture PNGs loaded
    from disk (staircase_scene.h:120–164) — must render bit-identically
    to the same scene assembled from in-memory arrays."""
    from PIL import Image

    from tpu_pathtracer.models.mesh import (STAIRCASE_TEXTURE_NAMES,
                                            staircase_camera,
                                            staircase_materials)
    from tpu_pathtracer.models.scene import SKY_CONST, make_scene
    from tpu_pathtracer.ops.texture import build_atlas

    v0, v1, v2, tc, mid = procedural_staircase_mesh(num_steps=4)
    mesh = build_bvh(v0, v1, v2, tc, mid, prims_per_leaf=5)
    path = str(tmp_path / "stairs.bvh")
    save_bvh_file(path, mesh)

    rng = np.random.RandomState(11)
    expected = []
    for i, name in enumerate(STAIRCASE_TEXTURE_NAMES):
        u8 = rng.randint(0, 256, (8 + i, 6, 3), dtype=np.uint8)
        Image.fromarray(u8, "RGB").save(str(tmp_path / name))
        expected.append(u8[::-1].astype(np.float32) / 255.0)

    scene, cam = load_staircase_scene(path, str(tmp_path), 24, 16)
    cfg = RenderConfig(nx=24, ny=16, ns=1, max_depth=3)
    img = render_image(scene, cam, cfg)
    assert np.isfinite(img).all()

    atlas, widths, heights = build_atlas(expected)
    scene2 = make_scene(staircase_materials(), mesh=mesh,
                        tex_atlas=atlas, tex_width=widths,
                        tex_height=heights, use_nee=True,
                        sky_mode=SKY_CONST)
    img2 = render_image(scene2, staircase_camera(24, 16), cfg)
    np.testing.assert_array_equal(img, img2)


def test_scene_from_bvh_file(tmp_path):
    """Full staircase assembly path from a BVH_00.04 file on disk
    (load_scene → setup_kernel_scene analogue, staircase_scene.h:120–184)."""
    v0, v1, v2, tc, mid = procedural_staircase_mesh(num_steps=4)
    mesh = build_bvh(v0, v1, v2, tc, mid, prims_per_leaf=5)
    path = str(tmp_path / "stairs.bvh")
    save_bvh_file(path, mesh)

    scene, cam = load_staircase_scene(path, None, 24, 16)
    cfg = RenderConfig(nx=24, ny=16, ns=1, max_depth=3, textures=False)
    img = render_image(scene, cam, cfg)
    assert img.shape == (16, 24, 3)
    assert np.isfinite(img).all()

    # must match the in-memory procedural assembly (same geometry)
    scene2, cam2 = procedural_staircase_scene(24, 16, num_steps=4)
    img2 = render_image(scene2, cam2, cfg)
    np.testing.assert_array_equal(img, img2)


def test_cli_rocks_scene(tmp_path):
    """--scene rocks dispatches the 845k-tri irregular pile end-to-end
    (CPU path: jnp traversal; the mesh builds + renders + writes)."""
    out = str(tmp_path / "rocks.png")
    cli.main(["--scene", "rocks", "--nx", "24", "--ny", "16",
              "--ns", "1", "--max-depth", "2", "-o", out,
              "--engine", "plain"])
    assert os.path.getsize(out) > 0
