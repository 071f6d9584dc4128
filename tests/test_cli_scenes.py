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
