"""OBJ mesh loading → BVH → render."""

import numpy as np

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.engine.render import render_image
from tpu_pathtracer.models.obj import load_obj, load_obj_scene

CUBE_OBJ = """\
# unit cube
v -1 -1 -1
v  1 -1 -1
v  1  1 -1
v -1  1 -1
v -1 -1  1
v  1 -1  1
v  1  1  1
v -1  1  1
vt 0 0
vt 1 0
vt 1 1
f 1/1 2/2 3/3 4/1
f 6/1 5/2 8/3 7/1
f 5/1 1/2 4/3 8/1
f 2/1 6/2 7/3 3/1
f 4/1 3/2 7/3 8/1
f 5/1 6/2 2/3 1/1
"""


def test_load_obj_quads_triangulated(tmp_path):
    p = tmp_path / "cube.obj"
    p.write_text(CUBE_OBJ)
    v0, v1, v2, tc = load_obj(str(p))
    assert v0.shape == (12, 3)  # 6 quads → 12 tris
    # all vertices on the unit cube
    allv = np.concatenate([v0, v1, v2])
    assert np.all(np.abs(allv) == 1.0)
    # texcoords picked up
    assert tc.shape == (12, 6)
    assert tc.max() == 1.0


def test_load_obj_negative_indices(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    v0, v1, v2, tc = load_obj(str(p))
    assert v0.shape == (1, 3)
    np.testing.assert_array_equal(v1[0], [1, 0, 0])


def test_obj_scene_renders(tmp_path):
    p = tmp_path / "cube.obj"
    p.write_text(CUBE_OBJ)
    scene, cam = load_obj_scene(str(p), 32, 24)
    cfg = RenderConfig(nx=32, ny=24, ns=2, max_depth=4)
    img = render_image(scene, cam, cfg)
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all()
    # the cube must be visible (image not all sky)
    assert img.std() > 0.01


def test_model_zoo_scene_renders():
    from tpu_pathtracer.models.shapes import model_zoo_scene

    scene, cam = model_zoo_scene(32, 24, "coat", nu=12, nv=8)
    assert scene.mesh.num_tris >= 2 * 12 * 8
    cfg = RenderConfig(nx=32, ny=24, ns=2, max_depth=4)
    img = render_image(scene, cam, cfg)
    assert np.isfinite(img).all()
    assert img.std() > 0.01
