"""Rock-pile irregular dragon-scale mesh tests — VERDICT r4 item 3.

The 'dragon-class' knot is a smooth parametric tube with near-ideal
BVH locality; the rock pile (fBm-displaced, anisotropically scaled,
deeply interpenetrating icospheres) is the honest irregular topology
at the same triangle count. These tests pin (a) mesh validity and
genuine size irregularity, (b) crack-free displacement (shared edges
displace identically), (c) packet-traversal exactness on this
topology, and (d) a small end-to-end render.
"""

import numpy as np

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.engine.render import render_image
from tpu_pathtracer.models.shapes import rock_pile_mesh, rocks_zoo_scene
from tpu_pathtracer.ops import bvh as B
from tpu_pathtracer.ops.pallas_bvh import build_packet_mesh, packet_trace
from tpu_pathtracer.ops.v3 import V3
from tpu_pathtracer.ops.vec import FLT_MAX


def _small_pile():
    return rock_pile_mesh(n_big=2, n_small=3, seed=9)


def test_rock_pile_shape_and_irregularity():
    v0, v1, v2, tc = _small_pile()
    n = v0.shape[0]
    assert n == 2 * 5120 + 3 * 1280
    for a in (v0, v1, v2, tc):
        assert np.isfinite(a).all()
    # triangle areas must span orders of magnitude (the knot's do not)
    e1, e2 = v1 - v0, v2 - v0
    areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
    assert np.percentile(areas, 99) / np.percentile(areas, 5) > 10.0
    # deep overlap: per-rock bounding boxes must intersect each other
    sizes = [5120, 5120, 1280, 1280, 1280]
    lo, hi = [], []
    at = 0
    for s in sizes:
        pts = np.concatenate([v0[at:at + s], v1[at:at + s],
                              v2[at:at + s]])
        lo.append(pts.min(0))
        hi.append(pts.max(0))
        at += s
    overlaps = sum(
        int((np.minimum(hi[i], hi[j]) > np.maximum(lo[i], lo[j])).all())
        for i in range(5) for j in range(i + 1, 5))
    assert overlaps >= 1


def test_rock_pile_no_cracks():
    """Displacement is a pure function of position: every vertex value
    appears in >=2 triangles (faces are stored independently, so a
    per-face noise would break this)."""
    v0, v1, v2, _ = rock_pile_mesh(n_big=0, n_small=1, seed=3)
    pts = np.concatenate([v0, v1, v2])
    _, counts = np.unique(pts.round(5), axis=0, return_counts=True)
    assert (counts >= 2).mean() > 0.99


def test_rocks_packet_trace_exact_vs_brute_force():
    v0, v1, v2, tc = _small_pile()
    mid = np.ones((v0.shape[0],), np.int32)
    mesh = B.build_bvh(v0, v1, v2, tc, mid, prims_per_leaf=16)
    pm = build_packet_mesh(mesh)

    rng = np.random.RandomState(4)
    n = 300
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(2.0, 10.0, n)
    tgt = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    tgt[:, 1] = rng.uniform(0.0, 3.0, n)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ov = V3(*[np.ascontiguousarray(o[:, i]) for i in range(3)])
    dv = V3(*[np.ascontiguousarray(d[:, i]) for i in range(3)])
    ref = B.brute_force(mesh, o, d, 1e-3, FLT_MAX)
    (t, tri, *_), _c = packet_trace(
        ov, dv, FLT_MAX, pm.nodes, pm.blocks, pm.tri_feat, pm.cl_first,
        pm.width, 1e-3, interpret=True, stride=pm.stride, cpb=pm.cpb,
        smem_nodes=pm.smem_nodes)
    hit = np.asarray(ref.tri_id) >= 0
    assert hit.sum() > 50
    np.testing.assert_array_equal(hit, np.asarray(tri) >= 0)
    np.testing.assert_array_equal(np.asarray(ref.tri_id)[hit],
                                  np.asarray(tri)[hit])
    np.testing.assert_allclose(np.asarray(ref.t)[hit],
                               np.asarray(t)[hit], rtol=2e-6)


def test_rocks_scene_renders():
    cfg = RenderConfig(nx=48, ny=32, ns=2, max_depth=5, textures=False)
    scene, cam = rocks_zoo_scene(cfg.nx, cfg.ny, n_big=2, n_small=3,
                                 seed=9)
    img = render_image(scene, cam, cfg)
    assert img.shape == (32, 48, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01
