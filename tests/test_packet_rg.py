"""Regrouped (demand-packed) packet traversal — interpret mode.

The rg kernel's hits are exact per-pair MT accepts: winner triangle
ids must match the scalar packet kernel everywhere except equal-t
ties across the dense/sparse dispatch boundary (where both winners
carry the same t), and t agrees to FMA-contraction tolerance. The
dense-only configuration (dense_thresh=0) must be bit-identical.
"""

import numpy as np
import jax.numpy as jnp

from tpu_pathtracer.ops import bvh as B
from tpu_pathtracer.ops.pallas_bvh import build_packet_mesh, packet_trace
from tpu_pathtracer.ops.pallas_bvh_rg import build_packet_rg, packet_trace_rg
from tpu_pathtracer.ops.v3 import V3
from tpu_pathtracer.ops.vec import FLT_MAX


def _mesh(t=6000, seed=0, ppl=64):
    rng = np.random.RandomState(seed)
    base = rng.uniform(-10, 10, (t, 3)).astype(np.float32)
    v1 = base + rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    v2 = base + rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    tc = rng.rand(t, 6).astype(np.float32)
    mid = rng.randint(0, 5, t).astype(np.int32)
    return B.build_bvh(base, v1, v2, tc, mid, prims_per_leaf=ppl)


def _rays(n, seed=1):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ov = V3(*(jnp.asarray(o[:, k]) for k in range(3)))
    dv = V3(*(jnp.asarray(d[:, k]) for k in range(3)))
    return ov, dv


def _trace_pair(mesh, ov, dv, dense_thresh, **build_kw):
    rg = build_packet_rg(mesh, max_width=64, **build_kw)
    pm = rg.pm
    kw = dict(interpret=True, smem_nodes=pm.smem_nodes,
              top_rows=pm.top_rows, nodes_top=pm.nodes_top,
              quant=pm.quant, qparams=pm.qparams)
    outs_a, cnt_a = packet_trace(
        ov, dv, FLT_MAX, pm.nodes, pm.blocks, pm.tri_feat, pm.cl_first,
        pm.width, 1e-3, stride=pm.stride, cpb=pm.cpb, **kw)
    outs_b, cnt_b = packet_trace_rg(
        ov, dv, FLT_MAX, pm.nodes, pm.blocks, rg.blocks_rg, pm.tri_feat,
        pm.cl_first, pm.width, 1e-3, stride=pm.stride,
        dense_thresh=dense_thresh, **kw)
    return outs_a, cnt_a, outs_b, cnt_b


def _check(outs_a, outs_b, exact=False):
    ta, ia = np.asarray(outs_a[0]), np.asarray(outs_a[1])
    tb, ib = np.asarray(outs_b[0]), np.asarray(outs_b[1])
    np.testing.assert_array_equal(ia >= 0, ib >= 0)
    if exact:
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ta, tb)
        return
    # winner ids may differ only at equal-t ties (dense/sparse
    # boundary ordering); t always within FMA-contraction ulps
    mism = ia != ib
    if mism.any():
        np.testing.assert_array_equal(ta[mism], tb[mism])
    hit = ia >= 0
    np.testing.assert_allclose(ta[hit], tb[hit], rtol=2e-6)
    # u/v/normals come from the same winner_features recompute; where
    # the winner id matches they must agree tightly
    same = hit & ~mism
    for k in (2, 3, 4, 5, 6, 8):
        np.testing.assert_allclose(np.asarray(outs_a[k])[same],
                                   np.asarray(outs_b[k])[same],
                                   rtol=2e-5, atol=1e-5)


def test_rg_all_sparse_matches_scalar():
    mesh = _mesh()
    ov, dv = _rays(2048)
    outs_a, cnt_a, outs_b, cnt_b = _trace_pair(mesh, ov, dv,
                                               dense_thresh=2000)
    _check(outs_a, outs_b)
    # deferred commits may add a few % steps/visits, never fewer
    assert int(cnt_b[2]) >= int(cnt_a[2])
    assert int(cnt_b[2]) <= int(cnt_a[2]) * 1.5 + 4


def test_rg_dense_only_bit_identical():
    mesh = _mesh()
    ov, dv = _rays(2048)
    outs_a, _, outs_b, _ = _trace_pair(mesh, ov, dv, dense_thresh=0)
    _check(outs_a, outs_b, exact=True)


def test_rg_mixed_dispatch():
    mesh = _mesh()
    ov, dv = _rays(2048, seed=3)
    outs_a, _, outs_b, _ = _trace_pair(mesh, ov, dv, dense_thresh=40)
    _check(outs_a, outs_b)


def test_rg_window_overflow_flushes():
    # few clusters + many rays -> per-visit demand in the hundreds, so
    # windows flush on the pair-capacity check rather than visit count
    mesh = _mesh(t=512, ppl=64)
    ov, dv = _rays(4096, seed=5)
    outs_a, _, outs_b, _ = _trace_pair(mesh, ov, dv, dense_thresh=2000)
    _check(outs_a, outs_b)


def test_rg_quantized_node_table():
    mesh = _mesh(t=4096)
    ov, dv = _rays(1024, seed=7)
    rg = build_packet_rg(mesh, max_width=64, quant_nodes=True)
    pm = rg.pm
    assert pm.quant
    kw = dict(interpret=True, smem_nodes=pm.smem_nodes,
              top_rows=pm.top_rows, nodes_top=pm.nodes_top,
              quant=pm.quant, qparams=pm.qparams)
    outs_a, _ = packet_trace(
        ov, dv, FLT_MAX, pm.nodes, pm.blocks, pm.tri_feat, pm.cl_first,
        pm.width, 1e-3, stride=pm.stride, cpb=pm.cpb, **kw)
    outs_b, _ = packet_trace_rg(
        ov, dv, FLT_MAX, pm.nodes, pm.blocks, rg.blocks_rg, pm.tri_feat,
        pm.cl_first, pm.width, 1e-3, stride=pm.stride, dense_thresh=64,
        **kw)
    _check(outs_a, outs_b)


def test_rg_render_end_to_end():
    # engine-level: regroup on vs off through the plain renderer (the
    # rg path swaps only the traversal; t agrees to FMA ulps, so the
    # images agree to well under the golden-test bar)
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.engine.render import render_image
    from tpu_pathtracer.models.shapes import knot_zoo_scene
    from tpu_pathtracer.utils.golden import rmse

    cfg = RenderConfig(nx=16, ny=8, ns=2, max_depth=4, rays_per_chunk=128,
                       textures=False, packet_threshold=1)
    scene, cam = knot_zoo_scene(cfg.nx, cfg.ny, nu=48, nv=12,
                                prims_per_leaf=64)  # 1152 tris
    ref = render_image(scene, cam, cfg)
    img = render_image(scene, cam,
                       cfg.replace(regroup=True, regroup_dense=24))
    assert rmse(ref, img) < 1e-4
