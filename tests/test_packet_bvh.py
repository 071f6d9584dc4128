"""Packet BVH traversal (the large-mesh TPU path) — interpret mode.

The packet kernel must be *exactly* the brute-force oracle: identical
hits, triangle ids, t/u/v, features, and occlusion — packet voting only
changes visit order/speed, never results.
"""

import numpy as np
import jax.numpy as jnp

from tpu_pathtracer.ops import bvh as B
from tpu_pathtracer.ops.pallas_bvh import (build_packet_mesh,
                                           packet_occluded, packet_trace)
from tpu_pathtracer.ops.v3 import V3
from tpu_pathtracer.ops.vec import FLT_MAX


def _mesh(t=2000, seed=0, ppl=16):
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
    return o, d, ov, dv


def test_packet_trace_exact_vs_brute_force():
    mesh = _mesh()
    pm = build_packet_mesh(mesh)
    o, d, ov, dv = _rays(600)
    ref = B.brute_force(mesh, jnp.asarray(o), jnp.asarray(d), 1e-3, FLT_MAX)
    (t, tri, u, v, nx, ny, nz, tu, tv, mid), (nb, nsg, _nl) = packet_trace(
        ov, dv, FLT_MAX, pm.nodes, pm.blocks, pm.tri_feat, pm.cl_first,
        pm.width, 1e-3, interpret=True, stride=pm.stride, cpb=pm.cpb, smem_nodes=pm.smem_nodes)
    assert int(nb) > 0  # node-step telemetry fires (single may be 0:
    # a 600-ray packet hits both children of nearly every node)

    rt, ri = np.asarray(ref.t), np.asarray(ref.tri_id)
    np.testing.assert_array_equal(ri >= 0, np.asarray(tri) >= 0)
    hit = ri >= 0
    np.testing.assert_array_equal(ri[hit], np.asarray(tri)[hit])
    # identical MT formula, but separately compiled graphs may contract
    # mul+add into FMA differently; the 1/a division amplifies the
    # dot-product ulp on u/v by ~|1/a|, hence the looser atol there
    np.testing.assert_allclose(rt[hit], np.asarray(t)[hit], rtol=2e-6)
    np.testing.assert_allclose(np.asarray(ref.u)[hit],
                               np.asarray(u)[hit], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.v)[hit],
                               np.asarray(v)[hit], atol=1e-5)

    # captured features == gathered truth
    tid = np.maximum(np.asarray(tri), 0)
    e1 = np.asarray(mesh.v1 - mesh.v0)[tid]
    e2 = np.asarray(mesh.v2 - mesh.v0)[tid]
    n_ref = np.cross(e1, e2)
    got_n = np.stack([np.asarray(nx), np.asarray(ny), np.asarray(nz)], 1)
    np.testing.assert_allclose(got_n[hit], n_ref[hit],
                               rtol=2e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mid)[hit],
                                  np.asarray(mesh.mesh_id)[tid][hit])
    tc = np.asarray(mesh.tex_coords)[tid]
    uu, vv = np.asarray(u), np.asarray(v)
    w0 = 1.0 - uu - vv
    tu_ref = uu * tc[:, 2] + vv * tc[:, 4] + w0 * tc[:, 0]
    tv_ref = uu * tc[:, 3] + vv * tc[:, 5] + w0 * tc[:, 1]
    np.testing.assert_allclose(np.asarray(tu)[hit], tu_ref[hit], atol=1e-5)
    np.testing.assert_allclose(np.asarray(tv)[hit], tv_ref[hit], atol=1e-5)


def test_packet_quad_and_fused_variants_bit_identical():
    """The 4-ary grandchild step and the fused node->leaf body change
    loop structure only: every output must be bit-identical to the
    binary/unfused kernel (same leaf set, same per-leaf MT order)."""
    mesh = _mesh(t=4000, seed=11, ppl=16)
    pm = build_packet_mesh(mesh)
    assert pm.smem_nodes and pm.cl_first >= 8  # quad path engages
    o, d, ov, dv = _rays(700, seed=12)

    def run(**kw):
        outs, _ = packet_trace(
            ov, dv, FLT_MAX, pm.nodes, pm.blocks, pm.tri_feat,
            pm.cl_first, pm.width, 1e-3, interpret=True,
            stride=pm.stride, cpb=pm.cpb, smem_nodes=pm.smem_nodes, **kw)
        return [np.asarray(x) for x in outs]

    base = run(fused=False, quad=False)
    for kw in ({"fused": True, "quad": False},
               {"fused": False, "quad": True},
               {"fused": True, "quad": True}):
        got = run(**kw)
        for b, g in zip(base, got):
            np.testing.assert_array_equal(b, g, err_msg=str(kw))

    tmax = 15.0
    occ_base, _ = packet_occluded(
        ov, dv, tmax, pm.nodes, pm.blocks, pm.cl_first, pm.width, 1e-3,
        interpret=True, stride=pm.stride, cpb=pm.cpb,
        smem_nodes=pm.smem_nodes, fused=False, quad=False)
    occ_quad, _ = packet_occluded(
        ov, dv, tmax, pm.nodes, pm.blocks, pm.cl_first, pm.width, 1e-3,
        interpret=True, stride=pm.stride, cpb=pm.cpb,
        smem_nodes=pm.smem_nodes, fused=True, quad=True)
    np.testing.assert_array_equal(np.asarray(occ_base),
                                  np.asarray(occ_quad))


def test_packet_scratch_state_bit_identical():
    """The VMEM scratch-ref lane state variant (config.packet_scratch)
    only moves where closest/besti (nearest) and closest/occ (any-hit)
    live — every output must be bit-equal, alone and with prefetch."""
    mesh = _mesh(t=4000, seed=31, ppl=16)
    pm = build_packet_mesh(mesh)
    o, d, ov, dv = _rays(700, seed=32)
    kw = dict(interpret=True, stride=pm.stride, cpb=pm.cpb,
              smem_nodes=pm.smem_nodes)
    base, cb = packet_trace(ov, dv, FLT_MAX, pm.nodes, pm.blocks,
                            pm.tri_feat, pm.cl_first, pm.width, 1e-3,
                            **kw)
    occ_b, _ = packet_occluded(ov, dv, 15.0, pm.nodes, pm.blocks,
                               pm.cl_first, pm.width, 1e-3, **kw)
    for pf in (False, True):
        got, cg = packet_trace(ov, dv, FLT_MAX, pm.nodes, pm.blocks,
                               pm.tri_feat, pm.cl_first, pm.width,
                               1e-3, scratch=True, prefetch=pf, **kw)
        for b, g in zip(base, got):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(g))
        assert all(int(x) == int(y) for x, y in zip(cb, cg))
        occ_s, _ = packet_occluded(ov, dv, 15.0, pm.nodes, pm.blocks,
                                   pm.cl_first, pm.width, 1e-3,
                                   scratch=True, prefetch=pf, **kw)
        np.testing.assert_array_equal(np.asarray(occ_b),
                                      np.asarray(occ_s))


def test_packed_next_leaf_prefetch_bit_identical():
    """The packed-layout next-leaf prefetch (pf1 — the pop target after
    a leaf visit is a pure scalar function of idx/bs, so its block DMA
    starts under the MT loop) only moves copies between two SMEM
    slots: nearest and any-hit outputs must be bit-equal to
    prefetch=False on the packed (stride<128) layout the pair scheme
    can't serve."""
    mesh = _mesh(t=4000, seed=41, ppl=64)
    pm = build_packet_mesh(mesh, max_width=64)  # width 64 -> packed
    assert pm.stride < 128 and pm.blocks.ndim == 3  # packed layout
    o, d, ov, dv = _rays(700, seed=42)
    kw = dict(interpret=True, stride=pm.stride, cpb=pm.cpb,
              smem_nodes=pm.smem_nodes)
    off, c_off = packet_trace(ov, dv, FLT_MAX, pm.nodes, pm.blocks,
                              pm.tri_feat, pm.cl_first, pm.width, 1e-3,
                              prefetch=False, **kw)
    on, c_on = packet_trace(ov, dv, FLT_MAX, pm.nodes, pm.blocks,
                            pm.tri_feat, pm.cl_first, pm.width, 1e-3,
                            prefetch=True, **kw)
    for b, g in zip(off, on):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(g))
    assert all(int(x) == int(y) for x, y in zip(c_off, c_on))
    occ_off, _ = packet_occluded(ov, dv, 15.0, pm.nodes, pm.blocks,
                                 pm.cl_first, pm.width, 1e-3,
                                 prefetch=False, **kw)
    occ_on, _ = packet_occluded(ov, dv, 15.0, pm.nodes, pm.blocks,
                                pm.cl_first, pm.width, 1e-3,
                                prefetch=True, **kw)
    np.testing.assert_array_equal(np.asarray(occ_off),
                                  np.asarray(occ_on))


def test_packed_pair_prefetch_bit_identical():
    """The packed-layout pair prefetch (pf2, config.pair_pf) covers
    every leaf visit at the node step that descends into it — outputs
    must be bit-equal to prefetch off, nearest and any-hit."""
    mesh = _mesh(t=4000, seed=43, ppl=64)
    pm = build_packet_mesh(mesh, max_width=64)  # packed layout
    assert pm.stride < 128 and pm.blocks.ndim == 3
    o, d, ov, dv = _rays(700, seed=44)
    kw = dict(interpret=True, stride=pm.stride, cpb=pm.cpb,
              smem_nodes=pm.smem_nodes)
    off, c_off = packet_trace(ov, dv, FLT_MAX, pm.nodes, pm.blocks,
                              pm.tri_feat, pm.cl_first, pm.width, 1e-3,
                              prefetch=False, **kw)
    on, c_on = packet_trace(ov, dv, FLT_MAX, pm.nodes, pm.blocks,
                            pm.tri_feat, pm.cl_first, pm.width, 1e-3,
                            prefetch=False, pair_pf=True, **kw)
    for b, g in zip(off, on):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(g))
    assert all(int(x) == int(y) for x, y in zip(c_off, c_on))
    occ_off, _ = packet_occluded(ov, dv, 15.0, pm.nodes, pm.blocks,
                                 pm.cl_first, pm.width, 1e-3,
                                 prefetch=False, **kw)
    occ_on, _ = packet_occluded(ov, dv, 15.0, pm.nodes, pm.blocks,
                                pm.cl_first, pm.width, 1e-3,
                                prefetch=False, pair_pf=True, **kw)
    np.testing.assert_array_equal(np.asarray(occ_off),
                                  np.asarray(occ_on))


def test_packet_oct_step_bit_identical():
    """The 8-ary great-grandchild step (oct=True) changes loop
    structure only: outputs must be bit-identical to the binary and
    4-ary kernels (same accepted set; ties aside, same winners)."""
    mesh = _mesh(t=8000, seed=21, ppl=16)
    pm = build_packet_mesh(mesh)
    assert pm.smem_nodes and pm.cl_first >= 16  # oct path engages
    o, d, ov, dv = _rays(700, seed=22)

    def run(**kw):
        outs, cnts = packet_trace(
            ov, dv, FLT_MAX, pm.nodes, pm.blocks, pm.tri_feat,
            pm.cl_first, pm.width, 1e-3, interpret=True,
            stride=pm.stride, cpb=pm.cpb, smem_nodes=pm.smem_nodes, **kw)
        return [np.asarray(x) for x in outs], cnts

    base, _ = run(fused=False, quad=False)
    quad, quad_c = run(fused=True, quad=True)
    octs, oct_c = run(fused=True, quad=True, oct=True)
    for b, g in zip(base, quad):
        np.testing.assert_array_equal(b, g)
    for b, g in zip(base, octs):
        np.testing.assert_array_equal(b, g)
    # telemetry fires (visit COUNTS may differ slightly: ordering votes
    # see great-grandchild mins, so closest can shrink in a different
    # order than the 4-ary walk)
    assert int(oct_c[2]) > 0 and int(oct_c[0]) > 0

    tmax = 15.0

    def run_occ(**kw):
        occ, _ = packet_occluded(
            ov, dv, tmax, pm.nodes, pm.blocks, pm.cl_first, pm.width,
            1e-3, interpret=True, stride=pm.stride, cpb=pm.cpb,
            smem_nodes=pm.smem_nodes, **kw)
        return np.asarray(occ)

    np.testing.assert_array_equal(run_occ(fused=False, quad=False),
                                  run_occ(fused=True, quad=True,
                                          oct=True))


def test_packet_occluded_matches_nearest():
    mesh = _mesh(t=1500, seed=3)
    pm = build_packet_mesh(mesh)
    o, d, ov, dv = _rays(600, seed=4)
    ref = B.brute_force(mesh, jnp.asarray(o), jnp.asarray(d), 1e-3, FLT_MAX)
    tmax = 15.0
    occ, _counts = packet_occluded(ov, dv, tmax, pm.nodes, pm.blocks,
                                   pm.cl_first, pm.width, 1e-3,
                                   interpret=True, stride=pm.stride,
                                   cpb=pm.cpb, smem_nodes=pm.smem_nodes)
    truth = (np.asarray(ref.tri_id) >= 0) & (np.asarray(ref.t) < tmax)
    np.testing.assert_array_equal(np.asarray(occ), truth)


def test_packet_grouping_of_small_leaves():
    """prims_per_leaf=5 (the reference's default) groups into ≤128-tri
    clusters; results stay exact."""
    mesh = _mesh(t=900, seed=5, ppl=5)
    pm = build_packet_mesh(mesh)
    assert pm.width == 80 and pm.stride == 128 and pm.cpb == 1
    o, d, ov, dv = _rays(300, seed=6)
    ref = B.brute_force(mesh, jnp.asarray(o), jnp.asarray(d), 1e-3, FLT_MAX)
    (t, tri, *_), _counts = packet_trace(
        ov, dv, FLT_MAX, pm.nodes, pm.blocks, pm.tri_feat, pm.cl_first,
        pm.width, 1e-3, interpret=True, stride=pm.stride, cpb=pm.cpb, smem_nodes=pm.smem_nodes)
    hit = np.asarray(ref.tri_id) >= 0
    np.testing.assert_array_equal(np.asarray(ref.tri_id)[hit],
                                  np.asarray(tri)[hit])
    np.testing.assert_allclose(np.asarray(ref.t)[hit],
                               np.asarray(t)[hit], rtol=2e-6)


def test_packet_render_end_to_end():
    """Tiny forced-packet render == the jnp-traversal render (the packet
    path swaps the traversal + feature plumbing, not the radiance math)."""
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.engine.render import render_image
    from tpu_pathtracer.models.shapes import knot_zoo_scene
    from tpu_pathtracer.utils.golden import rmse

    cfg = RenderConfig(nx=16, ny=8, ns=1, max_depth=3, rays_per_chunk=128,
                       textures=False)
    scene, cam = knot_zoo_scene(cfg.nx, cfg.ny, nu=48, nv=12,
                                prims_per_leaf=32)  # 1152 tris
    ref = render_image(scene, cam, cfg)
    forced = cfg.replace(force_feat_kernels=True, packet_threshold=1)
    img = render_image(scene, cam, forced)
    assert rmse(ref, img) < 1e-5


def test_packet_narrow_width_packed_layout():
    """Power-of-two narrow clusters (width 32 -> cpb 2 siblings per DMA
    block) stay exactly equal to brute force."""
    mesh = _mesh(t=3000, seed=7, ppl=32)
    pm = build_packet_mesh(mesh, max_width=32, packed=True)
    assert pm.width == 32 and pm.stride == 32 and pm.cpb == 2
    assert pm.blocks.shape[1:] == (8, 128)
    o, d, ov, dv = _rays(500, seed=8)
    ref = B.brute_force(mesh, jnp.asarray(o), jnp.asarray(d), 1e-3, FLT_MAX)
    (t, tri, *_), _counts = packet_trace(
        ov, dv, FLT_MAX, pm.nodes, pm.blocks, pm.tri_feat, pm.cl_first,
        pm.width, 1e-3, interpret=True, stride=pm.stride, cpb=pm.cpb, smem_nodes=pm.smem_nodes)
    hit = np.asarray(ref.tri_id) >= 0
    np.testing.assert_array_equal(hit, np.asarray(tri) >= 0)
    np.testing.assert_array_equal(np.asarray(ref.tri_id)[hit],
                                  np.asarray(tri)[hit])
    np.testing.assert_allclose(np.asarray(ref.t)[hit],
                               np.asarray(t)[hit], rtol=2e-6)
    occ, _c = packet_occluded(ov, dv, 12.0, pm.nodes, pm.blocks,
                              pm.cl_first, pm.width, 1e-3, interpret=True,
                              stride=pm.stride, cpb=pm.cpb, smem_nodes=pm.smem_nodes)
    truth = hit & (np.asarray(ref.t) < 12.0)
    np.testing.assert_array_equal(np.asarray(occ), truth)


def test_packet_wide_legacy_layout():
    """Cluster widths above 128 (prims_per_leaf=256) use the legacy
    padded layout with a multi-row lane stride and stay exact."""
    mesh = _mesh(t=2000, seed=9, ppl=256)
    pm = build_packet_mesh(mesh, max_width=256)
    assert pm.width == 256 and pm.stride == 256 and pm.cpb == 1
    o, d, ov, dv = _rays(400, seed=10)
    ref = B.brute_force(mesh, jnp.asarray(o), jnp.asarray(d), 1e-3, FLT_MAX)
    (t, tri, *_), _counts = packet_trace(
        ov, dv, FLT_MAX, pm.nodes, pm.blocks, pm.tri_feat, pm.cl_first,
        pm.width, 1e-3, interpret=True, stride=pm.stride, cpb=pm.cpb,
        smem_nodes=pm.smem_nodes)
    hit = np.asarray(ref.tri_id) >= 0
    np.testing.assert_array_equal(hit, np.asarray(tri) >= 0)
    np.testing.assert_array_equal(np.asarray(ref.tri_id)[hit],
                                  np.asarray(tri)[hit])
    np.testing.assert_allclose(np.asarray(ref.t)[hit],
                               np.asarray(t)[hit], rtol=2e-6)


def test_packet_hybrid_node_table():
    """Tables over the SMEM budget use the hybrid path (top rows SMEM,
    deep rows VMEM) and stay exact. A tiny forced budget exercises the
    per-step branch on a small mesh."""
    mesh = _mesh(t=3000, seed=11, ppl=8)
    pm = build_packet_mesh(mesh, max_width=32, smem_budget_floats=200)
    assert not pm.smem_nodes and pm.top_rows == 16
    o, d, ov, dv = _rays(500, seed=12)
    ref = B.brute_force(mesh, jnp.asarray(o), jnp.asarray(d), 1e-3, FLT_MAX)
    (t, tri, *_), _counts = packet_trace(
        ov, dv, FLT_MAX, pm.nodes, pm.blocks, pm.tri_feat, pm.cl_first,
        pm.width, 1e-3, interpret=True, stride=pm.stride, cpb=pm.cpb,
        smem_nodes=pm.smem_nodes, top_rows=pm.top_rows,
        nodes_top=pm.nodes_top)
    hit = np.asarray(ref.tri_id) >= 0
    np.testing.assert_array_equal(hit, np.asarray(tri) >= 0)
    np.testing.assert_array_equal(np.asarray(ref.tri_id)[hit],
                                  np.asarray(tri)[hit])
    np.testing.assert_allclose(np.asarray(ref.t)[hit],
                               np.asarray(t)[hit], rtol=2e-6)
    occ, _c = packet_occluded(ov, dv, 14.0, pm.nodes, pm.blocks,
                              pm.cl_first, pm.width, 1e-3, interpret=True,
                              stride=pm.stride, cpb=pm.cpb,
                              smem_nodes=pm.smem_nodes,
                              top_rows=pm.top_rows,
                              nodes_top=pm.nodes_top)
    truth = hit & (np.asarray(ref.t) < 14.0)
    np.testing.assert_array_equal(np.asarray(occ), truth)


def test_non_pow2_leaf_row_warns_and_falls_back():
    """An externally loaded .bvh whose leaf row is not a power of two
    cannot take the packet kernel; the dispatch must warn about the
    ~75x-slower gather fallback instead of silently regressing
    (engine/wavefront.py:_use_packet)."""
    import dataclasses
    import warnings

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.engine.wavefront import _use_packet
    from tpu_pathtracer.models.presets import model_coat
    from tpu_pathtracer.models.scene import make_materials, make_scene

    mesh = _mesh(t=2000, ppl=16)
    scene = make_scene(make_materials([model_coat()] * 5), mesh=mesh)
    cfg = RenderConfig(nx=8, ny=8, ns=1, packet_threshold=100,
                       force_feat_kernels=True)
    assert _use_packet(scene, cfg)

    bad = dataclasses.replace(scene, mesh=dataclasses.replace(
        mesh, first_leaf=mesh.first_leaf + 1))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert not _use_packet(bad, cfg)
    assert any("power-of-two" in str(w.message) for w in caught)


def test_auto_pool_size_on_packet_path():
    """rays_per_chunk=0 auto-selects the 192k lane pool when the packet
    kernel is active (128k when image textures are, their carry tips
    192k into spill — measured sweeps, PERFORMANCE.md +
    experiments/pool_probe.py) and the 32k pool otherwise (r4 sweep:
    the lane-layout kernels shifted the non-packet optimum 16k→32k)."""
    import numpy as np

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.engine.regen import _pool_size
    from tpu_pathtracer.models.presets import model_coat
    from tpu_pathtracer.models.scene import make_materials, make_scene

    mesh = _mesh(t=2000, ppl=16)
    scene = make_scene(make_materials([model_coat()] * 5), mesh=mesh)
    big = RenderConfig(nx=512, ny=512, ns=1, packet_threshold=100,
                       force_feat_kernels=True)
    small = RenderConfig(nx=512, ny=512, ns=1, force_feat_kernels=True)
    assert _pool_size(big, big.num_pixels, scene) == 3 << 16
    assert _pool_size(small, small.num_pixels, scene) == 1 << 15
    tex = make_scene(make_materials([model_coat()] * 5), mesh=mesh,
                     tex_atlas=np.zeros((1, 2, 2, 3), np.float32),
                     tex_width=[2], tex_height=[2])
    assert _pool_size(big, big.num_pixels, tex) == 1 << 17
    assert _pool_size(big.replace(textures=False), big.num_pixels,
                      tex) == 3 << 16
    override = RenderConfig(nx=512, ny=512, ns=1, packet_threshold=100,
                            force_feat_kernels=True, rays_per_chunk=4096)
    assert _pool_size(override, override.num_pixels, scene) == 4096


def test_packet_quantized_node_table():
    """Quantized node tables (uint16 bounds vs the root box, packed 3
    int32 words/node, rounded outward at build time) must stay EXACT:
    dequantized boxes contain the true boxes, so only visit counts may
    change — hits, ids, and t are identical to the f32-table kernel."""
    mesh = _mesh(t=3000, seed=21, ppl=8)
    pm32 = build_packet_mesh(mesh, max_width=32, quant_nodes=False)
    pmq = build_packet_mesh(mesh, max_width=32, quant_nodes=True)
    assert pmq.quant and pmq.smem_nodes
    assert pmq.nodes.dtype == jnp.int32
    assert pmq.nodes.shape == (2 * pmq.cl_first * 3,)
    o, d, ov, dv = _rays(500, seed=22)
    (t0, tri0, *_), (nb0, ns0, nl0) = packet_trace(
        ov, dv, FLT_MAX, pm32.nodes, pm32.blocks, pm32.tri_feat,
        pm32.cl_first, pm32.width, 1e-3, interpret=True,
        stride=pm32.stride, cpb=pm32.cpb, smem_nodes=pm32.smem_nodes)
    (t1, tri1, *_), (nb1, ns1, nl1) = packet_trace(
        ov, dv, FLT_MAX, pmq.nodes, pmq.blocks, pmq.tri_feat,
        pmq.cl_first, pmq.width, 1e-3, interpret=True,
        stride=pmq.stride, cpb=pmq.cpb, smem_nodes=True,
        quant=True, qparams=pmq.qparams)
    np.testing.assert_array_equal(np.asarray(tri0), np.asarray(tri1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    # conservative boxes: visits may only grow, and only slightly
    assert int(nl1) >= int(nl0)
    assert int(nl1) <= int(nl0) * 1.2 + 8
    # the 8-ary step over the quantized table (dragon production shape)
    if pmq.cl_first >= 16:
        (t8, tri8, *_), _ = packet_trace(
            ov, dv, FLT_MAX, pmq.nodes, pmq.blocks, pmq.tri_feat,
            pmq.cl_first, pmq.width, 1e-3, interpret=True,
            stride=pmq.stride, cpb=pmq.cpb, smem_nodes=True,
            quant=True, qparams=pmq.qparams, oct=True)
        np.testing.assert_array_equal(np.asarray(tri0), np.asarray(tri8))
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t8))
    occ0, _ = packet_occluded(ov, dv, 14.0, pm32.nodes, pm32.blocks,
                              pm32.cl_first, pm32.width, 1e-3,
                              interpret=True, stride=pm32.stride,
                              cpb=pm32.cpb, smem_nodes=pm32.smem_nodes)
    occ1, _ = packet_occluded(ov, dv, 14.0, pmq.nodes, pmq.blocks,
                              pmq.cl_first, pmq.width, 1e-3,
                              interpret=True, stride=pmq.stride,
                              cpb=pmq.cpb, smem_nodes=True, quant=True,
                              qparams=pmq.qparams)
    np.testing.assert_array_equal(np.asarray(occ0), np.asarray(occ1))


def test_quantized_auto_selection_and_sentinels():
    """auto picks quant only when the f32 table misses the SMEM budget;
    the builder's empty-subtree sentinels stay inverted after
    quantization (never spuriously hittable)."""
    mesh = _mesh(t=3000, seed=23, ppl=8)
    # small mesh, default budget: f32 SMEM wins
    assert not build_packet_mesh(mesh, max_width=32).quant
    # forced budget: f32 misses, quant fits at 3/2 of the budget
    n_nodes = 2 * build_packet_mesh(mesh, max_width=32).cl_first
    pm = build_packet_mesh(mesh, max_width=32,
                           smem_budget_floats=n_nodes * 4)
    assert pm.quant
    # sentinel check: decode every node; inverted f32 boxes (empty
    # subtrees) must decode to inverted quantized boxes
    words = np.asarray(pm.nodes).view(np.uint32).reshape(-1, 3)
    qmin = np.stack([words[:, 0] & 0xFFFF, words[:, 0] >> 16,
                     words[:, 1] & 0xFFFF], 1).astype(np.float64)
    qmax = np.stack([words[:, 1] >> 16, words[:, 2] & 0xFFFF,
                     words[:, 2] >> 16], 1).astype(np.float64)
    s = np.asarray(pm.qparams[:3], np.float64)
    o = np.asarray(pm.qparams[3:6], np.float64)
    dmin = (qmin * s + o).astype(np.float32)
    dmax = (qmax * s + o).astype(np.float32)
    bmin = np.asarray(mesh.bvh_min[:qmin.shape[0]])
    bmax = np.asarray(mesh.bvh_max[:qmin.shape[0]])
    real = bmin[:, 0] <= bmax[:, 0]
    # real boxes: dequantized bounds contain the true bounds
    assert (dmin[real] <= bmin[real]).all()
    assert (dmax[real] >= bmax[real]).all()
    # sentinel boxes stay inverted in every axis
    assert (dmin[~real] > dmax[~real]).all()


def test_multipacket_bit_identical_to_single():
    """The multi-packet kernels (packs>1) interleave independent packets
    for latency amortization; each packet's traversal order is the
    single-packet unfused/binary order, so every output AND the
    node/leaf counters must be bit-identical to packs=1 (fused=False,
    quad=False) — padding differences included."""
    mesh = _mesh(t=4000, seed=21, ppl=16)
    pm = build_packet_mesh(mesh)
    assert pm.smem_nodes
    o, d, ov, dv = _rays(3000, seed=22)

    def run(**kw):
        outs, cnts = packet_trace(
            ov, dv, FLT_MAX, pm.nodes, pm.blocks, pm.tri_feat,
            pm.cl_first, pm.width, 1e-3, interpret=True,
            stride=pm.stride, cpb=pm.cpb, smem_nodes=pm.smem_nodes, **kw)
        return ([np.asarray(x) for x in outs],
                [int(c) for c in cnts])

    # outputs: identical to EVERY variant; counters: identical to the
    # production single config (fused+quad — the mp kernel implements
    # the same fused/quad rules per packet)
    base, base_c = run(fused=True, quad=True)
    base_bin, _ = run(fused=False, quad=False)
    for b, g in zip(base, base_bin):
        np.testing.assert_array_equal(b, g)
    for packs in (2, 4):
        for kw in ({"scratch": False}, {"scratch": True},
                   {"split": True}):
            got, got_c = run(packs=packs, **kw)
            for b, g in zip(base, got):
                np.testing.assert_array_equal(
                    b, g, err_msg=f"packs={packs} {kw}")
            assert base_c == got_c, \
                f"packs={packs} {kw}: {base_c} != {got_c}"

    tmax = 15.0
    occ_base, occ_bc = packet_occluded(
        ov, dv, tmax, pm.nodes, pm.blocks, pm.cl_first, pm.width, 1e-3,
        interpret=True, stride=pm.stride, cpb=pm.cpb,
        smem_nodes=pm.smem_nodes, fused=True, quad=True)
    for kw in ({"scratch": False}, {"scratch": True}, {"split": True}):
        occ_mp, occ_mc = packet_occluded(
            ov, dv, tmax, pm.nodes, pm.blocks, pm.cl_first, pm.width,
            1e-3, interpret=True, stride=pm.stride, cpb=pm.cpb,
            smem_nodes=pm.smem_nodes, packs=4, **kw)
        np.testing.assert_array_equal(np.asarray(occ_base),
                                      np.asarray(occ_mp))
        assert [int(c) for c in occ_bc] == [int(c) for c in occ_mc]


def test_multipacket_quantized_table():
    """packs>1 with the quantized SMEM node table (the dragon-class
    configuration) must match the single-packet quantized kernel."""
    mesh = _mesh(t=4000, seed=31, ppl=16)
    pmq = build_packet_mesh(mesh, quant_nodes=True)
    assert pmq.quant
    o, d, ov, dv = _rays(2000, seed=32)

    def run(**kw):
        outs, _ = packet_trace(
            ov, dv, FLT_MAX, pmq.nodes, pmq.blocks, pmq.tri_feat,
            pmq.cl_first, pmq.width, 1e-3, interpret=True,
            stride=pmq.stride, cpb=pmq.cpb, smem_nodes=pmq.smem_nodes,
            quant=True, qparams=pmq.qparams, **kw)
        return [np.asarray(x) for x in outs]

    base = run(fused=False, quad=False)
    got = run(packs=4)
    for b, g in zip(base, got):
        np.testing.assert_array_equal(b, g)
    got_s = run(packs=4, split=True)
    for b, g in zip(base, got_s):
        np.testing.assert_array_equal(b, g)


def test_multipacket_on_packed_blocks():
    """packs>1 on the PACKED (4 KB, stride-64) block layout — the
    default heap layout at width 64 since r4 — must stay bit-identical
    to packs=1 (validated on hardware by experiments/dragon_mp_ab.py:
    identical means; this pins it in CI)."""
    mesh = _mesh(t=3000, seed=31, ppl=16)
    pm = build_packet_mesh(mesh, max_width=64)
    assert pm.stride == 64 and pm.cpb == 1  # packed="auto" engaged
    o, d, ov, dv = _rays(2000, seed=32)

    def run(**kw):
        outs, cnts = packet_trace(
            ov, dv, FLT_MAX, pm.nodes, pm.blocks, pm.tri_feat,
            pm.cl_first, pm.width, 1e-3, interpret=True,
            stride=pm.stride, cpb=pm.cpb, smem_nodes=pm.smem_nodes, **kw)
        return [np.asarray(x) for x in outs], [int(c) for c in cnts]

    base, base_c = run()
    got, got_c = run(packs=2, scratch=True)
    for b, g in zip(base, got):
        np.testing.assert_array_equal(b, g)
    assert base_c == got_c
