"""SAH BVH4 explicit-stack packet traversal (ops/bvh4 + pallas_bvh4) —
interpret mode.

Same contract as the heap packet kernel (tests/test_packet_bvh.py): the
kernel must be *exactly* the brute-force oracle — identical hit masks,
original triangle ids (via tri_map), t/u/v, features, occlusion. The
SAH topology only changes visit order/speed, never results.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from tpu_pathtracer.ops import bvh as B
from tpu_pathtracer.ops.bvh4 import attach_bvh4, build_bvh4
from tpu_pathtracer.ops.pallas_bvh4 import packet_occluded4, packet_trace4
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


def test_builder_invariants():
    """Every sane triangle lands in exactly one cluster slot; every
    cluster/node is reachable exactly once from the root; child bounds
    contain their subtree's triangles."""
    mesh = _mesh(t=1777)  # deliberately non-pow2
    b4 = build_bvh4(mesh, width=32)
    tm = np.asarray(b4.tri_map)
    real = tm[tm >= 0]
    sane = np.isfinite(np.asarray(mesh.v0)).all(1)
    assert sorted(real.tolist()) == np.nonzero(sane)[0].tolist()

    refs = np.asarray(b4.refs).reshape(-1, 4)
    bounds = np.asarray(b4.bounds).reshape(-1, 4, 6)
    seen_nodes = set()
    seen_clusters = set()
    stack = [0]
    while stack:
        node = stack.pop()
        assert node not in seen_nodes
        seen_nodes.add(node)
        for k in range(4):
            r = int(refs[node, k])
            if r == 0:
                # empty slot: inverted bounds
                assert bounds[node, k, 0] > bounds[node, k, 3]
                continue
            assert bounds[node, k, 0] <= bounds[node, k, 3]
            if r > 0:
                stack.append(r - 1)
            else:
                c = -r - 1
                assert c not in seen_clusters
                seen_clusters.add(c)
                # cluster triangles inside the child box (eps slack)
                sl = slice(c * b4.width, (c + 1) * b4.width)
                ids = tm[sl]
                ids = ids[ids >= 0]
                pts = np.concatenate([np.asarray(mesh.v0)[ids],
                                      np.asarray(mesh.v1)[ids],
                                      np.asarray(mesh.v2)[ids]])
                mn, mx = bounds[node, k, :3], bounds[node, k, 3:]
                assert (pts >= mn - 1e-4).all() and (pts <= mx + 1e-4).all()
    assert len(seen_nodes) == b4.n_nodes
    assert len(seen_clusters) == b4.n_clusters


def test_trace4_exact_vs_brute_force():
    mesh = _mesh()
    b4 = build_bvh4(mesh, width=32)
    o, d, ov, dv = _rays(600)
    ref = B.brute_force(mesh, jnp.asarray(o), jnp.asarray(d), 1e-3, FLT_MAX)
    (t, tri, u, v, nx, ny, nz, tu, tv, mid), (nb, nsg, nl, nlp) = packet_trace4(
        ov, dv, FLT_MAX, b4.bounds, b4.refs, b4.blocks, b4.tri_feat,
        b4.width, 1e-3, b4.stack_cap, interpret=True)
    assert int(nb) > 0 and int(nl) > 0
    # split telemetry: pop-entered visits are a subset of all visits
    assert 0 <= int(nlp) <= int(nl)

    rt, ri = np.asarray(ref.t), np.asarray(ref.tri_id)
    tri = np.asarray(tri)
    hit = ri >= 0
    np.testing.assert_array_equal(hit, tri >= 0)
    # winner ids come back in SAH cluster-slot space
    orig = np.asarray(b4.tri_map)[np.maximum(tri, 0)]
    np.testing.assert_array_equal(ri[hit], orig[hit])
    np.testing.assert_allclose(rt[hit], np.asarray(t)[hit], rtol=2e-6)
    np.testing.assert_allclose(np.asarray(ref.u)[hit],
                               np.asarray(u)[hit], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.v)[hit],
                               np.asarray(v)[hit], atol=1e-5)

    # captured features == gathered truth (in ORIGINAL id space)
    tid = np.maximum(orig, 0)
    e1 = np.asarray(mesh.v1 - mesh.v0)[tid]
    e2 = np.asarray(mesh.v2 - mesh.v0)[tid]
    n_ref = np.cross(e1, e2)
    got_n = np.stack([np.asarray(nx), np.asarray(ny), np.asarray(nz)], 1)
    np.testing.assert_allclose(got_n[hit], n_ref[hit], rtol=2e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mid)[hit],
                                  np.asarray(mesh.mesh_id)[tid][hit])
    tc = np.asarray(mesh.tex_coords)[tid]
    uu, vv = np.asarray(u), np.asarray(v)
    w0 = 1.0 - uu - vv
    tu_ref = uu * tc[:, 2] + vv * tc[:, 4] + w0 * tc[:, 0]
    tv_ref = uu * tc[:, 3] + vv * tc[:, 5] + w0 * tc[:, 1]
    np.testing.assert_allclose(np.asarray(tu)[hit], tu_ref[hit], atol=1e-5)
    np.testing.assert_allclose(np.asarray(tv)[hit], tv_ref[hit], atol=1e-5)


def test_occluded4_exact():
    mesh = _mesh(t=3000, seed=7, ppl=32)
    b4 = build_bvh4(mesh, width=64)
    o, d, ov, dv = _rays(500, seed=8)
    ref = B.brute_force(mesh, jnp.asarray(o), jnp.asarray(d), 1e-3, FLT_MAX)
    hit = np.asarray(ref.tri_id) >= 0
    occ, _c = packet_occluded4(ov, dv, 12.0, b4.bounds, b4.refs, b4.blocks,
                               b4.width, 1e-3, b4.stack_cap, interpret=True)
    truth = hit & (np.asarray(ref.t) < 12.0)
    np.testing.assert_array_equal(np.asarray(occ), truth)
    # per-lane t_max vector (the NEE call shape), incl. dead lanes
    tmv = np.where(np.arange(500) % 3 == 0, -1.0, 9.0).astype(np.float32)
    occ2, _c = packet_occluded4(ov, dv, jnp.asarray(tmv), b4.bounds,
                                b4.refs, b4.blocks, b4.width, 1e-3,
                                b4.stack_cap, interpret=True)
    truth2 = hit & (np.asarray(ref.t) < tmv) & (tmv > 0)
    np.testing.assert_array_equal(np.asarray(occ2), truth2)


def test_prefetch_bit_identical():
    """The double-buffered leaf DMA variant (config.bvh4_pf) only moves
    the copies — every output must be bit-equal, nearest and any-hit."""
    mesh = _mesh(t=2400, seed=3)
    b4 = build_bvh4(mesh, width=32)
    o, d, ov, dv = _rays(700, seed=4)
    base = packet_trace4(ov, dv, FLT_MAX, b4.bounds, b4.refs, b4.blocks,
                         b4.tri_feat, b4.width, 1e-3, b4.stack_cap,
                         interpret=True)
    pf = packet_trace4(ov, dv, FLT_MAX, b4.bounds, b4.refs, b4.blocks,
                       b4.tri_feat, b4.width, 1e-3, b4.stack_cap,
                       interpret=True, prefetch=True)
    for a, b in zip(base[0], pf[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(base[1], pf[1]):
        assert int(a) == int(b)

    occ, _ = packet_occluded4(ov, dv, 12.0, b4.bounds, b4.refs, b4.blocks,
                              b4.width, 1e-3, b4.stack_cap, interpret=True)
    occ_pf, _ = packet_occluded4(ov, dv, 12.0, b4.bounds, b4.refs,
                                 b4.blocks, b4.width, 1e-3, b4.stack_cap,
                                 interpret=True, prefetch=True)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_pf))


def test_spec_prefetch_bit_identical():
    """The descend-entered speculative leaf DMA (config.bvh4_spec) only
    moves copies into a 3rd slot — every output must be bit-equal,
    with and without the scratch-ref lane state."""
    mesh = _mesh(t=2400, seed=7)
    b4 = build_bvh4(mesh, width=32)
    o, d, ov, dv = _rays(700, seed=8)
    base = packet_trace4(ov, dv, FLT_MAX, b4.bounds, b4.refs, b4.blocks,
                         b4.tri_feat, b4.width, 1e-3, b4.stack_cap,
                         interpret=True)
    for scr in (False, True):
        sp = packet_trace4(ov, dv, FLT_MAX, b4.bounds, b4.refs,
                           b4.blocks, b4.tri_feat, b4.width, 1e-3,
                           b4.stack_cap, interpret=True, prefetch=True,
                           spec=True, scratch=scr)
        for a, b in zip(base[0], sp[0]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(base[1], sp[1]):
            assert int(a) == int(b)


def test_pair_prefetch_bit_identical():
    """The all-leaf-children prefetch (config.bvh4_pair) only moves
    copies into per-child slots — every output must be bit-equal,
    with and without the scratch-ref lane state."""
    mesh = _mesh(t=2400, seed=11)
    b4 = build_bvh4(mesh, width=32)
    o, d, ov, dv = _rays(700, seed=12)
    base = packet_trace4(ov, dv, FLT_MAX, b4.bounds, b4.refs, b4.blocks,
                         b4.tri_feat, b4.width, 1e-3, b4.stack_cap,
                         interpret=True)
    for scr in (False, True):
        pr = packet_trace4(ov, dv, FLT_MAX, b4.bounds, b4.refs,
                           b4.blocks, b4.tri_feat, b4.width, 1e-3,
                           b4.stack_cap, interpret=True, prefetch=True,
                           pair=True, scratch=scr)
        for a, b in zip(base[0], pr[0]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(base[1], pr[1]):
            assert int(a) == int(b)


def test_scratch_state_bit_identical():
    """The VMEM scratch-ref lane state variant (config.bvh4_scratch)
    only moves where closest/besti live — every output must be
    bit-equal, alone and composed with prefetch."""
    mesh = _mesh(t=2400, seed=5)
    b4 = build_bvh4(mesh, width=32)
    o, d, ov, dv = _rays(700, seed=6)
    base = packet_trace4(ov, dv, FLT_MAX, b4.bounds, b4.refs, b4.blocks,
                         b4.tri_feat, b4.width, 1e-3, b4.stack_cap,
                         interpret=True)
    for pf in (False, True):
        scr = packet_trace4(ov, dv, FLT_MAX, b4.bounds, b4.refs,
                            b4.blocks, b4.tri_feat, b4.width, 1e-3,
                            b4.stack_cap, interpret=True, scratch=True,
                            prefetch=pf)
        for a, b in zip(base[0], scr[0]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(base[1], scr[1]):
            assert int(a) == int(b)

    occ, _ = packet_occluded4(ov, dv, 12.0, b4.bounds, b4.refs,
                              b4.blocks, b4.width, 1e-3, b4.stack_cap,
                              interpret=True)
    for pf in (False, True):
        occ_s, _ = packet_occluded4(ov, dv, 12.0, b4.bounds, b4.refs,
                                    b4.blocks, b4.width, 1e-3,
                                    b4.stack_cap, interpret=True,
                                    scratch=True, prefetch=pf)
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_s))


def test_bvh4_quantized_table_exact():
    """The uint16-quantized BVH4 table tier (dragon-class tables that
    miss the f32 SMEM budget) must stay EXACT: outward-rounded boxes
    contain the true boxes, so only visit counts may grow — hits, ids,
    and t are identical to the f32-table kernel, nearest and any-hit."""
    mesh = _mesh(t=3000, seed=11, ppl=16)
    b4 = build_bvh4(mesh, width=32)
    mq = attach_bvh4(mesh, width=32, quant=True)
    q4 = mq.bvh4
    assert q4.quant and q4.qparams is not None
    assert q4.bounds.dtype == jnp.int32
    assert q4.bounds.shape == (q4.n_nodes * 12,)
    np.testing.assert_array_equal(np.asarray(b4.refs), np.asarray(q4.refs))

    # every live dequantized box contains its f32 box; empty slots stay
    # inverted (never spuriously hittable)
    qp = np.asarray(q4.qparams, np.float64)
    words = np.asarray(q4.bounds).view(np.uint32).reshape(-1, 4, 3)
    qmin = np.stack([words[..., 0] & 0xFFFF, words[..., 0] >> 16,
                     words[..., 1] & 0xFFFF], -1).astype(np.float32)
    qmax = np.stack([words[..., 1] >> 16, words[..., 2] & 0xFFFF,
                     words[..., 2] >> 16], -1).astype(np.float32)
    dq_lo = qmin * qp[0:3].astype(np.float32) + qp[3:6].astype(np.float32)
    dq_hi = qmax * qp[0:3].astype(np.float32) + qp[3:6].astype(np.float32)
    fb = np.asarray(b4.bounds).reshape(-1, 4, 6)
    live = np.asarray(b4.refs).reshape(-1, 4) != 0
    assert (dq_lo[live] <= fb[live][:, 0:3]).all()
    assert (dq_hi[live] >= fb[live][:, 3:6]).all()
    assert (qmin[~live] > qmax[~live]).all()

    o, d, ov, dv = _rays(600, seed=12)
    (t0, tri0, *_), (nb0, ns0, nl0, _p0) = packet_trace4(
        ov, dv, FLT_MAX, b4.bounds, b4.refs, b4.blocks, b4.tri_feat,
        b4.width, 1e-3, b4.stack_cap, interpret=True)
    (t1, tri1, *_), (nb1, ns1, nl1, _p1) = packet_trace4(
        ov, dv, FLT_MAX, q4.bounds, q4.refs, q4.blocks, q4.tri_feat,
        q4.width, 1e-3, q4.stack_cap, interpret=True,
        quant=True, qparams=q4.qparams)
    np.testing.assert_array_equal(np.asarray(tri0), np.asarray(tri1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    # conservative boxes: visits may only grow, and only slightly
    assert int(nl1) >= int(nl0)
    assert int(nl1) <= int(nl0) * 1.2 + 8

    occ0, _ = packet_occluded4(ov, dv, 14.0, b4.bounds, b4.refs,
                               b4.blocks, b4.width, 1e-3, b4.stack_cap,
                               interpret=True)
    occ1, _ = packet_occluded4(ov, dv, 14.0, q4.bounds, q4.refs,
                               q4.blocks, q4.width, 1e-3, q4.stack_cap,
                               interpret=True, quant=True,
                               qparams=q4.qparams)
    np.testing.assert_array_equal(np.asarray(occ0), np.asarray(occ1))

    # prefetch composes with quant (leaf DMAs don't touch the table)
    (t2, tri2, *_), _ = packet_trace4(
        ov, dv, FLT_MAX, q4.bounds, q4.refs, q4.blocks, q4.tri_feat,
        q4.width, 1e-3, q4.stack_cap, interpret=True,
        quant=True, qparams=q4.qparams, prefetch=True)
    np.testing.assert_array_equal(np.asarray(tri0), np.asarray(tri2))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t2))


def test_bvh4_quantized_render_end_to_end():
    """Forced-quant BVH4 render through the engine dispatch == the
    jnp-traversal render (quant/qparams plumbed via config.bvh4)."""
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.engine.render import render_image
    from tpu_pathtracer.models.shapes import knot_zoo_scene
    from tpu_pathtracer.utils.golden import rmse

    cfg = RenderConfig(nx=16, ny=8, ns=1, max_depth=3, rays_per_chunk=128,
                       textures=False)
    scene, cam = knot_zoo_scene(cfg.nx, cfg.ny, nu=48, nv=12,
                                prims_per_leaf=32)
    ref = render_image(scene, cam, cfg)
    scene4 = dataclasses.replace(
        scene, mesh=attach_bvh4(scene.mesh, width=32, quant=True))
    assert scene4.mesh.bvh4.quant
    forced = cfg.replace(force_feat_kernels=True, packet_threshold=1)
    img = render_image(scene4, cam, forced)
    assert rmse(ref, img) < 1e-5


def test_bvh4_render_end_to_end():
    """Tiny forced-packet render with BVH4 tables == the jnp-traversal
    render: the SAH topology swaps traversal order only."""
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.engine.render import render_image
    from tpu_pathtracer.models.shapes import knot_zoo_scene
    from tpu_pathtracer.utils.golden import rmse

    cfg = RenderConfig(nx=16, ny=8, ns=1, max_depth=3, rays_per_chunk=128,
                       textures=False)
    scene, cam = knot_zoo_scene(cfg.nx, cfg.ny, nu=48, nv=12,
                                prims_per_leaf=32)  # 1152 tris
    ref = render_image(scene, cam, cfg)
    scene4 = dataclasses.replace(
        scene, mesh=attach_bvh4(scene.mesh, width=32))
    assert scene4.mesh.bvh4 is not None
    forced = cfg.replace(force_feat_kernels=True, packet_threshold=1)
    img = render_image(scene4, cam, forced)
    assert rmse(ref, img) < 1e-5
    # config.bvh4=False forces the heap kernel even with tables attached
    img_off = render_image(scene4, cam, forced.replace(bvh4=False))
    assert rmse(ref, img_off) < 1e-5


def test_bvh4_regen_and_tiled_match_plain():
    """The production engines (regen pool; 8-device tiled shard_map) run
    the BVH4 kernel with identical radiance."""
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.engine.regen import render_image_regen
    from tpu_pathtracer.engine.render import render_image
    from tpu_pathtracer.models.shapes import knot_zoo_scene
    from tpu_pathtracer.parallel.tiles import render_image_tiled

    cfg = RenderConfig(nx=16, ny=8, ns=1, max_depth=3, rays_per_chunk=128,
                       textures=False, force_feat_kernels=True,
                       packet_threshold=1)
    scene, cam = knot_zoo_scene(cfg.nx, cfg.ny, nu=48, nv=12,
                                prims_per_leaf=32)
    scene = dataclasses.replace(scene,
                                mesh=attach_bvh4(scene.mesh, width=32))
    plain = render_image(scene, cam, cfg)
    regen = render_image_regen(scene, cam, cfg)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(regen),
                               atol=1e-6)
    tiled = render_image_tiled(scene, cam, cfg)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(tiled))


def test_auto_tier_selection_per_mesh():
    """Per-mesh tier auto-selection (VERDICT r3 item 8): the tier is
    chosen from the mesh, not opted into per scene.

    - f32 tier: table fits SMEM_TABLE_BUDGET -> always attached
      (measured >= neutral on every workload).
    - quant tier: dragon-scale meshes attach the uint16 tables only
      when expected_cost_ratio predicts the SAH topology >=15% cheaper
      than the heap walk (QUANT_AUTO_RATIO) — irregular terrain yes
      (~0.74), the parametric dragon knot no (~0.95, measured 0.97x on
      hardware)."""
    from tpu_pathtracer.models.shapes import (knot_zoo_scene,
                                              terrain_big_zoo_scene)
    from tpu_pathtracer.ops.bvh4 import QUANT_TABLE_BUDGET

    s, _ = knot_zoo_scene(32, 32)  # 131k tris: f32 tier
    assert s.mesh.bvh4 is not None and not s.mesh.bvh4.quant

    s, _ = terrain_big_zoo_scene(32, 32)  # ~668k tris, irregular
    b4 = s.mesh.bvh4
    assert b4 is not None and b4.quant
    assert (b4.bounds.size + b4.refs.size) * 4 <= QUANT_TABLE_BUDGET

    s, _ = knot_zoo_scene(32, 32, nu=1664, nv=262)  # dragon: heap
    assert s.mesh.bvh4 is None


def test_expected_cost_ratio_orders_topologies():
    """The SA-heuristic tier criterion must order the measured
    workloads correctly: irregular terrain well under the threshold,
    the parametric knot well over (PERFORMANCE.md r3/r4 A/Bs)."""
    from tpu_pathtracer.models.shapes import (knot_zoo_scene,
                                              terrain_zoo_scene)
    from tpu_pathtracer.ops.bvh4 import (QUANT_AUTO_RATIO, _collapse4,
                                         _sah_binary_for,
                                         expected_cost_ratio)

    def ratio(scene):
        m = scene.mesh
        tris, built = _sah_binary_for(m, 64, 16)
        bounds, refs, _cl, _d = _collapse4(*built[:4], *built[5:7])
        return expected_cost_ratio(m, bounds, refs, 64)

    s, _ = terrain_zoo_scene(32, 32)
    r_terrain = ratio(s)
    s, _ = knot_zoo_scene(32, 32)
    r_knot = ratio(s)
    assert r_terrain < QUANT_AUTO_RATIO < r_knot
    assert r_terrain < 0.8      # measured 0.743
    assert r_knot > 0.9         # measured 0.959
