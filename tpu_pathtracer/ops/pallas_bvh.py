"""Pallas TPU packet BVH traversal for large meshes.

The reference's hottest core is per-thread stack BVH traversal
(``hitBvh``, kernels.cu:154–224 — ~99% of kernel time, README.md:48).
Per-thread traversal needs per-lane gathers, which TPUs lack (measured:
Mosaic has no per-lane VMEM gather; XLA row-gathers cost ~9 ns/lane).
This kernel replaces it with *packet* (speculative) traversal, the shape
that maps to TPU hardware:

  * A packet of ``R×128`` rays shares ONE scalar traversal state
    (node index + uint32 bitstack, the dual-node scheme of
    kernels.cu:148–224). Node AABBs ride in SMEM (packed 6 floats/node,
    DMA'd once per packet; native scalar loads are 1.67× faster per
    step than VMEM lane extracts) — tables over 512 KB fall back to a
    VMEM-resident table.
  * Descent decisions are packet votes: a child is visited if ANY lane's
    slab entry beats its per-lane closest-t; near-first ordering by
    majority vote. Lanes that would not have visited a node simply fail
    its tests — per-lane nearest-hit masking keeps results exactly equal
    to per-ray traversal; coherence only affects speed.
  * Leaves are clusters of consecutive triangles (the builder's leaf
    order; 32 per cluster by default — the width sweep in PERFORMANCE.md
    shows finer leaves shrink the packet's visit union 1.2–1.3× over
    128), DMA'd HBM→SMEM (~0.1 µs for 8 KB) and tested
    triangle-by-triangle with scalar broadcasts against the whole lane
    tile; the triangle loop is fully unrolled on hardware so every SMEM
    index is static (1.39× — Mosaic pipelines across triangles).
  * The shadow variant is any-hit: a lane retires on its first hit
    (kernels.cu:207) by zeroing its closest-t so it stops voting; the
    packet exits once every lane is retired.

Triangle-hit math and accumulation order mirror ``ops/pallas_tris`` /
``ops/intersect.triangles_hit`` exactly (intersections.h:54–83) so the
packet path is bit-compatible with the brute-force oracle.
"""

from __future__ import annotations

import functools
import warnings
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pathtracer.models.scene import MeshData

_FLT_MAX = 3.4028235e38
MAX_SMEM_NODE_FLOATS = 128 * 1024  # 512 KB SMEM node-table budget
# (probed: 768 KB scratch still compiles on v5e, 1 MB does not; 512 KB
# leaves margin for the cluster block + program scalars)
MAX_SMEM_QNODE_WORDS = 192 * 1024  # 768 KB budget for QUANTIZED tables
# only: they are the last-resort for dragon-class meshes whose f32
# table can never fit, and the probed ceiling is safe with the small
# (2-16 KB) cluster block
_BBOX_T_MIN = 0.001  # intersections.h:8,:26
ROWS = 8             # sublane rows per packet -> packet = ROWS*128 rays
# Fully unroll the leaf MT loop on hardware (Mosaic supports only full
# or no unroll): static scalar indices + cross-triangle pipelining —
# measured 1.39x on staircase-hires at width 32. Interpret mode keeps
# the rolled loop (identical carries/results, 5x faster CI).


class PacketMesh(NamedTuple):
    """Device data for the packet kernel, derived from MeshData."""
    nodes: jnp.ndarray    # [n_nodes_pad, 8] f32: minx..maxz,0,0; heap from 1
    blocks: jnp.ndarray   # [n_blocks, brows, 128] f32 DMA blocks; each
    # packs cpb sibling clusters of 16*stride floats (brows >= 8 —
    # Mosaic tiles the last two dims (8,128), dim-0 slices are free)
    tri_feat: jnp.ndarray  # [n_tris_packed, 16] nx,ny,nz,tc0..5,mid rows —
    # the winner's features come from ONE post-kernel row gather instead
    # of ~10 masked tile updates per triangle visit in the hot loop
    cl_first: int         # heap index of the first cluster-level node
    width: int            # triangles per cluster (= prims_per_leaf << k)
    stride: int           # component stride within a cluster (= width for
    # power-of-two widths; 128 for the legacy padded layout)
    cpb: int              # clusters per DMA block (power of two)
    smem_nodes: bool = False  # nodes is a flat [n*6] array DMA'd to SMEM
    # at packet start (scalar loads are 1.67x faster per node step than
    # VMEM extracts); False -> [n_pad, 8] VMEM-resident table
    top_rows: int = 0     # hybrid mode for tables too big for SMEM: the
    # top `top_rows` node rows (duplicated flat in `nodes_top`) are
    # DMA'd HBM->SMEM per packet and the deeper levels read from the
    # VMEM table (steps distribute ~evenly across levels, so most steps
    # still get native scalar loads)
    nodes_top: jnp.ndarray = None  # flat [top_rows*8] copy of the top
    quant: bool = False   # nodes is a flat [n*3] int32 array of uint16
    # bounds relative to the root box, packed (minx|miny<<16),
    # (minz|maxx<<16), (maxy|maxz<<16), rounded OUTWARD at build time —
    # dequantized boxes always contain the true boxes, so traversal is
    # provably exact (extra visits only, never missed hits). Halves^2
    # the table bytes: dragon-class 65k-node tables (1.5 MB f32) fit
    # the SMEM budget at 786 KB, w=64 at 393 KB (VERDICT r2 item 2)
    qparams: jnp.ndarray = None  # [8] f32 (sx,sy,sz,lox,loy,loz,0,0)
    # dequant scales/offsets — device values (built under jit), read by
    # the kernel from a tiny SMEM input


def _tri_components(mesh: MeshData):
    """Per-triangle MT component rows (16 rows of T): v0, e1, e2, n
    (tc/mesh-id are NOT in the hot loop — the winner's features come
    from one post-kernel row gather). n = e1×e2 feeds the restructured
    MT (see ops/intersect.triangles_hit): zero-area sentinels give
    n = 0 → a = 0 → parallel → miss, same as before. Returns
    (flat [16, T], sane, e1, e2, nx, ny, nz) — shared by the scalar
    and regrouped block builders."""
    sane = jnp.isfinite(mesh.v0).all(axis=1)  # sentinel slots -> zeros
    z3 = jnp.zeros_like(mesh.v0)
    v0 = jnp.where(sane[:, None], mesh.v0, z3)
    e1 = jnp.where(sane[:, None], mesh.v1 - mesh.v0, z3)
    e2 = jnp.where(sane[:, None], mesh.v2 - mesh.v0, z3)
    nx = e1[:, 1] * e2[:, 2] - e1[:, 2] * e2[:, 1]
    ny = e1[:, 2] * e2[:, 0] - e1[:, 0] * e2[:, 2]
    nz = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    comps = [v0[:, 0], v0[:, 1], v0[:, 2],
             e1[:, 0], e1[:, 1], e1[:, 2],
             e2[:, 0], e2[:, 1], e2[:, 2],
             nx, ny, nz]
    comps += [jnp.zeros_like(nx)] * 4  # pad to 16 comps (aligned rows)
    flat = jnp.stack(comps, axis=0)              # [16, T]
    return flat, sane, e1, e2, nx, ny, nz


def build_packet_mesh(mesh: MeshData, max_width: int = 128,
                      packed: str | bool = "auto",
                      smem_budget_floats: int | None = None,
                      quant_nodes: str | bool = "auto") -> PacketMesh:
    """Group BVH leaves into ≤128-triangle clusters and pack the node
    table + SoA cluster blocks the kernel consumes.

    Works for any power-of-two complete tree (our builder and the
    reference's ``BVH_00.04`` layout, kernels.cu:614): cluster level =
    leaf level minus k where ``prims_per_leaf << k ≤ 128``; cluster
    triangles are contiguous because leaves are.
    """
    P = mesh.prims_per_leaf
    first_leaf = mesh.first_leaf
    if first_leaf & (first_leaf - 1):
        raise ValueError("packet traversal needs a complete power-of-two "
                         f"BVH; first_leaf={first_leaf}")
    k = 0
    while (P << (k + 1)) <= max_width and (first_leaf >> (k + 1)) >= 1:
        k += 1
    width = P << k
    cl_first = first_leaf >> k
    n_clusters = cl_first
    # packed layout: a cluster is 16*width contiguous floats. At
    # width 64 that is exactly ONE (8,128) block — cpb=1, stride=64,
    # every SMEM index still compile-time static — and the leaf DMA
    # halves (4 KB vs 8 KB of half-empty rows), which the r4
    # decomposition (experiments/leafmt_probe.py) measured as the
    # entire per-visit overhead: dragon 434.6 -> 413-420 ms/spp,
    # bit-identical (experiments/dragon_packed_ab.py). "auto" packs
    # exactly that case. cpb>1 packing (narrow widths) stays opt-in:
    # the dynamic sub-cluster row offset costs ~12% (r2). Packing
    # disables the speculative pair prefetch (stride<128), measured
    # worth only ~0.7% on the dragon — net win.
    if packed == "auto":
        packed = (16 * width == 1024)
    packed = packed and width >= 8 and not (width & (width - 1))

    # node table rows 0..2*cl_first (row 0 unused). Tables up to
    # MAX_SMEM_NODE_FLOATS (21845 nodes packed 6-wide) ride in SMEM
    # inside the kernel — native scalar loads beat VMEM extracts 1.67x
    # per node step (microbench; PERFORMANCE.md). Larger tables (e.g.
    # the 872k-tri dragon's 65k nodes) stay VMEM-resident 8-wide.
    n_nodes = 2 * cl_first
    budget = (MAX_SMEM_NODE_FLOATS if smem_budget_floats is None
              else smem_budget_floats)
    smem_nodes = n_nodes * 6 <= budget
    # quantized tables get the probed 768 KB ceiling (3/2 of the f32
    # budget when an explicit budget is forced, e.g. in tests)
    qbudget = (MAX_SMEM_QNODE_WORDS if smem_budget_floats is None
               else budget * 3 // 2)
    quant = (quant_nodes is True
             or (quant_nodes == "auto" and not smem_nodes
                 and n_nodes * 3 <= qbudget))
    if quant_nodes is True and n_nodes * 3 > qbudget:
        raise ValueError(f"quantized node table ({n_nodes * 3} words) "
                         f"exceeds the SMEM budget")
    if quant_nodes is False:
        quant = False
    qparams = None
    top_rows = 0
    if quant:
        # uint16 bounds relative to the root box, rounded OUTWARD (one
        # extra quantum of margin kills FMA-vs-two-step dequant edge
        # cases): the dequantized box always contains the true box, so
        # traversal stays provably exact — at most extra visits. The
        # builder's empty-subtree sentinels (min=1e30 > max=-1e30) clamp
        # to inverted quantized boxes (qmin=65534 > qmax=1), which the
        # slab test still rejects. 3 int32 words/node: a dragon-class
        # 65k-node table drops 1.5 MB -> 768 KB and fits SMEM.
        # trace-safe (jnp) build: the engine calls this inside jit with
        # a traced scene, so the table AND the dequant params are
        # device values; the kernel reads the params from a tiny SMEM
        # input instead of baked immediates.
        bmin = mesh.bvh_min[:n_nodes]
        bmax = mesh.bvh_max[:n_nodes]
        lo = mesh.bounds_min
        # /65000 (not /65535) leaves ~500 quanta of headroom so real
        # boxes never reach the clamp bounds, where outward padding
        # would otherwise be lost to the clip
        s32 = jnp.maximum((mesh.bounds_max - lo) / 65000.0, 1e-12)
        # offset must round DOWN so dequant(0) <= root lo <= any bmin
        o32 = jnp.where(lo > 0, lo * (1.0 - 3e-7) - 1e-37,
                        lo * (1.0 + 3e-7) - 1e-37)
        qmin = jnp.clip(jnp.floor((bmin - o32) / s32), 1, 65535)
        qmax = jnp.clip(jnp.ceil((bmax - o32) / s32), 0, 65534)
        # fix-up in the kernel's dequant arithmetic, then 1-quantum pad
        deq = qmin * s32 + o32
        qmin = jnp.clip(jnp.where(deq > bmin, qmin - 1, qmin) - 1,
                        0, 65535)
        deq = qmax * s32 + o32
        qmax = jnp.clip(jnp.where(deq < bmax, qmax + 1, qmax) + 1,
                        0, 65535)
        qmin = qmin.astype(jnp.uint32)
        qmax = qmax.astype(jnp.uint32)
        words = jnp.stack(
            [qmin[:, 0] | (qmin[:, 1] << 16),
             qmin[:, 2] | (qmax[:, 0] << 16),
             qmax[:, 1] | (qmax[:, 2] << 16)], axis=1)
        nodes = jax.lax.bitcast_convert_type(words, jnp.int32).reshape(-1)
        qparams = jnp.concatenate(
            [s32.astype(jnp.float32), o32.astype(jnp.float32),
             jnp.zeros((2,), jnp.float32)])
        smem_nodes = True
    elif not smem_nodes:
        # hybrid: top of the table in SMEM as (top_rows, 8) rows
        top_rows = 1
        while top_rows * 2 * 8 <= budget and top_rows * 2 <= n_nodes:
            top_rows *= 2
        if top_rows < 16:
            top_rows = 0
    if smem_nodes and not quant:
        nodes = jnp.concatenate(
            [mesh.bvh_min[:n_nodes], mesh.bvh_max[:n_nodes]],
            axis=1).reshape(-1)
    elif not smem_nodes:
        n_pad = ((n_nodes + 7) // 8) * 8
        nodes = jnp.concatenate(
            [mesh.bvh_min[:n_nodes], mesh.bvh_max[:n_nodes],
             jnp.zeros((n_nodes, 2), jnp.float32)], axis=1)
        nodes = jnp.concatenate(
            [nodes, jnp.zeros((n_pad - n_nodes, 8), jnp.float32)], axis=0)

    flat, sane, e1, e2, nx, ny, nz = _tri_components(mesh)
    cl = flat.reshape(16, n_clusters, width).transpose(1, 0, 2)
    if packed:
        # zero-waste DMA blocks: a cluster is 16*width contiguous floats;
        # pack cpb sibling clusters per (brows,128) block so narrow
        # clusters don't pad each component row to 128 lanes (8x DMA +
        # HBM waste at width 16). Siblings share a DMA -> free prefetch.
        stride = width
        cl_floats = 16 * width
        brows = max(8, cl_floats // 128)
        cpb = brows * 128 // cl_floats
        if n_clusters % cpb:
            pad = cpb - n_clusters % cpb
            cl = jnp.concatenate(
                [cl, jnp.zeros((pad, 16, width), jnp.float32)], axis=0)
        blk = cl.reshape(-1, brows, 128)
    else:
        # legacy padded layout for odd widths (e.g. prims_per_leaf=5
        # grouping to 80): component rows padded to a lane multiple
        w_pad = ((width + 127) // 128) * 128
        stride, cpb = w_pad, 1
        blk = jnp.concatenate(
            [cl, jnp.zeros((cl.shape[0], 16, w_pad - width), jnp.float32)],
            axis=2)
    # per-triangle feature rows: face normal e1×e2 (the same f32 edges the
    # kernel sees — kernels.cu:336), texcoords, mesh id, plus v0/e1/e2 so
    # the winner's u/v can be recomputed OUTSIDE the kernel (drops the
    # per-triangle bu/bv selects from the hot MT loop); row width is
    # free for TPU gathers up to 320 B
    tri_feat = jnp.stack(
        [nx, ny, nz] + [mesh.tex_coords[:, i] for i in range(6)]
        + [mesh.mesh_id.astype(jnp.float32)]
        + [jnp.where(sane, mesh.v0[:, i], 0.0) for i in range(3)]
        + [e1[:, i] for i in range(3)]
        + [e2[:, i] for i in range(3)], axis=1)
    nodes_top = (nodes[:top_rows].reshape(-1) if top_rows else None)
    return PacketMesh(nodes=nodes, blocks=blk, tri_feat=tri_feat,
                      cl_first=cl_first, width=width, stride=stride,
                      cpb=cpb, smem_nodes=smem_nodes, top_rows=top_rows,
                      nodes_top=nodes_top, quant=quant, qparams=qparams)


def _slab(b, o1, o2, o3, i1, i2, i3, n1, n2, n3, closest):
    """Entry-distance slab test of one node AABB (``b``: 6 scalar bounds
    minx,miny,minz,maxx,maxy,maxz) against the (R,128) lane tile;
    FLT_MAX on miss. Mirrors ops/intersect.bbox_hit_dist's where-form
    (C NaN semantics)."""
    t0x = (b[0] - o1) * i1
    t1x = (b[3] - o1) * i1
    t0y = (b[1] - o2) * i2
    t1y = (b[4] - o2) * i2
    t0z = (b[2] - o3) * i3
    t1z = (b[5] - o3) * i3
    lox = jnp.where(n1, t1x, t0x)
    hix = jnp.where(n1, t0x, t1x)
    loy = jnp.where(n2, t1y, t0y)
    hiy = jnp.where(n2, t0y, t1y)
    loz = jnp.where(n3, t1z, t0z)
    hiz = jnp.where(n3, t0z, t1z)
    tmin = jnp.full(o1.shape, _BBOX_T_MIN, jnp.float32)
    tmax = closest
    tmin = jnp.where(lox > tmin, lox, tmin)
    tmax = jnp.where(hix < tmax, hix, tmax)
    tmin = jnp.where(loy > tmin, loy, tmin)
    tmax = jnp.where(hiy < tmax, hiy, tmax)
    tmin = jnp.where(loz > tmin, loz, tmin)
    tmax = jnp.where(hiz < tmax, hiz, tmax)
    return jnp.where(tmax < tmin, _FLT_MAX, tmin)


def _ctz32(x):
    """Count trailing zeros of a nonzero uint32 scalar (kernels.cu:149).

    Mosaic has neither scalar popcount nor scalar bitcast, so use the
    branchless binary search (5 select+shift rounds)."""
    x = x.astype(jnp.uint32)
    n = jnp.int32(0)
    for half, mask in ((16, 0xFFFF), (8, 0xFF), (4, 0xF), (2, 0x3),
                       (1, 0x1)):
        zero = (x & jnp.uint32(mask)) == 0
        n = n + jnp.where(zero, half, 0)
        x = jnp.where(zero, x >> jnp.uint32(half), x)
    return n


def _advance_votes(lhit, rhit, closest):
    """Vector half of a node step: the two packed vote reductions.
    Split from ``_advance_apply`` so multi-packet kernels can ISSUE all
    packets' reductions before CONSUMING any — the vector->scalar sync
    is the node step's latency floor (measured 338 -> 142 ns/step at 4
    interleaved packets, experiments/dual_probe.py)."""
    trav_l = lhit < closest
    trav_r = rhit < closest
    both_m = trav_l & trav_r
    # near-first by majority of lanes that hit both (kernels.cu:183-187
    # per-ray near ordering, lifted to a packet vote). The four
    # vector->scalar reductions (2 any + 2 sum) collapse to TWO packed
    # sums — reductions are the costly part of a node step: lane counts
    # fit 16-bit fields of one int32 (valid up to 32768-lane packets —
    # larger counts would carry into the n_r field and corrupt votes),
    # and the signed sum over both-lanes of (rhit<lhit ? 1 : -1) equals
    # 2*n_pref - n_both, so majority == (sum > 0) exactly (ties and
    # equal-hit lanes count toward the left child, as before).
    assert lhit.size < 32768, "packed vote fields overflow"
    li = trav_l.astype(jnp.int32)
    ri = trav_r.astype(jnp.int32)
    pref = jnp.where(both_m,
                     jnp.where(rhit < lhit, 1, -1), 0)
    packed = jnp.sum(li + (ri << 16), dtype=jnp.int32)
    s_pref = jnp.sum(pref, dtype=jnp.int32)
    return packed, s_pref


def _advance_apply(idx, bs, packed, s_pref, l):
    """Scalar half of a node step: consume the packed votes, pick the
    near-first child / pop, update the bitstack."""
    vl = (packed & 0xFFFF) > 0
    vr = (packed >> 16) > 0
    swap = (s_pref > 0).astype(jnp.int32)

    both = vl & vr
    single = vl ^ vr
    # pop (kernels.cu:148-152)
    m = jnp.where(bs > 0, _ctz32(bs), 0)
    bs_p = (bs >> m.astype(jnp.uint32)) ^ jnp.uint32(1)
    idx_p = (idx >> m) ^ 1

    child_both = l + swap
    child_single = jnp.where(vl, l, l + 1)
    new_idx = jnp.where(both, child_both,
                        jnp.where(single, child_single, idx_p))
    new_bs = jnp.where(both, (bs << jnp.uint32(1)) + jnp.uint32(1),
                       jnp.where(single, bs << jnp.uint32(1), bs_p))
    return new_idx, new_bs, both, single


def _advance(idx, bs, lhit, rhit, closest, l):
    """Shared scalar traversal step: votes, near-first choice, bitstack.
    Returns (new_idx, new_bs, both, single)."""
    packed, s_pref = _advance_votes(lhit, rhit, closest)
    return _advance_apply(idx, bs, packed, s_pref, l)


def _pop(idx, bs):
    """Bitstack pop (kernels.cu:148-152): ascend to the lowest pending
    level's sibling; (0, bs) when the stack is empty ends traversal."""
    m = jnp.where(bs > 0, _ctz32(bs), 0)
    return (idx >> m) ^ 1, (bs >> m.astype(jnp.uint32)) ^ jnp.uint32(1)


def _advance4(idx, bs, ha, hb, hc, hd, closest):
    """Two-level traversal step over the four GRANDCHILDREN of ``idx``
    (heap rows 4idx..4idx+3: a,b under child 2idx; c,d under 2idx+1).
    Descends straight to the majority-nearest hit grandchild, pushing
    one pending bit per skipped level — the binary bitstack's pop
    reconstruction ((idx>>m)^1) is exactly right for both: popping the
    level-2 bit lands on the grandchild's pair partner, the level-1 bit
    on the uncle (which then re-tests its two children; redundant but
    conservative-correct). One scalar round trip covers two levels.

    The grandchild boxes are subsets of the skipped child boxes, so
    testing them directly is tighter than the two-step binary descent —
    never more subtree visits, same leaf set, same per-leaf MT order.
    """
    return _quad_apply(idx, bs, *_quad_votes(ha, hb, hc, hd, closest),
                       ha.size)


def _quad_votes(ha, hb, hc, hd, closest):
    """Vector half of the 4-ary step: the four packed vote reductions
    (split like _advance_votes for multi-packet interleaving)."""
    a_i = (ha < closest).astype(jnp.int32)
    b_i = (hb < closest).astype(jnp.int32)
    c_i = (hc < closest).astype(jnp.int32)
    d_i = (hd < closest).astype(jnp.int32)
    assert ha.size < 32768, "packed vote fields overflow"
    pk1 = jnp.sum(a_i + (b_i << 16), dtype=jnp.int32)
    pk2 = jnp.sum(c_i + (d_i << 16), dtype=jnp.int32)
    # near-first majorities: subtree L vs R by min grandchild entry,
    # then within each pair; the three +/-1 votes ride one packed sum
    # (biased by +1/lane so the 16-bit fields stay unsigned; the n-lane
    # bias cancels in the sign test: sum(v+1) > n  <=>  sum(v) > 0)
    minl = jnp.minimum(ha, hb)
    minr = jnp.minimum(hc, hd)
    p_lr = jnp.where((minl < closest) & (minr < closest),
                     jnp.where(minr < minl, 2, 0), 1)
    p_ab = jnp.where((ha < closest) & (hb < closest),
                     jnp.where(hb < ha, 2, 0), 1)
    p_cd = jnp.where((hc < closest) & (hd < closest),
                     jnp.where(hd < hc, 2, 0), 1)
    pk3 = jnp.sum(p_lr + (p_ab << 16), dtype=jnp.int32)
    s_cd = jnp.sum(p_cd, dtype=jnp.int32)
    return pk1, pk2, pk3, s_cd


def _quad_apply(idx, bs, pk1, pk2, pk3, s_cd, n_lanes):
    """Scalar half of the 4-ary step: consume the packed votes."""
    va = (pk1 & 0xFFFF) > 0
    vb = (pk1 >> 16) > 0
    vc = (pk2 & 0xFFFF) > 0
    vd = (pk2 >> 16) > 0
    swap_lr = (pk3 & 0xFFFF) > n_lanes
    swap_ab = (pk3 >> 16) > n_lanes
    swap_cd = s_cd > n_lanes
    vl = va | vb
    vr = vc | vd

    # level-1 choice: R first iff both subtrees hit and majority prefers
    # R, or only R hit
    go_r = jnp.where(vl & vr, swap_lr, vr)
    uncle = vl & vr
    # level-2 choice within the chosen pair
    v0 = jnp.where(go_r, vc, va)
    v1 = jnp.where(go_r, vd, vb)
    swap_p = jnp.where(go_r, swap_cd, swap_ab)
    sib = v0 & v1
    k_pair = jnp.where(sib, swap_p.astype(jnp.int32),
                       v1.astype(jnp.int32))
    new_idx_d = idx * 4 + go_r.astype(jnp.int32) * 2 + k_pair
    new_bs_d = (((bs << jnp.uint32(1))
                 | uncle.astype(jnp.uint32)) << jnp.uint32(1)) \
        | sib.astype(jnp.uint32)

    idx_p, bs_p = _pop(idx, bs)
    any_hit = vl | vr
    new_idx = jnp.where(any_hit, new_idx_d, idx_p)
    new_bs = jnp.where(any_hit, new_bs_d, bs_p)
    # telemetry: count the two covered levels' visit classes
    nb_inc = uncle.astype(jnp.int32) + sib.astype(jnp.int32)
    nsg_inc = ((vl ^ vr).astype(jnp.int32)
               + (any_hit & (v0 ^ v1)).astype(jnp.int32))
    return new_idx, new_bs, nb_inc, nsg_inc


def _oct_votes(h, closest):
    """Vector half of the 8-ary step: hit counts for the eight
    GREAT-grandchildren plus the seven hierarchical near-first ordering
    votes (quad-vs-quad, pair-vs-pair within each quad, within each
    pair), packed into eight cross-lane sums.  The hierarchy reproduces
    binary near-first order (kernels.cu:183-187) lifted three levels."""
    assert h[0].size < 32768, "packed vote fields overflow"
    hi = [(x < closest).astype(jnp.int32) for x in h]
    pk1 = jnp.sum(hi[0] + (hi[1] << 16), dtype=jnp.int32)
    pk2 = jnp.sum(hi[2] + (hi[3] << 16), dtype=jnp.int32)
    pk3 = jnp.sum(hi[4] + (hi[5] << 16), dtype=jnp.int32)
    pk4 = jnp.sum(hi[6] + (hi[7] << 16), dtype=jnp.int32)

    def pref(left, right):
        # +1/lane bias (see _quad_votes): majority == sum > n_lanes
        return jnp.where((left < closest) & (right < closest),
                         jnp.where(right < left, 2, 0), 1)

    m01 = jnp.minimum(h[0], h[1])
    m23 = jnp.minimum(h[2], h[3])
    m45 = jnp.minimum(h[4], h[5])
    m67 = jnp.minimum(h[6], h[7])
    p_q = pref(jnp.minimum(m01, m23), jnp.minimum(m45, m67))
    pk5 = jnp.sum(p_q + (pref(m01, m23) << 16), dtype=jnp.int32)
    pk6 = jnp.sum(pref(m45, m67) + (pref(h[0], h[1]) << 16),
                  dtype=jnp.int32)
    pk7 = jnp.sum(pref(h[2], h[3]) + (pref(h[4], h[5]) << 16),
                  dtype=jnp.int32)
    s8 = jnp.sum(pref(h[6], h[7]), dtype=jnp.int32)
    return pk1, pk2, pk3, pk4, pk5, pk6, pk7, s8


def _oct_apply(idx, bs, pk1, pk2, pk3, pk4, pk5, pk6, pk7, s8, n_lanes):
    """Scalar half of the 8-ary step: consume the packed votes, descend
    three levels to the majority-nearest hit great-grandchild, push one
    pending bit per level (uncle quad / other pair / pair sibling) —
    the binary bitstack's pop reconstruction (idx>>m)^1 is exactly
    right for all three, as for the 4-ary step's two."""
    va = (pk1 & 0xFFFF) > 0
    vb = (pk1 >> 16) > 0
    vc = (pk2 & 0xFFFF) > 0
    vd = (pk2 >> 16) > 0
    ve = (pk3 & 0xFFFF) > 0
    vf = (pk3 >> 16) > 0
    vg = (pk4 & 0xFFFF) > 0
    vh = (pk4 >> 16) > 0
    swap_q = (pk5 & 0xFFFF) > n_lanes
    swap_p01 = (pk5 >> 16) > n_lanes
    swap_p23 = (pk6 & 0xFFFF) > n_lanes
    sw0 = (pk6 >> 16) > n_lanes
    sw1 = (pk7 & 0xFFFF) > n_lanes
    sw2 = (pk7 >> 16) > n_lanes
    sw3 = s8 > n_lanes

    vp0 = va | vb
    vp1 = vc | vd
    vp2 = ve | vf
    vp3 = vg | vh
    vq0 = vp0 | vp1
    vq1 = vp2 | vp3
    # level 1: which quad
    go_q = jnp.where(vq0 & vq1, swap_q, vq1)
    uncle = vq0 & vq1
    # level 2: which pair within the chosen quad
    cp0 = jnp.where(go_q, vp2, vp0)
    cp1 = jnp.where(go_q, vp3, vp1)
    sw_pp = jnp.where(go_q, swap_p23, swap_p01)
    op = cp0 & cp1  # other pair pending
    go_p = jnp.where(op, sw_pp, cp1)

    def sel4(x0, x1, x2, x3):
        return jnp.where(go_q, jnp.where(go_p, x3, x2),
                         jnp.where(go_p, x1, x0))

    # level 3: which child within the chosen pair
    v0 = sel4(va, vc, ve, vg)
    v1 = sel4(vb, vd, vf, vh)
    sw = sel4(sw0, sw1, sw2, sw3)
    sib = v0 & v1
    k = jnp.where(sib, sw.astype(jnp.int32), v1.astype(jnp.int32))
    new_idx_d = idx * 8 + go_q.astype(jnp.int32) * 4 \
        + go_p.astype(jnp.int32) * 2 + k
    new_bs_d = ((((bs << jnp.uint32(1)) | uncle.astype(jnp.uint32))
                 << jnp.uint32(1)) | op.astype(jnp.uint32)) \
        << jnp.uint32(1) | sib.astype(jnp.uint32)

    idx_p, bs_p = _pop(idx, bs)
    any_hit = vq0 | vq1
    new_idx = jnp.where(any_hit, new_idx_d, idx_p)
    new_bs = jnp.where(any_hit, new_bs_d, bs_p)
    # telemetry: the three covered levels' visit classes
    nb_inc = uncle.astype(jnp.int32) + op.astype(jnp.int32) \
        + sib.astype(jnp.int32)
    nsg_inc = ((vq0 ^ vq1).astype(jnp.int32)
               + (any_hit & (cp0 ^ cp1)).astype(jnp.int32)
               + (any_hit & (v0 ^ v1)).astype(jnp.int32))
    return new_idx, new_bs, nb_inc, nsg_inc


def _node_bounds8(ntab, g, quant=False, qparams=None):
    """Eight great-grandchildren boxes at rows ``g``..g+7 (g = 8*idx)
    from a flat SMEM node table (f32 or quantized)."""
    if quant:
        sx, sy, sz, lox, loy, loz = qparams
        b = g * 3
        w = [ntab[b + i] for i in range(24)]

        def dq(word, sh, s, o):
            q = (word >> sh) & 0xFFFF if sh else word & 0xFFFF
            return q.astype(jnp.float32) * s + o

        def box(w0, w1, w2):
            return (dq(w0, 0, sx, lox), dq(w0, 16, sy, loy),
                    dq(w1, 0, sz, loz), dq(w1, 16, sx, lox),
                    dq(w2, 0, sy, loy), dq(w2, 16, sz, loz))

        return tuple(box(w[3 * k], w[3 * k + 1], w[3 * k + 2])
                     for k in range(8))
    b = g * 6
    return tuple(tuple(ntab[b + 6 * k + i] for i in range(6))
                 for k in range(8))


def _oct_step(ntab, idx, bs, closest, o1, o2, o3, i1, i2, i3,
              n1, n2, n3, quant, qscal):
    """One 8-ary node step: slab-test the eight great-grandchildren and
    advance three levels (see _oct_apply)."""
    boxes = _node_bounds8(ntab, idx * 8, quant, qscal)
    h = tuple(_slab(bx, o1, o2, o3, i1, i2, i3, n1, n2, n3, closest)
              for bx in boxes)
    return _oct_apply(idx, bs, *_oct_votes(h, closest), h[0].size)


def _node_bounds4(ntab, g, quant=False, qparams=None):
    """Four grandchildren boxes at rows ``g``..g+3 (g = 4*idx) from a
    flat SMEM node table (f32 or quantized) — the quad step is only
    enabled when the whole table rides SMEM."""
    if quant:
        sx, sy, sz, lox, loy, loz = qparams
        b = g * 3
        w = [ntab[b + i] for i in range(12)]

        def dq(word, sh, s, o):
            q = (word >> sh) & 0xFFFF if sh else word & 0xFFFF
            return q.astype(jnp.float32) * s + o

        def box(w0, w1, w2):
            return (dq(w0, 0, sx, lox), dq(w0, 16, sy, loy),
                    dq(w1, 0, sz, loz), dq(w1, 16, sx, lox),
                    dq(w2, 0, sy, loy), dq(w2, 16, sz, loz))

        return (box(w[0], w[1], w[2]), box(w[3], w[4], w[5]),
                box(w[6], w[7], w[8]), box(w[9], w[10], w[11]))
    b = g * 6
    return tuple(tuple(ntab[b + 6 * k + i] for i in range(6))
                 for k in range(4))


def _node_bounds(smem_nodes, top_rows, nodes, ntab, l, quant=False,
                 qparams=None):
    """Both children's 6 scalar bounds for the parent whose children sit
    at rows ``l``/``l+1``: flat SMEM loads when the whole table rides in
    SMEM (dequantized via 3 packed int32 words/node in quant mode); in
    hybrid mode the top ``top_rows`` rows come from the SMEM copy and
    deeper rows from the VMEM table; else VMEM row extracts."""
    if quant:
        sx, sy, sz, lox, loy, loz = qparams
        b = l * 3
        w = [ntab[b + i] for i in range(6)]

        def dq(word, sh, s, o):
            # mask AFTER the shift: >> on int32 sign-extends
            q = (word >> sh) & 0xFFFF if sh else word & 0xFFFF
            return q.astype(jnp.float32) * s + o

        def box(w0, w1, w2):
            return (dq(w0, 0, sx, lox), dq(w0, 16, sy, loy),
                    dq(w1, 0, sz, loz), dq(w1, 16, sx, lox),
                    dq(w2, 0, sy, loy), dq(w2, 16, sz, loz))

        return box(w[0], w[1], w[2]), box(w[3], w[4], w[5])
    if smem_nodes:
        b = l * 6
        return (tuple(ntab[b + i] for i in range(6)),
                tuple(ntab[b + 6 + i] for i in range(6)))

    def vmem_read(_):
        pair = nodes[pl.ds(l, 2), :]  # (2, 8) children rows
        return (tuple(pair[0, i] for i in range(6)),
                tuple(pair[1, i] for i in range(6)))

    if not top_rows:
        return vmem_read(None)

    def smem_read(_):
        b = l * 8
        # l even -> children l/l+1 are both < top_rows together
        return (tuple(ntab[b + i] for i in range(6)),
                tuple(ntab[b + 8 + i] for i in range(6)))

    return jax.lax.cond(l < top_rows, smem_read, vmem_read, None)


def _node_box(smem_nodes, top_rows, nodes, ntab, r, quant=False,
              qparams=None):
    """One node row's own 6 scalar bounds (for the stale-leaf re-test;
    every node's box sits at its own row of the table)."""
    if quant:
        sx, sy, sz, lox, loy, loz = qparams
        b = r * 3
        w0 = ntab[b]
        w1 = ntab[b + 1]
        w2 = ntab[b + 2]

        def dq(word, sh, s, o):
            q = (word >> sh) & 0xFFFF if sh else word & 0xFFFF
            return q.astype(jnp.float32) * s + o

        return (dq(w0, 0, sx, lox), dq(w0, 16, sy, loy),
                dq(w1, 0, sz, loz), dq(w1, 16, sx, lox),
                dq(w2, 0, sy, loy), dq(w2, 16, sz, loz))
    if smem_nodes:
        b = r * 6
        return tuple(ntab[b + i] for i in range(6))

    def vmem_read(_):
        row = nodes[pl.ds(r, 1), :]
        return tuple(row[0, i] for i in range(6))

    if not top_rows:
        return vmem_read(None)

    def smem_read(_):
        b = r * 8
        return tuple(ntab[b + i] for i in range(6))

    return jax.lax.cond(r < top_rows, smem_read, vmem_read, None)


def _run_scoped_traversal(scoped, blocks, nodes, smem_nodes, top_rows,
                          rpc=0, pf1_rows=0, pf2_rows=0,
                          scratch_shapes=()):
    if rpc:
        # prefetch layout: two pair slots (4 clusters x rpc rows) + one
        # DMA semaphore per slot; blocks arrives flattened (C*rpc, 128)
        kw = dict(blk=pltpu.SMEM((4 * rpc, 128), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA(()),
                  s0=pltpu.SemaphoreType.DMA(()),
                  s1=pltpu.SemaphoreType.DMA(()))
    elif pf2_rows:
        # packed-layout pair prefetch: two pair slots of two clusters,
        # one DMA semaphore per cluster copy
        kw = dict(blk=pltpu.SMEM((4 * pf2_rows, 128), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA(()),
                  s0=pltpu.SemaphoreType.DMA(()),
                  s1=pltpu.SemaphoreType.DMA(()),
                  s2=pltpu.SemaphoreType.DMA(()),
                  s3=pltpu.SemaphoreType.DMA(()))
    elif pf1_rows:
        # packed-layout next-leaf prefetch: two single-cluster slots,
        # one extra semaphore (at most one copy in flight)
        kw = dict(blk=pltpu.SMEM((2 * pf1_rows, 128), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA(()),
                  s0=pltpu.SemaphoreType.DMA(()))
    else:
        kw = dict(blk=pltpu.SMEM(blocks.shape[1:], jnp.float32),
                  sem=pltpu.SemaphoreType.DMA(()))
    if smem_nodes:
        kw["ntab"] = pltpu.SMEM(nodes.shape, nodes.dtype)
    elif top_rows:
        kw["ntab"] = pltpu.SMEM((top_rows * 8,), jnp.float32)
    for name, dt in scratch_shapes:
        # scratch-ref lane state (config.packet_scratch): (8,128) tiles
        # that would otherwise ride the while-loop carry through every
        # lax.cond join of the trip
        kw[name] = pltpu.VMEM((8, 128), dt)
    pl.run_scoped(scoped, **kw)


def _quad_step(ntab, idx, bs, closest, o1, o2, o3, i1, i2, i3,
               n1, n2, n3, quant, qscal):
    """One 4-ary node step: slab-test the four grandchildren and advance
    two levels (see _advance4)."""
    ba, bb, bc, bd = _node_bounds4(ntab, idx * 4, quant, qscal)
    ha = _slab(ba, o1, o2, o3, i1, i2, i3, n1, n2, n3, closest)
    hb = _slab(bb, o1, o2, o3, i1, i2, i3, n1, n2, n3, closest)
    hc = _slab(bc, o1, o2, o3, i1, i2, i3, n1, n2, n3, closest)
    hd = _slab(bd, o1, o2, o3, i1, i2, i3, n1, n2, n3, closest)
    return _advance4(idx, bs, ha, hb, hc, hd, closest)


def _mt_scalar_tri(blk, brow, w, stride, o1, o2, o3, d1, d2, d3, t_min,
                   closest, approx_recip=False, rows=None):
    """Möller–Trumbore of one triangle (scalar comps from the SMEM block:
    component c of the cluster starting at row ``brow`` lives at
    ``blk[brow + c*stride//128, c*stride%128 + w]`` — both index parts
    are one scalar add since c*stride%128 + w < 128 for power-of-two
    strides <= 128) against the lane tile — op-for-op the
    ops/pallas_tris sequence (restructured form: precomputed n = e1×e2
    replaces the h = d×e2 cross; see ops/intersect.triangles_hit)."""
    def rd(c):
        if stride >= 128:       # legacy layout: one component per row
            if rows is not None:    # prefetch: flattened (rows,128)
                # buffer; slot base hoisted per visit (one add per ROW,
                # not one per read); w//128, w%128 static under unroll
                spr = stride // 128
                if isinstance(w, int):
                    return blk[rows[c * spr + w // 128], w % 128]
                return blk[rows[c * spr] + w // 128, w % 128]
            return blk[c, w]
        off = c * stride
        if rows is not None:
            return blk[rows[off // 128], off % 128 + w]
        return blk[brow + off // 128, off % 128 + w]

    v0x = rd(0)
    v0y = rd(1)
    v0z = rd(2)
    g1x = rd(3)
    g1y = rd(4)
    g1z = rd(5)
    g2x = rd(6)
    g2y = rd(7)
    g2z = rd(8)
    n1 = rd(9)
    n2 = rd(10)
    n3 = rd(11)
    a = -(d1 * n1 + d2 * n2 + d3 * n3)
    parallel = jnp.abs(a) < 1e-7  # intersections.h:55
    # NOTE: f divides by a directly — no where(parallel, 1, a) guard.
    # Parallel triangles (|a| < 1e-7, incl. the heap path's
    # inf-sentinel NaNs) produce garbage f/u/v/t, but ``parallel`` is
    # in ``bad`` and the NaN t also fails ~(t > t_min), so they can
    # never win; winners' outputs are bit-identical. Saves one select
    # per triangle in the hottest loop (the pure-MT probe measures the
    # loop at the VPU issue-rate floor — experiments/leafmt_probe.py).
    if approx_recip:
        # opt-in fast path (config.fast_math): hardware approximate
        # reciprocal (~2^-14 rel) instead of the exact f32 divide.
        # t/u/v shift by ~1e-4 relative; geometry stays exact, so the
        # TIR-trap failure mode (PERFORMANCE.md r1) cannot occur.
        # Gated by an SSIM test against the exact path.
        f = pl.reciprocal(a, approx=True)
    else:
        f = 1.0 / a
    sx = o1 - v0x
    sy = o2 - v0y
    sz = o3 - v0z
    qx = sy * d3 - sz * d2
    qy = sz * d1 - sx * d3
    qz = sx * d2 - sy * d1
    u = f * (qx * g2x + qy * g2y + qz * g2z)
    v = -(f * (qx * g1x + qy * g1y + qz * g1z))
    t = f * (sx * n1 + sy * n2 + sz * n3)
    # decision-set identity: u<0|u>1|v<0|u+v>1 == min(u,v)<0|u+v>1
    # (u>1 & v>=0 implies fl(u+v)>=u>1 since fl(y)>=x for representable
    # x<=y; u>1 & v<0 is caught by the min; NaNs land in `bad` the same
    # way) — 3 fewer VPU ops per triangle, accept set unchanged.
    bad = (parallel | (jnp.minimum(u, v) < 0.0) | (u + v > 1.0)
           | jnp.logical_not(t > t_min) | jnp.logical_not(t < closest))
    return t, u, v, bad


def _packed_pf_helpers(blocks, blk, sem, s0, s1, s2, s3, crows):
    """pf1/pf2 DMA helpers for the PACKED block layout, shared by the
    nearest and shadow kernels (the same share-don't-copy pattern as
    pallas_bvh4._leaf_dma_helpers — keeps the two kernels' DMA
    machinery from drifting apart).

    pf1 (next-leaf): two single-cluster slots, one semaphore (at most
    one copy in flight).  pf2 (pair): two pair slots of two clusters,
    one semaphore per cluster copy (s0/s1 = slot 0, s2/s3 = slot 1).
    """
    def pf1_consume(c_blk, pfon, par):
        """Wait/load cluster ``c_blk`` into a slot; returns it."""
        cur_slot = jnp.where(pfon > 0, par, 0)

        @pl.when(pfon > 0)
        def _():
            pltpu.make_async_copy(
                blocks.at[0], blk.at[pl.ds(0, crows)], s0).wait()

        @pl.when(pfon == 0)
        def _():
            dma = pltpu.make_async_copy(
                blocks.at[c_blk], blk.at[pl.ds(0, crows)], sem)
            dma.start()
            dma.wait()
        return cur_slot

    def pf1_issue(nxt_leaf, nxt_blk, cur_slot):
        """Start the pop target's copy into the other slot (only when
        the target is itself a leaf — then it is GUARANTEED to be the
        next visit)."""
        pf_slot = 1 - cur_slot

        @pl.when(nxt_leaf & (pf_slot == 0))
        def _():
            pltpu.make_async_copy(
                blocks.at[nxt_blk], blk.at[pl.ds(0, crows)],
                s0).start()

        @pl.when(nxt_leaf & (pf_slot == 1))
        def _():
            pltpu.make_async_copy(
                blocks.at[nxt_blk], blk.at[pl.ds(crows, crows)],
                s0).start()
        return nxt_leaf.astype(jnp.int32), pf_slot

    def pf2_drain(slot):
        """Wait BOTH single-cluster copies of pair slot 0/1."""
        lo = slot * 2 * crows
        sa, sb = (s0, s1) if slot == 0 else (s2, s3)
        pltpu.make_async_copy(blocks.at[0],
                              blk.at[pl.ds(lo, crows)], sa).wait()
        pltpu.make_async_copy(blocks.at[0],
                              blk.at[pl.ds(lo + crows, crows)],
                              sb).wait()

    def pf2_issue(pred0, c0_s0, pred1, c0_s1, p0, p1):
        """Pair issue, packed layout: two cluster copies per slot
        (c0_*: the pair's EVEN cluster id), draining any unconsumed
        previous pair in the slot first."""
        @pl.when(pred0 & (p0 > 0))
        def _():
            pf2_drain(0)

        @pl.when(pred0)
        def _():
            pltpu.make_async_copy(
                blocks.at[c0_s0], blk.at[pl.ds(0, crows)],
                s0).start()
            pltpu.make_async_copy(
                blocks.at[c0_s0 + 1], blk.at[pl.ds(crows, crows)],
                s1).start()

        @pl.when(pred1 & (p1 > 0))
        def _():
            pf2_drain(1)

        @pl.when(pred1)
        def _():
            pltpu.make_async_copy(
                blocks.at[c0_s1], blk.at[pl.ds(2 * crows, crows)],
                s2).start()
            pltpu.make_async_copy(
                blocks.at[c0_s1 + 1],
                blk.at[pl.ds(3 * crows, crows)], s3).start()
        return (jnp.where(pred0, 1, p0), jnp.where(pred1, 1, p1))

    return pf1_consume, pf1_issue, pf2_drain, pf2_issue


def _kernel_nearest(ox, oy, oz, dx, dy, dz, tmax, nodes, *rest,
                    cl_first, width, stride, cpb, t_min, unroll,
                    smem_nodes, top_rows, quant=False, qparams=None,
                    leaf_cull=True, approx_recip=False, fused=True,
                    quad=True, oct=False, tree_min=False,
                    prefetch=False, scratch=False, pair_pf=False):
    rest = list(rest)
    nodes_top = rest.pop(0) if top_rows else None
    qp = rest.pop(0) if quant else None
    blocks, tri_out, feat_out, cnt_out = rest
    rows_per_cluster = 16 * stride // 128
    log2cpb = cpb.bit_length() - 1
    # the 4-ary step reads grandchild rows from a flat SMEM table only
    quad_ok = quad and (smem_nodes or quant) and not top_rows \
        and cl_first >= 8
    # 8-ary great-grandchild step (3 binary levels per vote round trip);
    # incompatible with the pair-prefetch scheme (8 candidate clusters
    # span 4 pairs — the 2 parity slots can't cover them), so oct wins
    # the conflict and pf is disabled below
    oct_ok = oct and quad_ok and cl_first >= 16
    # pf: sibling-pair cluster prefetch. In the complete pow2 tree,
    # every leaf's 2-cluster pair is known at the node step that
    # descends into it, and a far sibling is always visited IMMEDIATELY
    # after the near one (LIFO bitstack), so two statically-addressed
    # pair slots keyed by pair parity give zero-misprediction prefetch:
    # the pair DMA issues BEFORE the step's slab votes (hiding under
    # the ~300 ns vote round trip) and the visit only waits the
    # remainder. Measured sync DMA+consume is ~390 ns/visit of which
    # double-buffering recovers ~250 (experiments/dma_probe.py).
    pf = (prefetch and fused and cpb == 1 and stride % 128 == 0
          and stride >= 128 and not leaf_cull and cl_first >= 2
          and not oct_ok)
    # pf1: single-cluster next-leaf prefetch for the PACKED block layout
    # (stride < 128, where the pair scheme's row addressing doesn't
    # apply — since the packed blocks landed in r4 these meshes ran
    # with NO leaf prefetch at all). The pop target after a leaf visit
    # is a pure scalar function of (idx, bs), so when it is itself a
    # leaf its (8,128) block DMA starts BEFORE this visit's MT loop
    # and completes under it — non-speculative, zero mispredict, the
    # BVH4 kernel's proven stack-top-peek pattern (pallas_bvh4
    # _leaf_dma_helpers) translated to the bitstack.
    # pf2: the pair scheme ported to the packed layout (opt-in,
    # config.pair_pf). Same zero-misprediction coverage argument as pf
    # — every leaf visit's pair was issued at the node step that
    # descends into it (binary or quad), so there is NO sync path —
    # but each pair is two single-cluster (8,128) copies with their
    # own semaphores (a 3-D (2,8,128) source can't land in the 2-D
    # SMEM slab in one DMA).
    pf2 = (pair_pf and fused and cpb == 1 and not leaf_cull
           and cl_first >= 2 and not oct_ok and not pf
           and not tree_min and blocks.ndim == 3)
    pf1 = (prefetch and fused and cpb == 1 and not leaf_cull
           and cl_first >= 2 and not oct_ok and not pf
           and not tree_min and not pf2 and blocks.ndim == 3)
    rpc = rows_per_cluster
    PAIR = 2 * rpc
    CROWS = blocks.shape[1] if (pf1 or pf2) else 0  # rows per cluster

    pid0 = pl.program_id(0) == 0  # first grid step: table DMA runs once
    def scoped(blk, sem, s0=None, s1=None, s2=None, s3=None,
               ntab=None, cls=None, bst=None):
        (pf1_consume, pf1_issue, pf2_drain,
         pf2_issue) = _packed_pf_helpers(blocks, blk, sem, s0, s1,
                                         s2, s3, CROWS)
        def pf_drain(ss, lo):
            pltpu.make_async_copy(blocks.at[pl.ds(0, PAIR)],
                                  blk.at[pl.ds(lo, PAIR)], ss).wait()

        def pf_issue(pred0, c0_s0, pred1, c0_s1, p0, p1):
            """Start pair DMAs into slot 0/1 under scalar predicates
            (c0_*: the pair's EVEN cluster id), draining any unconsumed
            previous copy in the slot first."""
            @pl.when(pred0 & (p0 > 0))
            def _():
                pf_drain(s0, 0)

            @pl.when(pred0)
            def _():
                pltpu.make_async_copy(
                    blocks.at[pl.ds(c0_s0 * rpc, PAIR)],
                    blk.at[pl.ds(0, PAIR)], s0).start()

            @pl.when(pred1 & (p1 > 0))
            def _():
                pf_drain(s1, PAIR)

            @pl.when(pred1)
            def _():
                pltpu.make_async_copy(
                    blocks.at[pl.ds(c0_s1 * rpc, PAIR)],
                    blk.at[pl.ds(PAIR, PAIR)], s1).start()
            return (jnp.where(pred0, 1, p0), jnp.where(pred1, 1, p1))


        if smem_nodes:
            # node table -> SMEM once per packet: scalar loads beat VMEM
            # extracts 1.67x per node step (PERFORMANCE.md microbench)
            nd = pltpu.make_async_copy(nodes, ntab, sem)
            nd.start()
            nd.wait()
        elif top_rows:
            # hybrid: DMA the flat top-slab copy HBM->SMEM; deep levels
            # read from the VMEM table via a per-step branch
            nd = pltpu.make_async_copy(nodes_top, ntab, sem)
            nd.start()
            nd.wait()
        if quant:
            # read the 6 dequant scalars once; they stay in registers
            # across the whole traversal
            qscal = tuple(qp[i] for i in range(6))
        else:
            qscal = None
        o1 = ox[:, :]
        o2 = oy[:, :]
        o3 = oz[:, :]
        d1 = dx[:, :]
        d2 = dy[:, :]
        d3 = dz[:, :]
        i1 = 1.0 / d1
        i2 = 1.0 / d2
        i3 = 1.0 / d3
        n1 = i1 < 0.0
        n2 = i2 < 0.0
        n3 = i3 < 0.0
        shp = o1.shape

        def node_bin(carry):
            if scratch:
                idx, bs, nb, nsg, nl, p0, p1 = carry
                closest = cls[:, :]
            else:
                idx, bs, nb, nsg, nl, closest, besti, p0, p1 = carry
            l = idx * 2
            if pf or pf2:
                # children are leaves -> issue their pair's DMA before
                # the slab votes; slot = pair parity bit of the cluster
                isleaf = l >= cl_first
                c0 = jnp.maximum(l - cl_first, 0)  # pair's even cluster
                s_even = ((c0 >> 1) & 1) == 0
                issue = pf_issue if pf else pf2_issue
                p0, p1 = issue(isleaf & s_even, c0,
                               isleaf & jnp.logical_not(s_even), c0,
                               p0, p1)
            bl, br = _node_bounds(smem_nodes, top_rows, nodes, ntab, l,
                                  quant, qscal)
            lhit = _slab(bl, o1, o2, o3, i1, i2, i3, n1, n2, n3, closest)
            rhit = _slab(br, o1, o2, o3, i1, i2, i3, n1, n2, n3,
                         closest)
            new_idx, new_bs, both, single = _advance(idx, bs, lhit, rhit,
                                                     closest, l)
            nb = nb + both.astype(jnp.int32)
            nsg = nsg + single.astype(jnp.int32)
            if scratch:
                return (new_idx, new_bs, nb, nsg, nl, p0, p1)
            return (new_idx, new_bs, nb, nsg, nl, closest, besti, p0, p1)

        def node_quad(carry):
            if scratch:
                idx, bs, nb, nsg, nl, p0, p1 = carry
                closest = cls[:, :]
            else:
                idx, bs, nb, nsg, nl, closest, besti, p0, p1 = carry
            if pf or pf2:
                # grandchildren are leaves -> both candidate pairs,
                # complementary parities, issued before the 4 slabs
                g = idx * 4
                isleaf = g >= cl_first
                cl_ = jnp.maximum(g - cl_first, 0)
                sl_even = ((cl_ >> 1) & 1) == 0
                issue = pf_issue if pf else pf2_issue
                p0, p1 = issue(isleaf, jnp.where(sl_even, cl_, cl_ + 2),
                               isleaf, jnp.where(sl_even, cl_ + 2, cl_),
                               p0, p1)
            new_idx, new_bs, nbi, nsgi = _quad_step(
                ntab, idx, bs, closest, o1, o2, o3, i1, i2, i3,
                n1, n2, n3, quant, qscal)
            if scratch:
                return (new_idx, new_bs, nb + nbi, nsg + nsgi, nl,
                        p0, p1)
            return (new_idx, new_bs, nb + nbi, nsg + nsgi, nl, closest,
                    besti, p0, p1)

        def node_oct(carry):
            if scratch:
                idx, bs, nb, nsg, nl, p0, p1 = carry
                closest = cls[:, :]
            else:
                idx, bs, nb, nsg, nl, closest, besti, p0, p1 = carry
            new_idx, new_bs, nbi, nsgi = _oct_step(
                ntab, idx, bs, closest, o1, o2, o3, i1, i2, i3,
                n1, n2, n3, quant, qscal)
            if scratch:
                return (new_idx, new_bs, nb + nbi, nsg + nsgi, nl,
                        p0, p1)
            return (new_idx, new_bs, nb + nbi, nsg + nsgi, nl, closest,
                    besti, p0, p1)

        if oct_ok:
            # 8-ary triple step where great-grandchildren exist; the
            # 4-ary / binary steps cover the two boundary levels
            def node_fn(carry):
                def deep(c):
                    return jax.lax.cond(c[0] < cl_first // 2, node_quad,
                                        node_bin, c)
                return jax.lax.cond(carry[0] < cl_first // 4, node_oct,
                                    deep, carry)
        elif quad_ok:
            # 4-ary double step above the last interior level (children
            # of the last level are leaves -> binary step handles them)
            def node_fn(carry):
                return jax.lax.cond(carry[0] < cl_first // 2, node_quad,
                                    node_bin, carry)
        else:
            node_fn = node_bin

        def leaf_fn(carry):
            if scratch:
                idx, bs, nb, nsg, nl, p0, p1 = carry
                closest = cls[:, :]
                besti = bst[:, :]
            else:
                idx, bs, nb, nsg, nl, closest, besti, p0, p1 = carry
            c = idx - cl_first
            # cpb == 1: keep SMEM row indices compile-time constants
            # (a traced brow costs ~12% in the MT loop — PERFORMANCE.md)
            c_blk = c if cpb == 1 else c >> log2cpb
            brow = 0 if cpb == 1 else (c & (cpb - 1)) * rows_per_cluster
            if pf1:
                # pop target (pure scalar function of idx/bs) known
                # BEFORE the MT loop: consume this visit's block, then
                # start the next leaf's copy so it completes under MT
                m_e = jnp.where(bs > 0, _ctz32(bs), 0)
                nxt_idx = (idx >> m_e) ^ 1
                cur_slot = pf1_consume(c_blk, p0, p1)
                p0, p1 = pf1_issue(nxt_idx >= cl_first,
                                   jnp.maximum(nxt_idx - cl_first, 0),
                                   cur_slot)
                base = cur_slot * CROWS
                mt_rows = [base + r for r in range(CROWS)]
            elif pf2:
                # first visit of the pair waits both copies; the
                # sibling finds pend cleared, data resident
                slot1 = ((c >> 1) & 1) == 1

                @pl.when(jnp.logical_not(slot1) & (p0 > 0))
                def _():
                    pf2_drain(0)

                @pl.when(slot1 & (p1 > 0))
                def _():
                    pf2_drain(1)
                p0 = jnp.where(slot1, p0, 0)
                p1 = jnp.where(slot1, 0, p1)
                base = (c & 3) * CROWS
                mt_rows = [base + r for r in range(CROWS)]
            elif pf:
                # wait this slot's pair copy (first visit of the pair
                # only — the sibling finds pend cleared, data resident)
                slot1 = ((c >> 1) & 1) == 1

                @pl.when(jnp.logical_not(slot1) & (p0 > 0))
                def _():
                    pf_drain(s0, 0)

                @pl.when(slot1 & (p1 > 0))
                def _():
                    pf_drain(s1, PAIR)
                p0 = jnp.where(slot1, p0, 0)
                p1 = jnp.where(slot1, 0, p1)
                base = (c & 3) * rpc
                mt_rows = [base + r for r in range(rpc)]
            else:
                mt_rows = None

            def do_mt(st):
                if not pf and not pf1 and not pf2:
                    dma = pltpu.make_async_copy(blocks.at[c_blk], blk,
                                                sem)
                    dma.start()
                    dma.wait()

                def tri(w, st):
                    closest, besti = st
                    t, u, v, bad = _mt_scalar_tri(
                        blk, brow, w, stride, o1, o2, o3, d1, d2, d3,
                        t_min, closest, approx_recip, rows=mt_rows)
                    closest = jnp.where(bad, closest, t)
                    besti = jnp.where(bad, besti, c * width + w)
                    # normals/texcoords/mesh-id/u/v are NOT captured
                    # here: they are pure functions of the winning tri
                    # id, fetched by one row gather + recompute after
                    # the kernel (~12 tile-ops/tri saved)
                    return (closest, besti)

                if tree_min and unroll:
                    # dependency-diet variant (measured: LOSES 5-6% on
                    # both coherent and bounce knot traces — the serial
                    # chain was not the bottleneck; kept off, see
                    # PERFORMANCE.md r3): every triangle is tested
                    # against the ENTRY closest (a visit-constant), so
                    # the ~4-op serial chain through the running
                    # `closest` (cmp -> or -> not -> select, x width)
                    # disappears; the per-visit winner comes from a
                    # streaming pairwise (t, w) min-tree (same op count:
                    # 3 ops/merge x width-1 vs 3 removed ops/tri, chain
                    # depth log2(width) x 3). Bit-exact: t values are
                    # unchanged and ties keep the LOWER triangle index
                    # (ta <= tb keeps a), matching the strict t<closest
                    # first-win of the sequential loop.
                    closest0, besti0 = st
                    stk = []  # (level, t_tile, w_idx) — idx may be int
                    for w in range(width):
                        t, u, v, bad = _mt_scalar_tri(
                            blk, brow, w, stride, o1, o2, o3, d1, d2,
                            d3, t_min, closest0, approx_recip,
                            rows=mt_rows)
                        ent = (0, jnp.where(bad, _FLT_MAX, t), w)
                        while stk and stk[-1][0] == ent[0]:
                            lv, ta, wa = stk.pop()
                            _, tb, wb = ent
                            keep_a = ta <= tb
                            ent = (lv + 1, jnp.where(keep_a, ta, tb),
                                   jnp.where(keep_a, wa, wb))
                        stk.append(ent)
                    _, tm, wm = stk.pop()
                    while stk:  # non-pow2 width leftovers (later=deeper
                        lv, ta, wa = stk.pop()  # = earlier tris: keep a
                        keep_a = ta <= tm
                        tm = jnp.where(keep_a, ta, tm)
                        wm = jnp.where(keep_a, wa, wm)
                    won = tm < closest0
                    closest = jnp.where(won, tm, closest0)
                    besti = jnp.where(won, c * width + wm, besti0)
                    return (closest, besti)
                elif unroll:
                    # full unroll: w becomes a Python constant, so every
                    # scalar SMEM index in the MT body is compile-time
                    # static and Mosaic can pipeline across triangles
                    for w in range(width):
                        st = tri(w, st)
                else:
                    st = jax.lax.fori_loop(0, width, tri, st)
                return st

            if leaf_cull:
                # stale-leaf re-test: by pop time, `closest` has often
                # shrunk below this cluster's box (a nearer leaf was
                # processed first under near-first ordering). One slab
                # test of the cluster's OWN box (row idx) + a vote
                # (~30 ops) skips the ~width*40-op MT loop for dead
                # leaves. Same conservative-slab criterion the vote
                # used, so results are exactly unchanged.
                lb = _node_box(smem_nodes, top_rows, nodes, ntab, idx,
                               quant, qscal)
                lhit = _slab(lb, o1, o2, o3, i1, i2, i3, n1, n2, n3,
                             closest)
                alive = jnp.sum((lhit < closest).astype(jnp.int32),
                                dtype=jnp.int32) > 0
                nl = nl + alive.astype(jnp.int32)
                closest, besti = jax.lax.cond(
                    alive, do_mt, lambda st: st, (closest, besti))
            else:
                nl = nl + 1
                closest, besti = do_mt((closest, besti))
            m = jnp.where(bs > 0, _ctz32(bs), 0)
            new_bs = (bs >> m.astype(jnp.uint32)) ^ jnp.uint32(1)
            new_idx = (idx >> m) ^ 1
            if scratch:
                cls[:, :] = closest
                bst[:, :] = besti
                return (new_idx, new_bs, nb, nsg, nl, p0, p1)
            return (new_idx, new_bs, nb, nsg, nl, closest, besti, p0, p1)

        if fused:
            # fused body: a node step that lands on a leaf runs the MT
            # visit in the SAME while iteration (the per-iteration
            # scalar->vector round trip is the measured per-step cost
            # floor — PERFORMANCE.md r3 phase split). Entering on a
            # popped-to leaf skips the node step. Identical traversal
            # order, fewer loop trips.
            def body(carry):
                carry = jax.lax.cond(carry[0] < cl_first, node_fn,
                                     lambda c: c, carry)
                return jax.lax.cond(carry[0] >= cl_first, leaf_fn,
                                    lambda c: c, carry)
        else:
            def body(carry):
                return jax.lax.cond(carry[0] >= cl_first, leaf_fn,
                                    node_fn, carry)

        def cond(carry):
            return carry[0] > 0

        if scratch:
            cls[:, :] = tmax[:, :]
            bst[:, :] = jnp.full(shp, -1, jnp.int32)
            init = (jnp.int32(1), jnp.uint32(1), jnp.int32(0),
                    jnp.int32(0), jnp.int32(0), jnp.int32(0),
                    jnp.int32(0))
            _, _, nb, nsg, nl, p0f, p1f = jax.lax.while_loop(
                cond, body, init)
            closest = cls[:, :]
            besti = bst[:, :]
        else:
            init = (jnp.int32(1), jnp.uint32(1), jnp.int32(0),
                    jnp.int32(0), jnp.int32(0), tmax[:, :],
                    jnp.full(shp, -1, jnp.int32),
                    jnp.int32(0), jnp.int32(0))
            _, _, nb, nsg, nl, closest, besti, p0f, p1f = \
                jax.lax.while_loop(cond, body, init)
        if pf:
            # drain speculative pair copies never consumed by a visit
            @pl.when(p0f > 0)
            def _():
                pf_drain(s0, 0)

            @pl.when(p1f > 0)
            def _():
                pf_drain(s1, PAIR)
        if pf1:
            # defensive: the next-leaf copy is always consumed on the
            # following trip (the exit pop lands below cl_first), but
            # balance the semaphore if that ever changes
            @pl.when(p0f > 0)
            def _():
                pltpu.make_async_copy(
                    blocks.at[0], blk.at[pl.ds(0, CROWS)], s0).wait()
        if pf2:
            # drain speculative pairs never consumed by a visit
            @pl.when(p0f > 0)
            def _():
                pf2_drain(0)

            @pl.when(p1f > 0)
            def _():
                pf2_drain(1)
        # per-packet telemetry at [0, 0..2]: both/single node steps and
        # leaf-cluster visits
        ii = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
        cnt_out[:, :] = jnp.where(
            (ii == 0) & (jj == 0), nb,
            jnp.where((ii == 0) & (jj == 1), nsg,
                      jnp.where((ii == 0) & (jj == 2), nl, 0)))
        tri_out[:, :] = besti
        feat_out[:, :] = closest

    _run_scoped_traversal(scoped, blocks, nodes, smem_nodes, top_rows,
                          rpc=rpc if pf else 0,
                          pf1_rows=CROWS if pf1 else 0,
                          pf2_rows=CROWS if pf2 else 0,
                          scratch_shapes=((("cls", jnp.float32),
                                           ("bst", jnp.int32))
                                          if scratch else ()))


def _kernel_shadow(ox, oy, oz, dx, dy, dz, tmax, nodes, *rest,
                   cl_first, width, stride, cpb, t_min,
                   unroll, smem_nodes, top_rows, quant=False, qparams=None,
                   leaf_cull=True, approx_recip=False, fused=True,
                   quad=True, oct=False, prefetch=False, scratch=False,
                   pair_pf=False):
    rest = list(rest)
    nodes_top = rest.pop(0) if top_rows else None
    qp = rest.pop(0) if quant else None
    blocks, occ_out, cnt_out = rest
    rows_per_cluster = 16 * stride // 128
    log2cpb = cpb.bit_length() - 1
    quad_ok = quad and (smem_nodes or quant) and not top_rows \
        and cl_first >= 8
    oct_ok = oct and quad_ok and cl_first >= 16
    # sibling-pair prefetch — see _kernel_nearest
    pf = (prefetch and fused and cpb == 1 and stride % 128 == 0
          and stride >= 128 and not leaf_cull and cl_first >= 2
          and not oct_ok)
    # packed-layout pair prefetch (opt-in) — see _kernel_nearest pf2
    pf2 = (pair_pf and fused and cpb == 1 and not leaf_cull
           and cl_first >= 2 and not oct_ok and not pf
           and blocks.ndim == 3)
    # packed-layout next-leaf prefetch — see _kernel_nearest
    pf1 = (prefetch and fused and cpb == 1 and not leaf_cull
           and cl_first >= 2 and not oct_ok and not pf and not pf2
           and blocks.ndim == 3)
    rpc = rows_per_cluster
    PAIR = 2 * rpc
    CROWS = blocks.shape[1] if (pf1 or pf2) else 0

    pid0 = pl.program_id(0) == 0  # first grid step: table DMA runs once
    def scoped(blk, sem, s0=None, s1=None, s2=None, s3=None,
               ntab=None, cls=None, bst=None):
        (pf1_consume, pf1_issue, pf2_drain,
         pf2_issue) = _packed_pf_helpers(blocks, blk, sem, s0, s1,
                                         s2, s3, CROWS)
        def pf_drain(ss, lo):
            pltpu.make_async_copy(blocks.at[pl.ds(0, PAIR)],
                                  blk.at[pl.ds(lo, PAIR)], ss).wait()

        def pf_issue(pred0, c0_s0, pred1, c0_s1, p0, p1):
            @pl.when(pred0 & (p0 > 0))
            def _():
                pf_drain(s0, 0)

            @pl.when(pred0)
            def _():
                pltpu.make_async_copy(
                    blocks.at[pl.ds(c0_s0 * rpc, PAIR)],
                    blk.at[pl.ds(0, PAIR)], s0).start()

            @pl.when(pred1 & (p1 > 0))
            def _():
                pf_drain(s1, PAIR)

            @pl.when(pred1)
            def _():
                pltpu.make_async_copy(
                    blocks.at[pl.ds(c0_s1 * rpc, PAIR)],
                    blk.at[pl.ds(PAIR, PAIR)], s1).start()
            return (jnp.where(pred0, 1, p0), jnp.where(pred1, 1, p1))


        if smem_nodes:
            # once per pallas_call — SMEM scratch persists across the
            # sequential grid steps
            @pl.when(pid0)
            def _():
                nd = pltpu.make_async_copy(nodes, ntab, sem)
                nd.start()
                nd.wait()
        elif top_rows:
            @pl.when(pid0)
            def _():
                nd = pltpu.make_async_copy(nodes_top, ntab, sem)
                nd.start()
                nd.wait()
        if quant:
            # read the 6 dequant scalars once; they stay in registers
            # across the whole traversal
            qscal = tuple(qp[i] for i in range(6))
        else:
            qscal = None
        o1 = ox[:, :]
        o2 = oy[:, :]
        o3 = oz[:, :]
        d1 = dx[:, :]
        d2 = dy[:, :]
        d3 = dz[:, :]
        i1 = 1.0 / d1
        i2 = 1.0 / d2
        i3 = 1.0 / d3
        n1 = i1 < 0.0
        n2 = i2 < 0.0
        n3 = i3 < 0.0

        def node_bin(carry):
            if scratch:
                # cls/bst hold closest/occ (same tile dtypes as the
                # nearest kernel's closest/besti scratch)
                idx, bs, nb, nsg, nl, ndone, p0, p1 = carry
                closest = cls[:, :]
            else:
                idx, bs, nb, nsg, nl, closest, occ, ndone, p0, p1 = carry
            l = idx * 2
            if pf or pf2:
                isleaf = l >= cl_first
                c0 = jnp.maximum(l - cl_first, 0)
                s_even = ((c0 >> 1) & 1) == 0
                issue = pf_issue if pf else pf2_issue
                p0, p1 = issue(isleaf & s_even, c0,
                               isleaf & jnp.logical_not(s_even), c0,
                               p0, p1)
            bl, br = _node_bounds(smem_nodes, top_rows, nodes, ntab, l,
                                  quant, qscal)
            lhit = _slab(bl, o1, o2, o3, i1, i2, i3, n1, n2, n3, closest)
            rhit = _slab(br, o1, o2, o3, i1, i2, i3, n1, n2, n3,
                         closest)
            new_idx, new_bs, both, single = _advance(idx, bs, lhit, rhit,
                                                     closest, l)
            nb = nb + both.astype(jnp.int32)
            nsg = nsg + single.astype(jnp.int32)
            if scratch:
                return (new_idx, new_bs, nb, nsg, nl, ndone, p0, p1)
            return (new_idx, new_bs, nb, nsg, nl, closest, occ, ndone,
                    p0, p1)

        def node_quad(carry):
            if scratch:
                idx, bs, nb, nsg, nl, ndone, p0, p1 = carry
                closest = cls[:, :]
            else:
                idx, bs, nb, nsg, nl, closest, occ, ndone, p0, p1 = carry
            if pf or pf2:
                g = idx * 4
                isleaf = g >= cl_first
                cl_ = jnp.maximum(g - cl_first, 0)
                sl_even = ((cl_ >> 1) & 1) == 0
                issue = pf_issue if pf else pf2_issue
                p0, p1 = issue(isleaf, jnp.where(sl_even, cl_, cl_ + 2),
                               isleaf, jnp.where(sl_even, cl_ + 2, cl_),
                               p0, p1)
            new_idx, new_bs, nbi, nsgi = _quad_step(
                ntab, idx, bs, closest, o1, o2, o3, i1, i2, i3,
                n1, n2, n3, quant, qscal)
            if scratch:
                return (new_idx, new_bs, nb + nbi, nsg + nsgi, nl,
                        ndone, p0, p1)
            return (new_idx, new_bs, nb + nbi, nsg + nsgi, nl, closest,
                    occ, ndone, p0, p1)

        def node_oct(carry):
            if scratch:
                idx, bs, nb, nsg, nl, ndone, p0, p1 = carry
                closest = cls[:, :]
            else:
                idx, bs, nb, nsg, nl, closest, occ, ndone, p0, p1 = carry
            new_idx, new_bs, nbi, nsgi = _oct_step(
                ntab, idx, bs, closest, o1, o2, o3, i1, i2, i3,
                n1, n2, n3, quant, qscal)
            if scratch:
                return (new_idx, new_bs, nb + nbi, nsg + nsgi, nl,
                        ndone, p0, p1)
            return (new_idx, new_bs, nb + nbi, nsg + nsgi, nl, closest,
                    occ, ndone, p0, p1)

        if oct_ok:
            def node_fn(carry):
                def deep(c):
                    return jax.lax.cond(c[0] < cl_first // 2, node_quad,
                                        node_bin, c)
                return jax.lax.cond(carry[0] < cl_first // 4, node_oct,
                                    deep, carry)
        elif quad_ok:
            def node_fn(carry):
                return jax.lax.cond(carry[0] < cl_first // 2, node_quad,
                                    node_bin, carry)
        else:
            node_fn = node_bin

        def leaf_fn(carry):
            if scratch:
                idx, bs, nb, nsg, nl, ndone, p0, p1 = carry
                closest = cls[:, :]
                occ = bst[:, :]
            else:
                idx, bs, nb, nsg, nl, closest, occ, ndone, p0, p1 = carry
            c = idx - cl_first
            # cpb == 1: keep SMEM row indices compile-time constants
            # (a traced brow costs ~12% in the MT loop — PERFORMANCE.md)
            c_blk = c if cpb == 1 else c >> log2cpb
            brow = 0 if cpb == 1 else (c & (cpb - 1)) * rows_per_cluster
            if pf1:
                m_e = jnp.where(bs > 0, _ctz32(bs), 0)
                nxt_idx = (idx >> m_e) ^ 1
                cur_slot = pf1_consume(c_blk, p0, p1)
                p0, p1 = pf1_issue(nxt_idx >= cl_first,
                                   jnp.maximum(nxt_idx - cl_first, 0),
                                   cur_slot)
                base = cur_slot * CROWS
                mt_rows = [base + r for r in range(CROWS)]
            elif pf2:
                slot1 = ((c >> 1) & 1) == 1

                @pl.when(jnp.logical_not(slot1) & (p0 > 0))
                def _():
                    pf2_drain(0)

                @pl.when(slot1 & (p1 > 0))
                def _():
                    pf2_drain(1)
                p0 = jnp.where(slot1, p0, 0)
                p1 = jnp.where(slot1, 0, p1)
                base = (c & 3) * CROWS
                mt_rows = [base + r for r in range(CROWS)]
            elif pf:
                slot1 = ((c >> 1) & 1) == 1

                @pl.when(jnp.logical_not(slot1) & (p0 > 0))
                def _():
                    pf_drain(s0, 0)

                @pl.when(slot1 & (p1 > 0))
                def _():
                    pf_drain(s1, PAIR)
                p0 = jnp.where(slot1, p0, 0)
                p1 = jnp.where(slot1, 0, p1)
                base = (c & 3) * rpc
                mt_rows = [base + r for r in range(rpc)]
            else:
                mt_rows = None

            def do_mt(st):
                if not pf and not pf1 and not pf2:
                    dma = pltpu.make_async_copy(blocks.at[c_blk], blk,
                                                sem)
                    dma.start()
                    dma.wait()

                def tri(w, st):
                    closest, occ = st
                    t, u, v, bad = _mt_scalar_tri(
                        blk, brow, w, stride, o1, o2, o3, d1, d2, d3,
                        t_min, closest, approx_recip, rows=mt_rows)
                    occ = jnp.where(bad, occ, jnp.int32(1))
                    # any-hit early-out (kernels.cu:207): retire the
                    # lane so it stops voting for nodes
                    closest = jnp.where(bad, closest, jnp.float32(-1e30))
                    return closest, occ

                if unroll:
                    for w in range(width):
                        st = tri(w, st)
                else:
                    st = jax.lax.fori_loop(0, width, tri, st)
                return st

            if leaf_cull:
                # stale-leaf re-test (see _kernel_nearest): retired
                # lanes (closest < 0) never pass the slab, so culling
                # gets more aggressive as the packet retires
                lb = _node_box(smem_nodes, top_rows, nodes, ntab, idx,
                               quant, qscal)
                lhit = _slab(lb, o1, o2, o3, i1, i2, i3, n1, n2, n3,
                             closest)
                alive = jnp.sum((lhit < closest).astype(jnp.int32),
                                dtype=jnp.int32) > 0
                nl = nl + alive.astype(jnp.int32)
                closest, occ = jax.lax.cond(
                    alive, do_mt, lambda st: st, (closest, occ))
            else:
                nl = nl + 1
                closest, occ = do_mt((closest, occ))
            # retired == closest < 0 (covers inert padding lanes too)
            ndone = jnp.all(closest < 0.0).astype(jnp.int32)
            m = jnp.where(bs > 0, _ctz32(bs), 0)
            new_bs = (bs >> m.astype(jnp.uint32)) ^ jnp.uint32(1)
            new_idx = (idx >> m) ^ 1
            if scratch:
                cls[:, :] = closest
                bst[:, :] = occ
                return (new_idx, new_bs, nb, nsg, nl, ndone, p0, p1)
            return (new_idx, new_bs, nb, nsg, nl, closest, occ, ndone,
                    p0, p1)

        if fused:
            def body(carry):
                carry = jax.lax.cond(carry[0] < cl_first, node_fn,
                                     lambda c: c, carry)
                return jax.lax.cond(carry[0] >= cl_first, leaf_fn,
                                    lambda c: c, carry)
        else:
            def body(carry):
                return jax.lax.cond(carry[0] >= cl_first, leaf_fn,
                                    node_fn, carry)

        def cond(carry):
            ndone = carry[5] if scratch else carry[7]
            return (carry[0] > 0) & (ndone == 0)

        shp = o1.shape
        if scratch:
            cls[:, :] = tmax[:, :]
            bst[:, :] = jnp.zeros(shp, jnp.int32)
            init = (jnp.int32(1), jnp.uint32(1), jnp.int32(0),
                    jnp.int32(0), jnp.int32(0), jnp.int32(0),
                    jnp.int32(0), jnp.int32(0))
            _, _, nb, nsg, nl, _, p0f, p1f = jax.lax.while_loop(
                cond, body, init)
            occ = bst[:, :]
        else:
            init = (jnp.int32(1), jnp.uint32(1), jnp.int32(0),
                    jnp.int32(0), jnp.int32(0), tmax[:, :],
                    jnp.zeros(shp, jnp.int32),
                    jnp.int32(0), jnp.int32(0), jnp.int32(0))
            _, _, nb, nsg, nl, _, occ, _, p0f, p1f = jax.lax.while_loop(
                cond, body, init)
        if pf:
            # drain speculative copies (early-out can exit mid-pair)
            @pl.when(p0f > 0)
            def _():
                pf_drain(s0, 0)

            @pl.when(p1f > 0)
            def _():
                pf_drain(s1, PAIR)
        if pf1:
            # the any-hit early-out can exit with the next-leaf copy
            # still in flight — balance its semaphore
            @pl.when(p0f > 0)
            def _():
                pltpu.make_async_copy(
                    blocks.at[0], blk.at[pl.ds(0, CROWS)], s0).wait()
        if pf2:
            @pl.when(p0f > 0)
            def _():
                pf2_drain(0)

            @pl.when(p1f > 0)
            def _():
                pf2_drain(1)
        occ_out[:, :] = occ
        ii = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
        cnt_out[:, :] = jnp.where(
            (ii == 0) & (jj == 0), nb,
            jnp.where((ii == 0) & (jj == 1), nsg,
                      jnp.where((ii == 0) & (jj == 2), nl, 0)))

    _run_scoped_traversal(scoped, blocks, nodes, smem_nodes, top_rows,
                          rpc=rpc if pf else 0,
                          pf1_rows=CROWS if pf1 else 0,
                          pf2_rows=CROWS if pf2 else 0,
                          scratch_shapes=((("cls", jnp.float32),
                                           ("bst", jnp.int32))
                                          if scratch else ()))


def _mp_ray_views(ox, oy, oz, dx, dy, dz, tmax, packs):
    """Per-packet ray tiles + slab precomputes from (8*packs, 128)
    blocks."""
    views = []
    for p in range(packs):
        r = slice(8 * p, 8 * (p + 1))
        o1, o2, o3 = ox[r, :], oy[r, :], oz[r, :]
        d1, d2, d3 = dx[r, :], dy[r, :], dz[r, :]
        i1, i2, i3 = 1.0 / d1, 1.0 / d2, 1.0 / d3
        views.append((o1, o2, o3, d1, d2, d3, i1, i2, i3,
                      i1 < 0.0, i2 < 0.0, i3 < 0.0, tmax[r, :]))
    return views


def _kernel_nearest_mp(ox, oy, oz, dx, dy, dz, tmax, nodes, *rest,
                       cl_first, width, stride, t_min, unroll, packs,
                       quant=False, approx_recip=False, fused=True,
                       quad=True, scratch=False):
    """Multi-packet nearest-hit traversal: ``packs`` independent
    1024-ray packets share one kernel invocation, and every trip issues
    ALL packets' slab tests + vote reductions (phase 1) before consuming
    ANY vote (phase 2). The vector->scalar vote sync is the node step's
    latency floor — interleaving P independent chains amortizes it
    (measured 338/211/142 ns/step at P=1/2/4, experiments/dual_probe.py).
    Per-packet traversal order, results, and step/visit counts are
    IDENTICAL to the single-packet kernel with fused=False, quad=False
    (each packet's state advances by the same rules); only wall-clock
    changes. Requires a flat SMEM node table (f32 or quantized) and the
    cpb==1 block layout.

    ``scratch``: per-pack closest/besti tiles live in VMEM scratch refs
    instead of the while-loop carry (the single-kernel
    ``packet_scratch`` pattern) — the round-2 multi-packet loss was
    attributed partly to P packs' worth of (8,128) state crossing every
    per-trip ``lax.cond`` join; scratch refs remove exactly that.
    Phase-1 reads happen at trip top (all tiles die in the vote
    reductions before any branch); leaf visits re-read and write their
    own pack's slice inside the branch, so trip semantics are unchanged.
    """
    rest = list(rest)
    qp = rest.pop(0) if quant else None
    blocks, tri_out, feat_out, cnt_out = rest

    pid0 = pl.program_id(0) == 0  # first grid step: table DMA runs once
    def scoped(blk, sem, ntab, cls=None, bst=None):
        @pl.when(pid0)
        def _():
            nd = pltpu.make_async_copy(nodes, ntab, sem)
            nd.start()
            nd.wait()
        qscal = tuple(qp[i] for i in range(6)) if quant else None
        quad_ok = quad and cl_first >= 8
        views = _mp_ray_views(ox, oy, oz, dx, dy, dz, tmax, packs)
        if scratch:
            for p in range(packs):
                cls[pl.ds(8 * p, 8), :] = views[p][12]
                bst[pl.ds(8 * p, 8), :] = jnp.full((8, 128), -1,
                                                   jnp.int32)

        def body(carry):
            idxs = carry[0]
            bss = carry[1]
            if scratch:
                closests = [cls[pl.ds(8 * p, 8), :]
                            for p in range(packs)]
                bestis = None
                nb, nsg, nl = carry[2]
            else:
                closests = carry[2]
                bestis = carry[3]
                nb, nsg, nl = carry[4]
            # ---- phase 1: issue every packet's slabs + packed votes
            votes = []
            for p in range(packs):
                (o1, o2, o3, _d1, _d2, _d3, i1, i2, i3, n1, n2, n3,
                 _tm) = views[p]
                # clamped row: packets at a leaf / dead read harmless
                # bounds that phase 2 discards — keeps phase 1
                # straight-line (no branches before the vote consumes)
                lq = jnp.clip(idxs[p], 1, cl_first - 1) * 2
                if quad_ok:
                    # 4-ary double step above the last interior level
                    # (same rule as the single kernel): read the four
                    # grandchild rows when eligible, else the child
                    # pair twice (slabs 2/3 duplicate 0/1, discarded).
                    # NOT gated on at-node: a scalar-cond gate around
                    # phase 1 measured SLOWER (dragon 455.7 -> 473.8
                    # ms/spp) — branch overhead beats the speculative
                    # slab work it saves.
                    is_q = idxs[p] < cl_first // 2
                    gq = jnp.clip(idxs[p], 1, cl_first // 2 - 1) * 4
                    r01 = jnp.where(is_q, gq, lq)
                    r23 = jnp.where(is_q, gq + 2, lq)
                    b0, b1 = _node_bounds(True, 0, None, ntab, r01,
                                          quant, qscal)
                    b2, b3 = _node_bounds(True, 0, None, ntab, r23,
                                          quant, qscal)
                    args_s = (o1, o2, o3, i1, i2, i3, n1, n2, n3,
                              closests[p])
                    h0 = _slab(b0, *args_s)
                    h1 = _slab(b1, *args_s)
                    h2 = _slab(b2, *args_s)
                    h3 = _slab(b3, *args_s)
                    votes.append(
                        (_advance_votes(h0, h1, closests[p]),
                         _quad_votes(h0, h1, h2, h3, closests[p]), lq))
                else:
                    bl, br = _node_bounds(True, 0, None, ntab, lq,
                                          quant, qscal)
                    lhit = _slab(bl, o1, o2, o3, i1, i2, i3, n1, n2,
                                 n3, closests[p])
                    rhit = _slab(br, o1, o2, o3, i1, i2, i3, n1, n2,
                                 n3, closests[p])
                    votes.append(
                        (_advance_votes(lhit, rhit, closests[p]), None,
                         lq))
            # ---- phase 2: consume votes / run leaf visits per packet
            n_idx, n_bs, n_cl, n_bi = [], [], [], []
            for p in range(packs):
                (packed, s_pref), qvotes, lq = votes[p]
                (o1, o2, o3, d1, d2, d3, _i1, _i2, _i3, _n1, _n2, _n3,
                 _tm) = views[p]

                def mt_cluster(idx, closest, besti, p=p, o1=o1, o2=o2,
                               o3=o3, d1=d1, d2=d2, d3=d3):
                    """DMA + MT one cluster (``idx`` AT a leaf row)."""
                    c = idx - cl_first
                    dma = pltpu.make_async_copy(blocks.at[c], blk.at[p],
                                                sem)
                    dma.start()
                    dma.wait()

                    def tri(w, st):
                        closest, besti = st
                        t, u, v, bad = _mt_scalar_tri(
                            blk.at[p], 0, w, stride, o1, o2, o3,
                            d1, d2, d3, t_min, closest, approx_recip)
                        closest = jnp.where(bad, closest, t)
                        besti = jnp.where(bad, besti, c * width + w)
                        return (closest, besti)

                    st = (closest, besti)
                    if unroll:
                        for w in range(width):
                            st = tri(w, st)
                    else:
                        st = jax.lax.fori_loop(0, width, tri, st)
                    return st

                def leaf_visit(idx, bs, closest, besti, nl,
                               mt_cluster=mt_cluster):
                    closest, besti = mt_cluster(idx, closest, besti)
                    new_idx, new_bs = _pop(idx, bs)
                    return (new_idx, new_bs, closest, besti, nl + 1)

                def leaf_visit_s(idx, bs, nl, p=p,
                                 mt_cluster=mt_cluster):
                    """Scratch flavor: lane state reads/writes the
                    pack's VMEM slice inside the branch — only scalars
                    cross the cond joins."""
                    sl = pl.ds(8 * p, 8)
                    closest, besti = mt_cluster(idx, cls[sl, :],
                                                bst[sl, :])
                    cls[sl, :] = closest
                    bst[sl, :] = besti
                    new_idx, new_bs = _pop(idx, bs)
                    return (new_idx, new_bs, nl + 1)

                def apply_votes(idx, bs, packed=packed, s_pref=s_pref,
                                lq=lq, qvotes=qvotes):
                    if quad_ok:
                        def apply_q(_):
                            return _quad_apply(idx, bs, *qvotes, 1024)

                        def apply_b(_):
                            ni, nbs, both, single = _advance_apply(
                                idx, bs, packed, s_pref, lq)
                            return (ni, nbs, both.astype(jnp.int32),
                                    single.astype(jnp.int32))

                        return jax.lax.cond(
                            idx < cl_first // 2, apply_q, apply_b, None)
                    ni, nbs, both, single = _advance_apply(
                        idx, bs, packed, s_pref, lq)
                    return (ni, nbs, both.astype(jnp.int32),
                            single.astype(jnp.int32))

                def leaf_branch(op, leaf_visit=leaf_visit):
                    idx, bs, closest, besti, nb, nsg, nl = op
                    idx, bs, closest, besti, nl = leaf_visit(
                        idx, bs, closest, besti, nl)
                    return (idx, bs, closest, besti, nb, nsg, nl)

                def node_branch(op, apply_votes=apply_votes,
                                leaf_visit=leaf_visit):
                    idx, bs, closest, besti, nb, nsg, nl = op
                    ni, nbs, nbi, nsgi = apply_votes(idx, bs)
                    dead = idx <= 0
                    ni = jnp.where(dead, 0, ni)
                    nbs = jnp.where(dead, jnp.uint32(0), nbs)
                    live = jnp.logical_not(dead).astype(jnp.int32)
                    nb = nb + nbi * live
                    nsg = nsg + nsgi * live
                    if fused:
                        # fused body (same trick as the single kernel):
                        # a step that DESCENDS into a leaf runs its MT in
                        # the same trip; leaves entered by pops take
                        # their own trip via leaf_branch
                        def desc(st):
                            return leaf_visit(*st)

                        ni, nbs, closest, besti, nl = jax.lax.cond(
                            ni >= cl_first, desc,
                            lambda st: st,
                            (ni, nbs, closest, besti, nl))
                    return (ni, nbs, closest, besti, nb, nsg, nl)

                def leaf_branch_s(op, leaf_visit_s=leaf_visit_s):
                    idx, bs, nb, nsg, nl = op
                    idx, bs, nl = leaf_visit_s(idx, bs, nl)
                    return (idx, bs, nb, nsg, nl)

                def node_branch_s(op, apply_votes=apply_votes,
                                  leaf_visit_s=leaf_visit_s):
                    idx, bs, nb, nsg, nl = op
                    ni, nbs, nbi, nsgi = apply_votes(idx, bs)
                    dead = idx <= 0
                    ni = jnp.where(dead, 0, ni)
                    nbs = jnp.where(dead, jnp.uint32(0), nbs)
                    live = jnp.logical_not(dead).astype(jnp.int32)
                    nb = nb + nbi * live
                    nsg = nsg + nsgi * live
                    if fused:
                        def desc(st):
                            return leaf_visit_s(*st)

                        ni, nbs, nl = jax.lax.cond(
                            ni >= cl_first, desc, lambda st: st,
                            (ni, nbs, nl))
                    return (ni, nbs, nb, nsg, nl)

                if scratch:
                    idx, bs, nb, nsg, nl = jax.lax.cond(
                        idxs[p] >= cl_first, leaf_branch_s,
                        node_branch_s, (idxs[p], bss[p], nb, nsg, nl))
                else:
                    idx, bs, closest, besti, nb, nsg, nl = jax.lax.cond(
                        idxs[p] >= cl_first, leaf_branch, node_branch,
                        (idxs[p], bss[p], closests[p], bestis[p], nb,
                         nsg, nl))
                    n_cl.append(closest)
                    n_bi.append(besti)
                n_idx.append(idx)
                n_bs.append(bs)
            if scratch:
                return (tuple(n_idx), tuple(n_bs), (nb, nsg, nl))
            return (tuple(n_idx), tuple(n_bs), tuple(n_cl), tuple(n_bi),
                    (nb, nsg, nl))

        def cond(carry):
            alive = carry[0][0] > 0
            for p in range(1, packs):
                alive = alive | (carry[0][p] > 0)
            return alive

        shp = (8, 128)
        if scratch:
            init = (tuple(jnp.int32(1) for _ in range(packs)),
                    tuple(jnp.uint32(1) for _ in range(packs)),
                    (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
            out = jax.lax.while_loop(cond, body, init)
            closest_all = cls[:, :]
            besti_all = bst[:, :]
            nb, nsg, nl = out[2]
        else:
            init = (tuple(jnp.int32(1) for _ in range(packs)),
                    tuple(jnp.uint32(1) for _ in range(packs)),
                    tuple(v[12] for v in views),
                    tuple(jnp.full(shp, -1, jnp.int32)
                          for _ in range(packs)),
                    (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
            out = jax.lax.while_loop(cond, body, init)
            closest_all = jnp.concatenate(list(out[2]), axis=0)
            besti_all = jnp.concatenate(list(out[3]), axis=0)
            nb, nsg, nl = out[4]
        oshp = (8 * packs, 128)
        ii = jax.lax.broadcasted_iota(jnp.int32, oshp, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, oshp, 1)
        cnt_out[:, :] = jnp.where(
            (ii == 0) & (jj == 0), nb,
            jnp.where((ii == 0) & (jj == 1), nsg,
                      jnp.where((ii == 0) & (jj == 2), nl, 0)))
        tri_out[:, :] = besti_all
        feat_out[:, :] = closest_all

    kw = dict(blk=pltpu.SMEM((packs,) + blocks.shape[1:], jnp.float32),
              sem=pltpu.SemaphoreType.DMA(()),
              ntab=pltpu.SMEM(nodes.shape, nodes.dtype))
    if scratch:
        kw["cls"] = pltpu.VMEM((8 * packs, 128), jnp.float32)
        kw["bst"] = pltpu.VMEM((8 * packs, 128), jnp.int32)
    pl.run_scoped(scoped, **kw)


def _kernel_shadow_mp(ox, oy, oz, dx, dy, dz, tmax, nodes, *rest,
                      cl_first, width, stride, t_min, unroll, packs,
                      quant=False, approx_recip=False, fused=True,
                      quad=True, scratch=False):
    """Multi-packet any-hit traversal (see _kernel_nearest_mp). A packet
    whose lanes have all retired sets its index to 0 — same exit rule as
    the single-packet shadow kernel's ndone carry. ``scratch``: per-pack
    closest/occ tiles in VMEM scratch refs (see _kernel_nearest_mp)."""
    rest = list(rest)
    qp = rest.pop(0) if quant else None
    blocks, occ_out, cnt_out = rest

    pid0 = pl.program_id(0) == 0  # first grid step: table DMA runs once
    def scoped(blk, sem, ntab, cls=None, occr=None):
        @pl.when(pid0)
        def _():
            nd = pltpu.make_async_copy(nodes, ntab, sem)
            nd.start()
            nd.wait()
        qscal = tuple(qp[i] for i in range(6)) if quant else None
        quad_ok = quad and cl_first >= 8
        views = _mp_ray_views(ox, oy, oz, dx, dy, dz, tmax, packs)
        if scratch:
            for p in range(packs):
                cls[pl.ds(8 * p, 8), :] = views[p][12]
                occr[pl.ds(8 * p, 8), :] = jnp.zeros((8, 128),
                                                     jnp.int32)

        def body(carry):
            if scratch:
                idxs, bss, cnts = carry
                closests = [cls[pl.ds(8 * p, 8), :]
                            for p in range(packs)]
                occs = None
            else:
                idxs, bss, closests, occs, cnts = carry
            nb, nsg, nl = cnts
            votes = []
            for p in range(packs):
                (o1, o2, o3, _d1, _d2, _d3, i1, i2, i3, n1, n2, n3,
                 _tm) = views[p]
                lq = jnp.clip(idxs[p], 1, cl_first - 1) * 2
                if quad_ok:
                    # 4-ary double step above the last interior level
                    # (same rule as the single kernel): read the four
                    # grandchild rows when eligible, else the child
                    # pair twice (slabs 2/3 duplicate 0/1, discarded).
                    # NOT gated on at-node: a scalar-cond gate around
                    # phase 1 measured SLOWER (dragon 455.7 -> 473.8
                    # ms/spp) — branch overhead beats the speculative
                    # slab work it saves.
                    is_q = idxs[p] < cl_first // 2
                    gq = jnp.clip(idxs[p], 1, cl_first // 2 - 1) * 4
                    r01 = jnp.where(is_q, gq, lq)
                    r23 = jnp.where(is_q, gq + 2, lq)
                    b0, b1 = _node_bounds(True, 0, None, ntab, r01,
                                          quant, qscal)
                    b2, b3 = _node_bounds(True, 0, None, ntab, r23,
                                          quant, qscal)
                    args_s = (o1, o2, o3, i1, i2, i3, n1, n2, n3,
                              closests[p])
                    h0 = _slab(b0, *args_s)
                    h1 = _slab(b1, *args_s)
                    h2 = _slab(b2, *args_s)
                    h3 = _slab(b3, *args_s)
                    votes.append(
                        (_advance_votes(h0, h1, closests[p]),
                         _quad_votes(h0, h1, h2, h3, closests[p]), lq))
                else:
                    bl, br = _node_bounds(True, 0, None, ntab, lq,
                                          quant, qscal)
                    lhit = _slab(bl, o1, o2, o3, i1, i2, i3, n1, n2,
                                 n3, closests[p])
                    rhit = _slab(br, o1, o2, o3, i1, i2, i3, n1, n2,
                                 n3, closests[p])
                    votes.append(
                        (_advance_votes(lhit, rhit, closests[p]), None,
                         lq))
            n_idx, n_bs, n_cl, n_oc = [], [], [], []
            for p in range(packs):
                (packed, s_pref), qvotes, lq = votes[p]
                (o1, o2, o3, d1, d2, d3, _i1, _i2, _i3, _n1, _n2, _n3,
                 _tm) = views[p]

                def mt_cluster(idx, closest, occ, p=p, o1=o1, o2=o2,
                               o3=o3, d1=d1, d2=d2, d3=d3):
                    c = idx - cl_first
                    dma = pltpu.make_async_copy(blocks.at[c], blk.at[p],
                                                sem)
                    dma.start()
                    dma.wait()

                    def tri(w, st):
                        closest, occ = st
                        t, u, v, bad = _mt_scalar_tri(
                            blk.at[p], 0, w, stride, o1, o2, o3,
                            d1, d2, d3, t_min, closest, approx_recip)
                        occ = jnp.where(bad, occ, jnp.int32(1))
                        closest = jnp.where(bad, closest,
                                            jnp.float32(-1e30))
                        return closest, occ

                    st = (closest, occ)
                    if unroll:
                        for w in range(width):
                            st = tri(w, st)
                    else:
                        st = jax.lax.fori_loop(0, width, tri, st)
                    return st

                def leaf_visit(idx, bs, closest, occ, nl,
                               mt_cluster=mt_cluster):
                    closest, occ = mt_cluster(idx, closest, occ)
                    ndone = jnp.all(closest < 0.0)
                    new_idx, new_bs = _pop(idx, bs)
                    new_idx = jnp.where(ndone, 0, new_idx)
                    return (new_idx, new_bs, closest, occ, nl + 1)

                def leaf_visit_s(idx, bs, nl, p=p,
                                 mt_cluster=mt_cluster):
                    sl = pl.ds(8 * p, 8)
                    closest, occ = mt_cluster(idx, cls[sl, :],
                                              occr[sl, :])
                    cls[sl, :] = closest
                    occr[sl, :] = occ
                    ndone = jnp.all(closest < 0.0)
                    new_idx, new_bs = _pop(idx, bs)
                    new_idx = jnp.where(ndone, 0, new_idx)
                    return (new_idx, new_bs, nl + 1)

                def apply_votes(idx, bs, packed=packed, s_pref=s_pref,
                                lq=lq, qvotes=qvotes):
                    if quad_ok:
                        def apply_q(_):
                            return _quad_apply(idx, bs, *qvotes, 1024)

                        def apply_b(_):
                            ni, nbs, both, single = _advance_apply(
                                idx, bs, packed, s_pref, lq)
                            return (ni, nbs, both.astype(jnp.int32),
                                    single.astype(jnp.int32))

                        return jax.lax.cond(
                            idx < cl_first // 2, apply_q, apply_b, None)
                    ni, nbs, both, single = _advance_apply(
                        idx, bs, packed, s_pref, lq)
                    return (ni, nbs, both.astype(jnp.int32),
                            single.astype(jnp.int32))

                def leaf_branch(op, leaf_visit=leaf_visit):
                    idx, bs, closest, occ, nb, nsg, nl = op
                    idx, bs, closest, occ, nl = leaf_visit(
                        idx, bs, closest, occ, nl)
                    return (idx, bs, closest, occ, nb, nsg, nl)

                def node_branch(op, apply_votes=apply_votes,
                                leaf_visit=leaf_visit):
                    idx, bs, closest, occ, nb, nsg, nl = op
                    ni, nbs, nbi, nsgi = apply_votes(idx, bs)
                    dead = idx <= 0
                    ni = jnp.where(dead, 0, ni)
                    nbs = jnp.where(dead, jnp.uint32(0), nbs)
                    live = jnp.logical_not(dead).astype(jnp.int32)
                    nb = nb + nbi * live
                    nsg = nsg + nsgi * live
                    if fused:
                        def desc(st):
                            return leaf_visit(*st)

                        ni, nbs, closest, occ, nl = jax.lax.cond(
                            ni >= cl_first, desc,
                            lambda st: st,
                            (ni, nbs, closest, occ, nl))
                    return (ni, nbs, closest, occ, nb, nsg, nl)

                def leaf_branch_s(op, leaf_visit_s=leaf_visit_s):
                    idx, bs, nb, nsg, nl = op
                    idx, bs, nl = leaf_visit_s(idx, bs, nl)
                    return (idx, bs, nb, nsg, nl)

                def node_branch_s(op, apply_votes=apply_votes,
                                  leaf_visit_s=leaf_visit_s):
                    idx, bs, nb, nsg, nl = op
                    ni, nbs, nbi, nsgi = apply_votes(idx, bs)
                    dead = idx <= 0
                    ni = jnp.where(dead, 0, ni)
                    nbs = jnp.where(dead, jnp.uint32(0), nbs)
                    live = jnp.logical_not(dead).astype(jnp.int32)
                    nb = nb + nbi * live
                    nsg = nsg + nsgi * live
                    if fused:
                        def desc(st):
                            return leaf_visit_s(*st)

                        ni, nbs, nl = jax.lax.cond(
                            ni >= cl_first, desc, lambda st: st,
                            (ni, nbs, nl))
                    return (ni, nbs, nb, nsg, nl)

                if scratch:
                    idx, bs, nb, nsg, nl = jax.lax.cond(
                        idxs[p] >= cl_first, leaf_branch_s,
                        node_branch_s, (idxs[p], bss[p], nb, nsg, nl))
                else:
                    idx, bs, closest, occ, nb, nsg, nl = jax.lax.cond(
                        idxs[p] >= cl_first, leaf_branch, node_branch,
                        (idxs[p], bss[p], closests[p], occs[p], nb, nsg,
                         nl))
                    n_cl.append(closest)
                    n_oc.append(occ)
                n_idx.append(idx)
                n_bs.append(bs)
            if scratch:
                return (tuple(n_idx), tuple(n_bs), (nb, nsg, nl))
            return (tuple(n_idx), tuple(n_bs), tuple(n_cl), tuple(n_oc),
                    (nb, nsg, nl))

        def cond(carry):
            alive = carry[0][0] > 0
            for p in range(1, packs):
                alive = alive | (carry[0][p] > 0)
            return alive

        shp = (8, 128)
        if scratch:
            init = (tuple(jnp.int32(1) for _ in range(packs)),
                    tuple(jnp.uint32(1) for _ in range(packs)),
                    (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
            out = jax.lax.while_loop(cond, body, init)
            occ_all = occr[:, :]
            nb, nsg, nl = out[2]
        else:
            init = (tuple(jnp.int32(1) for _ in range(packs)),
                    tuple(jnp.uint32(1) for _ in range(packs)),
                    tuple(v[12] for v in views),
                    tuple(jnp.zeros(shp, jnp.int32)
                          for _ in range(packs)),
                    (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
            out = jax.lax.while_loop(cond, body, init)
            occ_all = jnp.concatenate(list(out[3]), axis=0)
            nb, nsg, nl = out[4]
        oshp = (8 * packs, 128)
        ii = jax.lax.broadcasted_iota(jnp.int32, oshp, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, oshp, 1)
        occ_out[:, :] = occ_all
        cnt_out[:, :] = jnp.where(
            (ii == 0) & (jj == 0), nb,
            jnp.where((ii == 0) & (jj == 1), nsg,
                      jnp.where((ii == 0) & (jj == 2), nl, 0)))

    kw = dict(blk=pltpu.SMEM((packs,) + blocks.shape[1:], jnp.float32),
              sem=pltpu.SemaphoreType.DMA(()),
              ntab=pltpu.SMEM(nodes.shape, nodes.dtype))
    if scratch:
        kw["cls"] = pltpu.VMEM((8 * packs, 128), jnp.float32)
        kw["occr"] = pltpu.VMEM((8 * packs, 128), jnp.int32)
    pl.run_scoped(scoped, **kw)


def _mps_phase1(views, idxs, closests, ntab, cl_first, quad_ok, quant,
                qscal, blocks, blk, sems, packs):
    """Split-trip phase 1: for every pack, issue the pop-entered leaf
    cluster DMA (scalar-predicated — rides under the other packs' slab
    work) and the node slabs + packed vote reductions (clamped rows for
    leaf/dead packs, harmless — phase 2 discards them). Returns
    (votes, s_leafs)."""
    votes, s_leafs = [], []
    for p in range(packs):
        (o1, o2, o3, _d1, _d2, _d3, i1, i2, i3, n1, n2, n3,
         _tm) = views[p]
        s_leaf = idxs[p] >= cl_first
        s_leafs.append(s_leaf)

        @pl.when(s_leaf)
        def _(p=p, idx=idxs[p]):
            pltpu.make_async_copy(blocks.at[idx - cl_first], blk.at[p],
                                  sems.at[p]).start()

        lq = jnp.clip(idxs[p], 1, cl_first - 1) * 2
        if quad_ok:
            is_q = idxs[p] < cl_first // 2
            gq = jnp.clip(idxs[p], 1, cl_first // 2 - 1) * 4
            r01 = jnp.where(is_q, gq, lq)
            r23 = jnp.where(is_q, gq + 2, lq)
            b0, b1 = _node_bounds(True, 0, None, ntab, r01, quant, qscal)
            b2, b3 = _node_bounds(True, 0, None, ntab, r23, quant, qscal)
            args_s = (o1, o2, o3, i1, i2, i3, n1, n2, n3, closests[p])
            h0 = _slab(b0, *args_s)
            h1 = _slab(b1, *args_s)
            h2 = _slab(b2, *args_s)
            h3 = _slab(b3, *args_s)
            votes.append((_advance_votes(h0, h1, closests[p]),
                          _quad_votes(h0, h1, h2, h3, closests[p]), lq))
        else:
            bl, br = _node_bounds(True, 0, None, ntab, lq, quant, qscal)
            lhit = _slab(bl, o1, o2, o3, i1, i2, i3, n1, n2, n3,
                         closests[p])
            rhit = _slab(br, o1, o2, o3, i1, i2, i3, n1, n2, n3,
                         closests[p])
            votes.append((_advance_votes(lhit, rhit, closests[p]), None,
                          lq))
    return votes, s_leafs


def _mps_advance(idx, bs, s_leaf, nb, nsg, nl, votes_p, cl_first,
                 quad_ok):
    """Split-trip phase 2a: one pack's scalar state advance. Leaf packs
    pop; node packs apply the phase-1 votes (fused: a step that descends
    into a leaf schedules its MT and pops past it). Returns
    (idx', bs', nb, nsg, nl, mt, c): ``mt`` nonzero schedules an MT loop
    on cluster ``c`` in phase 2b. Traversal order, results, and
    counters are identical to the fused single-packet kernel."""
    (packed, s_pref), qvotes, lq = votes_p

    def apply_votes(idx, bs):
        if quad_ok:
            def apply_q(_):
                return _quad_apply(idx, bs, *qvotes, 1024)

            def apply_b(_):
                ni, nbs, both, single = _advance_apply(idx, bs, packed,
                                                       s_pref, lq)
                return (ni, nbs, both.astype(jnp.int32),
                        single.astype(jnp.int32))

            return jax.lax.cond(idx < cl_first // 2, apply_q, apply_b,
                                None)
        ni, nbs, both, single = _advance_apply(idx, bs, packed, s_pref,
                                               lq)
        return (ni, nbs, both.astype(jnp.int32),
                single.astype(jnp.int32))

    def leaf_br(op):
        idx, bs, nb, nsg, nl = op
        ni, nbs = _pop(idx, bs)
        return (ni, nbs, nb, nsg, nl + 1, jnp.int32(1), idx - cl_first)

    def node_br(op):
        idx, bs, nb, nsg, nl = op
        ni, nbs, nbi, nsgi = apply_votes(idx, bs)
        dead = idx <= 0
        ni = jnp.where(dead, 0, ni)
        nbs = jnp.where(dead, jnp.uint32(0), nbs)
        live = jnp.logical_not(dead).astype(jnp.int32)
        nb = nb + nbi * live
        nsg = nsg + nsgi * live
        # fused descend: the MT itself runs in phase 2b; pop past the
        # leaf now so the next trip continues from the sibling
        desc = ni >= cl_first
        c = jnp.maximum(ni - cl_first, 0)
        pi, pbs = _pop(ni, nbs)
        mt = desc.astype(jnp.int32)
        ni = jnp.where(desc, pi, ni)
        nbs = jnp.where(desc, pbs, nbs)
        return (ni, nbs, nb, nsg, nl + mt, mt, c)

    return jax.lax.cond(s_leaf, leaf_br, node_br, (idx, bs, nb, nsg, nl))


def _kernel_nearest_mps(ox, oy, oz, dx, dy, dz, tmax, nodes, *rest,
                        cl_first, width, stride, t_min, unroll, packs,
                        quant=False, approx_recip=False, quad=True):
    """Split-trip multi-packet nearest-hit traversal
    (``config.packet_split``): the _mp kernels' issue/consume phase
    split extended to the LEAF phase. Per while-trip: phase 1 issues
    every pack's slab tests + vote reductions AND the pop-entered leaf
    cluster DMAs (per-pack semaphores); phase 2a advances every pack's
    scalar state (vote apply / pop, fused-descend DMAs issued as soon
    as the target is known); phase 2b runs all scheduled MT loops
    back-to-back against the VMEM lane-state refs. Compared to the _mp
    kernels (whose per-pack leaf visit runs DMA start+wait+MT serially
    inside its branch), every leaf DMA is in flight before any MT
    consumes and the vote round trips hide under MT compute — the
    ~590 ns/visit non-compute serialization (PERFORMANCE.md phase
    split) amortizes across packs instead of serializing. Per-packet
    traversal order, results, and counters are identical to the fused
    single-packet kernel (tested). Requires a flat SMEM node table and
    cpb==1; lane state always lives in scratch refs (the _mp
    ``scratch`` flavor — only scalars cross the cond joins)."""
    rest = list(rest)
    qp = rest.pop(0) if quant else None
    blocks, tri_out, feat_out, cnt_out = rest

    pid0 = pl.program_id(0) == 0  # first grid step: table DMA runs once
    def scoped(blk, sem, sems, ntab, cls, bst):
        @pl.when(pid0)
        def _():
            nd = pltpu.make_async_copy(nodes, ntab, sem)
            nd.start()
            nd.wait()
        qscal = tuple(qp[i] for i in range(6)) if quant else None
        quad_ok = quad and cl_first >= 8
        views = _mp_ray_views(ox, oy, oz, dx, dy, dz, tmax, packs)
        for p in range(packs):
            cls[pl.ds(8 * p, 8), :] = views[p][12]
            bst[pl.ds(8 * p, 8), :] = jnp.full((8, 128), -1, jnp.int32)

        def body(carry):
            idxs = carry[0]
            bss = carry[1]
            nb, nsg, nl = carry[2]
            closests = [cls[pl.ds(8 * p, 8), :] for p in range(packs)]
            votes, s_leafs = _mps_phase1(views, idxs, closests, ntab,
                                         cl_first, quad_ok, quant,
                                         qscal, blocks, blk, sems, packs)
            # ---- phase 2a: scalar advance + fused-descend DMA issue
            n_idx, n_bs, mts, mcs = [], [], [], []
            for p in range(packs):
                idx, bs, nb, nsg, nl, mt, c = _mps_advance(
                    idxs[p], bss[p], s_leafs[p], nb, nsg, nl, votes[p],
                    cl_first, quad_ok)

                @pl.when((mt > 0) & jnp.logical_not(s_leafs[p]))
                def _(p=p, c=c):
                    pltpu.make_async_copy(blocks.at[c], blk.at[p],
                                          sems.at[p]).start()

                n_idx.append(idx)
                n_bs.append(bs)
                mts.append(mt)
                mcs.append(c)
            # ---- phase 2b: consume — all packs' MT loops back-to-back
            for p in range(packs):
                (o1, o2, o3, d1, d2, d3, _i1, _i2, _i3, _n1, _n2, _n3,
                 _tm) = views[p]

                @pl.when(mts[p] > 0)
                def _(p=p, c=mcs[p], o1=o1, o2=o2, o3=o3, d1=d1, d2=d2,
                      d3=d3):
                    pltpu.make_async_copy(blocks.at[c], blk.at[p],
                                          sems.at[p]).wait()
                    sl = pl.ds(8 * p, 8)

                    def tri(w, st):
                        closest, besti = st
                        t, u, v, bad = _mt_scalar_tri(
                            blk.at[p], 0, w, stride, o1, o2, o3,
                            d1, d2, d3, t_min, closest, approx_recip)
                        closest = jnp.where(bad, closest, t)
                        besti = jnp.where(bad, besti, c * width + w)
                        return (closest, besti)

                    st = (cls[sl, :], bst[sl, :])
                    if unroll:
                        for w in range(width):
                            st = tri(w, st)
                    else:
                        st = jax.lax.fori_loop(0, width, tri, st)
                    cls[sl, :] = st[0]
                    bst[sl, :] = st[1]
            return (tuple(n_idx), tuple(n_bs), (nb, nsg, nl))

        def cond(carry):
            alive = carry[0][0] > 0
            for p in range(1, packs):
                alive = alive | (carry[0][p] > 0)
            return alive

        init = (tuple(jnp.int32(1) for _ in range(packs)),
                tuple(jnp.uint32(1) for _ in range(packs)),
                (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        out = jax.lax.while_loop(cond, body, init)
        nb, nsg, nl = out[2]
        oshp = (8 * packs, 128)
        ii = jax.lax.broadcasted_iota(jnp.int32, oshp, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, oshp, 1)
        cnt_out[:, :] = jnp.where(
            (ii == 0) & (jj == 0), nb,
            jnp.where((ii == 0) & (jj == 1), nsg,
                      jnp.where((ii == 0) & (jj == 2), nl, 0)))
        tri_out[:, :] = bst[:, :]
        feat_out[:, :] = cls[:, :]

    pl.run_scoped(scoped,
                  blk=pltpu.SMEM((packs,) + blocks.shape[1:],
                                 jnp.float32),
                  sem=pltpu.SemaphoreType.DMA(()),
                  sems=pltpu.SemaphoreType.DMA((packs,)),
                  ntab=pltpu.SMEM(nodes.shape, nodes.dtype),
                  cls=pltpu.VMEM((8 * packs, 128), jnp.float32),
                  bst=pltpu.VMEM((8 * packs, 128), jnp.int32))


def _kernel_shadow_mps(ox, oy, oz, dx, dy, dz, tmax, nodes, *rest,
                       cl_first, width, stride, t_min, unroll, packs,
                       quant=False, approx_recip=False, quad=True):
    """Split-trip multi-packet any-hit traversal (see
    _kernel_nearest_mps). Retirement (all lanes occluded -> pack index
    0) is decided by a reduction inside the phase-2b MT, after the
    phase-2a pop already advanced the pack — the retire flag lives in
    an SMEM scratch and zeroes the pack's index at the next trip's
    top, where the dead-pack path keeps counters and state inert, so
    results and counters still match the fused single-packet kernel
    exactly (one extra harmless trip of pre-issued work per retired
    pack is the only difference, and it is wall-clock only)."""
    rest = list(rest)
    qp = rest.pop(0) if quant else None
    blocks, occ_out, cnt_out = rest

    pid0 = pl.program_id(0) == 0  # first grid step: table DMA runs once
    def scoped(blk, sem, sems, ntab, cls, occr, ret):
        @pl.when(pid0)
        def _():
            nd = pltpu.make_async_copy(nodes, ntab, sem)
            nd.start()
            nd.wait()
        qscal = tuple(qp[i] for i in range(6)) if quant else None
        quad_ok = quad and cl_first >= 8
        views = _mp_ray_views(ox, oy, oz, dx, dy, dz, tmax, packs)
        for p in range(packs):
            cls[pl.ds(8 * p, 8), :] = views[p][12]
            occr[pl.ds(8 * p, 8), :] = jnp.zeros((8, 128), jnp.int32)
            ret[p] = jnp.int32(0)

        def body(carry):
            # retire flags land one trip late (phase 2b writes them
            # after phase 2a advanced the pack) — apply them here
            idxs = tuple(jnp.where(ret[p] > 0, 0, carry[0][p])
                         for p in range(packs))
            bss = carry[1]
            nb, nsg, nl = carry[2]
            closests = [cls[pl.ds(8 * p, 8), :] for p in range(packs)]
            votes, s_leafs = _mps_phase1(views, idxs, closests, ntab,
                                         cl_first, quad_ok, quant,
                                         qscal, blocks, blk, sems, packs)
            n_idx, n_bs, mts, mcs = [], [], [], []
            for p in range(packs):
                idx, bs, nb, nsg, nl, mt, c = _mps_advance(
                    idxs[p], bss[p], s_leafs[p], nb, nsg, nl, votes[p],
                    cl_first, quad_ok)

                @pl.when((mt > 0) & jnp.logical_not(s_leafs[p]))
                def _(p=p, c=c):
                    pltpu.make_async_copy(blocks.at[c], blk.at[p],
                                          sems.at[p]).start()

                n_idx.append(idx)
                n_bs.append(bs)
                mts.append(mt)
                mcs.append(c)
            for p in range(packs):
                (o1, o2, o3, d1, d2, d3, _i1, _i2, _i3, _n1, _n2, _n3,
                 _tm) = views[p]

                @pl.when(mts[p] > 0)
                def _(p=p, c=mcs[p], o1=o1, o2=o2, o3=o3, d1=d1, d2=d2,
                      d3=d3):
                    pltpu.make_async_copy(blocks.at[c], blk.at[p],
                                          sems.at[p]).wait()
                    sl = pl.ds(8 * p, 8)

                    def tri(w, st):
                        closest, occ = st
                        t, u, v, bad = _mt_scalar_tri(
                            blk.at[p], 0, w, stride, o1, o2, o3,
                            d1, d2, d3, t_min, closest, approx_recip)
                        occ = jnp.where(bad, occ, jnp.int32(1))
                        closest = jnp.where(bad, closest,
                                            jnp.float32(-1e30))
                        return (closest, occ)

                    st = (cls[sl, :], occr[sl, :])
                    if unroll:
                        for w in range(width):
                            st = tri(w, st)
                    else:
                        st = jax.lax.fori_loop(0, width, tri, st)
                    cls[sl, :] = st[0]
                    occr[sl, :] = st[1]
                    ndone = jnp.all(st[0] < 0.0)
                    ret[p] = jnp.where(ndone, jnp.int32(1), ret[p])
            return (tuple(n_idx), tuple(n_bs), (nb, nsg, nl))

        def cond(carry):
            # a fully-retired pack exits one trip late (the flag is
            # applied at body top); its extra trip is dead-path inert
            alive = (carry[0][0] > 0) & (ret[0] == 0)
            for p in range(1, packs):
                alive = alive | ((carry[0][p] > 0) & (ret[p] == 0))
            return alive

        init = (tuple(jnp.int32(1) for _ in range(packs)),
                tuple(jnp.uint32(1) for _ in range(packs)),
                (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        out = jax.lax.while_loop(cond, body, init)
        nb, nsg, nl = out[2]
        oshp = (8 * packs, 128)
        ii = jax.lax.broadcasted_iota(jnp.int32, oshp, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, oshp, 1)
        occ_out[:, :] = occr[:, :]
        cnt_out[:, :] = jnp.where(
            (ii == 0) & (jj == 0), nb,
            jnp.where((ii == 0) & (jj == 1), nsg,
                      jnp.where((ii == 0) & (jj == 2), nl, 0)))

    pl.run_scoped(scoped,
                  blk=pltpu.SMEM((packs,) + blocks.shape[1:],
                                 jnp.float32),
                  sem=pltpu.SemaphoreType.DMA(()),
                  sems=pltpu.SemaphoreType.DMA((packs,)),
                  ntab=pltpu.SMEM(nodes.shape, nodes.dtype),
                  cls=pltpu.VMEM((8 * packs, 128), jnp.float32),
                  occr=pltpu.VMEM((8 * packs, 128), jnp.int32),
                  ret=pltpu.SMEM((packs,), jnp.int32))


def _pad_rays(a, fill, n_pad):
    n = a.shape[0]
    if n_pad != n:
        a = jnp.concatenate([a, jnp.full((n_pad - n,), fill, a.dtype)])
    return a.reshape(-1, 128)


def _mp_eligible(packs, smem_nodes, quant, top_rows, cpb):
    """Multi-packet kernels need a flat SMEM node table (f32 or quant)
    and cpb==1 blocks; any other layout falls back to the
    single-packet kernel — with a trace-time warning, so the fallback
    is never silent (VERDICT r3 item 6)."""
    mp = (packs > 1 and (smem_nodes or quant) and not top_rows
          and cpb == 1)
    if packs > 1 and not mp:
        warnings.warn(
            f"packet_packs={packs} requires a flat SMEM node table "
            "(f32 or quantized, no top-rows hybrid, cpb=1) -- "
            "running the single-packet kernel",
            RuntimeWarning, stacklevel=3)
    return mp


@functools.partial(jax.jit, static_argnames=("cl_first", "width", "t_min",
                                             "interpret", "rows", "stride",
                                             "cpb", "smem_nodes",
                                             "top_rows", "quant",
                                             "leaf_cull",
                                             "approx_recip", "fused",
                                             "quad", "oct", "packs",
                                             "tree_min", "prefetch",
                                             "scratch", "split",
                                             "pair_pf"))
def packet_trace(origin, direction, t_max, nodes, blocks, tri_feat,
                 cl_first: int, width: int, t_min: float,
                 interpret: bool = False, rows: int = ROWS,
                 stride: int = 128, cpb: int = 1,
                 smem_nodes: bool = False, top_rows: int = 0,
                 nodes_top=None, quant: bool = False, qparams=None,
                 leaf_cull: bool = False, approx_recip: bool = False,
                 fused: bool = True, quad: bool = True, oct: bool = False,
                 packs: int = 1,
                 tree_min: bool = False, prefetch: bool = True,
                 scratch: bool = False, split: bool = False,
                 pair_pf: bool = False):
    """Nearest-hit packet traversal over the whole ray batch.

    origin/direction: V3-like component SoA ([N] x/y/z); t_max [N] or
    scalar; tri_feat the [T,16] per-triangle feature rows (PacketMesh).
    Returns ((t, tri_id, u, v, nx, ny, nz, tu, tv, mid) dense [N]
    arrays, (nodes_both, nodes_single, leaf_visits) scalar telemetry);
    tri_id = -1 and t = t_max on miss. ``packs`` > 1 interleaves that
    many independent packets per kernel block (latency amortization —
    see _kernel_nearest_mp) when the mesh layout is eligible.
    """
    mp = _mp_eligible(packs, smem_nodes, quant, top_rows, cpb)
    oct_ok = oct and quad and (smem_nodes or quant) and not top_rows \
        and cl_first >= 16
    # sibling-pair prefetch (see _kernel_nearest): flatten blocks to
    # (C*rpc, 128) so pair DMAs are single aligned dim-0 slices
    pf = (prefetch and not mp and fused and cpb == 1
          and stride % 128 == 0 and stride >= 128
          and not leaf_cull and cl_first >= 2 and not oct_ok)
    if pf:
        blocks = blocks.reshape(-1, 128)
    rows_blk = rows * (packs if mp else 1)
    n = origin.x.shape[0]
    n_pad = ((n + rows_blk * 128 - 1) // (rows_blk * 128)) \
        * (rows_blk * 128)
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    args = [
        _pad_rays(origin.x, 0.0, n_pad), _pad_rays(origin.y, 0.0, n_pad),
        _pad_rays(origin.z, 0.0, n_pad),
        _pad_rays(direction.x, 1.0, n_pad),
        _pad_rays(direction.y, 0.0, n_pad),
        _pad_rays(direction.z, 0.0, n_pad),
        _pad_rays(t_max_b, 0.0, n_pad),  # pad lanes: closest=0 -> inert
        nodes,
    ] + ([nodes_top] if top_rows else []) \
      + ([qparams] if quant else []) + [blocks]
    n_packets = n_pad // (rows_blk * 128)
    ray_spec = pl.BlockSpec((rows_blk, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    if smem_nodes:
        node_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    else:
        node_spec = pl.BlockSpec(nodes.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    blk_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    extra = [pl.BlockSpec(memory_space=pltpu.HBM)] if top_rows else []
    if quant:
        # dequant scales/offsets ride in SMEM (they are device values —
        # the table is built inside jit where no static floats exist)
        extra = extra + [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if mp and split:
        kernel = functools.partial(
            _kernel_nearest_mps, cl_first=cl_first, width=width,
            stride=stride, t_min=float(t_min), unroll=not interpret,
            packs=packs, quant=quant, approx_recip=approx_recip,
            quad=quad)
    elif mp:
        kernel = functools.partial(
            _kernel_nearest_mp, cl_first=cl_first, width=width,
            stride=stride, t_min=float(t_min), unroll=not interpret,
            packs=packs, quant=quant, approx_recip=approx_recip,
            fused=fused, quad=quad, scratch=scratch)
    else:
        kernel = functools.partial(
            _kernel_nearest, cl_first=cl_first, width=width,
            stride=stride, cpb=cpb, t_min=float(t_min),
            unroll=not interpret, smem_nodes=smem_nodes,
            top_rows=top_rows, quant=quant, leaf_cull=leaf_cull,
            approx_recip=approx_recip, fused=fused, quad=quad, oct=oct,
            tree_min=tree_min, prefetch=prefetch, scratch=scratch,
            pair_pf=pair_pf)
    tri, feat, cnt = pl.pallas_call(
        kernel,
        grid=(n_packets,),
        in_specs=[ray_spec] * 7 + [node_spec] + extra + [blk_spec],
        out_specs=(ray_spec, ray_spec, ray_spec),
        out_shape=(jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32),
                   jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32)),
        interpret=interpret,
        # the node table is the big VMEM item (2*cl_first rows: 1 MB at
        # width 16 on a 262k-tri mesh); the default 16 MB scoped limit
        # sits right at the regen graph's edge — give the kernel room
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
    )(*args)
    tri = tri.reshape(-1)[:n]
    t = feat.reshape(-1)[:n]
    nodes_both = cnt[::rows_blk, 0].sum()
    nodes_single = cnt[::rows_blk, 1].sum()
    leaf_visits = cnt[::rows_blk, 2].sum()
    return (winner_features(origin, direction, t, tri, tri_feat),
            (nodes_both, nodes_single, leaf_visits))


def winner_features(origin, direction, t, tri, tri_feat):
    """Winner features: one 19-wide row gather (free width on TPU) +
    u/v recompute from the gathered v0/e1/e2 (same MT algebra the
    kernel ran; drops the per-triangle bu/bv selects from the hot
    loop). Misses gather row 0 -> masked to 0. Shared by the scalar
    and regrouped packet kernels."""
    fr = tri_feat[jnp.maximum(tri, 0)]
    nx, ny, nz = fr[:, 0], fr[:, 1], fr[:, 2]
    mid = fr[:, 9].astype(jnp.int32)
    hit = tri >= 0
    a = -(direction.x * nx + direction.y * ny + direction.z * nz)
    f_inv = 1.0 / jnp.where(jnp.abs(a) < 1e-30, 1.0, a)
    sx = origin.x - fr[:, 10]
    sy = origin.y - fr[:, 11]
    sz = origin.z - fr[:, 12]
    qx = sy * direction.z - sz * direction.y
    qy = sz * direction.x - sx * direction.z
    qz = sx * direction.y - sy * direction.x
    u = f_inv * (qx * fr[:, 16] + qy * fr[:, 17] + qz * fr[:, 18])
    v = -(f_inv * (qx * fr[:, 13] + qy * fr[:, 14] + qz * fr[:, 15]))
    u = jnp.where(hit, u, 0.0)
    v = jnp.where(hit, v, 0.0)
    # barycentric texcoord interpolation (kernels.cu:337-338), same op
    # order as the feat path in engine/wavefront.py
    w0 = 1.0 - u - v
    tu = u * fr[:, 5] + v * fr[:, 7] + w0 * fr[:, 3]
    tv = u * fr[:, 6] + v * fr[:, 8] + w0 * fr[:, 4]
    return (t, tri, u, v, nx, ny, nz, tu, tv, mid)


@functools.partial(jax.jit, static_argnames=("cl_first", "width", "t_min",
                                             "interpret", "rows", "stride",
                                             "cpb", "smem_nodes",
                                             "top_rows", "quant",
                                             "leaf_cull",
                                             "approx_recip", "fused",
                                             "quad", "oct", "packs",
                                             "prefetch", "scratch",
                                             "split", "pair_pf"))
def packet_occluded(origin, direction, t_max, nodes, blocks, cl_first: int,
                    width: int, t_min: float, interpret: bool = False,
                    rows: int = ROWS, stride: int = 128, cpb: int = 1,
                    smem_nodes: bool = False, top_rows: int = 0,
                    nodes_top=None, quant: bool = False, qparams=None,
                    leaf_cull: bool = False, approx_recip: bool = False,
                    fused: bool = True, quad: bool = True,
                    oct: bool = False,
                    packs: int = 1, prefetch: bool = True,
                    scratch: bool = False, split: bool = False,
                    pair_pf: bool = False):
    """Any-hit packet traversal: ([N] bool occluded, (nodes_both,
    nodes_single, leaf_visits) scalar telemetry). ``packs`` as in
    :func:`packet_trace`."""
    mp = _mp_eligible(packs, smem_nodes, quant, top_rows, cpb)
    oct_ok = oct and quad and (smem_nodes or quant) and not top_rows \
        and cl_first >= 16
    pf = (prefetch and not mp and fused and cpb == 1
          and stride % 128 == 0 and stride >= 128
          and not leaf_cull and cl_first >= 2 and not oct_ok)
    if pf:
        blocks = blocks.reshape(-1, 128)
    rows_blk = rows * (packs if mp else 1)
    n = origin.x.shape[0]
    n_pad = ((n + rows_blk * 128 - 1) // (rows_blk * 128)) \
        * (rows_blk * 128)
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    args = [
        _pad_rays(origin.x, 0.0, n_pad), _pad_rays(origin.y, 0.0, n_pad),
        _pad_rays(origin.z, 0.0, n_pad),
        _pad_rays(direction.x, 1.0, n_pad),
        _pad_rays(direction.y, 0.0, n_pad),
        _pad_rays(direction.z, 0.0, n_pad),
        # pad lanes: closest<0 -> retired immediately, vote all-done
        _pad_rays(t_max_b, -1.0, n_pad),
        nodes,
    ] + ([nodes_top] if top_rows else []) \
      + ([qparams] if quant else []) + [blocks]
    n_packets = n_pad // (rows_blk * 128)
    ray_spec = pl.BlockSpec((rows_blk, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    if smem_nodes:
        node_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    else:
        node_spec = pl.BlockSpec(nodes.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    blk_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    extra = [pl.BlockSpec(memory_space=pltpu.HBM)] if top_rows else []
    if quant:
        # dequant scales/offsets ride in SMEM (they are device values —
        # the table is built inside jit where no static floats exist)
        extra = extra + [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if mp and split:
        kernel = functools.partial(
            _kernel_shadow_mps, cl_first=cl_first, width=width,
            stride=stride, t_min=float(t_min), unroll=not interpret,
            packs=packs, quant=quant, approx_recip=approx_recip,
            quad=quad)
    elif mp:
        kernel = functools.partial(
            _kernel_shadow_mp, cl_first=cl_first, width=width,
            stride=stride, t_min=float(t_min), unroll=not interpret,
            packs=packs, quant=quant, approx_recip=approx_recip,
            fused=fused, quad=quad, scratch=scratch)
    else:
        kernel = functools.partial(
            _kernel_shadow, cl_first=cl_first, width=width,
            stride=stride, cpb=cpb, t_min=float(t_min),
            unroll=not interpret, smem_nodes=smem_nodes,
            top_rows=top_rows, quant=quant, leaf_cull=leaf_cull,
            approx_recip=approx_recip, fused=fused, quad=quad, oct=oct,
            prefetch=prefetch, scratch=scratch, pair_pf=pair_pf)
    occ, cnt = pl.pallas_call(
        kernel,
        grid=(n_packets,),
        in_specs=[ray_spec] * 7 + [node_spec] + extra + [blk_spec],
        out_specs=(ray_spec, ray_spec),
        out_shape=(jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32),
                   jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
    )(*args)
    return (occ.reshape(-1)[:n] != 0,
            (cnt[::rows_blk, 0].sum(), cnt[::rows_blk, 1].sum(),
             cnt[::rows_blk, 2].sum()))
