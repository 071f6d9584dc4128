"""MXU-leaf packet BVH traversal: Möller–Trumbore on the matrix unit.

The exact packet kernel (``ops/pallas_bvh``) tests leaf triangles one at
a time with scalar SMEM broadcasts — ~37 VPU ops + 12 scalar loads per
triangle, with the scalar unit on the critical path (measured: a single
traced scalar add per read costs ~12%, PERFORMANCE.md). This variant
moves the whole leaf phase onto the MXU by *linearizing* the MT test:
with the restructured determinant form (n = e1×e2, q = s×d,
intersections.h:54–83 semantics), every numerator is bilinear in the ray
and the triangle:

    a   = -(d·n)
    t·a =  s·n  = o'·n − v0'·n
    u·a =  q·e2 = (o'×d)·e2 + d·(v0'×e2)
    v·a = −q·e1 = −(o'×d)·e1 − d·(v0'×e1)

so ONE ray feature vector  F = [d, o', o'×d, 1]  (10 of 16 rows) against
a per-triangle 4-column block G gives all four numerators of all
``width`` triangles of a cluster in a single [16,4w]ᵀ×[16,1024] matmul —
no scalar loads in the hot loop at all. o' and v0' are recentered by the
mesh-bounds center (rounded to powers of two so the subtraction is
mostly exact) to bound the |o·n| vs |s·n| cancellation ratio.

Exactness contract (relaxed vs the bit-exact packet kernel, by design —
the reference's own acceptance gate is statistical, main.cpp:117–126):
the matmul runs as a 3-pass bf16 hi/lo split (~2⁻¹⁸ relative per
numerator; ``passes=6`` gives a 3-way split at ~f32), which is used ONLY
to pick the winning triangle id per ray. The returned t/u/v/normal are
recomputed *post-kernel in exact f32 from the original geometry* of that
id (one [T,20] row gather — the exact kernel pays the same gather), so
the committed hit always lies exactly on a real triangle: the
lossy-geometry TIR-trap failure mode (PERFORMANCE.md round 1) cannot
occur. Winner selection may differ from the exact path only where two
candidates are within matmul tolerance (shared edges, near-ties) —
gated by RMSE/SSIM tests against the exact path.

Per-ray results remain packet-composition-independent: each ray's
numerators depend only on its own F column and G, votes only enlarge the
visit set, so regen == plain bit-parity still holds on this path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pathtracer.models.scene import MeshData
from tpu_pathtracer.ops.pallas_bvh import (
    ROWS, PacketMesh, _advance, _ctz32, _node_bounds, _pad_rays, _slab,
    build_packet_mesh,
)

_FLT_MAX = 3.4028235e38


class PacketMX(NamedTuple):
    """Packet mesh + MXU leaf blocks. ``pm`` carries the node tables and
    the exact-path cluster blocks (still used by the shadow kernel and as
    the exactness anchor)."""
    pm: PacketMesh
    gblocks: jnp.ndarray   # [C, 16, 4w] f32 per-cluster test columns
    tri_geom: jnp.ndarray  # [T, 20] v0,e1,e2,n,tc0..5,mid,pad — exact
    # winner recompute + features (original, un-recentered coordinates)
    center: jnp.ndarray    # [3] f32 — recentering applied to G's
    # geometry; rays must be shifted by the same amount. Traced (the
    # view is built inside jit), so computed with jnp ops.


def _pow2_center(c: jnp.ndarray) -> jnp.ndarray:
    """Round center coordinates to the nearest power of two (or 0):
    subtracting a pow2 near the operand is exact far more often
    (Sterbenz-adjacent), so recentering injects almost no rounding."""
    a = jnp.abs(c)
    p = jnp.sign(c) * jnp.exp2(jnp.round(jnp.log2(jnp.maximum(a, 1e-30))))
    return jnp.where(a < 0.5, 0.0, p).astype(jnp.float32)


def build_packet_mx(mesh: MeshData, max_width: int = 128,
                    smem_budget_floats: int | None = None) -> PacketMX:
    """Build the MXU leaf blocks on top of ``build_packet_mesh``'s node
    tables / exact blocks. G column groups (width w each): A, T, U, V
    (V pre-negated so the kernel's v = V·f needs no sign flip)."""
    # the MX kernel reads the node table as f32 scalars — never quantized
    pm = build_packet_mesh(mesh, max_width=max_width,
                           smem_budget_floats=smem_budget_floats,
                           quant_nodes=False)
    w = pm.width
    C = pm.cl_first
    # recenter about the root bounds (row 1 of the implicit heap)
    ctr = jnp.asarray((mesh.bvh_min[1] + mesh.bvh_max[1]) * 0.5,
                      jnp.float32)
    cvec = _pow2_center(ctr)
    center = cvec

    sane = jnp.isfinite(mesh.v0).all(axis=1)  # sentinel slots -> zeros
    z3 = jnp.zeros_like(mesh.v0)
    v0 = jnp.where(sane[:, None], mesh.v0, z3)
    e1 = jnp.where(sane[:, None], mesh.v1 - mesh.v0, z3)
    e2 = jnp.where(sane[:, None], mesh.v2 - mesh.v0, z3)
    n = jnp.cross(e1, e2)
    v0p = v0 - cvec                     # recentered for the matmul only
    cu = jnp.cross(v0p, e2)             # d-coeffs of u·a
    cv = jnp.cross(v0p, e1)             # d-coeffs of (q·e1)
    T = v0.shape[0]
    z = jnp.zeros((T,), jnp.float32)

    def cols(d3, o3, c3, k):
        """One test-column group as a [16, T] row stack."""
        rows = [d3[:, 0], d3[:, 1], d3[:, 2],
                o3[:, 0], o3[:, 1], o3[:, 2],
                c3[:, 0], c3[:, 1], c3[:, 2], k] + [z] * 6
        return jnp.stack(rows, axis=0)

    z33 = jnp.zeros_like(v0)
    g_a = cols(-n, z33, z33, z)                       # a = -(d·n)
    g_t = cols(z33, n, z33, -(v0p * n).sum(axis=1))   # s·n
    g_u = cols(cu, z33, e2, z)                        # q·e2
    g_v = cols(-cv, z33, -e1, z)             # -(q·e1)
    # [16, T] each -> [16, C, w] -> concat groups along the minor axis
    def grp(g):
        return g.reshape(16, C, w)
    g = jnp.concatenate([grp(g_a), grp(g_t), grp(g_u), grp(g_v)], axis=2)
    gblocks = g.transpose(1, 0, 2)                    # [C, 16, 4w]

    # exact-recompute rows: ORIGINAL v0 (not recentered), edges, normal,
    # texcoords, material id; 20 cols (row gathers cost one element up
    # to ~320 B — PERFORMANCE.md fact 1)
    tri_geom = jnp.stack(
        [v0[:, 0], v0[:, 1], v0[:, 2],
         e1[:, 0], e1[:, 1], e1[:, 2],
         e2[:, 0], e2[:, 1], e2[:, 2],
         n[:, 0], n[:, 1], n[:, 2]]
        + [mesh.tex_coords[:, i] for i in range(6)]
        + [mesh.mesh_id.astype(jnp.float32), z], axis=1)
    return PacketMX(pm=pm, gblocks=gblocks, tri_geom=tri_geom,
                    center=center)


def _tile_to_row(tile):
    """(R,128) lane tile -> [1, R*128] row (ray r*128+l at lane r*128+l).
    Mosaic compiles this reshape natively (hardware-verified relayout);
    an explicit slice+concat is rejected (offset mismatch on non-concat
    dim)."""
    return tile.reshape(1, tile.shape[0] * tile.shape[1])


def _row_to_tile(row, rows):
    """[1, R*128] row -> (R,128) lane tile (inverse reshape)."""
    return row.reshape(rows, row.shape[1] // rows)


def _split3(x):
    """3-way bf16 split: hi+mid+lo reproduces f32 to ~2^-27."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


_DN0 = (((0,), (0,)), ((), ()))  # contract dim 0 of both: G^T @ F


def _mm_split(g, f_parts, passes):
    """f32-ish [4w, 1024] product of g [16,4w] with F [16,1024] from
    bf16 parts. 3 passes ~= 2^-18 relative; 6 passes ~= f32."""
    f_hi, f_mid, f_lo = f_parts

    def dot(a, b):
        return jax.lax.dot_general(a, b, _DN0,
                                   preferred_element_type=jnp.float32)

    if passes == 3:
        g_hi = g.astype(jnp.bfloat16)
        g_lo = (g - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return dot(g_hi, f_hi) + (dot(g_hi, f_mid) + dot(g_lo, f_hi))
    g_hi, g_mid, g_lo = _split3(g)
    out = dot(g_hi, f_hi)
    out = out + (dot(g_hi, f_mid) + dot(g_mid, f_hi))
    out = out + ((dot(g_hi, f_lo) + dot(g_lo, f_hi)) + dot(g_mid, f_mid))
    return out


def _kernel_nearest_mx(ox, oy, oz, dx, dy, dz, tmax, fmat, nodes, *rest,
                       cl_first, width, t_min, passes, smem_nodes,
                       top_rows):
    if top_rows:
        nodes_top, gblocks, tri_out, t_out, cnt_out = rest
    else:
        nodes_top = None
        gblocks, tri_out, t_out, cnt_out = rest

    def scoped(gblk, f_hi, f_mid, f_lo, sem, ntab=None):
        if smem_nodes:
            nd = pltpu.make_async_copy(nodes, ntab, sem)
            nd.start()
            nd.wait()
        elif top_rows:
            nd = pltpu.make_async_copy(nodes_top, ntab, sem)
            nd.start()
            nd.wait()
        o1, o2, o3 = ox[:, :], oy[:, :], oz[:, :]
        d1, d2, d3 = dx[:, :], dy[:, :], dz[:, :]
        i1, i2, i3 = 1.0 / d1, 1.0 / d2, 1.0 / d3
        n1, n2, n3 = i1 < 0.0, i2 < 0.0, i3 < 0.0
        shp = o1.shape

        # F (built outside: [16,1024] f32) -> bf16 parts, once per packet
        fm = fmat[0]
        hi, mid, lo = _split3(fm)
        f_hi[:, :] = hi
        f_mid[:, :] = mid
        f_lo[:, :] = lo

        closest_r0 = _tile_to_row(tmax[:, :])
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (width, ROWS * 128), 0)

        def node_fn(carry):
            idx, bs, nb, nsg, nl, cl_t, cl_r, best_r = carry
            l = idx * 2
            bl, br = _node_bounds(smem_nodes, top_rows, nodes, ntab, l)
            lhit = _slab(bl, o1, o2, o3, i1, i2, i3, n1, n2, n3, cl_t)
            rhit = _slab(br, o1, o2, o3, i1, i2, i3, n1, n2, n3, cl_t)
            new_idx, new_bs, both, single = _advance(idx, bs, lhit, rhit,
                                                     cl_t, l)
            nb = nb + both.astype(jnp.int32)
            nsg = nsg + single.astype(jnp.int32)
            return (new_idx, new_bs, nb, nsg, nl, cl_t, cl_r, best_r)

        def leaf_fn(carry):
            idx, bs, nb, nsg, nl, cl_t, cl_r, best_r = carry
            nl = nl + 1
            c = idx - cl_first
            dma = pltpu.make_async_copy(gblocks.at[c], gblk, sem)
            dma.start()
            dma.wait()
            out = _mm_split(gblk[:, :], (f_hi[:, :], f_mid[:, :],
                                         f_lo[:, :]), passes)
            a = out[0:width]
            tn = out[width:2 * width]
            un = out[2 * width:3 * width]
            vn = out[3 * width:4 * width]
            f = 1.0 / a
            t = tn * f
            u = un * f
            v = vn * f
            bad = ((jnp.abs(a) < 1e-7) | (jnp.minimum(u, v) < 0.0)
                   | (u + v > 1.0) | jnp.logical_not(t > t_min)
                   | jnp.logical_not(t < cl_r))
            key = jnp.where(bad, _FLT_MAX, t)
            t_leaf = jnp.min(key, axis=0, keepdims=True)
            i_leaf = jnp.min(jnp.where(key == t_leaf, rows_i, width),
                             axis=0, keepdims=True)
            won = t_leaf < cl_r
            cl_r = jnp.where(won, t_leaf, cl_r)
            best_r = jnp.where(won, c * width + i_leaf, best_r)
            cl_t = _row_to_tile(cl_r, ROWS)
            m = jnp.where(bs > 0, _ctz32(bs), 0)
            new_bs = (bs >> m.astype(jnp.uint32)) ^ jnp.uint32(1)
            new_idx = (idx >> m) ^ 1
            return (new_idx, new_bs, nb, nsg, nl, cl_t, cl_r, best_r)

        def body(carry):
            return jax.lax.cond(carry[0] >= cl_first, leaf_fn, node_fn,
                                carry)

        def cond(carry):
            return carry[0] > 0

        init = (jnp.int32(1), jnp.uint32(1), jnp.int32(0), jnp.int32(0),
                jnp.int32(0), tmax[:, :], closest_r0,
                jnp.full((1, ROWS * 128), -1, jnp.int32))
        _, _, nb, nsg, nl, cl_t, cl_r, best_r = jax.lax.while_loop(
            cond, body, init)
        tri_out[:, :] = _row_to_tile(best_r, ROWS)
        t_out[:, :] = cl_t
        ii = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
        cnt_out[:, :] = jnp.where(
            (ii == 0) & (jj == 0), nb,
            jnp.where((ii == 0) & (jj == 1), nsg,
                      jnp.where((ii == 0) & (jj == 2), nl, 0)))

    kw = dict(gblk=pltpu.VMEM(gblocks.shape[1:], jnp.float32),
              f_hi=pltpu.VMEM((16, ROWS * 128), jnp.bfloat16),
              f_mid=pltpu.VMEM((16, ROWS * 128), jnp.bfloat16),
              f_lo=pltpu.VMEM((16, ROWS * 128), jnp.bfloat16),
              sem=pltpu.SemaphoreType.DMA(()))
    if smem_nodes:
        kw["ntab"] = pltpu.SMEM(nodes.shape, nodes.dtype)
    elif top_rows:
        kw["ntab"] = pltpu.SMEM((top_rows * 8,), jnp.float32)
    pl.run_scoped(scoped, **kw)


def _kernel_shadow_mx(ox, oy, oz, dx, dy, dz, tmax, fmat, nodes, *rest,
                      cl_first, width, t_min, passes, smem_nodes,
                      top_rows):
    if top_rows:
        nodes_top, gblocks, occ_out, cnt_out = rest
    else:
        nodes_top = None
        gblocks, occ_out, cnt_out = rest

    def scoped(gblk, f_hi, f_mid, f_lo, sem, ntab=None):
        if smem_nodes:
            nd = pltpu.make_async_copy(nodes, ntab, sem)
            nd.start()
            nd.wait()
        elif top_rows:
            nd = pltpu.make_async_copy(nodes_top, ntab, sem)
            nd.start()
            nd.wait()
        o1, o2, o3 = ox[:, :], oy[:, :], oz[:, :]
        d1, d2, d3 = dx[:, :], dy[:, :], dz[:, :]
        i1, i2, i3 = 1.0 / d1, 1.0 / d2, 1.0 / d3
        n1, n2, n3 = i1 < 0.0, i2 < 0.0, i3 < 0.0
        shp = o1.shape

        fm = fmat[0]
        hi, mid, lo = _split3(fm)
        f_hi[:, :] = hi
        f_mid[:, :] = mid
        f_lo[:, :] = lo

        def node_fn(carry):
            idx, bs, nb, nsg, nl, cl_t, cl_r, occ_r, ndone = carry
            l = idx * 2
            bl, br = _node_bounds(smem_nodes, top_rows, nodes, ntab, l)
            lhit = _slab(bl, o1, o2, o3, i1, i2, i3, n1, n2, n3, cl_t)
            rhit = _slab(br, o1, o2, o3, i1, i2, i3, n1, n2, n3, cl_t)
            new_idx, new_bs, both, single = _advance(idx, bs, lhit, rhit,
                                                     cl_t, l)
            nb = nb + both.astype(jnp.int32)
            nsg = nsg + single.astype(jnp.int32)
            return (new_idx, new_bs, nb, nsg, nl, cl_t, cl_r, occ_r, ndone)

        def leaf_fn(carry):
            idx, bs, nb, nsg, nl, cl_t, cl_r, occ_r, ndone = carry
            nl = nl + 1
            c = idx - cl_first
            dma = pltpu.make_async_copy(gblocks.at[c], gblk, sem)
            dma.start()
            dma.wait()
            out = _mm_split(gblk[:, :], (f_hi[:, :], f_mid[:, :],
                                         f_lo[:, :]), passes)
            a = out[0:width]
            tn = out[width:2 * width]
            un = out[2 * width:3 * width]
            vn = out[3 * width:4 * width]
            f = 1.0 / a
            t = tn * f
            u = un * f
            v = vn * f
            bad = ((jnp.abs(a) < 1e-7) | (jnp.minimum(u, v) < 0.0)
                   | (u + v > 1.0) | jnp.logical_not(t > t_min)
                   | jnp.logical_not(t < cl_r))
            hit_any = jnp.any(jnp.logical_not(bad), axis=0, keepdims=True)
            occ_r = jnp.where(hit_any, jnp.int32(1), occ_r)
            # any-hit retirement (kernels.cu:207): stop voting
            cl_r = jnp.where(hit_any, jnp.float32(-1e30), cl_r)
            cl_t = _row_to_tile(cl_r, ROWS)
            ndone = jnp.all(cl_r < 0.0).astype(jnp.int32)
            m = jnp.where(bs > 0, _ctz32(bs), 0)
            new_bs = (bs >> m.astype(jnp.uint32)) ^ jnp.uint32(1)
            new_idx = (idx >> m) ^ 1
            return (new_idx, new_bs, nb, nsg, nl, cl_t, cl_r, occ_r, ndone)

        def body(carry):
            return jax.lax.cond(carry[0] >= cl_first, leaf_fn, node_fn,
                                carry)

        def cond(carry):
            return (carry[0] > 0) & (carry[8] == 0)

        init = (jnp.int32(1), jnp.uint32(1), jnp.int32(0), jnp.int32(0),
                jnp.int32(0), tmax[:, :], _tile_to_row(tmax[:, :]),
                jnp.zeros((1, ROWS * 128), jnp.int32), jnp.int32(0))
        _, _, nb, nsg, nl, _, _, occ_r, _ = jax.lax.while_loop(
            cond, body, init)
        occ_out[:, :] = _row_to_tile(occ_r, ROWS)
        ii = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
        cnt_out[:, :] = jnp.where(
            (ii == 0) & (jj == 0), nb,
            jnp.where((ii == 0) & (jj == 1), nsg,
                      jnp.where((ii == 0) & (jj == 2), nl, 0)))

    kw = dict(gblk=pltpu.VMEM(gblocks.shape[1:], jnp.float32),
              f_hi=pltpu.VMEM((16, ROWS * 128), jnp.bfloat16),
              f_mid=pltpu.VMEM((16, ROWS * 128), jnp.bfloat16),
              f_lo=pltpu.VMEM((16, ROWS * 128), jnp.bfloat16),
              sem=pltpu.SemaphoreType.DMA(()))
    if smem_nodes:
        kw["ntab"] = pltpu.SMEM(nodes.shape, nodes.dtype)
    elif top_rows:
        kw["ntab"] = pltpu.SMEM((top_rows * 8,), jnp.float32)
    pl.run_scoped(scoped, **kw)


def _fmat(origin, direction, center, n_pad):
    """Per-ray feature matrix [P, 16, 1024]: rows d, o', o'×d, 1 where
    o' = o - center (the pow2 recentering G was built with)."""
    if center is None:
        center = jnp.zeros((3,), jnp.float32)
    n = origin.x.shape[0]

    def pad(a, fill):
        if n_pad != n:
            a = jnp.concatenate([a, jnp.full((n_pad - n,), fill, a.dtype)])
        return a

    o1 = pad(origin.x - center[0], 0.0)
    o2 = pad(origin.y - center[1], 0.0)
    o3 = pad(origin.z - center[2], 0.0)
    d1 = pad(direction.x, 1.0)
    d2 = pad(direction.y, 0.0)
    d3 = pad(direction.z, 0.0)
    c1 = o2 * d3 - o3 * d2
    c2 = o3 * d1 - o1 * d3
    c3 = o1 * d2 - o2 * d1
    one = jnp.ones((n_pad,), jnp.float32)
    zero = jnp.zeros((n_pad,), jnp.float32)
    f = jnp.stack([d1, d2, d3, o1, o2, o3, c1, c2, c3, one]
                  + [zero] * 6, axis=0)                     # [16, n_pad]
    return f.reshape(16, -1, ROWS * 128).transpose(1, 0, 2)


def _exact_winner(origin, direction, tri, t_kernel, tri_geom, t_min):
    """Exact f32 recompute of (t, u, v, n, tu, tv, mid) for the winning
    triangle ids — op-for-op ops/intersect.triangles_hit's restructured
    MT on the ORIGINAL geometry, so the committed hit is bit-exact for
    its id regardless of matmul tolerance."""
    fr = tri_geom[jnp.maximum(tri, 0)]
    v0x, v0y, v0z = fr[:, 0], fr[:, 1], fr[:, 2]
    g1x, g1y, g1z = fr[:, 3], fr[:, 4], fr[:, 5]
    g2x, g2y, g2z = fr[:, 6], fr[:, 7], fr[:, 8]
    nx, ny, nz = fr[:, 9], fr[:, 10], fr[:, 11]
    d1, d2, d3 = direction.x, direction.y, direction.z
    a = -(d1 * nx + d2 * ny + d3 * nz)
    f = 1.0 / jnp.where(jnp.abs(a) < 1e-7, 1.0, a)
    sx = origin.x - v0x
    sy = origin.y - v0y
    sz = origin.z - v0z
    qx = sy * d3 - sz * d2
    qy = sz * d1 - sx * d3
    qz = sx * d2 - sy * d1
    u = f * (qx * g2x + qy * g2y + qz * g2z)
    v = -(f * (qx * g1x + qy * g1y + qz * g1z))
    t = f * (sx * nx + sy * ny + sz * nz)
    hit = tri >= 0
    # insurance: a degenerate winner (|a| crossing 1e-7 between the
    # split and exact arithmetic) falls back to the kernel's t
    ok = hit & jnp.isfinite(t)
    t = jnp.where(ok, t, t_kernel)
    u = jnp.where(ok, u, 0.0)
    v = jnp.where(ok, v, 0.0)
    mid = fr[:, 18].astype(jnp.int32)
    w0 = 1.0 - u - v
    tu = u * fr[:, 14] + v * fr[:, 16] + w0 * fr[:, 12]
    tv = u * fr[:, 15] + v * fr[:, 17] + w0 * fr[:, 13]
    return t, u, v, nx, ny, nz, tu, tv, mid


@functools.partial(jax.jit, static_argnames=("cl_first", "width", "t_min",
                                             "interpret", "passes",
                                             "smem_nodes", "top_rows"))
def packet_trace_mx(origin, direction, t_max, nodes, gblocks, tri_geom,
                    cl_first: int, width: int, t_min: float,
                    center=None, passes: int = 3,
                    interpret: bool = False, smem_nodes: bool = False,
                    top_rows: int = 0, nodes_top=None):
    """Nearest-hit MXU packet traversal. Same output signature as
    ``pallas_bvh.packet_trace``: ((t, tri, u, v, nx, ny, nz, tu, tv,
    mid), (nodes_both, nodes_single, leaf_visits))."""
    n = origin.x.shape[0]
    n_pad = ((n + ROWS * 128 - 1) // (ROWS * 128)) * (ROWS * 128)
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    fmat = _fmat(origin, direction, center, n_pad)
    args = [
        _pad_rays(origin.x, 0.0, n_pad), _pad_rays(origin.y, 0.0, n_pad),
        _pad_rays(origin.z, 0.0, n_pad),
        _pad_rays(direction.x, 1.0, n_pad),
        _pad_rays(direction.y, 0.0, n_pad),
        _pad_rays(direction.z, 0.0, n_pad),
        _pad_rays(t_max_b, 0.0, n_pad),  # pad lanes: closest=0 -> inert
        fmat, nodes,
    ] + ([nodes_top] if top_rows else []) + [gblocks]
    n_packets = n_pad // (ROWS * 128)
    ray_spec = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    fmat_spec = pl.BlockSpec((1, 16, ROWS * 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    if smem_nodes:
        node_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    else:
        node_spec = pl.BlockSpec(nodes.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    blk_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    extra = [pl.BlockSpec(memory_space=pltpu.HBM)] if top_rows else []
    tri, t_k, cnt = pl.pallas_call(
        functools.partial(_kernel_nearest_mx, cl_first=cl_first,
                          width=width, t_min=float(t_min), passes=passes,
                          smem_nodes=smem_nodes, top_rows=top_rows),
        grid=(n_packets,),
        in_specs=[ray_spec] * 7 + [fmat_spec, node_spec] + extra
        + [blk_spec],
        out_specs=(ray_spec, ray_spec, ray_spec),
        out_shape=(jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32),
                   jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
    )(*args)
    tri = tri.reshape(-1)[:n]
    t_k = t_k.reshape(-1)[:n]
    nodes_both = cnt[::ROWS, 0].sum()
    nodes_single = cnt[::ROWS, 1].sum()
    leaf_visits = cnt[::ROWS, 2].sum()
    t, u, v, nx, ny, nz, tu, tv, mid = _exact_winner(
        origin, direction, tri, t_k, tri_geom, t_min)
    return ((t, tri, u, v, nx, ny, nz, tu, tv, mid),
            (nodes_both, nodes_single, leaf_visits))


@functools.partial(jax.jit, static_argnames=("cl_first", "width", "t_min",
                                             "interpret", "passes",
                                             "smem_nodes", "top_rows"))
def packet_occluded_mx(origin, direction, t_max, nodes, gblocks,
                       cl_first: int, width: int, t_min: float,
                       center=None, passes: int = 3,
                       interpret: bool = False, smem_nodes: bool = False,
                       top_rows: int = 0, nodes_top=None):
    """Any-hit MXU packet traversal: ([N] bool occluded, telemetry)."""
    n = origin.x.shape[0]
    n_pad = ((n + ROWS * 128 - 1) // (ROWS * 128)) * (ROWS * 128)
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    fmat = _fmat(origin, direction, center, n_pad)
    args = [
        _pad_rays(origin.x, 0.0, n_pad), _pad_rays(origin.y, 0.0, n_pad),
        _pad_rays(origin.z, 0.0, n_pad),
        _pad_rays(direction.x, 1.0, n_pad),
        _pad_rays(direction.y, 0.0, n_pad),
        _pad_rays(direction.z, 0.0, n_pad),
        # pad lanes: closest<0 -> retired immediately, vote all-done
        _pad_rays(t_max_b, -1.0, n_pad),
        fmat, nodes,
    ] + ([nodes_top] if top_rows else []) + [gblocks]
    n_packets = n_pad // (ROWS * 128)
    ray_spec = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    fmat_spec = pl.BlockSpec((1, 16, ROWS * 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    if smem_nodes:
        node_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    else:
        node_spec = pl.BlockSpec(nodes.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    blk_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    extra = [pl.BlockSpec(memory_space=pltpu.HBM)] if top_rows else []
    occ, cnt = pl.pallas_call(
        functools.partial(_kernel_shadow_mx, cl_first=cl_first,
                          width=width, t_min=float(t_min), passes=passes,
                          smem_nodes=smem_nodes, top_rows=top_rows),
        grid=(n_packets,),
        in_specs=[ray_spec] * 7 + [fmat_spec, node_spec] + extra
        + [blk_spec],
        out_specs=(ray_spec, ray_spec),
        out_shape=(jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32),
                   jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
    )(*args)
    return (occ.reshape(-1)[:n] != 0,
            (cnt[::ROWS, 0].sum(), cnt[::ROWS, 1].sum(),
             cnt[::ROWS, 2].sum()))
