"""Pallas TPU kernel: fused brute-force ray×triangle nearest-hit.

For meshes that fit in VMEM (up to a few thousand triangles), testing
every triangle on the VPU beats pointer-chasing a BVH on TPU: the
traversal's per-step node gathers are HBM round trips with terrible
locality, while this kernel streams (TILE rays × T triangles) Möller–
Trumbore tests (intersections.h:54–83) entirely on-chip. The engine
dispatches: small mesh → this kernel; large mesh → the vectorized BVH
traversal (ops/bvh.py).

Sentinel padding triangles (+inf vertices, kernels.cu:202) fall out
naturally: NaN comparisons are false so they always miss.

Layout (round 4): rays ride (8,128) LANE tiles — 1024 per grid step —
and triangles are scalar-broadcast from a (12, T) SMEM table by an
unrolled loop (full unroll to UNROLL_MAX slots, rolled fori beyond),
the same shape as the packet kernels' leaf MT loop and the r4 sphere
kernel rewrite: the original (TILE, T) column-broadcast + cross-lane
argmin layout measured ~3x above its VPU op floor
(experiments/sphere_layout_probe.py). Winners (t, id, u, v) are
tracked by sequential strict-< selects — the same first-wins
tie-break as the chunked argmin; features still come from the exact
3-term bf16 one-hot MXU contraction, chunked so sel tiles stay ~1 MB.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FLT_MAX = 3.4028235e38
TILE = 256
T_CHUNK = 512
ROWS = 8               # lane-layout kernels: (8,128) ray tiles
UNROLL_MAX = 1024      # full triangle-loop unroll up to this many slots
SEL_CHUNK = 512        # one-hot feature-fetch chunk (sel tile ~1 MB)


def _sb_tri_step(tab, s, o1, o2, o3, d1, d2, d3, t_min, t_best):
    """One scalar-broadcast Möller–Trumbore test against the (8,128)
    lane tile — op-for-op the _mt_chunk sequence (restructured form
    with precomputed n; see ops/pallas_bvh._mt_scalar_tri)."""
    v0x = tab[0, s]
    v0y = tab[1, s]
    v0z = tab[2, s]
    g1x = tab[3, s]
    g1y = tab[4, s]
    g1z = tab[5, s]
    g2x = tab[6, s]
    g2y = tab[7, s]
    g2z = tab[8, s]
    n1 = tab[9, s]
    n2 = tab[10, s]
    n3 = tab[11, s]
    a = -(d1 * n1 + d2 * n2 + d3 * n3)
    parallel = jnp.abs(a) < 1e-7  # intersections.h:55
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
    bad = (parallel | (jnp.minimum(u, v) < 0.0) | (u + v > 1.0)
           | jnp.logical_not(t > t_min) | jnp.logical_not(t < t_best))
    return t, u, v, bad


def _kernel_sb(ox, oy, oz, dx, dy, dz, tmax, tris, *rest, t_min,
               t_pad, n_live, n_c, unroll, any_hit=False):
    """Lane-layout kernel: nearest hit + u/v (+ features when
    ``n_c`` > 0), or any-hit occlusion."""
    if any_hit:
        (occ_out,) = rest
    elif n_c:
        feat_t, t_out, i_out, u_out, v_out, f_out = rest
    else:
        t_out, i_out, u_out, v_out = rest

    def scoped(tab, sem):
        d = pltpu.make_async_copy(tris, tab, sem)
        d.start()
        d.wait()
        o1 = ox[:, :]
        o2 = oy[:, :]
        o3 = oz[:, :]
        d1 = dx[:, :]
        d2 = dy[:, :]
        d3 = dz[:, :]
        tmax_v = tmax[:, :]
        shp = o1.shape

        if any_hit:
            def step(s, st):
                occ, = st
                # any-hit: test against the ORIGINAL t_max, not a
                # shrinking bound (no nearest tracking needed)
                t, u, v, bad = _sb_tri_step(
                    tab, s, o1, o2, o3, d1, d2, d3, t_min, tmax_v)
                occ = jnp.where(bad, occ, jnp.int32(1))
                return (occ,)
            init = (jnp.zeros(shp, jnp.int32),)
        else:
            def step(s, st):
                t_best, i_best, u_best, v_best = st
                t, u, v, bad = _sb_tri_step(
                    tab, s, o1, o2, o3, d1, d2, d3, t_min, t_best)
                t_best = jnp.where(bad, t_best, t)
                i_best = jnp.where(bad, i_best, s)
                u_best = jnp.where(bad, u_best, u)
                v_best = jnp.where(bad, v_best, v)
                return (t_best, i_best, u_best, v_best)
            init = (tmax_v, jnp.full(shp, -1, jnp.int32),
                    jnp.zeros(shp, jnp.float32),
                    jnp.zeros(shp, jnp.float32))

        # loop only the LIVE slots: inf-sentinel padding triangles
        # can never win (NaN arithmetic -> bad), so testing them is
        # pure waste (the 396-tri staircase pads to 512 -> 23% dead)
        if unroll:
            st = init
            for s in range(n_live):
                st = step(s, st)
        else:
            st = jax.lax.fori_loop(0, n_live, step, init)

        if any_hit:
            occ_out[:, :] = st[0]
            return
        t_best, i_best, u_best, v_best = st
        if n_c:
            i_row = i_best.reshape(1, ROWS * 128)
            acc = jnp.zeros((n_c, ROWS * 128), jnp.float32)
            for k in range(t_pad // SEL_CHUNK if t_pad % SEL_CHUNK == 0
                           else t_pad // SEL_CHUNK + 1):
                base = k * SEL_CHUNK
                width = min(SEL_CHUNK, t_pad - base)
                fchunk = feat_t[:, base:base + width]
                hi = fchunk.astype(jnp.bfloat16)
                r1 = fchunk - hi.astype(jnp.float32)
                mid = r1.astype(jnp.bfloat16)
                lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
                # per-chunk iota at the exact width — SLICING a bigger
                # iota ((512,1024)[:128]) abort-crashes Mosaic
                rowk = jax.lax.broadcasted_iota(
                    jnp.int32, (width, ROWS * 128), 0)
                sel = (rowk + base == i_row).astype(jnp.bfloat16)
                acc = acc + jnp.dot(hi, sel,
                                    preferred_element_type=jnp.float32)
                acc = acc + jnp.dot(mid, sel,
                                    preferred_element_type=jnp.float32)
                acc = acc + jnp.dot(lo, sel,
                                    preferred_element_type=jnp.float32)
            f_out[:, :] = acc
        t_out[:, :] = jnp.where(i_best >= 0, t_best, _FLT_MAX)
        i_out[:, :] = i_best
        u_out[:, :] = jnp.where(i_best >= 0, u_best, 0.0)
        v_out[:, :] = jnp.where(i_best >= 0, v_best, 0.0)

    pl.run_scoped(scoped, tab=pltpu.SMEM((12, t_pad), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA(()))


def _sb_pack_tris(origin, direction, v0, e1, e2, nrm, t_max, n, t):
    """Shared packing for the lane-layout tri kernels: rays reshaped to
    (n_pad//128, 128) tiles, triangles as one (12, t_pad) table
    (inf-sentinel padding -> NaN arithmetic -> always-miss,
    kernels.cu:202)."""
    n_pad = ((n + ROWS * 128 - 1) // (ROWS * 128)) * (ROWS * 128)
    t_pad = ((t + 127) // 128) * 128
    shp2 = (n_pad // 128, 128)

    def pad_n(a, fill):
        if n_pad != n:
            a = jnp.concatenate(
                [a, jnp.full((n_pad - n,), fill, a.dtype)])
        return a.reshape(shp2)

    def pad_t(a):
        if t_pad != t:
            a = jnp.concatenate(
                [a, jnp.full((t_pad - t,), jnp.inf, a.dtype)])
        return a

    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    tris = jnp.stack([
        pad_t(v0.x), pad_t(v0.y), pad_t(v0.z),
        pad_t(e1.x), pad_t(e1.y), pad_t(e1.z),
        pad_t(e2.x), pad_t(e2.y), pad_t(e2.z),
        pad_t(nrm.x), pad_t(nrm.y), pad_t(nrm.z)])
    args = [
        pad_n(origin.x, 0.0), pad_n(origin.y, 0.0), pad_n(origin.z, 0.0),
        pad_n(direction.x, 1.0), pad_n(direction.y, 0.0),
        pad_n(direction.z, 0.0),
        pad_n(t_max_b, 0.0),
        tris,
    ]
    return args, n_pad, t_pad, shp2


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def tris_anyhit_soa(origin, direction, v0, e1, e2, nrm, t_min: float, t_max,
                    interpret: bool = False) -> jnp.ndarray:
    """[N] bool: any triangle hit in (t_min, t_max) — the shadow-ray
    fast path (no nearest/argmin/uv work). ``nrm``: precomputed face
    normals e1×e2 (V3 of [T])."""
    n = origin.x.shape[0]
    t = v0.x.shape[0]
    args, n_pad, t_pad, shp2 = _sb_pack_tris(origin, direction, v0, e1,
                                             e2, nrm, t_max, n, t)
    ray = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    occ = pl.pallas_call(
        functools.partial(_kernel_sb, t_min=float(t_min), t_pad=t_pad,
                          n_live=t, n_c=0, any_hit=True,
                          unroll=(not interpret
                                  and t_pad <= UNROLL_MAX)),
        grid=(n_pad // (ROWS * 128),),
        in_specs=[ray] * 7 + [hbm],
        out_specs=ray,
        out_shape=jax.ShapeDtypeStruct(shp2, jnp.int32),
        interpret=interpret,
    )(*args)
    return occ.reshape(-1)[:n] != 0


@functools.partial(jax.jit, static_argnames=("t_min", "interpret", "num_feats"))
def tris_hit_feat(origin, direction, v0, e1, e2, nrm, feat: jnp.ndarray,
                  t_min: float, t_max, interpret: bool = False,
                  num_feats: int = 26):
    """Nearest triangle hit + fused per-triangle feature fetch.

    nrm: precomputed face normals e1×e2 (V3 of [T]).
    feat [T, C] (edges, texcoords, material columns pre-joined).
    Returns (t, tri_idx, u, v, feats tuple of C dense [N] arrays).
    """
    n = origin.x.shape[0]
    t = v0.x.shape[0]
    c = feat.shape[1]
    args, n_pad, t_pad, shp2 = _sb_pack_tris(origin, direction, v0, e1,
                                             e2, nrm, t_max, n, t)
    feat_t = feat.T  # [C, T] feature-major
    if t_pad != t:
        feat_t = jnp.concatenate(
            [feat_t, jnp.zeros((c, t_pad - t), feat.dtype)], axis=1)
    args = args + [feat_t]
    ray = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    ftab = pl.BlockSpec((c, t_pad), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    fout = pl.BlockSpec((c, ROWS * 128), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel_sb, t_min=float(t_min), t_pad=t_pad,
                          n_live=t, n_c=c,
                          unroll=(not interpret
                                  and t_pad <= UNROLL_MAX)),
        grid=(n_pad // (ROWS * 128),),
        in_specs=[ray] * 7 + [hbm, ftab],
        out_specs=(ray, ray, ray, ray, fout),
        out_shape=(jax.ShapeDtypeStruct(shp2, jnp.float32),
                   jax.ShapeDtypeStruct(shp2, jnp.int32),
                   jax.ShapeDtypeStruct(shp2, jnp.float32),
                   jax.ShapeDtypeStruct(shp2, jnp.float32),
                   jax.ShapeDtypeStruct((c, n_pad), jnp.float32)),
        interpret=interpret,
    )(*args)
    fo = outs[4]
    return (outs[0].reshape(-1)[:n], outs[1].reshape(-1)[:n],
            outs[2].reshape(-1)[:n], outs[3].reshape(-1)[:n],
            tuple(fo[i, :n] for i in range(c)))


def tris_hit_soa(origin, direction, v0, e1, e2, nrm, t_min: float, t_max,
                 interpret: bool = False):
    """Component-SoA entry: origin/direction are V3 of [N]; v0/e1/e2/nrm
    are V3 of [T] (e1/e2 = precomputed edges, nrm = e1×e2)."""
    return _tris_hit_impl(origin.x, origin.y, origin.z,
                          direction.x, direction.y, direction.z,
                          v0.x, v0.y, v0.z, e1.x, e1.y, e1.z,
                          e2.x, e2.y, e2.z, nrm.x, nrm.y, nrm.z,
                          t_min, t_max, interpret)


def tris_hit_pallas(origin: jnp.ndarray, direction: jnp.ndarray,
                    v0: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray,
                    t_min: float, t_max, interpret: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[N,3]-interface convenience wrapper. Returns (t, tri_idx, u, v)."""
    e1 = v1 - v0
    e2 = v2 - v0
    nx = e1[:, 1] * e2[:, 2] - e1[:, 2] * e2[:, 1]
    ny = e1[:, 2] * e2[:, 0] - e1[:, 0] * e2[:, 2]
    nz = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    return _tris_hit_impl(
        origin[:, 0], origin[:, 1], origin[:, 2],
        direction[:, 0], direction[:, 1], direction[:, 2],
        v0[:, 0], v0[:, 1], v0[:, 2], e1[:, 0], e1[:, 1], e1[:, 2],
        e2[:, 0], e2[:, 1], e2[:, 2], nx, ny, nz, t_min, t_max, interpret)


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def _tris_hit_impl(ox, oy, oz, dx, dy, dz,
                   v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
                   nx, ny, nz,
                   t_min: float, t_max, interpret: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Nearest triangle hit for N rays. Returns (t, tri_idx, u, v)."""
    from tpu_pathtracer.ops.v3 import V3

    n = ox.shape[0]
    t = v0x.shape[0]
    args, n_pad, t_pad, shp2 = _sb_pack_tris(
        V3(ox, oy, oz), V3(dx, dy, dz), V3(v0x, v0y, v0z),
        V3(e1x, e1y, e1z), V3(e2x, e2y, e2z), V3(nx, ny, nz), t_max,
        n, t)
    ray = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    out, idx, uu, vv = pl.pallas_call(
        functools.partial(_kernel_sb, t_min=float(t_min), t_pad=t_pad,
                          n_live=t, n_c=0,
                          unroll=(not interpret
                                  and t_pad <= UNROLL_MAX)),
        grid=(n_pad // (ROWS * 128),),
        in_specs=[ray] * 7 + [hbm],
        out_specs=(ray,) * 4,
        out_shape=(jax.ShapeDtypeStruct(shp2, jnp.float32),
                   jax.ShapeDtypeStruct(shp2, jnp.int32),
                   jax.ShapeDtypeStruct(shp2, jnp.float32),
                   jax.ShapeDtypeStruct(shp2, jnp.float32)),
        interpret=interpret,
    )(*args)
    return (out.reshape(-1)[:n], idx.reshape(-1)[:n],
            uu.reshape(-1)[:n], vv.reshape(-1)[:n])
