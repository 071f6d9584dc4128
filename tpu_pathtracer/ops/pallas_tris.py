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


def _chunking(t: int):
    """Pad the triangle count to a lane multiple and pick the in-kernel
    chunk size: a single chunk up to 1024 (VMEM (TILE, t_pad) tiles stay
    ~1 MB), else 512-wide chunks — avoids padding 640-triangle scenes to
    1024 and doing 60% dead work."""
    t128 = ((t + 127) // 128) * 128
    if t128 <= 1024:
        return t128, t128
    t_pad = ((t + T_CHUNK - 1) // T_CHUNK) * T_CHUNK
    return t_pad, T_CHUNK


def _mt_chunk(o1, o2, o3, d1, d2, d3, refs, sl, t_min, tmax_v):
    """Restructured Möller–Trumbore over one (TILE, chunk) tile: one
    shared cross q = s×d plus the precomputed face normal n = e1×e2
    replace the two per-pair crosses (see ops/intersect.triangles_hit
    for the determinant identities — the op order here mirrors it
    bit-for-bit). Returns (t, u, v, bad)."""
    (ax, ay, az, e1x, e1y, e1z, e2x, e2y, e2z, nx, ny, nz) = refs
    v0x = ax[0, sl][None, :]
    v0y = ay[0, sl][None, :]
    v0z = az[0, sl][None, :]
    g1x = e1x[0, sl][None, :]
    g1y = e1y[0, sl][None, :]
    g1z = e1z[0, sl][None, :]
    g2x = e2x[0, sl][None, :]
    g2y = e2y[0, sl][None, :]
    g2z = e2z[0, sl][None, :]
    n1 = nx[0, sl][None, :]
    n2 = ny[0, sl][None, :]
    n3 = nz[0, sl][None, :]
    a = -(d1 * n1 + d2 * n2 + d3 * n3)
    parallel = jnp.abs(a) < 1e-7  # intersections.h:55
    f = 1.0 / jnp.where(parallel, 1.0, a)
    sx = o1 - v0x
    sy = o2 - v0y
    sz = o3 - v0z
    # q = cross(s, d)
    qx = sy * d3 - sz * d2
    qy = sz * d1 - sx * d3
    qz = sx * d2 - sy * d1
    u = f * (qx * g2x + qy * g2y + qz * g2z)
    v = -(f * (qx * g1x + qy * g1y + qz * g1z))
    t = f * (sx * n1 + sy * n2 + sz * n3)
    # min(u,v)<0 | u+v>1 == the full 4-test chain (see
    # ops/pallas_bvh._mt_scalar_tri for the identity) — same accept set
    bad = (parallel | (jnp.minimum(u, v) < 0.0) | (u + v > 1.0)
           | jnp.logical_not(t > t_min) | jnp.logical_not(t < tmax_v))
    return t, u, v, bad


def _kernel(ox, oy, oz, dx, dy, dz, tmax, *refs, t_min: float, t_pad: int,
            chunk: int):
    tri_refs = refs[:12]
    t_out, i_out, u_out, v_out = refs[12:]
    o1 = ox[0, :][:, None]
    o2 = oy[0, :][:, None]
    o3 = oz[0, :][:, None]
    d1 = dx[0, :][:, None]
    d2 = dy[0, :][:, None]
    d3 = dz[0, :][:, None]
    tmax_v = tmax[0, :][:, None]

    t_best = jnp.full((TILE, 1), _FLT_MAX, jnp.float32)
    i_best = jnp.full((TILE, 1), -1, jnp.int32)
    u_best = jnp.zeros((TILE, 1), jnp.float32)
    v_best = jnp.zeros((TILE, 1), jnp.float32)

    def chunk_body(k, carry):
        t_best, i_best, u_best, v_best = carry
        base = k * chunk
        t, u, v, bad = _mt_chunk(o1, o2, o3, d1, d2, d3, tri_refs,
                                 pl.ds(base, chunk), t_min, tmax_v)
        ts = jnp.where(bad, _FLT_MAX, t)
        tloc = jnp.min(ts, axis=1, keepdims=True)
        jloc = jnp.argmin(ts, axis=1).astype(jnp.int32)[:, None]
        better = tloc < t_best
        t_best = jnp.where(better, tloc, t_best)
        i_best = jnp.where(better, jloc + base, i_best)
        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, chunk), 1)
        sel = rows == jloc
        u_pick = jnp.sum(jnp.where(sel, u, 0.0), axis=1, keepdims=True)
        v_pick = jnp.sum(jnp.where(sel, v, 0.0), axis=1, keepdims=True)
        u_best = jnp.where(better, u_pick, u_best)
        v_best = jnp.where(better, v_pick, v_best)
        return t_best, i_best, u_best, v_best

    t_best, i_best, u_best, v_best = jax.lax.fori_loop(
        0, t_pad // chunk, chunk_body, (t_best, i_best, u_best, v_best))

    t_out[0, :] = t_best[:, 0]
    i_out[0, :] = i_best[:, 0]
    u_out[0, :] = u_best[:, 0]
    v_out[0, :] = v_best[:, 0]


def _kernel_feat(ox, oy, oz, dx, dy, dz, tmax, ax, ay, az, e1x, e1y, e1z,
                 e2x, e2y, e2z, nx, ny, nz, feat_t, t_out, i_out, u_out,
                 v_out, feat_out, *, t_min: float, t_pad: int,
                 num_feats: int, chunk: int):
    """Hit test + per-lane feature fetch (transposed one-hot MXU
    contraction into a single feature-major output — see
    pallas_spheres._kernel_feat)."""
    tri_refs = (ax, ay, az, e1x, e1y, e1z, e2x, e2y, e2z, nx, ny, nz)
    o1 = ox[0, :][:, None]
    o2 = oy[0, :][:, None]
    o3 = oz[0, :][:, None]
    d1 = dx[0, :][:, None]
    d2 = dy[0, :][:, None]
    d3 = dz[0, :][:, None]
    tmax_v = tmax[0, :][:, None]

    t_best = jnp.full((TILE, 1), _FLT_MAX, jnp.float32)
    i_best = jnp.full((TILE, 1), -1, jnp.int32)
    u_best = jnp.zeros((TILE, 1), jnp.float32)
    v_best = jnp.zeros((TILE, 1), jnp.float32)

    def chunk_body(k, carry):
        t_best, i_best, u_best, v_best = carry
        base = k * chunk
        t, u, v, bad = _mt_chunk(o1, o2, o3, d1, d2, d3, tri_refs,
                                 pl.ds(base, chunk), t_min, tmax_v)
        ts = jnp.where(bad, _FLT_MAX, t)
        tloc = jnp.min(ts, axis=1, keepdims=True)
        jloc = jnp.argmin(ts, axis=1).astype(jnp.int32)[:, None]
        better = tloc < t_best
        t_best = jnp.where(better, tloc, t_best)
        i_best = jnp.where(better, jloc + base, i_best)
        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, chunk), 1)
        sel = rows == jloc
        u_pick = jnp.sum(jnp.where(sel, u, 0.0), axis=1, keepdims=True)
        v_pick = jnp.sum(jnp.where(sel, v, 0.0), axis=1, keepdims=True)
        u_best = jnp.where(better, u_pick, u_best)
        v_best = jnp.where(better, v_pick, v_best)
        return t_best, i_best, u_best, v_best

    t_best, i_best, u_best, v_best = jax.lax.fori_loop(
        0, t_pad // chunk, chunk_body, (t_best, i_best, u_best, v_best))

    # feature fetch: feat_tᵀ-chunk @ one-hotᵀ on the MXU, bit-exactly via a
    # 3-term bf16 decomposition (see pallas_spheres._kernel_feat). The
    # chunk is sliced from the ref with pl.ds (Mosaic has no value-level
    # dynamic_slice) and decomposed per chunk.
    row0 = jax.lax.broadcasted_iota(jnp.int32, (chunk, TILE), 0)
    i_row = i_best[:, 0][None, :]

    def feat_body(k, acc_t):
        base = k * chunk
        fchunk = feat_t[:, pl.ds(base, chunk)]
        hi = fchunk.astype(jnp.bfloat16)
        r1 = fchunk - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        sel_t = (row0 + base == i_row).astype(jnp.bfloat16)
        acc_t = acc_t + jnp.dot(hi, sel_t, preferred_element_type=jnp.float32)
        acc_t = acc_t + jnp.dot(mid, sel_t, preferred_element_type=jnp.float32)
        acc_t = acc_t + jnp.dot(lo, sel_t, preferred_element_type=jnp.float32)
        return acc_t

    acc_t = jax.lax.fori_loop(0, t_pad // chunk, feat_body,
                              jnp.zeros((num_feats, TILE), jnp.float32))

    t_out[0, :] = t_best[:, 0]
    i_out[0, :] = i_best[:, 0]
    u_out[0, :] = u_best[:, 0]
    v_out[0, :] = v_best[:, 0]
    feat_out[:, :] = acc_t


def _kernel_any(ox, oy, oz, dx, dy, dz, tmax, ax, ay, az, e1x, e1y, e1z,
                e2x, e2y, e2z, nx, ny, nz, occ_out, *, t_min: float,
                t_pad: int, chunk: int):
    """Shadow any-hit: the ~same MT test but NO argmin/u/v/feature
    selection — occlusion only needs "did anything hit before t_max"
    (the early-out semantics of kernels.cu:207)."""
    tri_refs = (ax, ay, az, e1x, e1y, e1z, e2x, e2y, e2z, nx, ny, nz)
    o1 = ox[0, :][:, None]
    o2 = oy[0, :][:, None]
    o3 = oz[0, :][:, None]
    d1 = dx[0, :][:, None]
    d2 = dy[0, :][:, None]
    d3 = dz[0, :][:, None]
    tmax_v = tmax[0, :][:, None]

    def chunk_body(k, occ):
        base = k * chunk
        _, _, _, bad = _mt_chunk(o1, o2, o3, d1, d2, d3, tri_refs,
                                 pl.ds(base, chunk), t_min, tmax_v)
        hit = jnp.any(jnp.logical_not(bad), axis=1, keepdims=True)
        return occ | hit.astype(jnp.int32)

    occ = jax.lax.fori_loop(0, t_pad // chunk, chunk_body,
                            jnp.zeros((TILE, 1), jnp.int32))
    occ_out[0, :] = occ[:, 0]


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def tris_anyhit_soa(origin, direction, v0, e1, e2, nrm, t_min: float, t_max,
                    interpret: bool = False) -> jnp.ndarray:
    """[N] bool: any triangle hit in (t_min, t_max) — the shadow-ray
    fast path (no nearest/argmin/uv work). ``nrm``: precomputed face
    normals e1×e2 (V3 of [T])."""
    n = origin.x.shape[0]
    t = v0.x.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    t_pad, chunk = _chunking(t)

    def pad_n(a, fill):
        if n_pad != n:
            a = jnp.concatenate([a, jnp.full((n_pad - n,), fill, a.dtype)])
        return a.reshape(1, n_pad)

    def pad_t(a):
        if t_pad != t:
            a = jnp.concatenate([a, jnp.full((t_pad - t,), jnp.inf, a.dtype)])
        return a.reshape(1, t_pad)

    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    args = [
        pad_n(origin.x, 0.0), pad_n(origin.y, 0.0), pad_n(origin.z, 0.0),
        pad_n(direction.x, 1.0), pad_n(direction.y, 0.0),
        pad_n(direction.z, 0.0),
        pad_n(t_max_b, 0.0),
        pad_t(v0.x), pad_t(v0.y), pad_t(v0.z),
        pad_t(e1.x), pad_t(e1.y), pad_t(e1.z),
        pad_t(e2.x), pad_t(e2.y), pad_t(e2.z),
        pad_t(nrm.x), pad_t(nrm.y), pad_t(nrm.z),
    ]
    grid = (n_pad // TILE,)
    ray_spec = pl.BlockSpec((1, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, t_pad), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        functools.partial(_kernel_any, t_min=float(t_min), t_pad=t_pad,
                          chunk=chunk),
        grid=grid,
        in_specs=[ray_spec] * 7 + [tri_spec] * 12,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        interpret=interpret,
    )(*args)
    return occ[0, :n] != 0


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
    n_pad = ((n + TILE - 1) // TILE) * TILE
    t_pad, chunk = _chunking(t)

    def pad_n(a, fill):
        if n_pad != n:
            a = jnp.concatenate([a, jnp.full((n_pad - n,), fill, a.dtype)])
        return a.reshape(1, n_pad)

    def pad_t(a):
        if t_pad != t:
            a = jnp.concatenate([a, jnp.full((t_pad - t,), jnp.inf, a.dtype)])
        return a.reshape(1, t_pad)

    c = feat.shape[1]
    feat_t = feat.T  # [C, T] feature-major
    if t_pad != t:
        feat_t = jnp.concatenate(
            [feat_t, jnp.zeros((c, t_pad - t), feat.dtype)], axis=1)
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    args = [
        pad_n(origin.x, 0.0), pad_n(origin.y, 0.0), pad_n(origin.z, 0.0),
        pad_n(direction.x, 1.0), pad_n(direction.y, 0.0),
        pad_n(direction.z, 0.0),
        pad_n(t_max_b, 0.0),
        pad_t(v0.x), pad_t(v0.y), pad_t(v0.z),
        pad_t(e1.x), pad_t(e1.y), pad_t(e1.z),
        pad_t(e2.x), pad_t(e2.y), pad_t(e2.z),
        pad_t(nrm.x), pad_t(nrm.y), pad_t(nrm.z),
        feat_t,
    ]
    grid = (n_pad // TILE,)
    ray_spec = pl.BlockSpec((1, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, t_pad), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    feat_spec = pl.BlockSpec((c, t_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    fout_spec = pl.BlockSpec((c, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel_feat, t_min=float(t_min), t_pad=t_pad,
                          num_feats=c, chunk=chunk),
        grid=grid,
        in_specs=[ray_spec] * 7 + [tri_spec] * 12 + [feat_spec],
        out_specs=(ray_spec, ray_spec, ray_spec, ray_spec, fout_spec),
        out_shape=(jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((c, n_pad), jnp.float32)),
        interpret=interpret,
    )(*args)
    fo = outs[4]
    return (outs[0][0, :n], outs[1][0, :n], outs[2][0, :n], outs[3][0, :n],
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
    n = ox.shape[0]
    t = v0x.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    t_pad, chunk = _chunking(t)

    def pad_n(a, fill):
        if n_pad != n:
            a = jnp.concatenate([a, jnp.full((n_pad - n,), fill, a.dtype)])
        return a.reshape(1, n_pad)

    def pad_t(a):
        if t_pad != t:
            # inf sentinel → NaN edges → always-miss (kernels.cu:202)
            a = jnp.concatenate([a, jnp.full((t_pad - t,), jnp.inf, a.dtype)])
        return a.reshape(1, t_pad)

    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    args = [
        pad_n(ox, 0.0), pad_n(oy, 0.0), pad_n(oz, 0.0),
        pad_n(dx, 1.0), pad_n(dy, 0.0), pad_n(dz, 0.0),
        pad_n(t_max_b, 0.0),
        pad_t(v0x), pad_t(v0y), pad_t(v0z),
        pad_t(e1x), pad_t(e1y), pad_t(e1z),
        pad_t(e2x), pad_t(e2y), pad_t(e2z),
        pad_t(nx), pad_t(ny), pad_t(nz),
    ]

    grid = (n_pad // TILE,)
    ray_spec = pl.BlockSpec((1, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, t_pad), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out, idx, uu, vv = pl.pallas_call(
        functools.partial(_kernel, t_min=float(t_min), t_pad=t_pad,
                          chunk=chunk),
        grid=grid,
        in_specs=[ray_spec] * 7 + [tri_spec] * 12,
        out_specs=(ray_spec,) * 4,
        out_shape=(jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.float32)),
        interpret=interpret,
    )(*args)
    return out[0, :n], idx[0, :n], uu[0, :n], vv[0, :n]
