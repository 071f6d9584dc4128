"""Pallas TPU kernel: fused brute-force ray×sphere nearest-hit.

The jnp formulation materializes [N, S] intermediates in HBM (the matmul
outputs + quadratic temporaries), making sphere intersection HBM-bandwidth
bound at ~12 bytes per ray-sphere pair. This kernel keeps the whole sphere
set and all per-pair temporaries VMEM-resident: HBM traffic drops to the
ray SoA in (24 B/ray) and (t, idx) out (8 B/ray) regardless of S, and the
per-pair math runs the *direct* ``oc = o - c`` form (intersections.h:85–
104) at full f32 precision — no matmul-expansion cancellation, so no
refinement pass is needed.

Layout (round 4): rays ride (8,128) LANE tiles — 1024 rays per grid
step — and spheres are scalar-broadcast from an SMEM table by a fully
unrolled loop, exactly like the packet kernels' leaf MT loop. The
original layout (rays along sublanes as (TILE,1) columns, spheres
along lanes, winner via cross-lane min+argmin per 512-chunk) measured
~3x above its VPU op floor: column broadcasts, lane reductions, and
the (C,TILE) accumulator relayouts eat the difference
(experiments/sphere_layout_probe.py: 254 -> 82 us per 16k-ray
iteration, t/idx/features bit-identical — the sequential strict-<
winner update implements the same first-wins tie-break as the chunked
argmin). The winner's features still come from the in-kernel 3-term
bf16 one-hot MXU contraction (exact); sel is (S, 1024) per packet.
The old layout survives only under ``mx=True`` (the measured-negative
MXU b/c decision record, PERFORMANCE.md r3).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_FLT_MAX = 3.4028235e38  # python float: pallas kernels must not capture traced consts
TILE = 256
S_CHUNK = 512
ROWS = 8               # lane-layout kernels: (8,128) ray tiles
UNROLL_MAX = 1024      # full sphere-loop unroll up to this many slots


def _sb_sphere_step(tab, s, o1, o2, o3, d1, d2, d3, t_min, t_best,
                    i_best):
    """One scalar-broadcast sphere test against the (8,128) lane tile
    — arithmetic op-for-op the _sphere_chunk_ts sequence (oc form,
    sphere.h:10-23), winner by sequential strict-< (same first-wins
    tie-break as the chunked argmin it replaces)."""
    ccx = tab[0, s]
    ccy = tab[1, s]
    ccz = tab[2, s]
    rr2 = tab[3, s]
    ocx = o1 - ccx
    ocy = o2 - ccy
    ocz = o3 - ccz
    b = ocx * d1 + ocy * d2 + ocz * d3
    c = ocx * ocx + ocy * ocy + ocz * ocz - rr2
    disc = b * b - c
    ok = disc > 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = -b - sq
    t2 = -b + sq
    ts0 = jnp.where(t1 > t_min, t1, t2)
    win = ok & (ts0 > t_min) & (ts0 < t_best)
    return (jnp.where(win, ts0, t_best),
            jnp.where(win, s, i_best) if i_best is not None else None,
            win)


def _kernel_sb(ox, oy, oz, dx, dy, dz, tmax, sph, *rest, t_min,
               s_pad, n_live, n_c, unroll, any_hit=False):
    """Lane-layout kernel: nearest hit (+ optional one-hot feature
    fetch when ``n_c`` > 0) or any-hit (``any_hit``)."""
    if any_hit:
        (occ_out,) = rest
    elif n_c:
        feat_t, t_out, idx_out, f_out = rest
    else:
        t_out, idx_out = rest

    def scoped(tab, sem):
        d = pltpu.make_async_copy(sph, tab, sem)
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
        t_best = tmax_v
        i_best = None if any_hit else jnp.full(shp, -1, jnp.int32)
        occ = jnp.zeros(shp, jnp.int32) if any_hit else None
        # loop only the LIVE slots: padding spheres (r2 = -1) can
        # never win, so testing them is pure waste (486 real spheres
        # padded to 512 cost ~5% of the headline kernel)
        if unroll:
            for s in range(n_live):
                t_best, i_best, win = _sb_sphere_step(
                    tab, s, o1, o2, o3, d1, d2, d3, t_min, t_best,
                    i_best)
                if any_hit:
                    occ = jnp.where(win, jnp.int32(1), occ)
        else:
            def body(s, st):
                t_b, i_b, oc_ = st
                t_b, i_b, win = _sb_sphere_step(
                    tab, s, o1, o2, o3, d1, d2, d3, t_min, t_b, i_b)
                if any_hit:
                    oc_ = jnp.where(win, jnp.int32(1), oc_)
                return (t_b, i_b, oc_)
            t_best, i_best, occ = jax.lax.fori_loop(
                0, n_live, body, (t_best, i_best, occ))
        if any_hit:
            occ_out[:, :] = occ
            return
        if n_c:
            # winner features: exact 3-term bf16 one-hot contraction
            # (see _kernel_feat's rationale — per-lane HBM gathers are
            # ~10 ns/lane; this is ~0.1 ms for all columns at once)
            hi = feat_t[:, :].astype(jnp.bfloat16)
            r1_ = feat_t[:, :] - hi.astype(jnp.float32)
            mid = r1_.astype(jnp.bfloat16)
            lo = (r1_ - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            row0 = jax.lax.broadcasted_iota(
                jnp.int32, (s_pad, ROWS * 128), 0)
            i_row = i_best.reshape(1, ROWS * 128)
            sel = (row0 == i_row).astype(jnp.bfloat16)
            acc = jnp.dot(hi, sel, preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(mid, sel,
                                preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(lo, sel,
                                preferred_element_type=jnp.float32)
            f_out[:, :] = acc
        t_out[:, :] = jnp.where(i_best >= 0, t_best, _FLT_MAX)
        idx_out[:, :] = i_best

    pl.run_scoped(scoped, tab=pltpu.SMEM((4, s_pad), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA(()))


def _sphere_chunk_ts(o1, o2, o3, d1, d2, d3, t_min, tmax_v,
                     ccx, ccy, ccz, rr2):
    """Quadratic + near-preferring valid-min for one sphere chunk
    against the lane tile: per-(lane, sphere) candidate t, _FLT_MAX when
    invalid (sphere.h:10-23 semantics).

    Padding spheres carry r2 = -1, so c = |oc|^2 + 1 > b^2 and disc < 0
    by Cauchy-Schwarz (unit d) — no explicit validity test needed.
    t1 <= t2 always, so the near-preferring valid-min collapses to one
    select + one validity chain (bit-identical to min(where, where):
    t1 invalid-low -> t2, invalid-high -> both invalid)."""
    ocx = o1 - ccx
    ocy = o2 - ccy
    ocz = o3 - ccz
    b = ocx * d1 + ocy * d2 + ocz * d3
    c = ocx * ocx + ocy * ocy + ocz * ocz - rr2
    disc = b * b - c
    ok = disc > 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = -b - sq
    t2 = -b + sq
    ts0 = jnp.where(t1 > t_min, t1, t2)
    valid = ok & (ts0 > t_min) & (ts0 < tmax_v)
    return jnp.where(valid, ts0, _FLT_MAX)


def _kernel(ox, oy, oz, dx, dy, dz, tmax, cx, cy, cz, r2, t_out, idx_out,
            *, t_min: float, s_pad: int):
    o1 = ox[0, :][:, None]
    o2 = oy[0, :][:, None]
    o3 = oz[0, :][:, None]
    d1 = dx[0, :][:, None]
    d2 = dy[0, :][:, None]
    d3 = dz[0, :][:, None]
    tmax_v = tmax[0, :][:, None]

    t_best = jnp.full((TILE, 1), _FLT_MAX, jnp.float32)
    i_best = jnp.full((TILE, 1), -1, jnp.int32)

    num_chunks = s_pad // S_CHUNK
    for k in range(num_chunks):
        sl = slice(k * S_CHUNK, (k + 1) * S_CHUNK)
        ccx = cx[0, sl][None, :]
        ccy = cy[0, sl][None, :]
        ccz = cz[0, sl][None, :]
        rr2 = r2[0, sl][None, :]
        ts = _sphere_chunk_ts(o1, o2, o3, d1, d2, d3, t_min, tmax_v,
                              ccx, ccy, ccz, rr2)
        tloc = jnp.min(ts, axis=1, keepdims=True)
        jloc = jnp.argmin(ts, axis=1).astype(jnp.int32)[:, None]
        better = tloc < t_best
        t_best = jnp.where(better, tloc, t_best)
        i_best = jnp.where(better, jloc + k * S_CHUNK, i_best)

    t_out[0, :] = t_best[:, 0]
    idx_out[0, :] = i_best[:, 0]


def _bc_mxu(o1, o2, o3, d1, d2, d3, cx, cy, cz, r2, s_pad,
            exact_dot=False):
    """Quadratic b/c terms for ALL spheres via the MXU (opt-in
    ``fast_math``): b = o·d − c·d and |oc|² = |o|² − 2 o·c + |c|², where
    the two ray×center contractions ride one matmul with a 2-term bf16
    split per operand (3 passes — hi·hi + hi·lo + lo·hi; error ~|o||c|·
    2⁻¹⁸ from the dropped lo·lo term and split rounding). Replaces ~10
    of the ~23 per-pair VPU ops of the exact ``oc`` form. NOT bit-exact:
    the expanded |oc|² cancels catastrophically for bounce origins near
    a sphere, so grazing/self-epsilon accepts can flip — this path is
    gated by SSIM tests and is never the default.

    ``exact_dot`` (used in interpret mode): plain f32 matmuls instead of
    the bf16 split — XLA *CPU* accumulates bf16 dots at bf16 precision
    (measured 2⁻⁹ relative — useless), unlike the MXU's exact f32
    accumulation of bf16 products, so CI exercises the b/c formulation
    at f32 matmul precision and the split is validated on hardware.

    Returns (b, c) as (TILE, s_pad) f32 tiles.
    """
    od = d1 * o1 + d2 * o2 + d3 * o3
    oo = o1 * o1 + o2 * o2 + o3 * o3
    z = jnp.zeros_like(d1)
    lhs = jnp.concatenate(
        [jnp.concatenate([d1, d2, d3, z], axis=1),
         jnp.concatenate([o1, o2, o3, z], axis=1)], axis=0)  # (2T, 4)
    rhs = jnp.concatenate(
        [cx[0:1, :], cy[0:1, :], cz[0:1, :], jnp.zeros((1, s_pad),
                                                       jnp.float32)],
        axis=0)  # (4, s_pad)
    if exact_dot:
        # CPU-only path: default-precision f32 dots run at bf16 here
        # (measured 2^-9 rel); HIGHEST is true f32. Never reaches
        # Mosaic, so the 8-min HIGHEST compile hazard doesn't apply.
        m = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32,
                    precision="highest")
    else:
        lh = lhs.astype(jnp.bfloat16)
        ll = (lhs - lh.astype(jnp.float32)).astype(jnp.bfloat16)
        rh = rhs.astype(jnp.bfloat16)
        rl = (rhs - rh.astype(jnp.float32)).astype(jnp.bfloat16)
        m = jnp.dot(lh, rh, preferred_element_type=jnp.float32)
        m = m + jnp.dot(lh, rl, preferred_element_type=jnp.float32)
        m = m + jnp.dot(ll, rh, preferred_element_type=jnp.float32)
    cd = m[:TILE, :]
    oc = m[TILE:, :]
    ccq = (cx[0, :] * cx[0, :] + cy[0, :] * cy[0, :]
           + cz[0, :] * cz[0, :] - r2[0, :])[None, :]
    b = od - cd
    c = oo - 2.0 * oc + ccq
    return b, c


def _mx_chunk_ts(b, c, t_min, tmax_v):
    """disc/roots/validity chain shared with ``_sphere_chunk_ts`` but
    from precomputed (b, c) tiles."""
    disc = b * b - c
    ok = disc > 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = -b - sq
    t2 = -b + sq
    ts0 = jnp.where(t1 > t_min, t1, t2)
    valid = ok & (ts0 > t_min) & (ts0 < tmax_v)
    return jnp.where(valid, ts0, _FLT_MAX)


def _kernel_feat(ox, oy, oz, dx, dy, dz, tmax, cx, cy, cz, r2, feat_t,
                 t_out, idx_out, feat_out, *, t_min: float, s_pad: int,
                 num_feats: int, mx: bool = False, mx_exact: bool = False):
    """Hit test + per-lane feature fetch.

    After the nearest-hit pass, a second pass re-walks the sphere chunks
    building a one-hot selector for each lane's winning sphere and
    contracts it against the (transposed) feature table **on the MXU** —
    replacing per-lane HBM gathers (measured ~1.3 ms per gathered column
    on TPU) with ~0.1 ms of matmul for all columns together. The result is
    produced feature-major ``(C, TILE)`` into a single ``[C, N]`` output —
    per-column ``(1, TILE)`` outputs were measured to cost ~3 ms/call in
    Mosaic output handling.
    """
    o1 = ox[0, :][:, None]
    o2 = oy[0, :][:, None]
    o3 = oz[0, :][:, None]
    d1 = dx[0, :][:, None]
    d2 = dy[0, :][:, None]
    d3 = dz[0, :][:, None]
    tmax_v = tmax[0, :][:, None]

    t_best = jnp.full((TILE, 1), _FLT_MAX, jnp.float32)
    i_best = jnp.full((TILE, 1), -1, jnp.int32)

    if mx:
        b_all, c_all = _bc_mxu(o1, o2, o3, d1, d2, d3, cx, cy, cz, r2,
                               s_pad, exact_dot=mx_exact)
    num_chunks = s_pad // S_CHUNK
    for k in range(num_chunks):
        sl = slice(k * S_CHUNK, (k + 1) * S_CHUNK)
        if mx:
            ts = _mx_chunk_ts(b_all[:, sl], c_all[:, sl], t_min, tmax_v)
        else:
            ccx = cx[0, sl][None, :]
            ccy = cy[0, sl][None, :]
            ccz = cz[0, sl][None, :]
            rr2 = r2[0, sl][None, :]
            ts = _sphere_chunk_ts(o1, o2, o3, d1, d2, d3, t_min, tmax_v,
                                  ccx, ccy, ccz, rr2)
        tloc = jnp.min(ts, axis=1, keepdims=True)
        jloc = jnp.argmin(ts, axis=1).astype(jnp.int32)[:, None]
        better = tloc < t_best
        t_best = jnp.where(better, tloc, t_best)
        i_best = jnp.where(better, jloc + k * S_CHUNK, i_best)

    # ---- feature fetch: feat_tᵀ-chunk @ one-hotᵀ on the MXU, bit-exactly.
    # The f32 table is decomposed into three bf16 terms (hi+mid+lo covers
    # all 24 mantissa bits; each residual is exactly representable), and
    # the one-hot selector is exact in bf16 — so three DEFAULT-precision
    # MXU passes reconstruct the f32 features exactly, at half the cost of
    # Mosaic's HIGHEST f32 emulation. (A lossy 2-term variant was measured
    # no faster per iteration and its ~1e-5 feature error doubled total
    # iterations via long-tail TIR-trap pixels — exactness matters.)
    hi = feat_t[:, :].astype(jnp.bfloat16)
    r1 = feat_t[:, :] - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    acc_t = jnp.zeros((num_feats, TILE), jnp.float32)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (S_CHUNK, TILE), 0)
    i_row = i_best[:, 0][None, :]
    for k in range(num_chunks):
        sl2 = slice(k * S_CHUNK, (k + 1) * S_CHUNK)
        sel_t = (row0 + k * S_CHUNK == i_row).astype(jnp.bfloat16)
        acc_t = acc_t + jnp.dot(hi[:, sl2], sel_t,
                                preferred_element_type=jnp.float32)
        acc_t = acc_t + jnp.dot(mid[:, sl2], sel_t,
                                preferred_element_type=jnp.float32)
        acc_t = acc_t + jnp.dot(lo[:, sl2], sel_t,
                                preferred_element_type=jnp.float32)

    t_out[0, :] = t_best[:, 0]
    idx_out[0, :] = i_best[:, 0]
    feat_out[:, :] = acc_t


def _sb_pack(origin, direction, centers, radii, t_max, n, s):
    """Shared arg packing for the lane-layout kernels: rays reshaped to
    (n_pad//128, 128) tiles, spheres as one (4, s_pad) SMEM table
    (cx, cy, cz, r²·sign — padding slots carry r² = −1 so disc < 0 by
    Cauchy–Schwarz and can never win)."""
    n_pad = ((n + ROWS * 128 - 1) // (ROWS * 128)) * (ROWS * 128)
    s_pad = ((s + 127) // 128) * 128
    shp2 = (n_pad // 128, 128)

    def pad_n(a, fill):
        if n_pad != n:
            a = jnp.concatenate(
                [a, jnp.full((n_pad - n,), fill, a.dtype)])
        return a.reshape(shp2)

    def pad_s(a, fill):
        if s_pad != s:
            a = jnp.concatenate(
                [a, jnp.full((s_pad - s,), fill, a.dtype)])
        return a

    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    sph = jnp.stack([
        pad_s(centers.x, 0.0), pad_s(centers.y, 0.0),
        pad_s(centers.z, 0.0),
        pad_s(radii * radii * jnp.where(radii > 0, 1.0, -1.0), -1.0)])
    args = [
        pad_n(origin.x, 0.0), pad_n(origin.y, 0.0), pad_n(origin.z, 0.0),
        pad_n(direction.x, 1.0), pad_n(direction.y, 0.0),
        pad_n(direction.z, 0.0),
        pad_n(t_max_b, 0.0),
        sph,
    ]
    return args, n_pad, s_pad, shp2


@functools.partial(jax.jit, static_argnames=("t_min", "interpret",
                                             "num_feats", "mx"))
def spheres_hit_feat(origin, direction, centers, radii,
                     feat: jnp.ndarray, t_min: float, t_max,
                     interpret: bool = False, num_feats: int = 18,
                     mx: bool = False):
    """Nearest sphere hit + fused feature fetch.

    origin/direction/centers: V3 component batches ([N]/[S]); radii [S];
    feat [S, C] per-sphere feature table (material columns pre-joined).
    Returns (t [N], idx [N], feats: tuple of C dense [N] arrays — zeros
    for miss lanes).
    """
    n = origin.x.shape[0]
    s = centers.x.shape[0]
    c = feat.shape[1]
    if mx:
        return _spheres_hit_feat_mx(origin, direction, centers, radii,
                                    feat, t_min, t_max, interpret, c)
    args, n_pad, s_pad, shp2 = _sb_pack(origin, direction, centers,
                                        radii, t_max, n, s)
    feat_t = feat.T  # [C, S] — feature-major, matching the output
    if s_pad != s:
        feat_t = jnp.concatenate(
            [feat_t, jnp.zeros((c, s_pad - s), feat.dtype)], axis=1)
    args = args + [feat_t]
    ray = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    ftab = pl.BlockSpec((c, s_pad), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    fout = pl.BlockSpec((c, ROWS * 128), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel_sb, t_min=float(t_min), s_pad=s_pad,
                          n_live=s, n_c=c,
                          unroll=(not interpret
                                  and s_pad <= UNROLL_MAX)),
        grid=(n_pad // (ROWS * 128),),
        in_specs=[ray] * 7 + [hbm, ftab],
        out_specs=(ray, ray, fout),
        out_shape=(jax.ShapeDtypeStruct(shp2, jnp.float32),
                   jax.ShapeDtypeStruct(shp2, jnp.int32),
                   jax.ShapeDtypeStruct((c, n_pad), jnp.float32)),
        interpret=interpret,
    )(*args)
    t = outs[0].reshape(-1)[:n]
    idx = outs[1].reshape(-1)[:n]
    fo = outs[2]
    feats = tuple(fo[i, :n] for i in range(c))
    return t, idx, feats


def _spheres_hit_feat_mx(origin, direction, centers, radii, feat,
                         t_min, t_max, interpret, c):
    """The original (TILE, S)-layout kernel — retained ONLY as the
    ``mx=True`` decision record (MXU b/c contraction, measured 1.034x
    at SSIM 0.9934 — fails the fast-math gate; PERFORMANCE.md r3)."""
    n = origin.x.shape[0]
    s = centers.x.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    s_pad = ((s + S_CHUNK - 1) // S_CHUNK) * S_CHUNK

    def pad_n(a, fill):
        return jnp.concatenate(
            [a, jnp.full((n_pad - n,), fill, a.dtype)]).reshape(1, n_pad) \
            if n_pad != n else a.reshape(1, n_pad)

    def pad_s(a, fill):
        return jnp.concatenate(
            [a, jnp.full((s_pad - s,), fill, a.dtype)]).reshape(1, s_pad) \
            if s_pad != s else a.reshape(1, s_pad)

    radii_ = radii
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    feat_t = feat.T  # [C, S] — feature-major, matching the (C, TILE) output
    if s_pad != s:
        feat_t = jnp.concatenate(
            [feat_t, jnp.zeros((c, s_pad - s), feat.dtype)], axis=1)
    args = [
        pad_n(origin.x, 0.0), pad_n(origin.y, 0.0), pad_n(origin.z, 0.0),
        pad_n(direction.x, 1.0), pad_n(direction.y, 0.0),
        pad_n(direction.z, 0.0),
        pad_n(t_max_b, 0.0),
        pad_s(centers.x, 0.0), pad_s(centers.y, 0.0), pad_s(centers.z, 0.0),
        pad_s(radii_ * radii_ * jnp.where(radii_ > 0, 1.0, -1.0), -1.0),
        feat_t,
    ]

    grid = (n_pad // TILE,)
    ray_spec = pl.BlockSpec((1, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    sph_spec = pl.BlockSpec((1, s_pad), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    feat_spec = pl.BlockSpec((c, s_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    fout_spec = pl.BlockSpec((c, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel_feat, t_min=float(t_min), s_pad=s_pad,
                          num_feats=c, mx=True, mx_exact=interpret),
        grid=grid,
        in_specs=[ray_spec] * 7 + [sph_spec] * 4 + [feat_spec],
        out_specs=(ray_spec, ray_spec, fout_spec),
        out_shape=(jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
                   jax.ShapeDtypeStruct((c, n_pad), jnp.float32)),
        interpret=interpret,
    )(*args)
    t = outs[0][0, :n]
    idx = outs[1][0, :n]
    fo = outs[2]
    feats = tuple(fo[i, :n] for i in range(c))
    return t, idx, feats


def _kernel_any(ox, oy, oz, dx, dy, dz, tmax, cx, cy, cz, r2, occ_out,
                *, t_min: float, s_pad: int, mx: bool = False,
                mx_exact: bool = False):
    """Shadow any-hit over the sphere set: no argmin/min-reduce — just
    "did any sphere intersect before t_max"."""
    o1 = ox[0, :][:, None]
    o2 = oy[0, :][:, None]
    o3 = oz[0, :][:, None]
    d1 = dx[0, :][:, None]
    d2 = dy[0, :][:, None]
    d3 = dz[0, :][:, None]
    tmax_v = tmax[0, :][:, None]

    if mx:
        b_all, c_all = _bc_mxu(o1, o2, o3, d1, d2, d3, cx, cy, cz, r2,
                               s_pad, exact_dot=mx_exact)
    occ = jnp.zeros((TILE, 1), jnp.int32)
    for k in range(s_pad // S_CHUNK):
        sl = slice(k * S_CHUNK, (k + 1) * S_CHUNK)
        if mx:
            ts = _mx_chunk_ts(b_all[:, sl], c_all[:, sl], t_min, tmax_v)
        else:
            ccx = cx[0, sl][None, :]
            ccy = cy[0, sl][None, :]
            ccz = cz[0, sl][None, :]
            rr2 = r2[0, sl][None, :]
            ts = _sphere_chunk_ts(o1, o2, o3, d1, d2, d3, t_min, tmax_v,
                                  ccx, ccy, ccz, rr2)
        hit = ts < _FLT_MAX
        occ = occ | jnp.any(hit, axis=1, keepdims=True).astype(jnp.int32)
    occ_out[0, :] = occ[:, 0]


@functools.partial(jax.jit, static_argnames=("t_min", "interpret", "mx"))
def spheres_anyhit_soa(origin, direction, centers, radii, t_min: float,
                       t_max, interpret: bool = False,
                       mx: bool = False) -> jnp.ndarray:
    """[N] bool: any sphere hit in (t_min, t_max) — shadow fast path.
    (``mx`` retains the old-layout MXU b/c decision record.)"""
    n = origin.x.shape[0]
    s = centers.x.shape[0]
    if mx:
        return _spheres_anyhit_mx(origin, direction, centers, radii,
                                  t_min, t_max, interpret)
    args, n_pad, s_pad, shp2 = _sb_pack(origin, direction, centers,
                                        radii, t_max, n, s)
    ray = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    occ = pl.pallas_call(
        functools.partial(_kernel_sb, t_min=float(t_min), s_pad=s_pad,
                          n_live=s, n_c=0, any_hit=True,
                          unroll=(not interpret
                                  and s_pad <= UNROLL_MAX)),
        grid=(n_pad // (ROWS * 128),),
        in_specs=[ray] * 7 + [hbm],
        out_specs=ray,
        out_shape=jax.ShapeDtypeStruct(shp2, jnp.int32),
        interpret=interpret,
    )(*args)
    return occ.reshape(-1)[:n] != 0


def _spheres_anyhit_mx(origin, direction, centers, radii, t_min, t_max,
                       interpret):
    n = origin.x.shape[0]
    s = centers.x.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    s_pad = ((s + S_CHUNK - 1) // S_CHUNK) * S_CHUNK

    def pad_n(a, fill):
        return jnp.concatenate(
            [a, jnp.full((n_pad - n,), fill, a.dtype)]).reshape(1, n_pad) \
            if n_pad != n else a.reshape(1, n_pad)

    def pad_s(a, fill):
        return jnp.concatenate(
            [a, jnp.full((s_pad - s,), fill, a.dtype)]).reshape(1, s_pad) \
            if s_pad != s else a.reshape(1, s_pad)

    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    args = [
        pad_n(origin.x, 0.0), pad_n(origin.y, 0.0), pad_n(origin.z, 0.0),
        pad_n(direction.x, 1.0), pad_n(direction.y, 0.0),
        pad_n(direction.z, 0.0),
        pad_n(t_max_b, 0.0),
        pad_s(centers.x, 0.0), pad_s(centers.y, 0.0), pad_s(centers.z, 0.0),
        pad_s(radii * radii * jnp.where(radii > 0, 1.0, -1.0), -1.0),
    ]
    grid = (n_pad // TILE,)
    ray_spec = pl.BlockSpec((1, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    sph_spec = pl.BlockSpec((1, s_pad), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        functools.partial(_kernel_any, t_min=float(t_min), s_pad=s_pad,
                          mx=True, mx_exact=interpret),
        grid=grid,
        in_specs=[ray_spec] * 7 + [sph_spec] * 4,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        interpret=interpret,
    )(*args)
    return occ[0, :n] != 0


def spheres_hit_soa(origin, direction, centers, radii, t_min: float, t_max,
                    interpret: bool = False):
    """Component-SoA entry: origin/direction/centers are V3 of [N]/[S]
    arrays — no interleave/deinterleave at the boundary."""
    return _spheres_hit_impl(origin.x, origin.y, origin.z,
                             direction.x, direction.y, direction.z,
                             centers.x, centers.y, centers.z, radii,
                             t_min, t_max, interpret)


def spheres_hit_pallas(origin: jnp.ndarray, direction: jnp.ndarray,
                       centers: jnp.ndarray, radii: jnp.ndarray,
                       t_min: float, t_max,
                       interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[N,3]-interface drop-in for
    :func:`tpu_pathtracer.ops.intersect.spheres_hit`."""
    return _spheres_hit_impl(
        origin[:, 0], origin[:, 1], origin[:, 2],
        direction[:, 0], direction[:, 1], direction[:, 2],
        centers[:, 0], centers[:, 1], centers[:, 2], radii,
        t_min, t_max, interpret)


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def _spheres_hit_impl(ox, oy, oz, dx, dy, dz, cx, cy, cz, radii,
                      t_min: float, t_max, interpret: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (t [N] with _FLT_MAX miss, idx [N], -1 on miss)."""
    from tpu_pathtracer.ops.v3 import V3

    n = ox.shape[0]
    s = cx.shape[0]
    args, n_pad, s_pad, shp2 = _sb_pack(
        V3(ox, oy, oz), V3(dx, dy, dz), V3(cx, cy, cz), radii, t_max,
        n, s)
    ray = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    t, idx = pl.pallas_call(
        functools.partial(_kernel_sb, t_min=float(t_min), s_pad=s_pad,
                          n_live=s, n_c=0,
                          unroll=(not interpret
                                  and s_pad <= UNROLL_MAX)),
        grid=(n_pad // (ROWS * 128),),
        in_specs=[ray] * 7 + [hbm],
        out_specs=(ray, ray),
        out_shape=(jax.ShapeDtypeStruct(shp2, jnp.float32),
                   jax.ShapeDtypeStruct(shp2, jnp.int32)),
        interpret=interpret,
    )(*args)
    return t.reshape(-1)[:n], idx.reshape(-1)[:n]
