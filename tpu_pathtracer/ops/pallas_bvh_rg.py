"""Regrouped (demand-packed) packet BVH traversal.

The scalar packet kernel's leaf phase MT-tests every leaf cluster
against ALL 1024 lanes; measured demand (a lane's own slab test
passing under its current closest) is only ~1.2% of that on bounce
packets (experiments/demand_sim.py: 81x overwork on the knot, 368x on
the dragon). This kernel batches SPARSE leaf visits into windows of
up to K visits / S (ray, leaf) pairs and MT-tests only demanded pairs
in dense (width, S) tiles, with operands fetched by exact one-hot MXU
contractions (the established 3-term bf16 split — see
ops/pallas_spheres._kernel_feat); DENSE visits (> dense_thresh
demanding lanes, e.g. coherent primaries) take the inline scalar MT
path unchanged. Measured staging cost: ~12 us per 64-visit window vs
75.5 us scalar (experiments/regroup_probe.py — 6.3x on the leaf
phase).

Window mechanics (visit-major slot ordering, orientation constraints
from experiments/shapecast_probe.py):
  - visit v's demand mask m_v is an (8,128) lane tile; demanding
    lanes get slots vpref[v] + rank_v(r) (rank = exclusive lane
    prefix); enc_v = 2*rank + mask is stored to a (K,8,128) scratch,
    the visit's triangle block (3 bf16 split terms) is DMA'd to a
    (3K, rows8, 128) scratch, and vpref/cid go to SMEM.
  - flush: per-slot scalars from SMEM loops on (1,S); visit one-hot
    C_TT (K,S) via one iota compare; ray-ownership G (R,S) via a
    2-term one-hot fetch of enc; ray operands (21,S) = rayctT @ G;
    triangle operands (16*width, S) by the K-stacked 3-term one-hot
    contraction; dense MT on (width, S) tiles; per-slot column-min;
    three row-min passes scatter (t, earliest slot, besti) back to
    lanes.
  - commits are deferred to the flush (every <=K sparse visits):
    node culling and MT accepts use the stale committed closest, so
    traversal does a few % more steps/visits (demand_sim: +5-8% at
    K=32..64) but every accepted hit is exact; the final per-ray
    minimum is order-free, so results match the scalar kernel up to
    FMA-contraction ulps and equal-t tie-breaks across the
    dense/sparse boundary.

Semantic spec: /root/reference/kernels.cu:154-224 (traversal),
intersections.h:43-77 (MT); same restructured MT as
pallas_bvh._mt_scalar_tri.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pathtracer.models.scene import MeshData
from tpu_pathtracer.ops.pallas_bvh import (
    _FLT_MAX, _advance_votes, _ctz32, _mt_scalar_tri, _node_bounds,
    _node_bounds4, _node_box, _pad_rays, _pop, _quad_votes, _slab,
    _tri_components, build_packet_mesh, winner_features, PacketMesh)

_BIG_F = float(2 ** 30)


class PacketRG:
    """PacketMesh + the bf16 3-term split cluster blocks the regroup
    flush contracts on the MXU. blocks_rg: [3*C, rows8, 128] bf16 —
    rows (3c, 3c+1, 3c+2) are the hi/mid/lo terms of cluster c's 16
    component rows of `width` (comp j of tri w at flat j*width + w)."""

    def __init__(self, pm: PacketMesh, blocks_rg):
        self.pm = pm
        self.blocks_rg = blocks_rg


def build_packet_rg(mesh: MeshData, max_width: int = 64,
                    smem_budget_floats=None,
                    quant_nodes="auto") -> PacketRG:
    pm = build_packet_mesh(mesh, max_width=max_width,
                           smem_budget_floats=smem_budget_floats,
                           quant_nodes=quant_nodes)
    if (16 * pm.width) % 128 or pm.cpb != 1:
        raise ValueError(f"regroup path needs width*16 % 128 == 0 and "
                         f"cpb == 1 (width={pm.width}, cpb={pm.cpb})")
    flat, *_ = _tri_components(mesh)                  # [16, T]
    n_clusters = pm.cl_first
    rows8 = 16 * pm.width // 128
    # [C, 16*width] comp-major flat clusters -> 3-term bf16 split,
    # interleaved (c: hi, mid, lo) so the window DMA is one dim-0
    # slice of extent 3 per visit
    cl = flat.reshape(16, n_clusters, pm.width) \
        .transpose(1, 0, 2).reshape(n_clusters, 16 * pm.width)
    hi = cl.astype(jnp.bfloat16)
    r1 = cl - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    blocks_rg = jnp.stack([hi, mid, lo], axis=1) \
        .reshape(3 * n_clusters, rows8, 128)
    return PacketRG(pm, blocks_rg)


def _lane_exclusive_prefix(m):
    """Exclusive prefix sum of an (8,128) 0/1 tile in flat row-major
    lane order (lane log-scan + sublane carry)."""
    x = m.astype(jnp.int32)
    s = x
    for sh in (1, 2, 4, 8, 16, 32, 64):
        sp = pltpu.roll(s, sh, 1)
        mask = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) >= sh
        s = s + jnp.where(mask, sp, 0)
    row_tot = s[:, 127:128]                           # (8,1) row totals
    carry = jnp.zeros_like(s)
    for sh in (1, 2, 4):
        rp = pltpu.roll(row_tot, sh, 0)
        maskr = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) >= sh
        row_tot_sh = jnp.where(maskr, rp, 0)
        carry = carry + row_tot_sh
        row_tot = row_tot + row_tot_sh
    return s - x + carry[:, 0:1]


def _split3_row(x_row):
    """(1,R) f32 -> 3 x (1,R) bf16 exact split terms."""
    hi = x_row.astype(jnp.bfloat16)
    r1 = x_row - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return [hi, mid, lo]


def _advance_cnt(idx, bs, sp, smcnt, lhit, rhit, closest, l):
    """Binary node step that ALSO tracks demanding-lane counts: the
    packed vote fields already hold each child's hit-lane count, so
    pushing the far child's count to a scalar SMEM stack (in LIFO sync
    with the bitstack's 1-bits) hands every future leaf visit its
    demand count with zero extra vector->scalar syncs. The count is
    conservative at pop time (closest only shrinks), which is exactly
    what the regroup dispatch and slot reservation need."""
    packed, s_pref = _advance_votes(lhit, rhit, closest)
    vl_c = packed & 0xFFFF
    vr_c = packed >> 16
    vl = vl_c > 0
    vr = vr_c > 0
    swap = (s_pref > 0).astype(jnp.int32)
    both = vl & vr
    single = vl ^ vr
    m = jnp.where(bs > 0, _ctz32(bs), 0)
    bs_p = (bs >> m.astype(jnp.uint32)) ^ jnp.uint32(1)
    idx_p = (idx >> m) ^ 1
    child_both = l + swap
    child_single = jnp.where(vl, l, l + 1)
    new_idx = jnp.where(both, child_both,
                        jnp.where(single, child_single, idx_p))
    new_bs = jnp.where(both, (bs << jnp.uint32(1)) + jnp.uint32(1),
                       jnp.where(single, bs << jnp.uint32(1), bs_p))
    near_c = jnp.where(swap == 1, vr_c, vl_c)
    far_c = jnp.where(swap == 1, vl_c, vr_c)
    sing_c = jnp.where(vl, vl_c, vr_c)
    pop_c = smcnt[jnp.maximum(sp - 1, 0)]

    @pl.when(both)
    def _():
        smcnt[sp] = far_c

    new_pend = jnp.where(both, near_c, jnp.where(single, sing_c, pop_c))
    new_sp = sp + jnp.where(both, 1, jnp.where(single, 0, -1))
    return new_idx, new_bs, new_pend, new_sp, both, single


def _quad_cnt(ntab, idx, bs, sp, smcnt, closest, o1, o2, o3, i1, i2, i3,
              n1, n2, n3, quant, qscal, n_lanes):
    """4-ary grandchild step with count tracking (see _advance_cnt and
    pallas_bvh._advance4). Push order mirrors the bitstack: uncle bit
    first, sibling bit (popped first) second. The uncle is always an
    interior node here (quad runs above the last interior level), so
    its stack entry is a dummy — interior pops regenerate counts."""
    ba, bb_, bc_, bd = _node_bounds4(ntab, idx * 4, quant, qscal)
    ha = _slab(ba, o1, o2, o3, i1, i2, i3, n1, n2, n3, closest)
    hb = _slab(bb_, o1, o2, o3, i1, i2, i3, n1, n2, n3, closest)
    hc = _slab(bc_, o1, o2, o3, i1, i2, i3, n1, n2, n3, closest)
    hd = _slab(bd, o1, o2, o3, i1, i2, i3, n1, n2, n3, closest)
    pk1, pk2, pk3, s_cd = _quad_votes(ha, hb, hc, hd, closest)
    va_c = pk1 & 0xFFFF
    vb_c = pk1 >> 16
    vc_c = pk2 & 0xFFFF
    vd_c = pk2 >> 16
    va = va_c > 0
    vb = vb_c > 0
    vc = vc_c > 0
    vd = vd_c > 0
    swap_lr = (pk3 & 0xFFFF) > n_lanes
    swap_ab = (pk3 >> 16) > n_lanes
    swap_cd = s_cd > n_lanes
    vl = va | vb
    vr = vc | vd
    go_r = jnp.where(vl & vr, swap_lr, vr)
    uncle = vl & vr
    v0 = jnp.where(go_r, vc, va)
    v1 = jnp.where(go_r, vd, vb)
    v0c = jnp.where(go_r, vc_c, va_c)
    v1c = jnp.where(go_r, vd_c, vb_c)
    swap_p = jnp.where(go_r, swap_cd, swap_ab)
    sib = v0 & v1
    k_pair = jnp.where(sib, swap_p.astype(jnp.int32),
                       v1.astype(jnp.int32))
    chosen_c = jnp.where(k_pair == 1, v1c, v0c)
    sib_c = jnp.where(k_pair == 1, v0c, v1c)
    new_idx_d = idx * 4 + go_r.astype(jnp.int32) * 2 + k_pair
    new_bs_d = (((bs << jnp.uint32(1))
                 | uncle.astype(jnp.uint32)) << jnp.uint32(1)) \
        | sib.astype(jnp.uint32)
    idx_p, bs_p = _pop(idx, bs)
    any_hit = vl | vr
    new_idx = jnp.where(any_hit, new_idx_d, idx_p)
    new_bs = jnp.where(any_hit, new_bs_d, bs_p)
    pop_c = smcnt[jnp.maximum(sp - 1, 0)]
    sp1 = sp + uncle.astype(jnp.int32)

    @pl.when(uncle)
    def _():
        smcnt[sp] = n_lanes  # interior dummy, never read by a leaf

    @pl.when(sib)
    def _():
        smcnt[sp1] = sib_c

    new_sp = jnp.where(any_hit, sp1 + sib.astype(jnp.int32), sp - 1)
    new_pend = jnp.where(any_hit, chosen_c, pop_c)
    nb_inc = uncle.astype(jnp.int32) + sib.astype(jnp.int32)
    nsg_inc = ((vl ^ vr).astype(jnp.int32)
               + (any_hit & (v0 ^ v1)).astype(jnp.int32))
    return new_idx, new_bs, new_pend, new_sp, nb_inc, nsg_inc


def _kernel_nearest_rg(ox, oy, oz, dx, dy, dz, tmax, nodes, *rest,
                       cl_first, width, stride, t_min, unroll,
                       smem_nodes, top_rows, quant=False,
                       wk=64, ws=1024, dense_thresh=160, quad=True,
                       interpret=False, debug=False, prof=None):
    """Nearest-hit traversal with the regrouped leaf phase. Node phase
    (fused body + 4-ary quad step), dense-visit MT, pops and counters
    are the scalar kernel's (pallas_bvh._kernel_nearest)."""
    rest = list(rest)
    nodes_top = rest.pop(0) if top_rows else None
    qp = rest.pop(0) if quant else None
    blocks, blocks_rg, tri_out, feat_out, cnt_out = rest
    rows8 = 16 * width // 128
    quad_ok = quad and (smem_nodes or quant) and not top_rows \
        and cl_first >= 8
    # CPU-interpret runs bf16 dots with bf16 accumulation; HIGHEST
    # restores f32 accumulation so CI matches hardware (CLAUDE.md)
    prec = jax.lax.Precision.HIGHEST if interpret else None

    def dotn(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    def dotT(a, b):
        # contract dim 0 of BOTH operands: (K,M),(K,N) -> (M,N)
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    def scoped(blk, sem, semw, enc3, blk3, smv, smcnt, ntab=None):
        if smem_nodes or top_rows:
            nd = pltpu.make_async_copy(
                nodes if smem_nodes else nodes_top, ntab, sem)
            nd.start()
            nd.wait()
        qscal = tuple(qp[i] for i in range(6)) if quant else None
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
        # ws == lanes also guarantees any sparse visit fits an empty
        # window (pend <= n_lanes = ws), so dense_thresh is free to
        # exceed ws ("never dense")
        assert ws == o1.size, "slot count must equal packet lanes"
        smv[0] = 0  # vpref[0]; rows [0..wk] vpref, [wk+1..2wk] cids
        # zero the triangle scratch ONCE per packet: rows beyond the
        # window's fill are still contracted (x their zero one-hot),
        # and uninitialized bits can be NaN — 0*NaN = NaN poisons the
        # whole matmul column
        blk3[:, :, :] = jnp.zeros((3 * wk, rows8, 128), jnp.bfloat16)
        # ray operand rows, built once per packet: 3-term split of
        # (o1,o2,o3,d1,d2,d3) -> (18,R) bf16; flush appends the
        # flush-time closest split (21 rows total)
        rrows = []
        for compv in (o1, o2, o3, d1, d2, d3):
            rrows.extend(_split3_row(compv.reshape(1, ws)))
        rayct18 = jnp.concatenate(rrows, axis=0)      # (18,R) bf16

        def flush(closest, besti, wc, wp, dbg=None):
            """Regrouped MT over the window's recorded demand pairs;
            commits exact winners into (closest, besti). See module
            docstring; staging mirrors experiments/regroup_probe.py."""
            if prof == "norec":  # nothing recorded, nothing to do
                return closest, besti
            # drain the window's pipelined triangle DMAs (started at
            # record time; all copies are equal-size so each wait
            # retires one)
            def drain(v, _):
                pltpu.make_async_copy(blocks_rg.at[pl.ds(0, 3)],
                                      blk3.at[pl.ds(0, 3)], semw).wait()
                return 0
            jax.lax.fori_loop(0, wc, drain, 0)
            if prof == "noflush":
                return closest, besti
            # vpref tail: rows past wc must repeat the total so the
            # monotone SMEM scan below lands used slots on v < wc
            def fill(v, _):
                smv[v] = wp
                return 0
            jax.lax.fori_loop(wc + 1, wk + 1, fill, 0)
            # iotas rematerialized HERE, not in the enclosing scope:
            # hoisting them out makes ~1.3 MB of (wk,ws)-class tensors
            # loop-live across the whole traversal and spills the hot
            # node/record state (measured ~800 ns/visit of overhead)
            iota_sr = jax.lax.broadcasted_iota(jnp.int32, (1, ws), 1)
            iota_kv = jax.lax.broadcasted_iota(jnp.int32, (wk, ws), 0)
            iota_k3 = jax.lax.broadcasted_iota(jnp.int32, (3 * wk, ws), 0)
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (width, ws), 0)
            v_of_s = jnp.zeros((1, ws), jnp.int32)
            vpref_s = jnp.zeros((1, ws), jnp.int32)
            cid_s = jnp.zeros((1, ws), jnp.float32)
            for v in range(wk):
                sel = iota_sr >= smv[v]
                v_of_s = jnp.where(sel, v, v_of_s)
                vpref_s = jnp.where(sel, smv[v], vpref_s)
                cid_s = jnp.where(sel, smv[wk + 1 + v].astype(jnp.float32),
                                  cid_s)
            k_s = iota_sr - vpref_s
            used = iota_sr < wp
            ctt_b = (iota_kv == v_of_s) & used
            ctt = ctt_b.astype(jnp.bfloat16)
            # ray ownership: one 2-term one-hot fetch of enc = 2r+m
            enc_t = enc3[:, :, :].reshape(wk, ws)
            enc_hi = (enc_t >> 8).astype(jnp.bfloat16)
            enc_lo = (enc_t & 255).astype(jnp.bfloat16)
            ef = dotT(enc_hi, ctt) * 256.0 + dotT(enc_lo, ctt)
            want = (2 * k_s + 1).astype(jnp.float32)
            g_b = ef == want                          # (R,S)
            g = g_b.astype(jnp.bfloat16)
            # ray operands (21,S): o,d and the FLUSH-time closest (a
            # tighter t-cap than at record time — only prunes pairs
            # that lose anyway, the winner set is unchanged). Clamp the
            # cap below bf16 max: FLT_MAX (miss lanes) overflows the
            # 3-term split to inf-inf = NaN; any clamp above scene
            # scale compares identically in `t < cap`.
            cap = jnp.minimum(closest, 1e37)
            rayct = jnp.concatenate(
                [rayct18] + _split3_row(cap.reshape(1, ws)), axis=0)
            f = dotn(rayct, g)                        # (21,S)

            def c3(i):
                return f[3 * i:3 * i + 1, :] + f[3 * i + 1:3 * i + 2, :] \
                    + f[3 * i + 2:3 * i + 3, :]
            o1p, o2p, o3p = c3(0), c3(1), c3(2)
            d1p, d2p, d3p = c3(3), c3(4), c3(5)
            clp = c3(6)
            # triangle operands: K-stacked 3-term one-hot contraction
            # (C_TT row-tripled to match the (3K, rows8*128) blocks)
            u3 = iota_k3 - 3 * v_of_s
            ctt3 = ((u3 >= 0) & (u3 < 3) & used).astype(jnp.bfloat16)
            t_all = dotT(blk3[:, :, :].reshape(3 * wk, 16 * width),
                         ctt3)                        # (16*width, S)

            def tc(c):
                return t_all[c * width:(c + 1) * width, :]
            tn1, tn2, tn3 = tc(9), tc(10), tc(11)
            a = -(d1p * tn1 + d2p * tn2 + d3p * tn3)
            par = jnp.abs(a) < 1e-7                   # intersections.h:55
            fi = 1.0 / jnp.where(par, 1.0, a)
            sx = o1p - tc(0)
            sy = o2p - tc(1)
            sz = o3p - tc(2)
            qx = sy * d3p - sz * d2p
            qy = sz * d1p - sx * d3p
            qz = sx * d2p - sy * d1p
            uu = fi * (qx * tc(6) + qy * tc(7) + qz * tc(8))
            vv = -(fi * (qx * tc(3) + qy * tc(4) + qz * tc(5)))
            tt = fi * (sx * tn1 + sy * tn2 + sz * tn3)
            bad = (par | (jnp.minimum(uu, vv) < 0.0) | (uu + vv > 1.0)
                   | jnp.logical_not(tt > t_min)
                   | jnp.logical_not(tt < clp))
            tw = jnp.where(bad, _FLT_MAX, tt)         # (width,S)
            t_slot = jnp.min(tw, axis=0, keepdims=True)
            w_slot = jnp.min(jnp.where(tw == t_slot, iota_w,
                                       jnp.int32(width)),
                             axis=0, keepdims=True)
            besti_s = cid_s * width + w_slot.astype(jnp.float32)
            # scatter: 3 row-min passes (t, earliest slot, besti) —
            # earliest slot == visit order, the scalar kernel's
            # tie-break
            tb = jnp.where(g_b, t_slot, _FLT_MAX)     # (R,S)
            minv = jnp.min(tb, axis=1, keepdims=True)  # (R,1)
            tie = g_b & (t_slot == minv)
            mins = jnp.min(jnp.where(tie, iota_sr, jnp.int32(ws)),
                           axis=1, keepdims=True)
            bb = jnp.where(iota_sr == mins, besti_s, jnp.float32(_BIG_F))
            minb = jnp.min(bb, axis=1, keepdims=True)  # (R,1)
            minv8 = minv.reshape(shp)
            won = minv8 < closest
            closest = jnp.where(won, minv8, closest)
            besti = jnp.where(won, minb.reshape(shp).astype(jnp.int32),
                              besti)
            if dbg is not None:
                dbg["gsum"] = jnp.sum(g_b.astype(jnp.int32), axis=1,
                                      keepdims=True).reshape(shp)
                dbg["wp"] = wp
                dbg["wc"] = wc
                dbg["tslot_fin"] = jnp.sum(
                    (t_slot < _FLT_MAX).astype(jnp.int32))
                dbg["used"] = jnp.sum(used.astype(jnp.int32))
                um = used.astype(jnp.float32)
                dbg["tri_sum"] = jnp.sum(jnp.abs(t_all) * um)
                dbg["ray_sum"] = jnp.sum(jnp.abs(o1p + d1p) * um)
                dbg["cl_sum"] = jnp.sum(jnp.abs(clp) * um)
            return closest, besti

        def flush_reset(st):
            closest, besti, wc, wp = st
            closest, besti = flush(closest, besti, wc, wp)
            return closest, besti, jnp.int32(0), jnp.int32(0)

        def node_bin(carry):
            idx, bs, nb, nsg, nl, closest, besti, wc, wp, pend, sp = carry
            l = idx * 2
            bl, br = _node_bounds(smem_nodes, top_rows, nodes, ntab, l,
                                  quant, qscal)
            lhit = _slab(bl, o1, o2, o3, i1, i2, i3, n1, n2, n3, closest)
            rhit = _slab(br, o1, o2, o3, i1, i2, i3, n1, n2, n3,
                         closest)
            new_idx, new_bs, pend, sp, both, single = _advance_cnt(
                idx, bs, sp, smcnt, lhit, rhit, closest, l)
            nb = nb + both.astype(jnp.int32)
            nsg = nsg + single.astype(jnp.int32)
            return (new_idx, new_bs, nb, nsg, nl, closest, besti, wc, wp,
                    pend, sp)

        def node_quad(carry):
            idx, bs, nb, nsg, nl, closest, besti, wc, wp, pend, sp = carry
            new_idx, new_bs, pend, sp, nbi, nsgi = _quad_cnt(
                ntab, idx, bs, sp, smcnt, closest, o1, o2, o3, i1, i2, i3,
                n1, n2, n3, quant, qscal, o1.size)
            return (new_idx, new_bs, nb + nbi, nsg + nsgi, nl, closest,
                    besti, wc, wp, pend, sp)

        if quad_ok:
            def node_fn(carry):
                return jax.lax.cond(carry[0] < cl_first // 2, node_quad,
                                    node_bin, carry)
        else:
            node_fn = node_bin

        def leaf_fn(carry):
            idx, bs, nb, nsg, nl, closest, besti, wc, wp, pend, sp = carry
            c = idx - cl_first

            def dense(st):
                # inline scalar MT — pallas_bvh._kernel_nearest.do_mt
                closest, besti, wc, wp = st
                dma = pltpu.make_async_copy(blocks.at[c], blk, sem)
                dma.start()
                dma.wait()

                def tri(w, st2):
                    cl_, bi_ = st2
                    t, _u, _v, bad = _mt_scalar_tri(
                        blk, 0, w, stride, o1, o2, o3, d1, d2, d3,
                        t_min, cl_)
                    won = jnp.logical_not(bad)
                    cl_ = jnp.where(won, t, cl_)
                    bi_ = jnp.where(won, c * width + w, bi_)
                    return (cl_, bi_)

                if unroll:
                    st2 = (closest, besti)
                    for w in range(width):
                        st2 = tri(w, st2)
                    closest, besti = st2
                else:
                    closest, besti = jax.lax.fori_loop(
                        0, width, tri, (closest, besti))
                return closest, besti, wc, wp

            def sparse(st):
                # pend (from the count stack) is a conservative upper
                # bound on this visit's demand — reserving pend slots
                # keeps rank<k matching exact, extra slots stay empty.
                # Window room is guaranteed by the inner while cond
                # (the loop exits to the outer-level flush instead).
                closest, besti, wc, wp = st
                if prof == "norec":  # profiling-only: skip the record
                    return closest, besti, wc + 1, wp + pend
                lb = _node_box(smem_nodes, top_rows, nodes, ntab, idx,
                               quant, qscal)
                lhit = _slab(lb, o1, o2, o3, i1, i2, i3, n1, n2, n3,
                             closest)
                demand = lhit < closest
                rank = _lane_exclusive_prefix(demand)
                enc3[wc] = 2 * rank + demand.astype(jnp.int32)
                # pipelined: start only — the flush drains semw before
                # reading blk3, so record never eats the DMA latency
                pltpu.make_async_copy(
                    blocks_rg.at[pl.ds(c * 3, 3)],
                    blk3.at[pl.ds(wc * 3, 3)], semw).start()
                smv[wc + 1] = wp + pend
                smv[wk + 1 + wc] = c
                return closest, besti, wc + 1, wp + pend

            closest, besti, wc, wp = jax.lax.cond(
                pend > dense_thresh, dense, sparse,
                (closest, besti, wc, wp))
            nl = nl + 1
            m = jnp.where(bs > 0, _ctz32(bs), 0)
            new_bs = (bs >> m.astype(jnp.uint32)) ^ jnp.uint32(1)
            new_idx = (idx >> m) ^ 1
            # pop: the new current node IS the stack top; its count
            # rides the count stack
            new_sp = sp - 1
            new_pend = smcnt[jnp.maximum(sp - 1, 0)]
            return (new_idx, new_bs, nb, nsg, nl, closest, besti, wc, wp,
                    new_pend, new_sp)

        def sparse_full(carry):
            # a sparse leaf visit that would overflow the window —
            # the inner loop must exit to the outer-level flush first
            idx = carry[0]
            wc, wp, pend = carry[7], carry[8], carry[9]
            is_leaf = (idx >= cl_first) & (pend <= dense_thresh)
            no_room = (wc >= wk) | (wp + pend > ws)
            return is_leaf & no_room

        def body(carry):
            # fused body: node step + same-trip leaf visit (the visit
            # is gated on window room — a full window leaves idx parked
            # on the leaf for the next inner trip after the flush)
            carry = jax.lax.cond(carry[0] < cl_first, node_fn,
                                 lambda cr: cr, carry)
            return jax.lax.cond(
                (carry[0] >= cl_first) & jnp.logical_not(
                    sparse_full(carry)), leaf_fn, lambda cr: cr, carry)

        def inner_cond(carry):
            # run until traversal ends OR the next sparse leaf visit
            # would overflow the window (flush happens one level up, so
            # the giant flush body never sits inside this hot loop)
            return (carry[0] > 0) & jnp.logical_not(sparse_full(carry))

        def outer_body(carry):
            carry = jax.lax.while_loop(inner_cond, body, carry)
            idx, bs, nb, nsg, nl, closest, besti, wc, wp, pend, sp = carry
            closest, besti, wc, wp = flush_reset((closest, besti, wc, wp))
            return (idx, bs, nb, nsg, nl, closest, besti, wc, wp, pend,
                    sp)

        init = (jnp.int32(1), jnp.uint32(1), jnp.int32(0), jnp.int32(0),
                jnp.int32(0), tmax[:, :], jnp.full(shp, -1, jnp.int32),
                jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0))
        (_, _, nb, nsg, nl, closest, besti, wc, wp, _, _) = \
            jax.lax.while_loop(lambda cr: cr[0] > 0, outer_body, init)
        # every outer trip flushes, including the final one (idx==0
        # exits the inner loop into one last flush_reset)
        dbg = {} if debug else None
        if debug:
            closest, besti = flush(closest, besti, wc, wp, dbg)
        ii = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
        cnt_out[:, :] = jnp.where(
            (ii == 0) & (jj == 0), nb,
            jnp.where((ii == 0) & (jj == 1), nsg,
                      jnp.where((ii == 0) & (jj == 2), nl, 0)))
        if debug:
            tri_out[:, :] = dbg["gsum"]
            feat_out[:, :] = jnp.where(
                (ii == 0) & (jj == 0), dbg["wp"].astype(jnp.float32),
                jnp.where((ii == 0) & (jj == 1),
                          dbg["wc"].astype(jnp.float32),
                          jnp.where((ii == 0) & (jj == 2),
                                    dbg["tslot_fin"].astype(jnp.float32),
                                    jnp.where((ii == 0) & (jj == 3),
                                              dbg["used"].astype(
                                                  jnp.float32),
                                              jnp.where(
                                                  (ii == 0) & (jj == 4),
                                                  dbg["tri_sum"],
                                                  jnp.where(
                                                      (ii == 0) & (jj == 5),
                                                      dbg["ray_sum"],
                                                      jnp.where(
                                                          (ii == 0) & (jj == 6),
                                                          dbg["cl_sum"],
                                                          0.0)))))))
            return
        tri_out[:, :] = besti
        feat_out[:, :] = closest

    kw = dict(blk=pltpu.SMEM(blocks.shape[1:], jnp.float32),
              sem=pltpu.SemaphoreType.DMA(()),
              semw=pltpu.SemaphoreType.DMA(()),
              enc3=pltpu.VMEM((wk, 8, 128), jnp.int32),
              blk3=pltpu.VMEM((3 * wk, rows8, 128), jnp.bfloat16),
              smv=pltpu.SMEM((2 * wk + 2,), jnp.int32),
              smcnt=pltpu.SMEM((40,), jnp.int32))
    if smem_nodes:
        kw["ntab"] = pltpu.SMEM(nodes.shape, nodes.dtype)
    elif top_rows:
        kw["ntab"] = pltpu.SMEM((top_rows * 8,), jnp.float32)
    pl.run_scoped(scoped, **kw)


@functools.partial(jax.jit, static_argnames=(
    "cl_first", "width", "t_min", "interpret", "stride", "smem_nodes",
    "top_rows", "quant", "wk", "ws", "dense_thresh", "quad", "debug",
    "prof"))
def packet_trace_rg(origin, direction, t_max, nodes, blocks, blocks_rg,
                    tri_feat, cl_first: int, width: int, t_min: float,
                    interpret: bool = False, stride: int = 128,
                    smem_nodes: bool = False, top_rows: int = 0,
                    nodes_top=None, quant: bool = False, qparams=None,
                    wk: int = 64, ws: int = 1024,
                    dense_thresh: int = 160, quad: bool = True,
                    debug: bool = False, prof=None):
    """Nearest-hit regrouped packet traversal over the whole ray batch.
    Same contract as pallas_bvh.packet_trace (returns the winner
    feature tuple + (nodes_both, nodes_single, leaf_visits)); hits are
    exact per-pair MT accepts, equal to the scalar kernel up to FMA
    contraction ulps and cross-path equal-t tie-breaks."""
    # dt >= ws ("never dense") measured 5x slower on hardware — big-pend
    # visits churn windows — and showed a hardware-only 5/102k winner
    # mismatch in the statically-all-sparse variant; clamp keeps the
    # dense fallback live as the window load-balancer
    dense_thresh = min(dense_thresh, ws - 1)
    n = origin.x.shape[0]
    n_pad = ((n + 1023) // 1024) * 1024
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
      + ([qparams] if quant else []) + [blocks, blocks_rg]
    n_packets = n_pad // 1024
    ray_spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    if smem_nodes:
        node_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    else:
        node_spec = pl.BlockSpec(nodes.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    extra = [hbm] if top_rows else []
    if quant:
        extra = extra + [pl.BlockSpec(memory_space=pltpu.SMEM)]
    kernel = functools.partial(
        _kernel_nearest_rg, cl_first=cl_first, width=width,
        stride=stride, t_min=float(t_min), unroll=not interpret,
        smem_nodes=smem_nodes, top_rows=top_rows, quant=quant,
        wk=wk, ws=ws, dense_thresh=dense_thresh, quad=quad,
        interpret=interpret, debug=debug, prof=prof)
    tri, feat, cnt = pl.pallas_call(
        kernel,
        grid=(n_packets,),
        in_specs=[ray_spec] * 7 + [node_spec] + extra + [hbm, hbm],
        out_specs=(ray_spec, ray_spec, ray_spec),
        out_shape=(jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32),
                   jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 << 20),
    )(*args)
    tri = tri.reshape(-1)[:n]
    t = feat.reshape(-1)[:n]
    nodes_both = cnt[::8, 0].sum()
    nodes_single = cnt[::8, 1].sum()
    leaf_visits = cnt[::8, 2].sum()
    return (winner_features(origin, direction, t, tri, tri_feat),
            (nodes_both, nodes_single, leaf_visits))
