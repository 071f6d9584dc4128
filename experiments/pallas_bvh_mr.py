"""Multirow packet BVH traversal: 8 independent 128-ray packets per tile.

The single-state packet kernel (ops/pallas_bvh.py) shares ONE traversal
state across a 1024-ray packet, so every lane pays for the union of all
lanes' node visits and leaf clusters. This kernel keeps the same (8,128)
ray tile but gives each sublane ROW its own traversal state — 8
independent 128-ray packets advancing in lockstep *rounds*:

  * node round — every row at an internal node does one slab+vote step.
    The per-row node-pair bounds are fetched WITHOUT leaving vector
    domain: the node table is laid out as (12, B, 8, 128) component
    blocks and each block is read with two chained ``tpu.dynamic_gather``
    ops (sublane then lane), selected across blocks by the pair id's
    high bits. Measured ~140-200 ns/round at B<=4 and ~+20 ns per extra
    block (experiments/gather_probe.py) — the node phase all but
    vanishes versus ~230 ns/step x 8 packets of scalar stepping.
  * leaf push — a row reaching a leaf cluster pushes the cluster id onto
    a depth-``QUEUE`` per-row queue (vector ops) and pops its bitstack
    immediately, continuing to traverse (the "policy Q" schedule of
    experiments/multirow_sim.py). Culling then lags behind the queue —
    the stale nearest-t only ENLARGES the visit set, never skips a
    winning cluster, so per-ray results stay exact.
  * leaf phase — fires when every active row has work queued, a queue
    fills, or no row can step. ALL queued ids cross to scalar domain in
    one VMEM->SMEM hop (one ~0.5 us crossing amortized over up to
    8*QUEUE cluster visits), their cluster DMAs are issued up front into
    a double buffer, and each drain step MT-tests 8 rows' clusters at
    once: the (8,R8,128) scratch is transposed sublane-wise so every
    triangle component becomes one static (8,1)-slice lane-broadcast.

Smaller per-row packets visit fewer clusters per ray than the shared
1024-ray union (sim: 31.2 leaf rounds vs 58 visits at width 32 on the
131k knot), which is where the win comes from; the round structure is
what keeps the narrower packets on full-width vector hardware.

Semantics mirror the reference's per-thread stack traversal
(kernels.cu:154-224) exactly per ray; triangle-hit math is op-for-op
ops/pallas_bvh._mt_scalar_tri (intersections.h:54-83).
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
from tpu_pathtracer.ops.pallas_bvh import (_BBOX_T_MIN, _FLT_MAX, ROWS,
                                           build_packet_mesh)

QUEUE = 4          # queued leaf clusters per row (multirow_sim QDEPTH)
_BLOCK_PAIRS = 1024  # node-pairs per (8,128) gather block


class PacketMR(NamedTuple):
    """Device data for the multirow kernel."""
    ntab: jnp.ndarray     # [12, B, 8, 128] f32 child-bounds components of
    # node-pair p at [:, p>>10, (p>>7)&7, p&127]: rows 0-5 left child
    # minx,miny,minz,maxx,maxy,maxz; rows 6-11 right child
    blocks: jnp.ndarray   # [C, 16, 128] f32 cluster triangle data, one
    # cluster per block in the component-per-row layout (row c = component
    # c, lane j = triangle j) so the transposed read keeps static row
    # indices for every width
    tri_feat: jnp.ndarray  # [T, 16] winner feature rows (as PacketMesh)
    cl_first: int         # heap index of the first cluster-level node
    width: int            # triangles per cluster
    n_blocks: int         # B (gather blocks in ntab)


def build_packet_mr(mesh: MeshData, max_width: int = 128) -> PacketMR:
    """Derive the multirow tables from MeshData (same clustering rules as
    build_packet_mesh; see that builder for the width/cl_first math)."""
    pm = build_packet_mesh(mesh, max_width=max_width, quant_nodes=False)
    if pm.cpb != 1 or pm.stride != 128 or pm.width > 128:
        raise ValueError("multirow kernel needs the component-per-row "
                         "block layout (width <= 128, cpb == 1)")
    cl_first = pm.cl_first
    width = pm.width

    # --- node table as gather blocks ---------------------------------
    n_pairs = cl_first                      # parents 1..cl_first-1
    B = max((n_pairs + _BLOCK_PAIRS - 1) // _BLOCK_PAIRS, 1)
    bmin = np.asarray(mesh.bvh_min[:2 * cl_first])
    bmax = np.asarray(mesh.bvh_max[:2 * cl_first])
    tab = np.zeros((12, B * _BLOCK_PAIRS), np.float32)
    p = np.arange(1, cl_first)
    for c in range(3):
        tab[c, p] = bmin[2 * p, c]
        tab[3 + c, p] = bmax[2 * p, c]
        tab[6 + c, p] = bmin[2 * p + 1, c]
        tab[9 + c, p] = bmax[2 * p + 1, c]
    ntab = jnp.asarray(tab.reshape(12, B, 8, 128))

    # --- cluster blocks: component-per-row, one cluster per block -----
    if pm.blocks.shape[0] != cl_first or pm.blocks.shape[1] != 16:
        raise ValueError("unexpected block shape")
    return PacketMR(ntab=ntab, blocks=pm.blocks, tri_feat=pm.tri_feat,
                    cl_first=cl_first, width=width, n_blocks=B)


def _ctz8v(x):
    """(8,1) uint32 count-trailing-zeros via the float exponent of
    x & -x (exact for powers of two; valid while bit 31 is clear —
    bitstack depth < 31 always holds)."""
    xi = x.astype(jnp.int32)
    low = xi & -xi
    bits = jax.lax.bitcast_convert_type(low.astype(jnp.float32), jnp.int32)
    return (bits >> 23) - 127


def _gather_pair(ntab_ref, idxv, B):
    """All 12 child-bounds components of per-row node pairs ``idxv``
    ((8,1) int32) as (8,128) lane-constant tiles, fully in vector
    domain: chained sublane+lane dynamic gathers per block, selected
    across blocks."""
    sub8 = jnp.broadcast_to((idxv >> 7) & 7, (8, 128))
    lane8 = jnp.broadcast_to(idxv & 127, (8, 128))
    blk8 = jnp.broadcast_to(idxv >> 10, (8, 128))
    out = []
    for c in range(12):
        g = None
        for b in range(B):
            tab = ntab_ref[c, b]
            z = jnp.take_along_axis(tab, sub8, axis=0,
                                    mode="promise_in_bounds")
            gb = jnp.take_along_axis(z, lane8, axis=1,
                                     mode="promise_in_bounds")
            g = gb if g is None else jnp.where(blk8 == b, gb, g)
        out.append(g)
    return out[:6], out[6:]


def _slab_rows(b, o1, o2, o3, i1, i2, i3, n1, n2, n3, closest):
    """Per-row slab test: ``b`` components are (8,128) lane-constant
    tiles (each row its own box). Same where-form as pallas_bvh._slab."""
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


def _pop_rows(idxv, bsv):
    """Per-row bitstack pop (kernels.cu:148-152, vectorized over rows)."""
    m = jnp.where(bsv > jnp.uint32(0), _ctz8v(bsv), 0)
    bs_p = (bsv >> m.astype(jnp.uint32)) ^ jnp.uint32(1)
    idx_p = (idxv >> m) ^ 1
    return idx_p, bs_p


def _mt_mr_tri(xt, j, o1, o2, o3, d1, d2, d3, t_min, closest):
    """Möller–Trumbore of triangle ``j`` of each row's own cluster:
    component c of row r's cluster sits at xt[c][r, j] after the sublane
    transpose (component-per-row block layout) — a static (8,1)-slice
    lane-broadcast per operand. Math is op-for-op
    pallas_bvh._mt_scalar_tri."""
    def rd(c):
        if isinstance(j, int):       # unrolled (hardware): static slice
            col = xt[c][:, j:j + 1]
        else:                        # rolled (interpret): traced j
            col = jax.lax.dynamic_slice_in_dim(xt[c], j, 1, axis=1)
        return jnp.broadcast_to(col, o1.shape)

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
    f = 1.0 / jnp.where(parallel, 1.0, a)
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
           | jnp.logical_not(t > t_min) | jnp.logical_not(t < closest))
    return t, u, v, bad


def _kernel_mr(ox, oy, oz, dx, dy, dz, tmax, ntab, blocks,
               *outs, cl_first, width, B, t_min, unroll, shadow):
    R8 = blocks.shape[1]

    def scoped(idbuf, sids, scratch, idsem, sems):
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
        lane = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
        # Layout-anchored zeros: Mosaic layout inference rejects the
        # cond join when one branch returns a fresh splat (replicated
        # vreg) where the other returns computed data ("Invalid
        # relayout ... replicated in destination but not in source").
        # Deriving zeros from ray data (x*0.0 is not foldable for
        # floats) pins every carry to a concrete non-replicated layout.
        fzero = o1 * 0.0                      # (8,128) f32 zeros
        izero_f = fzero.astype(jnp.int32)     # (8,128) i32 zeros
        izero = izero_f[:, :1]                # (8,1)  i32 zeros

        def push_leaves(idxv, bsv, qids, qcnt):
            """Rows at a leaf with queue room push the cluster id and
            pop-continue (policy Q)."""
            at_leaf = idxv >= cl_first
            can = at_leaf & (qcnt < QUEUE)
            cid = idxv - cl_first
            put = jnp.broadcast_to(can, shp) & (lane == qcnt)
            qids = jnp.where(put, jnp.broadcast_to(cid, shp), qids)
            qcnt = qcnt + can.astype(jnp.int32)
            pi, pb = _pop_rows(idxv, bsv)
            idxv = jnp.where(can, pi, idxv)
            bsv = jnp.where(can, pb, bsv)
            return idxv, bsv, qids, qcnt

        def node_round(carry):
            idxv, bsv, qids, qcnt, closest, aux, nb, nsg, nl = carry
            idxv, bsv, qids, qcnt = push_leaves(idxv, bsv, qids, qcnt)
            step = (idxv > 0) & (idxv < cl_first)
            pg = jnp.clip(idxv, 1, cl_first - 1)
            bl, br = _gather_pair(ntab, pg, B)
            lhit = _slab_rows(bl, o1, o2, o3, i1, i2, i3, n1, n2, n3,
                              closest)
            rhit = _slab_rows(br, o1, o2, o3, i1, i2, i3, n1, n2, n3,
                              closest)
            trav_l = lhit < closest
            trav_r = rhit < closest
            both_m = trav_l & trav_r
            pref = jnp.where(both_m, jnp.where(rhit < lhit, 1, -1), 0)
            s_pref = jnp.sum(pref, axis=1, keepdims=True)
            vl = jnp.any(trav_l, axis=1, keepdims=True)
            vr = jnp.any(trav_r, axis=1, keepdims=True)
            swap = (s_pref > 0).astype(jnp.int32)
            both = vl & vr
            single = vl ^ vr
            l2 = pg * 2
            pi, pb = _pop_rows(idxv, bsv)
            child_both = l2 + swap
            child_single = jnp.where(vl, l2, l2 + 1)
            new_idx = jnp.where(both, child_both,
                                jnp.where(single, child_single, pi))
            new_bs = jnp.where(both,
                               (bsv << jnp.uint32(1)) + jnp.uint32(1),
                               jnp.where(single, bsv << jnp.uint32(1),
                                         pb))
            idxv = jnp.where(step, new_idx, idxv)
            bsv = jnp.where(step, new_bs, bsv)
            nb = nb + jnp.where(step & both, 1, 0)
            nsg = nsg + jnp.where(step & single, 1, 0)
            return (idxv, bsv, qids, qcnt, closest, aux, nb, nsg, nl)

        def leaf_phase(carry):
            idxv, bsv, qids, qcnt, closest, aux, nb, nsg, nl = carry
            # one scalar crossing for the whole queue: ids in lanes
            # [0,QUEUE), per-row count in lane QUEUE
            idbuf[:, :] = jnp.where(lane == QUEUE,
                                    jnp.broadcast_to(qcnt, shp), qids)
            cp = pltpu.make_async_copy(idbuf, sids, idsem)
            cp.start()
            cp.wait()

            def issue(q):
                for r in range(ROWS):
                    @pl.when(sids[r, QUEUE] > q)
                    def _():
                        pltpu.make_async_copy(
                            blocks.at[sids[r, q]],
                            scratch.at[q & 1, r], sems.at[q & 1, r]).start()

            issue(0)
            for q in range(QUEUE):
                if q + 1 < QUEUE:
                    issue(q + 1)
                for r in range(ROWS):
                    @pl.when(sids[r, QUEUE] > q)
                    def _():
                        pltpu.make_async_copy(
                            blocks.at[sids[r, q]],
                            scratch.at[q & 1, r], sems.at[q & 1, r]).wait()
                xt = jnp.swapaxes(scratch[q & 1], 0, 1)  # (16, 8, 128)
                has = qcnt > q                            # (8,1)
                cidv = qids[:, q:q + 1]
                nl = nl + has.astype(jnp.int32)

                def tri(j, st):
                    closest, aux = st
                    t, u, v, bad = _mt_mr_tri(
                        xt, j, o1, o2, o3, d1, d2, d3, t_min, closest)
                    won = jnp.logical_not(bad) & jnp.broadcast_to(has,
                                                                  shp)
                    if shadow:
                        occ = aux
                        occ = jnp.where(won, jnp.int32(1), occ)
                        # any-hit: retire the lane (kernels.cu:207)
                        closest = jnp.where(won, jnp.float32(-1e30),
                                            closest)
                        return (closest, occ)
                    besti, bu, bv = aux
                    closest = jnp.where(won, t, closest)
                    besti = jnp.where(
                        won, jnp.broadcast_to(cidv * width + j, shp),
                        besti)
                    bu = jnp.where(won, u, bu)
                    bv = jnp.where(won, v, bv)
                    return (closest, (besti, bu, bv))

                st = (closest, aux)
                if unroll:
                    for j in range(width):
                        st = tri(j, st)
                else:
                    st = jax.lax.fori_loop(0, width, tri, st)
                closest, aux = st
            qcnt = izero
            if shadow:
                # a fully retired row stops traversing
                dead = jnp.all(closest < 0.0, axis=1, keepdims=True)
                idxv = jnp.where(dead, 0, idxv)
            return (idxv, bsv, qids, qcnt, closest, aux, nb, nsg, nl)

        def fire_and_active(carry):
            idxv, bsv, qids, qcnt, closest, aux, nb, nsg, nl = carry
            at_leaf = idxv >= cl_first
            pending = qcnt > 0
            trav = idxv > 0
            stuck = at_leaf & (qcnt >= QUEUE)
            active = trav | pending
            steppable = trav & jnp.logical_not(stuck)
            fire = (jnp.any(pending)
                    & (jnp.all(pending | jnp.logical_not(active))
                       | jnp.any(qcnt >= QUEUE)
                       | jnp.logical_not(jnp.any(steppable))))
            return fire, jnp.any(active)

        def body(carry):
            fire, _ = fire_and_active(carry)
            return jax.lax.cond(fire, leaf_phase, node_round, carry)

        def cond(carry):
            _, act = fire_and_active(carry)
            return act

        if shadow:
            aux0 = izero_f
        else:
            aux0 = (izero_f - 1, fzero, fzero)
        init = (izero + 1, (izero + 1).astype(jnp.uint32),
                izero_f, izero, tmax[:, :], aux0,
                izero, izero, izero)
        out = jax.lax.while_loop(cond, body, init)
        _, _, _, _, closest, aux, nb, nsg, nl = out
        ii = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
        cnt = jnp.where(ii == 0, jnp.broadcast_to(nb, shp),
                        jnp.where(ii == 1, jnp.broadcast_to(nsg, shp),
                                  jnp.where(ii == 2,
                                            jnp.broadcast_to(nl, shp),
                                            0)))
        if shadow:
            occ_out, cnt_out = outs
            occ_out[:, :] = aux
            cnt_out[:, :] = cnt
        else:
            tri_out, feat_out, cnt_out = outs
            besti, bu, bv = aux
            tri_out[:, :] = besti
            feat_out[0, :, :] = closest
            feat_out[1, :, :] = bu
            feat_out[2, :, :] = bv
            cnt_out[:, :] = cnt

    pl.run_scoped(
        scoped,
        idbuf=pltpu.VMEM((ROWS, 128), jnp.int32),
        sids=pltpu.SMEM((ROWS, 128), jnp.int32),
        scratch=pltpu.VMEM((2, ROWS, R8, 128), jnp.float32),
        idsem=pltpu.SemaphoreType.DMA(()),
        sems=pltpu.SemaphoreType.DMA((2, ROWS)))


def _pad_rays(a, fill, n_pad):
    n = a.shape[0]
    if n_pad != n:
        a = jnp.concatenate([a, jnp.full((n_pad - n,), fill, a.dtype)])
    return a.reshape(-1, 128)


@functools.partial(jax.jit, static_argnames=("cl_first", "width", "B",
                                             "t_min", "interpret"))
def packet_trace_mr(origin, direction, t_max, ntab, blocks, tri_feat,
                    cl_first: int, width: int, B: int, t_min: float,
                    interpret: bool = False):
    """Nearest-hit multirow traversal; same result contract as
    ops.pallas_bvh.packet_trace (dense [N] outputs; tri_id=-1 on miss;
    (nodes_both, nodes_single, leaf_visits) telemetry)."""
    n = origin.x.shape[0]
    n_pad = ((n + ROWS * 128 - 1) // (ROWS * 128)) * (ROWS * 128)
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    args = [
        _pad_rays(origin.x, 0.0, n_pad), _pad_rays(origin.y, 0.0, n_pad),
        _pad_rays(origin.z, 0.0, n_pad),
        _pad_rays(direction.x, 1.0, n_pad),
        _pad_rays(direction.y, 0.0, n_pad),
        _pad_rays(direction.z, 0.0, n_pad),
        _pad_rays(t_max_b, 0.0, n_pad),  # pad lanes: closest=0 -> inert
        ntab, blocks,
    ]
    n_packets = n_pad // (ROWS * 128)
    ray_spec = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    ntab_spec = pl.BlockSpec(ntab.shape, lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    blk_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    tri, feat, cnt = pl.pallas_call(
        functools.partial(_kernel_mr, cl_first=cl_first, width=width,
                          B=B, t_min=float(t_min), unroll=not interpret,
                          shadow=False),
        grid=(n_packets,),
        in_specs=[ray_spec] * 7 + [ntab_spec, blk_spec],
        out_specs=(ray_spec,
                   pl.BlockSpec((3, ROWS, 128), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM),
                   ray_spec),
        out_shape=(jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32),
                   jax.ShapeDtypeStruct((3, n_pad // 128, 128),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
    )(*args)
    tri = tri.reshape(-1)[:n]
    f = feat.reshape(3, -1)[:, :n]
    nodes_both = cnt[:, 0].sum()
    nodes_single = cnt[:, 1].sum()
    leaf_visits = cnt[:, 2].sum()
    t, u, v = f[0], f[1], f[2]
    fr = tri_feat[jnp.maximum(tri, 0)]
    nx, ny, nz = fr[:, 0], fr[:, 1], fr[:, 2]
    mid = fr[:, 9].astype(jnp.int32)
    w0 = 1.0 - u - v
    tu = u * fr[:, 5] + v * fr[:, 7] + w0 * fr[:, 3]
    tv = u * fr[:, 6] + v * fr[:, 8] + w0 * fr[:, 4]
    return ((t, tri, u, v, nx, ny, nz, tu, tv, mid),
            (nodes_both, nodes_single, leaf_visits))


@functools.partial(jax.jit, static_argnames=("cl_first", "width", "B",
                                             "t_min", "interpret"))
def packet_occluded_mr(origin, direction, t_max, ntab, blocks,
                       cl_first: int, width: int, B: int, t_min: float,
                       interpret: bool = False):
    """Any-hit multirow traversal: ([N] bool occluded, telemetry)."""
    n = origin.x.shape[0]
    n_pad = ((n + ROWS * 128 - 1) // (ROWS * 128)) * (ROWS * 128)
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    args = [
        _pad_rays(origin.x, 0.0, n_pad), _pad_rays(origin.y, 0.0, n_pad),
        _pad_rays(origin.z, 0.0, n_pad),
        _pad_rays(direction.x, 1.0, n_pad),
        _pad_rays(direction.y, 0.0, n_pad),
        _pad_rays(direction.z, 0.0, n_pad),
        # pad lanes: closest<0 -> retired immediately
        _pad_rays(t_max_b, -1.0, n_pad),
        ntab, blocks,
    ]
    n_packets = n_pad // (ROWS * 128)
    ray_spec = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    ntab_spec = pl.BlockSpec(ntab.shape, lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    blk_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    occ, cnt = pl.pallas_call(
        functools.partial(_kernel_mr, cl_first=cl_first, width=width,
                          B=B, t_min=float(t_min), unroll=not interpret,
                          shadow=True),
        grid=(n_packets,),
        in_specs=[ray_spec] * 7 + [ntab_spec, blk_spec],
        out_specs=(ray_spec, ray_spec),
        out_shape=(jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32),
                   jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
    )(*args)
    return (occ.reshape(-1)[:n] != 0,
            (cnt[:, 0].sum(), cnt[:, 1].sum(), cnt[:, 2].sum()))
