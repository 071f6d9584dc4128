"""Explicit-stack packet traversal over SAH BVH4 tables.

The production heap kernel (ops/pallas_bvh.py) encodes pending subtrees
in a uint32 bitstack, which requires the complete pow2 topology the
reference uses (kernels.cu:148-224).  This kernel trades the bitstack
for a small scalar SMEM stack of child *refs*, which frees the tree
shape entirely: the binned-SAH BVH4 built by ops/bvh4.py (variable
leaf sizes, variable depth, 4-wide nodes) is what the topology
simulation says irregular-density meshes want (terrain 1.25-1.7x,
PERFORMANCE.md round 3).

Per node step (one vector->scalar vote round trip, the measured
~300 ns latency floor):

  * 24 bounds + 4 refs scalar SMEM loads (the whole table is DMA'd
    HBM->SMEM once per packet, like the heap kernel's flat table),
  * 4 slab tests over the (8,128) lane tile + the same packed vote
    reductions the heap kernel's 4-ary grandchild step uses
    (_quad_votes — pair-vs-pair then within-pair, matching the
    binary near-first order of kernels.cu:183-187),
  * descend to the majority-nearest hit child; push the other hit
    children far-first onto the SMEM stack (up to 3 predicated
    scalar stores — a push is a store at the stack top plus a
    predicate-gated pointer bump, so dead stores land above the live
    top and are never read).

Leaf visits (ref < 0) DMA the cluster block and run the same fully
unrolled scalar-broadcast MT loop as the heap kernel — results are
per-lane exact for the identical reasons (per-lane nearest masking),
and t is bit-equal to the heap path (the winning t is a min over the
same accepted set; only exact-t ties between distinct triangles could
pick a different winner id).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pathtracer.ops.pallas_bvh import (_mt_scalar_tri, _node_bounds4,
                                           _pad_rays, _quad_votes, _slab,
                                           winner_features)

_FLT_MAX = 3.4028235e38
ROWS = 8


def _stack_apply4(r0, r1, r2, r3, pk1, pk2, pk3, s_cd, n_lanes):
    """Consume the four packed votes: pick the majority-nearest hit
    child and order the remaining hit children for far-first pushes.

    Returns (any_hit, chosen_ref, ((ref, pred) pushes far-first),
    nb_inc, nsg_inc).  Vote semantics follow _quad_apply: pair L =
    slots 0,1, pair R = slots 2,3; swap_* votes mean "the second
    operand is nearer for the majority of lanes hitting both".
    """
    va = (pk1 & 0xFFFF) > 0
    vb = (pk1 >> 16) > 0
    vc = (pk2 & 0xFFFF) > 0
    vd = (pk2 >> 16) > 0
    swap_lr = (pk3 & 0xFFFF) > n_lanes
    swap_ab = (pk3 >> 16) > n_lanes
    swap_cd = s_cd > n_lanes
    vl = va | vb
    vr = vc | vd
    any_hit = vl | vr
    go_r = jnp.where(vl & vr, swap_lr, vr)
    # chosen pair (c,d) if go_r else (a,b)
    v0c = jnp.where(go_r, vc, va)
    v1c = jnp.where(go_r, vd, vb)
    swap_p = jnp.where(go_r, swap_cd, swap_ab)
    sib = v0c & v1c
    near_1 = jnp.where(sib, swap_p, v1c)  # child 1 of the pair chosen
    p0 = jnp.where(go_r, r2, r0)
    p1 = jnp.where(go_r, r3, r1)
    chosen = jnp.where(near_1, p1, p0)
    sib_ref = jnp.where(near_1, p0, p1)
    # other pair
    vo0 = jnp.where(go_r, va, vc)
    vo1 = jnp.where(go_r, vb, vd)
    swap_o = jnp.where(go_r, swap_ab, swap_cd)
    o0 = jnp.where(go_r, r0, r2)
    o1 = jnp.where(go_r, r1, r3)
    both_o = vo0 & vo1
    onear_1 = jnp.where(both_o, swap_o, vo1)
    o_near = jnp.where(onear_1, o1, o0)
    o_far = jnp.where(onear_1, o0, o1)
    # push far-first so pops run near-first: other-far, other-near,
    # then the chosen pair's sibling (popped first). All predicates
    # are False when !any_hit.
    pushes = ((o_far, both_o), (o_near, vo0 | vo1), (sib_ref, sib))
    nb_inc = (vl & vr).astype(jnp.int32) + sib.astype(jnp.int32)
    nsg_inc = (vl ^ vr).astype(jnp.int32) \
        + (any_hit & (v0c ^ v1c)).astype(jnp.int32)
    return any_hit, chosen, pushes, nb_inc, nsg_inc


def _node_step4(ntab, rtab, stk, cur, sp, closest,
                o1, o2, o3, i1, i2, i3, n1, n2, n3,
                quant=False, qscal=None, spec_probe=False,
                spec=None, spn=None, spc=None,
                pall=None, pmask=None, pnode=None):
    """One BVH4 node step: 4 slab tests, votes, descend + pushes.
    Returns (new_cur, new_sp, nb_inc, nsg_inc[, spn', spc']).
    ``quant`` reads the packed uint16 table through the heap kernel's
    dequant (_node_bounds4: 12 int32 words/node, outward-rounded
    boxes — extra visits possible, hits never missed, results
    unchanged).

    ``spec``: (blocks, blk, s2, rb_rows) — descend-entered leaf
    prefetch (VERDICT r4 item 1a). The child refs are scalar SMEM
    reads available BEFORE the vote round trip; the first leaf ref in
    table order (measured 53-59% of actual leaf descends,
    experiments/leaf_spec_probe.py) is speculatively DMA'd into a
    dedicated 3rd slot so the copy flies under the ~300 ns vote
    stall. A wrong guess costs one 4 KB copy's HBM bandwidth and an
    (amortized, usually-complete) semaphore drain at the next issue —
    not the heap pair-scheme's per-step drain serialization.
    ``spn``/``spc`` carry the pending-speculation state.

    ``spec_probe`` (telemetry only): nb_inc/nsg_inc instead count
    leaf-descends / leaf-descends-where-chosen-equals-the-first-leaf-
    ref-in-table-order — the accuracy of the cheapest pre-vote
    speculative-DMA predictor (VERDICT r4 item 1a sizing)."""
    rb = (cur - 1) * 4
    boxes = _node_bounds4(ntab, rb, quant, qscal)
    h0 = _slab(boxes[0], o1, o2, o3, i1, i2, i3, n1, n2, n3, closest)
    h1 = _slab(boxes[1], o1, o2, o3, i1, i2, i3, n1, n2, n3, closest)
    h2 = _slab(boxes[2], o1, o2, o3, i1, i2, i3, n1, n2, n3, closest)
    h3 = _slab(boxes[3], o1, o2, o3, i1, i2, i3, n1, n2, n3, closest)
    pk1, pk2, pk3, s_cd = _quad_votes(h0, h1, h2, h3, closest)
    r0 = rtab[rb]
    r1 = rtab[rb + 1]
    r2 = rtab[rb + 2]
    r3 = rtab[rb + 3]
    if spec is not None:
        # issue BEFORE any scalar consumption of the votes: the copy
        # starts while the scalar core waits on the vector reductions
        blocks, blk, s2, rbs = spec
        pred_leaf = jnp.where(
            r0 < 0, r0, jnp.where(r1 < 0, r1,
                                  jnp.where(r2 < 0, r2, r3)))
        do_spec = pred_leaf < 0
        nc = -pred_leaf - 1

        @pl.when(spn > 0)
        def _():  # drain the previous unconsumed speculation
            pltpu.make_async_copy(blocks.at[0],
                                  blk.at[pl.ds(2 * rbs, rbs)], s2).wait()

        @pl.when(do_spec)
        def _():
            pltpu.make_async_copy(blocks.at[nc],
                                  blk.at[pl.ds(2 * rbs, rbs)],
                                  s2).start()
        spn = do_spec.astype(jnp.int32)
        spc = jnp.where(do_spec, nc, -1)
    if pall is not None:
        # all-leaf-children issue (the heap pf2 idea on the explicit
        # stack): every leaf child's copy starts pre-vote into its
        # child-slot — the descended leaf AND its later-popped leaf
        # siblings are all guaranteed-covered, zero misprediction.
        # pmask bits = copies in flight, pnode = owning node.
        blocks, blk, csems, rbs = pall
        refs4 = (r0, r1, r2, r3)
        for i in range(4):
            @pl.when(((pmask >> i) & 1) > 0)
            def _(i=i):  # drain unconsumed previous copies
                pltpu.make_async_copy(
                    blocks.at[0],
                    blk.at[pl.ds((2 + i) * rbs, rbs)], csems[i]).wait()
        new_mask = jnp.int32(0)
        for i in range(4):
            ri = refs4[i]
            il = ri < 0

            @pl.when(il)
            def _(i=i, ri=ri):
                pltpu.make_async_copy(
                    blocks.at[-ri - 1],
                    blk.at[pl.ds((2 + i) * rbs, rbs)],
                    csems[i]).start()
            new_mask = new_mask | (il.astype(jnp.int32) << i)
        pmask = new_mask
        pnode = jnp.where(new_mask > 0, cur, 0)
    any_hit, chosen, pushes, nbi, nsgi = _stack_apply4(
        r0, r1, r2, r3, pk1, pk2, pk3, s_cd, h0.size)
    for ref, pred in pushes:
        stk[sp] = ref
        sp = sp + pred.astype(jnp.int32)
    spm = jnp.maximum(sp - 1, 0)
    popped = stk[spm]
    new_cur = jnp.where(any_hit, chosen,
                        jnp.where(sp > 0, popped, 0))
    new_sp = jnp.where(any_hit, sp, spm)
    if spec_probe:
        pred_leaf = jnp.where(
            r0 < 0, r0, jnp.where(r1 < 0, r1,
                                  jnp.where(r2 < 0, r2, r3)))
        desc_leaf = any_hit & (chosen < 0)
        nbi = desc_leaf.astype(jnp.int32)
        nsgi = (desc_leaf & (chosen == pred_leaf)).astype(jnp.int32)
    if pall is not None:
        return new_cur, new_sp, nbi, nsgi, pmask, pnode
    if spec is not None:
        return new_cur, new_sp, nbi, nsgi, spn, spc
    return new_cur, new_sp, nbi, nsgi


def _stack_pop(stk, sp):
    spm = jnp.maximum(sp - 1, 0)
    popped = stk[spm]
    return jnp.where(sp > 0, popped, 0), spm


def _leaf_dma_helpers(blocks, blk, sem, s0, s1, stk, rb=16):
    """Shared double-buffer leaf DMA for the explicit-stack kernels.

    The explicit ref stack makes leaf prefetch NON-speculative: when a
    leaf visit pops the stack and the new top is itself a leaf ref, that
    cluster is GUARANTEED to be the next visit (the fused body goes
    straight back into leaf_fn), so its DMA can start before this
    visit's MT loop and complete under it — no misprediction, no drain
    traffic (the two failure modes that capped the heap kernel's
    speculative pair prefetch at −3% e2e). Two 16-row slots in one
    (32,128) SMEM buffer; the MT loop addresses the active slot via a
    per-visit hoisted row base (the heap pf kernel's proven pattern).

    Returns (consume, issue):
      consume(c, pfon, par) -> slot  — wait/sync-load cluster ``c``
      issue(sp) -> (pfon', par', drain) — peek the stack top and start
        its DMA into the other slot; ``drain(pred)`` force-waits the
        just-issued copy under ``pred`` (shadow early-exit).
    """
    def consume(c, pfon, par):
        pf_b = pfon > 0
        cur_slot = jnp.where(pf_b, par, 0)

        @pl.when(pf_b & (par == 0))
        def _():
            pltpu.make_async_copy(blocks.at[0], blk.at[pl.ds(0, rb)],
                                  s0).wait()

        @pl.when(pf_b & (par == 1))
        def _():
            pltpu.make_async_copy(blocks.at[0], blk.at[pl.ds(rb, rb)],
                                  s1).wait()

        @pl.when(jnp.logical_not(pf_b))
        def _():
            dma = pltpu.make_async_copy(blocks.at[c],
                                        blk.at[pl.ds(0, rb)], sem)
            dma.start()
            dma.wait()
        return cur_slot

    def issue(sp, cur_slot):
        nxt = jnp.where(sp > 0, stk[jnp.maximum(sp - 1, 0)], 0)
        do_pf = nxt < 0
        nc = -nxt - 1
        # any slot in {0,1} not in use; cur_slot may be 2 (the spec
        # slot), in which case both are free
        pf_slot = jnp.where(cur_slot == 0, 1, 0)

        @pl.when(do_pf & (pf_slot == 0))
        def _():
            pltpu.make_async_copy(blocks.at[nc], blk.at[pl.ds(0, rb)],
                                  s0).start()

        @pl.when(do_pf & (pf_slot == 1))
        def _():
            pltpu.make_async_copy(blocks.at[nc], blk.at[pl.ds(rb, rb)],
                                  s1).start()

        def drain(pred):
            @pl.when(pred & do_pf & (pf_slot == 0))
            def _():
                pltpu.make_async_copy(blocks.at[0],
                                      blk.at[pl.ds(0, rb)], s0).wait()

            @pl.when(pred & do_pf & (pf_slot == 1))
            def _():
                pltpu.make_async_copy(blocks.at[0],
                                      blk.at[pl.ds(rb, rb)], s1).wait()

        return do_pf.astype(jnp.int32), pf_slot, drain

    return consume, issue


def _kernel_nearest4(ox, oy, oz, dx, dy, dz, tmax, bounds, refs, *rest,
                     width, t_min, unroll, stack_cap, prefetch,
                     quant=False, scratch=False, spec_probe=False,
                     spec=False, pair=False):
    rest = list(rest)
    qp = rest.pop(0) if quant else None
    blocks, tri_out, feat_out, cnt_out = rest
    rb = blocks.shape[1]               # 8 = packed layout, 16 = legacy
    stride = width if rb == 8 else 128
    assert not spec or prefetch, "spec requires the prefetch slots"
    assert not pair or prefetch, "pair requires the prefetch slots"
    assert not (spec and pair), "spec and pair share carry slots"

    pid0 = pl.program_id(0) == 0  # first grid step: table DMA runs once
    def scoped(blk, sem, ntab, rtab, stk, s0=None, s1=None, s2=None,
               c0=None, c1=None, c2=None, c3=None,
               cls=None, bst=None):
        csems = (c0, c1, c2, c3)
        # SMEM scratch persists across the sequential grid steps (the
        # accumulator-pattern guarantee), so the node/ref tables are
        # copied ONCE per pallas_call instead of once per packet —
        # saves (n_packets-1) x table-DMA (105-400 KB each)
        @pl.when(pid0)
        def _():
            nd = pltpu.make_async_copy(bounds, ntab, sem)
            nd.start()
            nd.wait()
            rd_ = pltpu.make_async_copy(refs, rtab, sem)
            rd_.start()
            rd_.wait()
        qscal = tuple(qp[i] for i in range(6)) if quant else None
        if prefetch:
            pf_consume, pf_issue = _leaf_dma_helpers(
                blocks, blk, sem, s0, s1, stk, rb=rb)
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
        if scratch:
            # mutable per-lane state lives in VMEM scratch instead of
            # the while-loop carry: the node/leaf lax.cond joins then
            # carry only scalars, so no (8,128) tile has to be
            # materialized/relaid-out at the two branch boundaries of
            # every trip (the measured per-trip serialization is the
            # leaf-phase bound — PERFORMANCE.md round 3).
            cls[:, :] = tmax[:, :]
            bst[:, :] = jnp.full(shp, -1, jnp.int32)

        def node_fn(carry):
            if scratch:
                cur, sp, nb, nsg, nl, nlp, pfon, par, spn, spc = carry
                closest = cls[:, :]
            else:
                (cur, sp, nb, nsg, nl, nlp, closest, besti, pfon, par,
                 spn, spc) = carry
            if pair:
                # spn/spc carry slots hold pmask/pnode in pair mode
                new_cur, new_sp, nbi, nsgi, spn, spc = _node_step4(
                    ntab, rtab, stk, cur, sp, closest,
                    o1, o2, o3, i1, i2, i3, n1, n2, n3, quant, qscal,
                    spec_probe=spec_probe,
                    pall=(blocks, blk, csems, rb), pmask=spn, pnode=spc)
            elif spec:
                new_cur, new_sp, nbi, nsgi, spn, spc = _node_step4(
                    ntab, rtab, stk, cur, sp, closest,
                    o1, o2, o3, i1, i2, i3, n1, n2, n3, quant, qscal,
                    spec_probe=spec_probe,
                    spec=(blocks, blk, s2, rb), spn=spn, spc=spc)
            else:
                new_cur, new_sp, nbi, nsgi = _node_step4(
                    ntab, rtab, stk, cur, sp, closest,
                    o1, o2, o3, i1, i2, i3, n1, n2, n3, quant, qscal,
                    spec_probe=spec_probe)
            if scratch:
                return (new_cur, new_sp, nb + nbi, nsg + nsgi, nl, nlp,
                        pfon, par, spn, spc)
            return (new_cur, new_sp, nb + nbi, nsg + nsgi, nl, nlp,
                    closest, besti, pfon, par, spn, spc)

        def leaf_fn(carry):
            if scratch:
                cur, sp, nb, nsg, nl, nlp, pfon, par, spn, spc = carry
                closest = cls[:, :]
                besti = bst[:, :]
            else:
                (cur, sp, nb, nsg, nl, nlp, closest, besti, pfon, par,
                 spn, spc) = carry
            c = -cur - 1
            if pair:
                use_pf = pfon > 0
                # match this leaf against the pending children of the
                # issuing node (4 scalar SMEM reads + compares)
                prb = (jnp.maximum(spc, 1) - 1) * 4
                match = jnp.int32(-1)
                for i in range(4):
                    hiti = ((spc > 0) & (((spn >> i) & 1) > 0)
                            & (rtab[prb + i] == cur))
                    match = jnp.where(hiti, i, match)
                use_pl = jnp.logical_not(use_pf) & (match >= 0)
                cur_slot = jnp.where(use_pf, par,
                                     jnp.where(use_pl, 2 + match, 0))

                @pl.when(use_pf & (par == 0))
                def _():
                    pltpu.make_async_copy(blocks.at[0],
                                          blk.at[pl.ds(0, rb)], s0).wait()

                @pl.when(use_pf & (par == 1))
                def _():
                    pltpu.make_async_copy(blocks.at[0],
                                          blk.at[pl.ds(rb, rb)],
                                          s1).wait()
                for i in range(4):
                    @pl.when(use_pl & (match == i))
                    def _(i=i):
                        pltpu.make_async_copy(
                            blocks.at[0],
                            blk.at[pl.ds((2 + i) * rb, rb)],
                            csems[i]).wait()

                @pl.when(jnp.logical_not(use_pf)
                         & jnp.logical_not(use_pl))
                def _():
                    dma = pltpu.make_async_copy(blocks.at[c],
                                                blk.at[pl.ds(0, rb)],
                                                sem)
                    dma.start()
                    dma.wait()
                spn = jnp.where(
                    use_pl,
                    spn & jnp.bitwise_not(
                        jnp.int32(1) << jnp.maximum(match, 0)),
                    spn)
                new_pfon, new_par, _drain = pf_issue(sp, cur_slot)
                base = cur_slot * rb
                mt_rows = [base + r for r in range(rb)]
            elif spec:
                use_pf = pfon > 0
                use_spec = jnp.logical_not(use_pf) & (spn > 0) & (spc == c)
                cur_slot = jnp.where(use_pf, par,
                                     jnp.where(use_spec, 2, 0))

                @pl.when(use_pf & (par == 0))
                def _():
                    pltpu.make_async_copy(blocks.at[0],
                                          blk.at[pl.ds(0, rb)], s0).wait()

                @pl.when(use_pf & (par == 1))
                def _():
                    pltpu.make_async_copy(blocks.at[0],
                                          blk.at[pl.ds(rb, rb)],
                                          s1).wait()

                @pl.when(use_spec)
                def _():
                    pltpu.make_async_copy(blocks.at[0],
                                          blk.at[pl.ds(2 * rb, rb)],
                                          s2).wait()

                @pl.when(jnp.logical_not(use_pf)
                         & jnp.logical_not(use_spec))
                def _():
                    dma = pltpu.make_async_copy(blocks.at[c],
                                                blk.at[pl.ds(0, rb)],
                                                sem)
                    dma.start()
                    dma.wait()
                spn = jnp.where(use_spec, 0, spn)
                new_pfon, new_par, _drain = pf_issue(sp, cur_slot)
                base = cur_slot * rb
                mt_rows = [base + r for r in range(rb)]
            elif prefetch:
                cur_slot = pf_consume(c, pfon, par)
                new_pfon, new_par, _drain = pf_issue(sp, cur_slot)
                base = cur_slot * rb
                mt_rows = [base + r for r in range(rb)]
            else:
                dma = pltpu.make_async_copy(blocks.at[c], blk, sem)
                dma.start()
                dma.wait()
                new_pfon, new_par = pfon, par
                mt_rows = None

            def tri(w, st):
                closest, besti = st
                t, u, v, bad = _mt_scalar_tri(
                    blk, 0, w, stride, o1, o2, o3, d1, d2, d3,
                    t_min, closest, rows=mt_rows)
                closest = jnp.where(bad, closest, t)
                besti = jnp.where(bad, besti, c * width + w)
                return (closest, besti)

            st = (closest, besti)
            if unroll:
                for w in range(width):
                    st = tri(w, st)
            else:
                st = jax.lax.fori_loop(0, width, tri, st)
            closest, besti = st
            new_cur, new_sp = _stack_pop(stk, sp)
            # split telemetry: visits whose NEXT visit is entered by
            # popping a leaf straight off the stack (= the visits the
            # non-speculative double-buffer prefetch covers); nl - nlp
            # visits are descend/node-pop-entered and pay the sync DMA
            nlp = nlp + (new_cur < 0).astype(jnp.int32)
            if scratch:
                cls[:, :] = closest
                bst[:, :] = besti
                return (new_cur, new_sp, nb, nsg, nl + 1, nlp,
                        new_pfon, new_par, spn, spc)
            return (new_cur, new_sp, nb, nsg, nl + 1, nlp, closest,
                    besti, new_pfon, new_par, spn, spc)

        # fused body (same trick as the heap kernel): a node step that
        # descends into a leaf runs the MT visit in the same trip
        def body(carry):
            carry = jax.lax.cond(carry[0] > 0, node_fn,
                                 lambda c: c, carry)
            return jax.lax.cond(carry[0] < 0, leaf_fn,
                                lambda c: c, carry)

        def cond(carry):
            return carry[0] != 0

        if scratch:
            init = (jnp.int32(1), jnp.int32(0), jnp.int32(0),
                    jnp.int32(0), jnp.int32(0), jnp.int32(0),
                    jnp.int32(0), jnp.int32(0), jnp.int32(0),
                    jnp.int32(-1))
            _, _, nb, nsg, nl, nlp, _, _, fspn, _ = jax.lax.while_loop(
                cond, body, init)
            closest = cls[:, :]
            besti = bst[:, :]
        else:
            init = (jnp.int32(1), jnp.int32(0), jnp.int32(0),
                    jnp.int32(0), jnp.int32(0), jnp.int32(0),
                    tmax[:, :],
                    jnp.full(shp, -1, jnp.int32),
                    jnp.int32(0), jnp.int32(0), jnp.int32(0),
                    jnp.int32(-1))
            (_, _, nb, nsg, nl, nlp, closest, besti, _,
             _, fspn, _) = jax.lax.while_loop(cond, body, init)
        if spec:
            # a speculation issued on the final node step may still be
            # in flight — balance its semaphore before the grid step
            # ends (the scratch persists into the next packet)
            @pl.when(fspn > 0)
            def _():
                pltpu.make_async_copy(blocks.at[0],
                                      blk.at[pl.ds(2 * rb, rb)],
                                      s2).wait()
        if pair:
            # balance any still-pending child copies
            for i in range(4):
                @pl.when(((fspn >> i) & 1) > 0)
                def _(i=i):
                    pltpu.make_async_copy(
                        blocks.at[0],
                        blk.at[pl.ds((2 + i) * rb, rb)],
                        csems[i]).wait()
        ii = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
        cnt_out[:, :] = jnp.where(
            (ii == 0) & (jj == 0), nb,
            jnp.where((ii == 0) & (jj == 1), nsg,
                      jnp.where((ii == 0) & (jj == 2), nl,
                                jnp.where((ii == 0) & (jj == 3), nlp,
                                          0))))
        tri_out[:, :] = besti
        feat_out[:, :] = closest

    nslots = 6 if pair else (3 if spec else (2 if prefetch else 1))
    kw = dict(blk=pltpu.SMEM((nslots * blocks.shape[1], 128) if prefetch
                             else blocks.shape[1:],
                             jnp.float32),
              sem=pltpu.SemaphoreType.DMA(()),
              ntab=pltpu.SMEM(bounds.shape,
                              jnp.int32 if quant else jnp.float32),
              rtab=pltpu.SMEM(refs.shape, jnp.int32),
              stk=pltpu.SMEM((stack_cap,), jnp.int32))
    if prefetch:
        kw["s0"] = pltpu.SemaphoreType.DMA(())
        kw["s1"] = pltpu.SemaphoreType.DMA(())
    if spec:
        kw["s2"] = pltpu.SemaphoreType.DMA(())
    if pair:
        for nm in ("c0", "c1", "c2", "c3"):
            kw[nm] = pltpu.SemaphoreType.DMA(())
    if scratch:
        kw["cls"] = pltpu.VMEM((ROWS, 128), jnp.float32)
        kw["bst"] = pltpu.VMEM((ROWS, 128), jnp.int32)
    pl.run_scoped(scoped, **kw)


def _kernel_shadow4(ox, oy, oz, dx, dy, dz, tmax, bounds, refs, *rest,
                    width, t_min, unroll, stack_cap, prefetch,
                    quant=False, scratch=False):
    rest = list(rest)
    qp = rest.pop(0) if quant else None
    blocks, occ_out, cnt_out = rest
    rb = blocks.shape[1]               # 8 = packed layout, 16 = legacy
    stride = width if rb == 8 else 128

    pid0 = pl.program_id(0) == 0  # first grid step: table DMA runs once
    def scoped(blk, sem, ntab, rtab, stk, s0=None, s1=None,
               cls=None, occr=None):
        # SMEM scratch persists across the sequential grid steps (the
        # accumulator-pattern guarantee), so the node/ref tables are
        # copied ONCE per pallas_call instead of once per packet —
        # saves (n_packets-1) x table-DMA (105-400 KB each)
        @pl.when(pid0)
        def _():
            nd = pltpu.make_async_copy(bounds, ntab, sem)
            nd.start()
            nd.wait()
            rd_ = pltpu.make_async_copy(refs, rtab, sem)
            rd_.start()
            rd_.wait()
        qscal = tuple(qp[i] for i in range(6)) if quant else None
        if prefetch:
            pf_consume, pf_issue = _leaf_dma_helpers(
                blocks, blk, sem, s0, s1, stk, rb=rb)
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
        if scratch:
            cls[:, :] = tmax[:, :]
            occr[:, :] = jnp.zeros(shp, jnp.int32)

        def node_fn(carry):
            if scratch:
                cur, sp, nb, nsg, nl, nlp, pfon, par = carry
                closest = cls[:, :]
            else:
                cur, sp, nb, nsg, nl, nlp, closest, occ, pfon, par = carry
            new_cur, new_sp, nbi, nsgi = _node_step4(
                ntab, rtab, stk, cur, sp, closest,
                o1, o2, o3, i1, i2, i3, n1, n2, n3, quant, qscal)
            if scratch:
                return (new_cur, new_sp, nb + nbi, nsg + nsgi, nl, nlp,
                        pfon, par)
            return (new_cur, new_sp, nb + nbi, nsg + nsgi, nl, nlp,
                    closest, occ, pfon, par)

        def leaf_fn(carry):
            if scratch:
                cur, sp, nb, nsg, nl, nlp, pfon, par = carry
                closest = cls[:, :]
                occ = occr[:, :]
            else:
                cur, sp, nb, nsg, nl, nlp, closest, occ, pfon, par = carry
            c = -cur - 1
            if prefetch:
                cur_slot = pf_consume(c, pfon, par)
                new_pfon, new_par, drain = pf_issue(sp, cur_slot)
                base = cur_slot * rb
                mt_rows = [base + r for r in range(rb)]
            else:
                dma = pltpu.make_async_copy(blocks.at[c], blk, sem)
                dma.start()
                dma.wait()
                new_pfon, new_par = pfon, par
                mt_rows = None

            def tri(w, st):
                closest, occ = st
                t, u, v, bad = _mt_scalar_tri(
                    blk, 0, w, stride, o1, o2, o3, d1, d2, d3,
                    t_min, closest, rows=mt_rows)
                occ = jnp.where(bad, occ, jnp.int32(1))
                # retire the lane: closest < 0 fails every further test
                closest = jnp.where(bad, closest, jnp.float32(-1e30))
                return (closest, occ)

            st = (closest, occ)
            if unroll:
                for w in range(width):
                    st = tri(w, st)
            else:
                st = jax.lax.fori_loop(0, width, tri, st)
            closest, occ = st
            new_cur, new_sp = _stack_pop(stk, sp)
            # all lanes retired -> exit (any-hit early out,
            # kernels.cu:207 lifted to the packet)
            ndone = jnp.all(closest < 0.0)
            if prefetch:
                # the early exit abandons the loop with the just-issued
                # prefetch in flight — drain it so the kernel's DMA
                # semaphores balance
                drain(ndone)
                new_pfon = jnp.where(ndone, 0, new_pfon)
            new_cur = jnp.where(ndone, 0, new_cur)
            nlp = nlp + (new_cur < 0).astype(jnp.int32)
            if scratch:
                cls[:, :] = closest
                occr[:, :] = occ
                return (new_cur, new_sp, nb, nsg, nl + 1, nlp,
                        new_pfon, new_par)
            return (new_cur, new_sp, nb, nsg, nl + 1, nlp, closest, occ,
                    new_pfon, new_par)

        def body(carry):
            carry = jax.lax.cond(carry[0] > 0, node_fn,
                                 lambda c: c, carry)
            return jax.lax.cond(carry[0] < 0, leaf_fn,
                                lambda c: c, carry)

        def cond(carry):
            return carry[0] != 0

        if scratch:
            init = (jnp.int32(1), jnp.int32(0), jnp.int32(0),
                    jnp.int32(0), jnp.int32(0), jnp.int32(0),
                    jnp.int32(0), jnp.int32(0))
            _, _, nb, nsg, nl, nlp, _, _ = jax.lax.while_loop(
                cond, body, init)
            occ = occr[:, :]
        else:
            init = (jnp.int32(1), jnp.int32(0), jnp.int32(0),
                    jnp.int32(0), jnp.int32(0), jnp.int32(0),
                    tmax[:, :],
                    jnp.zeros(shp, jnp.int32),
                    jnp.int32(0), jnp.int32(0))
            _, _, nb, nsg, nl, nlp, _, occ, _, _ = jax.lax.while_loop(
                cond, body, init)
        ii = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
        occ_out[:, :] = occ
        cnt_out[:, :] = jnp.where(
            (ii == 0) & (jj == 0), nb,
            jnp.where((ii == 0) & (jj == 1), nsg,
                      jnp.where((ii == 0) & (jj == 2), nl,
                                jnp.where((ii == 0) & (jj == 3), nlp,
                                          0))))

    kw = dict(blk=pltpu.SMEM((2 * blocks.shape[1], 128) if prefetch
                             else blocks.shape[1:],
                             jnp.float32),
              sem=pltpu.SemaphoreType.DMA(()),
              ntab=pltpu.SMEM(bounds.shape,
                              jnp.int32 if quant else jnp.float32),
              rtab=pltpu.SMEM(refs.shape, jnp.int32),
              stk=pltpu.SMEM((stack_cap,), jnp.int32))
    if prefetch:
        kw["s0"] = pltpu.SemaphoreType.DMA(())
        kw["s1"] = pltpu.SemaphoreType.DMA(())
    if scratch:
        kw["cls"] = pltpu.VMEM((ROWS, 128), jnp.float32)
        kw["occr"] = pltpu.VMEM((ROWS, 128), jnp.int32)
    pl.run_scoped(scoped, **kw)


@functools.partial(jax.jit, static_argnames=("width", "t_min",
                                             "interpret", "stack_cap",
                                             "prefetch", "quant",
                                             "scratch", "spec_probe",
                                             "spec", "pair"))
def packet_trace4(origin, direction, t_max, bounds, refs, blocks,
                  tri_feat, width: int, t_min: float,
                  stack_cap: int, interpret: bool = False,
                  prefetch: bool = False, quant: bool = False,
                  qparams=None, scratch: bool = False,
                  spec_probe: bool = False, spec: bool = False,
                  pair: bool = False):
    """Nearest-hit BVH4 packet traversal (see packet_trace for the
    output contract), with two differences: tri ids are in SAH
    cluster-slot space, and the counter tuple has a FOURTH element
    (nodes_both, nodes_single, leaf_visits, leaf_pop) — leaf_pop is
    the subset of visits entered by popping a leaf straight off the
    stack (the pop-vs-descend split telemetry, VERDICT r4 item 1b;
    the heap kernels return 3-tuples — callers index, they must not
    fixed-arity unpack across tiers).  ``quant``: ``bounds`` is the
    packed uint16 table (ops/bvh4._quantize4) and ``qparams`` the [8]
    f32 dequant scales/offsets, riding SMEM like the heap kernel's."""
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
        bounds, refs,
    ] + ([qparams] if quant else []) + [blocks]
    n_packets = n_pad // (ROWS * 128)
    ray_spec = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    qspec = [pl.BlockSpec(memory_space=pltpu.SMEM)] if quant else []
    kernel = functools.partial(
        _kernel_nearest4, width=width, t_min=float(t_min),
        unroll=not interpret, stack_cap=stack_cap, prefetch=prefetch,
        quant=quant, scratch=scratch, spec_probe=spec_probe,
        spec=spec, pair=pair)
    tri, feat, cnt = pl.pallas_call(
        kernel,
        grid=(n_packets,),
        in_specs=[ray_spec] * 7 + [hbm, hbm] + qspec + [hbm],
        out_specs=(ray_spec, ray_spec, ray_spec),
        out_shape=(jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32),
                   jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
    )(*args)
    tri = tri.reshape(-1)[:n]
    t = feat.reshape(-1)[:n]
    cnts = (cnt[::ROWS, 0].sum(), cnt[::ROWS, 1].sum(),
            cnt[::ROWS, 2].sum(), cnt[::ROWS, 3].sum())
    return winner_features(origin, direction, t, tri, tri_feat), cnts


@functools.partial(jax.jit, static_argnames=("width", "t_min",
                                             "interpret", "stack_cap",
                                             "prefetch", "quant",
                                             "scratch"))
def packet_occluded4(origin, direction, t_max, bounds, refs, blocks,
                     width: int, t_min: float, stack_cap: int,
                     interpret: bool = False, prefetch: bool = False,
                     quant: bool = False, qparams=None,
                     scratch: bool = False):
    """Any-hit BVH4 packet traversal (see packet_occluded; counters
    are the 4-tuple of packet_trace4 — leaf_pop last)."""
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
        bounds, refs,
    ] + ([qparams] if quant else []) + [blocks]
    n_packets = n_pad // (ROWS * 128)
    ray_spec = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    qspec = [pl.BlockSpec(memory_space=pltpu.SMEM)] if quant else []
    kernel = functools.partial(
        _kernel_shadow4, width=width, t_min=float(t_min),
        unroll=not interpret, stack_cap=stack_cap, prefetch=prefetch,
        quant=quant, scratch=scratch)
    occ, cnt = pl.pallas_call(
        kernel,
        grid=(n_packets,),
        in_specs=[ray_spec] * 7 + [hbm, hbm] + qspec + [hbm],
        out_specs=(ray_spec, ray_spec),
        out_shape=(jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32),
                   jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
    )(*args)
    return (occ.reshape(-1)[:n] != 0,
            (cnt[::ROWS, 0].sum(), cnt[::ROWS, 1].sum(),
             cnt[::ROWS, 2].sum(), cnt[::ROWS, 3].sum()))
