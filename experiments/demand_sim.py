"""CPU simulation: leaf-visit DEMAND regrouping vs packet-union visits.

The measured round-3 bound: a 1024-lane packet's leaf phase processes
the UNION of its lanes' demanded leaf clusters (bounce packets: 128
visits/pkt on the knot vs ~30 coherent), and every visit MT-tests all
1024 lanes against all `width` triangles. A regrouped architecture
would instead materialize per-lane (ray, leaf) DEMAND pairs, sort by
leaf id, and MT-test dense 1024-pair tiles — paying sort/gather
overhead per pair but doing only demanded work.

Whether that can win hinges on two numbers this sim measures on the
production complete tree (same votes/near-first ordering as the
kernel, ``topo_sim.trace_packet``):

1. pairs/1024 vs union visits: the ideal work ratio. A lane "demands"
   a leaf iff its own slab test against the leaf box passes under its
   CURRENT committed closest (the kernel MT-tests every lane
   regardless; demand is what a regrouped MT tile would have to do).
2. demand inflation under DEFERRED closest commits: batching breaks
   the visit->closest->prune feedback loop. ``commit_every=K`` commits
   pending closest updates only every K leaf visits (K=1 is the
   packet status quo; K=inf is enumerate-then-test). Node culling and
   MT accepts both use the stale committed value, so steps AND demand
   inflate — this is the architectural price of regrouping.

Verdict math: regroup leaf-phase cost per 1024 rays
    TRI_NS * width * (pairs/1024)  +  OVH * pairs
vs the production  TRI_NS * width * visits. The break-even OVH
(ns/pair) is printed; the measured TPU floor for sort+rowgather+
scatter-min round trips is ~25-60 ns/pair (PERFORMANCE.md cost model:
row gathers 2.4-9 ns/lane x 2 directions, lax.sort with payloads
~5 ns/elem, plus per-ray min reduce) — if break-even OVH is below
that, regrouping is dead on arrival.

Usage: JAX_PLATFORMS=cpu python experiments/demand_sim.py [scene ...]
"""

import sys
import time

import numpy as np

from experiments.topo_sim import (A_NS, PACKET, TRI_NS, WIDTH, Tree,
                                  from_complete, sample_packets, slab)


def mt_closest(tree, first, count, o, d, closest_eval):
    """Exact MT over one cluster; returns per-ray best t against
    closest_eval (accept requires t < closest_eval)."""
    v0 = tree.tv0[first: first + count]
    e1 = tree.te1[first: first + count]
    e2 = tree.te2[first: first + count]
    n = np.cross(e1, e2)
    a = -(d @ n.T)
    with np.errstate(divide="ignore", invalid="ignore"):
        f = 1.0 / a
        s = o[:, None, :] - v0[None, :, :]
        q = np.cross(s, d[:, None, :])
        u = f * np.einsum("rtc,tc->rt", q, e2)
        v = -(f * np.einsum("rtc,tc->rt", q, e1))
        t = f * np.einsum("rtc,tc->rt", s, n)
        ok = (np.abs(a) > 1e-7) & (np.minimum(u, v) >= 0) \
            & (u + v <= 1.0) & (t > 1e-3) & (t < closest_eval[:, None])
        tt = np.where(ok, t, np.inf).min(1)
    return tt.astype(np.float32)


def trace_demand(tree, root, o, d, commit_every):
    """Packet traversal with closest commits deferred to every
    `commit_every` leaf visits. Returns (steps, visits, demand_pairs,
    final committed closest)."""
    inv = np.where(d != 0, 1.0 / d, np.inf)
    commit = np.full(o.shape[0], 3.4e38, np.float32)   # drives culling
    pending = commit.copy()                            # accumulates hits
    steps = visits = pairs = 0
    stack = []
    node = root
    while True:
        c0 = tree.c0[node]
        if c0 < 0:  # leaf visit
            visits += 1
            first = -int(c0) - 1
            # demand = lanes whose own slab passes under committed t
            lo = slab(tree.bmin[node], tree.bmax[node], o, inv, commit)
            demand = lo < commit
            pairs += int(demand.sum())
            tt = mt_closest(tree, first, int(tree.c1[node]), o, d, commit)
            pending = np.minimum(pending, tt)
            if visits % commit_every == 0:
                commit = np.minimum(commit, pending)
        else:
            steps += 1
            l, r = int(c0), int(tree.c1[node])
            hl = slab(tree.bmin[l], tree.bmax[l], o, inv, commit)
            hr = slab(tree.bmin[r], tree.bmax[r], o, inv, commit)
            tl = hl < commit
            tr = hr < commit
            if tl.any() and tr.any():
                both = tl & tr
                swap = np.where(both,
                                np.where(hr < hl, 1, -1), 0).sum() > 0
                near, far = (r, l) if swap else (l, r)
                stack.append(far)
                node = near
                continue
            elif tl.any() or tr.any():
                node = l if tl.any() else r
                continue
        if not stack:
            break
        node = stack.pop()
    return steps, visits, pairs, np.minimum(commit, pending)


def run_packets(tree, root, o_all, d_all, commit_every, pkt, label):
    t0 = time.time()
    tot_s = tot_v = tot_p = 0
    n_pk = o_all.shape[0] // pkt
    ref = None
    closests = []
    for p in range(n_pk):
        sl = slice(p * pkt, (p + 1) * pkt)
        s, v, pr, cl = trace_demand(tree, root, o_all[sl], d_all[sl],
                                    commit_every)
        tot_s += s
        tot_v += v
        tot_p += pr
        closests.append(cl)
    per_1024 = PACKET / pkt  # normalize rows to per-1024-ray units
    sp = tot_s / n_pk * per_1024
    vp = tot_v / n_pk * per_1024
    pp = tot_p / n_pk * per_1024
    print(f"    {label:26s} steps/1k={sp:7.1f} visits/1k={vp:7.1f} "
          f"pairs/1k={pp:8.1f} (={pp / 1024:6.1f} tiles) "
          f"[{time.time() - t0:.0f}s]", flush=True)
    return sp, vp, pp, np.concatenate(closests)


def main():
    from tpu_pathtracer.models.shapes import knot_zoo_scene, \
        terrain_zoo_scene
    from experiments.incoh_phase import bounce_rays, primary_rays, n

    which = sys.argv[1:] or ["knot"]
    for name in which:
        if name == "knot":
            scene, cam = knot_zoo_scene(512, 512, prims_per_leaf=WIDTH)
        elif name == "dragon":
            scene, cam = knot_zoo_scene(512, 512, prims_per_leaf=WIDTH,
                                        nu=1664, nv=262)
        else:
            scene, cam = terrain_zoo_scene(512, 512, prims_per_leaf=WIDTH)
        mesh = scene.mesh
        tree, w = from_complete(mesh, WIDTH)
        print(f"{name}: {int(mesh.num_tris)} tris, cluster width {w}",
              flush=True)

        for rname, rays in (("coherent", primary_rays(scene, cam)),
                            ("bounce", bounce_rays(scene))):
            o3 = sample_packets([rays[0].x, rays[0].y, rays[0].z], n)
            d3 = sample_packets([rays[1].x, rays[1].y, rays[1].z], n)
            o = np.stack(o3, 1).astype(np.float32)
            d = np.stack(d3, 1).astype(np.float32)
            print(f"  {rname}:", flush=True)
            s1, v1, p1, cl1 = run_packets(tree, 1, o, d, 1, PACKET,
                                          "prod (commit=1)")
            _, _, _, _ = run_packets(tree, 1, o, d, 64, PACKET, "commit=64")
            _, v32, p32, cl32 = run_packets(tree, 1, o, d, 32, PACKET,
                                            "commit=32")
            sInf, vInf, pInf, clI = run_packets(
                tree, 1, o, d, 10 ** 9, PACKET, "commit=inf")
            # correctness sanity: deferred commits still converge to the
            # same closest (more work, same answer)
            assert np.allclose(cl1, clI, rtol=1e-5), "defer changed hits!"

            prod_leaf = TRI_NS * w * v1
            for tag, vv, pp in (("immediate", v1, p1),
                                ("commit=32", v32, p32),
                                ("commit=inf", vInf, pInf)):
                ideal = TRI_NS * w * pp / 1024
                be = (prod_leaf - ideal) / max(pp, 1)
                print(f"    -> {tag:10s}: work ratio "
                      f"{TRI_NS * w * vv / max(ideal, 1e-9):5.2f}x, "
                      f"break-even OVH {be:6.1f} ns/pair", flush=True)


if __name__ == "__main__":
    main()
