"""CPU sim: 4-ary (prod) vs 8-ary bitstack node steps on the heap.

The node step's ~300 ns is vote round-trip LATENCY (PERFORMANCE.md),
and the levers that won all round are "more tree levels per scalar
round trip" (4-ary grandchild step, BVH4 explicit stack).  This sim
asks what an 8-ary GREAT-grandchild step (3 binary levels per trip,
rows 8*idx..8*idx+7, up to 3 pending bits pushed) would do to the
while-trip count on the real meshes with real sampled packet rays,
before any kernel is written.

The bitstack semantics generalize unchanged: pending subtrees are one
bit per level, pops reconstruct (idx>>m)^1; a popped node simply runs
its own k-level step.  Leaf visits are identical by construction
(descendant boxes are subsets, so tested-hit sets per leaf agree).

Usage: JAX_PLATFORMS=cpu python experiments/oct_sim.py [knot dragon ...]
"""

import sys
import time

import numpy as np

A_NS = 300.0
TRI_NS = 18.4
PACKET = 1024
N_PACKETS = 16
_BBOX_T_MIN = 1e-3


def heap_view(mesh, width):
    """cl_first / w under the same cluster grouping as the kernel."""
    first_leaf = int(mesh.first_leaf)
    P = int(mesh.prims_per_leaf)
    k = 0
    while (P << (k + 1)) <= width and (first_leaf >> (k + 1)) >= 1:
        k += 1
    return first_leaf >> k, P << k


def slab_many(bmin, bmax, o, inv, closest):
    """Entry distances of many boxes (B,3) against the packet (R,3):
    returns (B, R) with inf on miss (kernel's _slab semantics)."""
    t0 = (bmin[:, None, :] - o[None, :, :]) * inv[None, :, :]
    t1 = (bmax[:, None, :] - o[None, :, :]) * inv[None, :, :]
    lo = np.minimum(t0, t1).max(2)
    hi = np.maximum(t0, t1).min(2)
    lo = np.maximum(lo, _BBOX_T_MIN)
    hi = np.minimum(hi, closest[None, :])
    return np.where(hi < lo, np.inf, lo)


def mt_update(v0, e1, e2, first, count, o, d, closest):
    v0 = v0[first: first + count]
    e1 = e1[first: first + count]
    e2 = e2[first: first + count]
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
            & (u + v <= 1.0) & (t > _BBOX_T_MIN) & (t < closest[:, None])
        tt = np.where(ok, t, np.inf).min(1)
    return np.minimum(closest, tt.astype(np.float32))


def majority_swap(hl, hr, closest):
    """True iff the majority of lanes hitting both prefers the right."""
    both = (hl < closest) & (hr < closest)
    return np.where(both, np.where(hr < hl, 1, -1), 0).sum() > 0


def order2(h, refs, closest):
    """Near-first order of a pair by the packet votes; returns the list
    of (ref, entry_group) hits, nearest first."""
    vl = (h[0] < closest).any()
    vr = (h[1] < closest).any()
    if vl and vr:
        if majority_swap(h[0], h[1], closest):
            return [refs[1], refs[0]]
        return [refs[0], refs[1]]
    if vl:
        return [refs[0]]
    if vr:
        return [refs[1]]
    return []


def step_k(levels, bmin, bmax, idx, bs, o, inv, closest):
    """One k-level node step (levels=1,2,3): test the 2^levels
    descendants of idx, descend majority-near-first, push one pending
    bit per level.  Returns (new_idx, new_bs)."""
    kk = 1 << levels
    base = idx * kk
    rows = np.arange(base, base + kk)
    h = slab_many(bmin[rows], bmax[rows], o, inv, closest)

    def rec(lo, hi):
        """Order the subtrees of h[lo:hi] near-first; returns ordered
        list of subtree child indices (relative, one per live subtree
        at THIS level split)."""
        if hi - lo == 1:
            return [lo] if (h[lo] < closest).any() else []
        mid = (lo + hi) // 2
        ml = h[lo:mid].min(0)
        mr = h[mid:hi].min(0)
        vl = (ml < closest).any()
        vr = (mr < closest).any()
        if not vl and not vr:
            return []
        first_r = vl and vr and majority_swap(ml, mr, closest)
        out = []
        groups = [(mid, hi), (lo, mid)] if first_r else [(lo, mid),
                                                         (mid, hi)]
        if not vl:
            groups = [(mid, hi)]
        elif not vr:
            groups = [(lo, mid)]
        for g in groups:
            out.append(rec(*g))
        return out

    tree = rec(0, kk)
    # tree is a nested near-first ordering; flatten: chosen = leftmost
    # leaf of the nest; pending bits: one per level where the OTHER
    # group had any hit (encoded top-down).
    bits = []
    node = tree
    chosen = None
    while True:
        if isinstance(node, int):
            chosen = node
            break
        if len(node) == 0:
            chosen = None
            break
        bits.append(1 if len(node) == 2 else 0)
        node = node[0]
    if chosen is None:
        # no hit: pop
        return pop(idx, bs)
    # bits is ordered level-1 first; kernel pushes exactly one bit per
    # level regardless (0 when the sibling group missed)
    while len(bits) < levels:
        bits.append(0)
    new_idx = base + chosen
    new_bs = bs
    for b in bits:
        new_bs = (new_bs << 1) | b
    return new_idx, new_bs


def pop(idx, bs):
    if bs == 0:
        return 0, 0
    m = (bs & -bs).bit_length() - 1
    return (idx >> m) ^ 1, (bs >> m) ^ 1


def trace_packet(mesh_arrs, cl_first, w, o, d, mode):
    """mode: 'quad' (prod: 2-level steps, 1-level at the boundary) or
    'oct' (3-level steps, falling to 2/1 at the boundary)."""
    bmin, bmax, v0, e1, e2 = mesh_arrs
    inv = np.where(d != 0, 1.0 / d, np.inf).astype(np.float32)
    closest = np.full(o.shape[0], 3.4e38, np.float32)
    idx, bs = 1, 0
    steps = {1: 0, 2: 0, 3: 0}
    visits = 0
    while idx != 0:
        if idx >= cl_first:
            visits += 1
            first = (idx - cl_first) * w
            closest = mt_update(v0, e1, e2, first, w, o, d, closest)
            idx, bs = pop(idx, bs)
            continue
        if mode == "oct" and idx < cl_first // 4:
            lv = 3
        elif idx < cl_first // 2:
            lv = 2
        else:
            lv = 1
        steps[lv] += 1
        idx, bs = step_k(lv, bmin, bmax, idx, bs, o, inv, closest)
    return steps, visits


def main():
    from tpu_pathtracer.models.shapes import knot_zoo_scene, \
        terrain_zoo_scene
    from experiments.incoh_phase import bounce_rays, primary_rays, n

    which = sys.argv[1:] or ["knot", "dragon"]
    for name in which:
        if name == "knot":
            scene, cam = knot_zoo_scene(512, 512)
        elif name == "dragon":
            scene, cam = knot_zoo_scene(512, 512, nu=1664, nv=262)
        else:
            scene, cam = terrain_zoo_scene(512, 512)
        mesh = scene.mesh
        width = 64
        cl_first, w = heap_view(mesh, width)
        arrs = (np.asarray(mesh.bvh_min), np.asarray(mesh.bvh_max),
                np.asarray(mesh.v0),
                np.asarray(mesh.v1) - np.asarray(mesh.v0),
                np.asarray(mesh.v2) - np.asarray(mesh.v0))
        print(f"{name}: {int(mesh.num_tris)} tris, cl_first={cl_first} "
              f"w={w}", flush=True)
        for rname, rays in (("coherent", primary_rays(scene, cam)),
                            ("bounce", bounce_rays(scene))):
            o3 = [np.asarray(a) for a in (rays[0].x, rays[0].y,
                                          rays[0].z)]
            d3 = [np.asarray(a) for a in (rays[1].x, rays[1].y,
                                          rays[1].z)]
            n_pk_all = n // PACKET
            picks = np.linspace(0, n_pk_all - 1, N_PACKETS).astype(int)
            idxs = (picks[:, None] * PACKET
                    + np.arange(PACKET)[None, :]).ravel()
            o = np.stack([a[idxs] for a in o3], 1).astype(np.float32)
            d = np.stack([a[idxs] for a in d3], 1).astype(np.float32)
            print(f"  {rname}:", flush=True)
            res = {}
            for mode in ("quad", "oct"):
                t0 = time.time()
                tot = {1: 0, 2: 0, 3: 0}
                tot_v = 0
                for p in range(N_PACKETS):
                    sl = slice(p * PACKET, (p + 1) * PACKET)
                    s, v = trace_packet(arrs, cl_first, w, o[sl], d[sl],
                                        mode)
                    for k in s:
                        tot[k] += s[k]
                    tot_v += v
                n_steps = sum(tot.values()) / N_PACKETS
                vis = tot_v / N_PACKETS
                ns = A_NS * n_steps + TRI_NS * w * vis
                res[mode] = (n_steps, vis, ns)
                print(f"    {mode:4s} steps/pkt={n_steps:7.1f} "
                      f"(1/2/3-lv {tot[1] // N_PACKETS}/"
                      f"{tot[2] // N_PACKETS}/{tot[3] // N_PACKETS}) "
                      f"leafs/pkt={vis:6.1f} model={ns / 1e3:8.1f} "
                      f"us/pkt  ({time.time() - t0:.0f}s)", flush=True)
            sq, so = res["quad"][2], res["oct"][2]
            ds = res["quad"][0] - res["oct"][0]
            print(f"    step cut {res['quad'][0]:.0f} -> "
                  f"{res['oct'][0]:.0f} ({ds / max(res['quad'][0], 1):.0%})"
                  f"; model speedup {sq / so:.3f}x "
                  f"(oct step at 350ns: "
                  f"{sq / (so + 50 * res['oct'][0]):.3f}x)", flush=True)


if __name__ == "__main__":
    main()
