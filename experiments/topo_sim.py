"""CPU simulation: complete-tree (implicit heap) vs true SAH topology.

The packet kernel requires a COMPLETE pow2 tree (bitstack pops are heap
arithmetic), which forces equal-count partitions: every split puts
exactly half the leaf capacity on each side, regardless of geometry.
A true binned-SAH tree (variable leaf sizes, variable depth) needs an
explicit stack + child links, but can terminate splits where SAH says
so. Before reworking the kernel, this sim measures what topology alone
is worth: it runs the SAME packet traversal scheme (any-lane votes,
majority near-first ordering, per-lane closest updated by exact MT at
each leaf) over both trees and applies the measured cost model

    t_packet = A_NS * node_steps + TRI_NS * width * leaf_visits

(A_NS=300, TRI_NS=18.4 from PERFORMANCE.md round-3 phase split, w=64;
SAH leaves are charged the full kernel width even when under-filled).

Usage: JAX_PLATFORMS=cpu python experiments/topo_sim.py [scene ...]
   scenes: knot terrain dragon (default: knot terrain)
"""

import sys
import time

import numpy as np

A_NS = 300.0
TRI_NS = 18.4
WIDTH = 64
N_PACKETS = 24
PACKET = 1024


class Tree:
    __slots__ = ("bmin", "bmax", "c0", "c1", "tv0", "te1", "te2", "n_leaves",
                 "depth")


def from_complete(mesh, width):
    """Convert the production complete tree (implicit heap grouped to
    `width`-tri clusters) into the explicit representation
    (leaf => c0 = -(first_tri+1), c1 = count)."""
    first_leaf = int(mesh.first_leaf)
    P = int(mesh.prims_per_leaf)
    k = 0
    while (P << (k + 1)) <= width and (first_leaf >> (k + 1)) >= 1:
        k += 1
    w = P << k
    cl_first = first_leaf >> k
    n = 2 * cl_first
    t = Tree()
    t.bmin = np.asarray(mesh.bvh_min)[:n]
    t.bmax = np.asarray(mesh.bvh_max)[:n]
    c0 = np.arange(n) * 2
    c1 = c0 + 1
    leaf = np.arange(n) >= cl_first
    first = (np.arange(n) - cl_first) * w
    t.c0 = np.where(leaf, -(first + 1), c0).astype(np.int64)
    t.c1 = np.where(leaf, w, c1).astype(np.int64)
    t.tv0 = np.asarray(mesh.v0)
    t.te1 = np.asarray(mesh.v1) - t.tv0
    t.te2 = np.asarray(mesh.v2) - t.tv0
    t.n_leaves = cl_first
    t.depth = int(np.log2(cl_first)) + 1
    return t, w


def build_sah(v0, v1, v2, max_leaf, n_bins=16, ci=None, ct=1.0):
    """Binned SAH under the PACKET cost model (variable topology),
    numpy; root node = 0.

    The kernel charges a leaf visit at the full cluster width
    (width*TRI_NS) no matter how many real triangles it holds, so the
    cost model is per-VISIT, not per-triangle: a subtree of N tris
    costs at least ceil(N/width) leaf visits. Classic per-tri SAH
    (ci~1) splits down to 2-tri leaves — 0.03 fill, catastrophic here.
    """
    if ci is None:
        ci = TRI_NS * WIDTH / A_NS  # ~3.93 node-steps per leaf visit
    T = v0.shape[0]
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    cent = 0.5 * (tmin + tmax)

    order = []
    n_ordered = 0
    bmin_l, bmax_l, c0_l, c1_l = [], [], [], []

    def new_node():
        bmin_l.append(None)
        bmax_l.append(None)
        c0_l.append(0)
        c1_l.append(0)
        return len(c0_l) - 1

    def area3(mn, mx):
        d = np.maximum(mx - mn, 0.0)
        return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] \
            + d[..., 2] * d[..., 0]

    root = new_node()
    stack = [(root, np.arange(T, dtype=np.int64), 0)]
    n_leaves = 0
    max_depth = 0
    while stack:
        node, idxs, depth = stack.pop()
        max_depth = max(max_depth, depth)
        bb_min = tmin[idxs].min(0)
        bb_max = tmax[idxs].max(0)
        bmin_l[node] = bb_min
        bmax_l[node] = bb_max
        nt = len(idxs)

        best = None  # (sah_child_sum, lmask)
        c = cent[idxs]
        for axis in range(3):
            lo, hi = c[:, axis].min(), c[:, axis].max()
            if hi - lo < 1e-12:
                continue
            bins = np.minimum(((c[:, axis] - lo) / (hi - lo)
                               * n_bins).astype(np.int64), n_bins - 1)
            cnt = np.bincount(bins, minlength=n_bins)
            bmn = np.full((n_bins, 3), 1e30, np.float64)
            bmx = np.full((n_bins, 3), -1e30, np.float64)
            np.minimum.at(bmn, bins, tmin[idxs])
            np.maximum.at(bmx, bins, tmax[idxs])
            lmn = np.minimum.accumulate(bmn, 0)
            lmx = np.maximum.accumulate(bmx, 0)
            rmn = np.minimum.accumulate(bmn[::-1], 0)[::-1]
            rmx = np.maximum.accumulate(bmx[::-1], 0)[::-1]
            lc = np.cumsum(cnt)[:-1]
            rc = nt - lc
            vl = -(-lc // max_leaf)  # ceil: minimal leaf visits left
            vr = -(-rc // max_leaf)
            cost = area3(lmn, lmx)[:-1] * vl + area3(rmn[1:], rmx[1:]) * vr
            valid = (lc > 0) & (rc > 0)
            if not valid.any():
                continue
            j = int(np.argmin(np.where(valid, cost, 1e30)))
            if best is None or cost[j] < best[0]:
                best = (cost[j], bins <= j)

        parent_area = max(area3(bb_min, bb_max), 1e-30)
        if nt <= max_leaf and (
                best is None
                or ct + ci * best[0] / parent_area >= ci * 1.0):
            c0_l[node] = -(n_ordered + 1)
            c1_l[node] = nt
            order.append(idxs)
            n_ordered += nt
            n_leaves += 1
            continue
        if best is None:
            # forced split (degenerate centroids): median halves
            axis = int(np.argmax(bb_max - bb_min))
            srt = np.argsort(cent[idxs][:, axis], kind="stable")
            lmask = np.zeros(nt, bool)
            lmask[srt[: nt // 2]] = True
        else:
            lmask = best[1]
        l_id = new_node()
        r_id = new_node()
        c0_l[node] = l_id
        c1_l[node] = r_id
        stack.append((l_id, idxs[lmask], depth + 1))
        stack.append((r_id, idxs[~lmask], depth + 1))

    t = Tree()
    t.bmin = np.stack(bmin_l).astype(np.float32)
    t.bmax = np.stack(bmax_l).astype(np.float32)
    t.c0 = np.array(c0_l, np.int64)
    t.c1 = np.array(c1_l, np.int64)
    ordr = np.concatenate(order)
    t.tv0 = v0[ordr]
    t.te1 = v1[ordr] - v0[ordr]
    t.te2 = v2[ordr] - v0[ordr]
    t.n_leaves = n_leaves
    t.depth = max_depth
    return t


# ---------------------------------------------------------------------------
# Packet traversal sim (same votes/ordering as the kernel)
# ---------------------------------------------------------------------------

def slab(bmin, bmax, o, inv, closest):
    t0 = (bmin - o) * inv
    t1 = (bmax - o) * inv
    lo = np.minimum(t0, t1).max(1)
    hi = np.maximum(t0, t1).min(1)
    lo = np.maximum(lo, 1e-3)
    hi = np.minimum(hi, closest)
    return np.where(hi < lo, np.inf, lo)


def mt(tree, first, count, o, d, closest):
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
            & (u + v <= 1.0) & (t > 1e-3) & (t < closest[:, None])
        tt = np.where(ok, t, np.inf).min(1)
    return np.minimum(closest, tt.astype(np.float32))


def trace_packet(tree, root, o, d):
    inv = np.where(d != 0, 1.0 / d, np.inf)
    closest = np.full(o.shape[0], 3.4e38, np.float32)
    steps = visits = 0
    stack = []
    node = root
    while True:
        c0 = tree.c0[node]
        if c0 < 0:  # leaf
            visits += 1
            first = -int(c0) - 1
            closest = mt(tree, first, int(tree.c1[node]), o, d, closest)
        else:
            steps += 1
            l, r = int(c0), int(tree.c1[node])
            hl = slab(tree.bmin[l], tree.bmax[l], o, inv, closest)
            hr = slab(tree.bmin[r], tree.bmax[r], o, inv, closest)
            tl = hl < closest
            tr = hr < closest
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
    return steps, visits


def simulate(tree, root, rays_o, rays_d, width, label):
    t0 = time.time()
    tot_s = tot_v = 0
    n_pk = rays_o.shape[0] // PACKET
    for p in range(n_pk):
        sl = slice(p * PACKET, (p + 1) * PACKET)
        s, v = trace_packet(tree, root, rays_o[sl], rays_d[sl])
        tot_s += s
        tot_v += v
    per_pkt_ns = A_NS * tot_s / n_pk + TRI_NS * width * tot_v / n_pk
    ms_131k = per_pkt_ns * (131072 / PACKET) / 1e6
    print(f"    {label:30s} steps/pkt={tot_s / n_pk:7.1f} "
          f"leafs/pkt={tot_v / n_pk:7.1f} -> model {ms_131k:7.2f} ms/131k"
          f"   ({time.time() - t0:.0f}s sim)", flush=True)
    return ms_131k


def sample_packets(arrs, n_total):
    """Evenly spaced PACKET-sized windows across the sorted ray set."""
    n_pk_all = n_total // PACKET
    picks = np.linspace(0, n_pk_all - 1, N_PACKETS).astype(int)
    idx = (picks[:, None] * PACKET + np.arange(PACKET)[None, :]).ravel()
    return [np.asarray(a)[idx] for a in arrs]


def main():
    from tpu_pathtracer.models.shapes import knot_zoo_scene, \
        terrain_zoo_scene
    from tpu_pathtracer.models.mesh import procedural_staircase_scene
    from experiments.incoh_phase import bounce_rays, primary_rays, n

    which = sys.argv[1:] or ["knot", "terrain"]
    for name in which:
        if name == "knot":
            scene, cam = knot_zoo_scene(512, 512, prims_per_leaf=WIDTH)
        elif name == "dragon":
            scene, cam = knot_zoo_scene(512, 512, prims_per_leaf=WIDTH,
                                        nu=1664, nv=262)
        elif name == "stairs":
            scene, cam = procedural_staircase_scene(
                512, 512, prims_per_leaf=WIDTH, sub=16)
        else:
            scene, cam = terrain_zoo_scene(512, 512,
                                           prims_per_leaf=WIDTH)
        mesh = scene.mesh
        nt = int(mesh.num_tris)
        print(f"{name}: {nt} tris", flush=True)

        t_a, w_a = from_complete(mesh, WIDTH)
        sane = np.isfinite(np.asarray(mesh.v0)).all(1)
        v0 = np.asarray(mesh.v0)[sane]
        v1 = np.asarray(mesh.v1)[sane]
        v2 = np.asarray(mesh.v2)[sane]
        t0 = time.time()
        t_b = build_sah(v0, v1, v2, WIDTH)
        fill = v0.shape[0] / (t_b.n_leaves * WIDTH)
        print(f"  sah build: {time.time() - t0:.0f}s, "
              f"{t_b.n_leaves} leaves fill={fill:.2f} depth={t_b.depth} "
              f"(complete: {t_a.n_leaves} leaves d{t_a.depth})",
              flush=True)

        for rname, rays in (("coherent", primary_rays(scene, cam)),
                            ("bounce", bounce_rays(scene))):
            o3 = sample_packets([rays[0].x, rays[0].y, rays[0].z], n)
            d3 = sample_packets([rays[1].x, rays[1].y, rays[1].z], n)
            o = np.stack(o3, 1).astype(np.float32)
            d = np.stack(d3, 1).astype(np.float32)
            print(f"  {rname}:", flush=True)
            a = simulate(t_a, 1, o, d, w_a, "complete heap (prod)")
            b = simulate(t_b, 0, o, d, WIDTH,
                         f"true SAH")
            print(f"    ratio complete/sah = {a / b:.2f}x", flush=True)


if __name__ == "__main__":
    main()
