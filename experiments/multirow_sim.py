"""Round-count simulation of an 8-independent-row packet kernel (CPU).

The proposed kernel packs 8 independent 128-ray packets into one
(8,128) vreg row set; each row has its own bitstack traversal state.
Per kernel iteration the 8 rows advance in lockstep ROUNDS:

    node round — every row at an internal node does one slab+vote step
                 (rows at leaves / done idle);
    leaf round — every row at a leaf gets its cluster DMA'd and MT-
                 tested (vreg-wide ops serve all such rows at once;
                 node rows idle).

Policy A: leaf round fires when ANY row sits at a leaf.
Policy B: leaf round fires only when NO row can node-step (all
          non-done rows at leaves) — node rows keep stepping first.
Policy Q: rows never wait at leaves — each row pushes the cluster id
          onto a depth-``QDEPTH`` queue and pops immediately; a leaf
          round fires when every active row has work queued, a queue
          fills, or traversal is finished with queues non-empty.
          Culling then lags (votes use a stale nearest), which only
          ENLARGES the visit set — still exact, counts go up slightly.

This sim counts rounds per scheme (and the production 1024-lane packet
as baseline) over sorted primary rays, using the exact production
traversal semantics per row. Round costs are then priced with the
hardware-measured per-phase numbers (iter_ablate) to predict speedup.

Usage: python experiments/multirow_sim.py [--dragon] [width]
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

from tpu_pathtracer.engine.wavefront import _ray_sort_key
from tpu_pathtracer.models.shapes import knot_zoo_scene
from tpu_pathtracer.ops.v3 import V3

argv = sys.argv[1:]
kw = {}
if argv and argv[0] == "--dragon":
    kw = {"nu": 1664, "nv": 262}
    argv = argv[1:]
width = int(argv[0]) if argv else 64
n = 65536

scene, cam = knot_zoo_scene(512, 512, prims_per_leaf=width, **kw)
mesh = scene.mesh
side = int(np.sqrt(n))
pix = jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(side * side)
origin, direction = cam.generate_rays(
    pix, jnp.zeros((n,), jnp.uint32), side, side)
key = _ray_sort_key(scene, origin, direction)
_, ox, oy, oz, dx, dy, dz = jax.lax.sort(
    (key, origin.x, origin.y, origin.z,
     direction.x, direction.y, direction.z), num_keys=1)
O = np.stack([np.asarray(ox), np.asarray(oy), np.asarray(oz)], axis=1)
D = np.stack([np.asarray(dx), np.asarray(dy), np.asarray(dz)], axis=1)

first_leaf = mesh.first_leaf
P = mesh.prims_per_leaf
k = 0
while (P << (k + 1)) <= width and (first_leaf >> (k + 1)) >= 1:
    k += 1
w = P << k
cl_first = first_leaf >> k
bmin = np.asarray(mesh.bvh_min[:2 * cl_first])
bmax = np.asarray(mesh.bvh_max[:2 * cl_first])
v0 = np.asarray(mesh.v0)
e1 = np.asarray(mesh.v1) - v0
e2 = np.asarray(mesh.v2) - v0
nrm = np.cross(e1, e2)
nrm[~np.isfinite(np.asarray(mesh.v0)).all(axis=1)] = 0.0

FLT_MAX = 3.4028235e38
T_MIN = 1e-3


class Row:
    """One 128-ray packet's traversal state."""

    def __init__(self, o, d):
        self.o, self.d = o, d
        self.inv = 1.0 / d
        self.neg = self.inv < 0
        self.closest = np.full(o.shape[0], FLT_MAX, np.float32)
        self.idx, self.bs = 1, 1

    def done(self):
        return self.idx <= 0

    def at_leaf(self):
        return self.idx >= cl_first

    def pop(self):
        m = (self.bs & -self.bs).bit_length() - 1 if self.bs else 0
        self.bs = (self.bs >> m) ^ 1
        self.idx = (self.idx >> m) ^ 1

    def node_step(self):
        l = self.idx * 2

        def slab(li):
            lo = np.where(self.neg, bmax[li], bmin[li])
            hi = np.where(self.neg, bmin[li], bmax[li])
            t0 = (lo - self.o) * self.inv
            t1 = (hi - self.o) * self.inv
            tmin = np.maximum(t0.max(axis=1), 1e-4)
            tmax = np.minimum(t1.min(axis=1), self.closest)
            return np.where(tmax < tmin, FLT_MAX, tmin)

        lhit, rhit = slab(l), slab(l + 1)
        tl = lhit < self.closest
        tr = rhit < self.closest
        both = tl & tr
        pref = np.where(both, np.where(rhit < lhit, 1, -1), 0).sum()
        swap = 1 if pref > 0 else 0
        if tl.any() and tr.any():
            self.idx, self.bs = l + swap, (self.bs << 1) + 1
        elif tl.any() or tr.any():
            self.idx = l if tl.any() else l + 1
            self.bs <<= 1
        else:
            self.pop()

    def leaf_step(self):
        self.mt_cluster(self.idx - cl_first)
        self.pop()

    def mt_cluster(self, c):
        s = slice(c * w, (c + 1) * w)
        nn = nrm[s]
        a = -(self.d @ nn.T)
        bad0 = np.abs(a) < 1e-7
        f = 1.0 / np.where(bad0, 1.0, a)
        sv = self.o[:, None, :] - v0[s][None, :, :]
        q = np.cross(sv, self.d[:, None, :])
        u = f * np.einsum('lwc,wc->lw', q, e2[s])
        vv = -(f * np.einsum('lwc,wc->lw', q, e1[s]))
        t = f * np.einsum('lwc,wc->lw', sv, nn)
        bad = (bad0 | (np.minimum(u, vv) < 0) | (u + vv > 1)
               | ~(t > T_MIN) | ~(t < self.closest[:, None]))
        t = np.where(bad, FLT_MAX, t)
        self.closest = np.minimum(self.closest, t.min(axis=1))


QDEPTH = 4


def run_group_q(rows):
    """Policy Q: queued leaves, rows never stall at a leaf."""
    node_rounds = leaf_rounds = 0
    queues = [[] for _ in rows]
    while True:
        for r, q in zip(rows, queues):
            while not r.done() and r.at_leaf() and len(q) < QDEPTH:
                q.append(r.idx - cl_first)
                r.pop()
        active = [i for i, r in enumerate(rows) if not r.done()]
        pending = [i for i, q in enumerate(queues) if q]
        if not active and not pending:
            break
        trav = [i for i in active if not rows[i].at_leaf()]
        fire = (pending
                and (all(queues[i] or i not in active for i in range(8))
                     or any(len(q) >= QDEPTH for q in queues)
                     or not trav))
        if fire:
            leaf_rounds += 1
            for i in pending:
                rows[i].mt_cluster(queues[i].pop(0))
        elif trav:
            node_rounds += 1
            for i in trav:
                rows[i].node_step()
        else:
            break
    return node_rounds, leaf_rounds


def run_group(rows, policy):
    if policy == "Q":
        return run_group_q(rows)
    node_rounds = leaf_rounds = 0
    while not all(r.done() for r in rows):
        leaves = [r for r in rows if not r.done() and r.at_leaf()]
        nodes = [r for r in rows if not r.done() and not r.at_leaf()]
        fire_leaf = ((policy == "A" and leaves)
                     or (policy == "B" and leaves and not nodes))
        if fire_leaf:
            leaf_rounds += 1
            for r in leaves:
                r.leaf_step()
        else:
            node_rounds += 1
            for r in nodes:
                r.node_step()
    return node_rounds, leaf_rounds


for policy in ("A", "B", "Q"):
    tot_n = tot_l = 0
    groups = 0
    for g0 in range(0, n, 1024):
        rows = [Row(O[g0 + r * 128:g0 + (r + 1) * 128],
                    D[g0 + r * 128:g0 + (r + 1) * 128]) for r in range(8)]
        nr, lr = run_group(rows, policy)
        tot_n += nr
        tot_l += lr
        groups += 1
    print(f"policy {policy}: node_rounds/grp={tot_n / groups:7.1f} "
          f"leaf_rounds/grp={tot_l / groups:7.1f} "
          f"tri_slots/grp={tot_l / groups * w:7.0f}", flush=True)
print(f"baseline 1024-packet (hw telemetry shape): steps=84 leafs=38 "
      f"tri_slots={38.2 * w:.0f}  [knot w={w}]")
