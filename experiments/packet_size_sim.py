"""Union-of-needs vs packet size (CPU numpy simulation).

Simulates the production packet traversal (shared bitstack, near-first
majority vote, per-lane nearest culling — ops/pallas_bvh semantics) at
several packet sizes over sorted primary rays, and reports per-RAY work:
node steps, leaf-cluster visits, and triangles tested. Smaller packets
share less, so their union of lane needs is tighter; this quantifies
how much leaf/node work an 8-independent-row kernel (8 x 128-ray
packets per (8,128) vreg) would save over the current 1024-ray packet.

Usage: python experiments/packet_size_sim.py [--dragon] [width]
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
sane = np.isfinite(np.asarray(mesh.v0)).all(axis=1)
nrm[~sane] = 0.0

FLT_MAX = 3.4028235e38
T_MIN = 1e-3


def slab(l, o, inv, neg, closest):
    lo = np.where(neg, bmax[l], bmin[l])
    hi = np.where(neg, bmin[l], bmax[l])
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    tmin = np.maximum(t0.max(axis=1), 1e-4)
    tmax = np.minimum(t1.min(axis=1), closest)
    return np.where(tmax < tmin, FLT_MAX, tmin)


def mt_cluster(c, o, d, closest):
    s = slice(c * w, (c + 1) * w)
    nn = nrm[s]                              # [w,3]
    a = -(d @ nn.T)                          # [L,w]
    bad0 = np.abs(a) < 1e-7
    f = 1.0 / np.where(bad0, 1.0, a)
    sv = o[:, None, :] - v0[s][None, :, :]   # [L,w,3]
    q = np.cross(sv, d[:, None, :])
    u = f * np.einsum('lwc,wc->lw', q, e2[s])
    v = -(f * np.einsum('lwc,wc->lw', q, e1[s]))
    t = f * np.einsum('lwc,wc->lw', sv, nn)
    bad = (bad0 | (np.minimum(u, v) < 0) | (u + v > 1)
           | ~(t > T_MIN) | ~(t < closest[:, None]))
    t = np.where(bad, FLT_MAX, t)
    return t.min(axis=1)


def run_packet(o, d):
    L = o.shape[0]
    inv = 1.0 / d
    neg = inv < 0
    closest = np.full(L, FLT_MAX, np.float32)
    idx, bs = 1, 1
    steps = leafs = tris = 0
    while idx > 0:
        if idx >= cl_first:
            leafs += 1
            tris += w
            tm = mt_cluster(idx - cl_first, o, d, closest)
            closest = np.minimum(closest, tm)
            m = (bs & -bs).bit_length() - 1 if bs else 0
            bs = (bs >> m) ^ 1
            idx = (idx >> m) ^ 1
        else:
            l = idx * 2
            lhit = slab(l, o, inv, neg, closest)
            rhit = slab(l + 1, o, inv, neg, closest)
            tl = lhit < closest
            tr = rhit < closest
            both = tl & tr
            vl = tl.any()
            vr = tr.any()
            pref = np.where(both, np.where(rhit < lhit, 1, -1), 0).sum()
            swap = 1 if pref > 0 else 0
            m = (bs & -bs).bit_length() - 1 if bs else 0
            if vl and vr:
                steps += 1
                idx, bs = l + swap, (bs << 1) + 1
            elif vl or vr:
                steps += 1
                idx, bs = (l if vl else l + 1), bs << 1
            else:
                idx, bs = (idx >> m) ^ 1, (bs >> m) ^ 1
    return steps, leafs, tris


for psize in (1024, 512, 256, 128, 64, 32):
    tot = np.zeros(3, np.int64)
    for p0 in range(0, n, psize):
        tot += run_packet(O[p0:p0 + psize], D[p0:p0 + psize])
    s, l, t = tot / n
    print(f"packet={psize:5d}: steps/ray={s:7.3f} leafs/ray={l:7.3f} "
          f"tris/ray={t:8.2f}", flush=True)
