"""Ceiling probe: how much does a tight initial `closest` cull?

The round-3 diagnosis says the leaf-visit COUNT is set by bounce
incoherence: minority lanes ride the majority's subtree votes with
closest=FLT_MAX, so the packet pays the visit union (4.2x the coherent
union, PERFORMANCE.md).  If every ray entered traversal with a tight
upper bound on its nearest hit (seeded closest), those lanes would vote
"no" on far subtrees and the union should shrink.

A sound seed exists in production form: trace a SUBSET of the real
triangles first (a "scaffold") — any scaffold hit is a real mesh hit,
so its t is a valid upper bound and a valid initial winner.  This probe
measures the CEILING of that idea with the oracle bound: trace once to
get t_true per ray, then re-trace with t_max = t_true*(1+1e-4) and
compare node steps / leaf visits / wall time, on coherent primaries and
synthetic bounce rays (knot by default, --dragon for dragon).

Also measures a LOOSE seed (2*t_true) for sensitivity: a scaffold bound
will land between the two.

Usage: python experiments/seed_probe.py [--dragon] [width ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from experiments.incoh_phase import bounce_rays, primary_rays
from tpu_pathtracer.models.shapes import knot_zoo_scene
from tpu_pathtracer.ops.pallas_bvh import build_packet_mesh, packet_trace
from tpu_pathtracer.ops.vec import FLT_MAX

n = 131072


def trace(pm, o, d, t_max):
    return packet_trace(
        o, d, t_max, pm.nodes, pm.blocks, pm.tri_feat,
        pm.cl_first, pm.width, 1e-3, stride=pm.stride, cpb=pm.cpb,
        smem_nodes=pm.smem_nodes, top_rows=pm.top_rows,
        nodes_top=pm.nodes_top, quant=pm.quant, qparams=pm.qparams)


def timed(pm, o0, d0, t_max):
    @jax.jit
    def run(steps, perturb):
        def body(_, carry):
            o, acc = carry
            from tpu_pathtracer.ops.v3 import V3
            (t, tri, *_), cnt = trace(pm, o, d0, t_max)
            tt = jnp.where(tri >= 0, t, 0.0)
            return V3(o.x + tt * 0.0, o.y, o.z), acc + tt.sum() + cnt[0]
        from tpu_pathtracer.ops.v3 import V3
        o = V3(o0.x + perturb * 1e-6, o0.y, o0.z)
        _, acc = jax.lax.fori_loop(0, steps, body, (o, jnp.float32(0.0)))
        return acc

    float(run(2, 0)), float(run(12, 0))

    def t(steps):
        best = 1e9
        for r in range(1, 4):
            t0 = time.perf_counter()
            v = float(run(steps, r))
            best = min(best, time.perf_counter() - t0)
            assert v == v
        return best
    per = (t(12) - t(2)) / 10
    (tt, tri, *_), cnt = trace(pm, o0, d0, t_max)
    packets = n // 1024
    steps = float(cnt[0] + cnt[1]) / packets
    leafs = float(cnt[2]) / packets
    return per, steps, leafs, np.asarray(tt), np.asarray(tri)


if __name__ == "__main__":
    argv = sys.argv[1:]
    kw = {}
    if argv and argv[0] == "--dragon":
        kw = {"nu": 1664, "nv": 262}
        argv = argv[1:]
    widths = [int(w) for w in argv] or [64]
    print("devices:", jax.devices(), flush=True)

    for w in widths:
        scene, cam = knot_zoo_scene(512, 512, prims_per_leaf=w, **kw)
        pm = build_packet_mesh(scene.mesh, max_width=w)
        print(f"width={w} tris={scene.mesh.num_tris} "
              f"smem_nodes={pm.smem_nodes}", flush=True)
        for name, rays in (("coherent", primary_rays(scene, cam)),
                           ("bounce", bounce_rays(scene))):
            o0, d0 = rays
            per0, s0, l0, t_true, tri0 = timed(pm, o0, d0, FLT_MAX)
            print(f"  {name:9s} base : {per0 * 1e3:7.2f} ms "
                  f"steps/pkt={s0:7.1f} leafs/pkt={l0:7.1f} "
                  f"hits={int((tri0 >= 0).sum())}", flush=True)
            for label, mul in (("oracle", 1.0 + 1e-4), ("loose2x", 2.0)):
                seed = jnp.where(jnp.asarray(tri0) >= 0,
                                 jnp.asarray(t_true) * mul, FLT_MAX)
                per1, s1, l1, t1, tri1 = timed(pm, o0, d0, seed)
                # exactness: the seeded trace must re-find every hit
                same = (tri1 == tri0).mean()
                print(f"  {name:9s} {label:6s}: {per1 * 1e3:7.2f} ms "
                      f"({per1 / per0:4.2f}x) steps/pkt={s1:7.1f} "
                      f"({s1 / s0:4.2f}x) leafs/pkt={l1:7.1f} "
                      f"({l1 / l0:4.2f}x) same-winner={same:6.4f}",
                      flush=True)
