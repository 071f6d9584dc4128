"""Leaf-width re-sweep under the sibling-pair prefetch (TPU).

The prefetch shrank the per-visit DMA share, so the visit cost is now
mostly MT compute (~37 VPU ops x width) — the width-64 optimum from the
r3 sweep (pre-prefetch, coherent rays) may have moved. Sweeps widths on
BOUNCE rays (the production-dominant regime) and coherent primaries,
scalar kernel with prefetch on.

Usage: python experiments/pf_width_sweep.py [--dragon] [width ...]
"""

import sys
import time

import jax
import numpy as np

from experiments.incoh_phase import bounce_rays, n, primary_rays
from tpu_pathtracer.models.shapes import knot_zoo_scene
from tpu_pathtracer.ops.pallas_bvh import build_packet_mesh, packet_trace
from tpu_pathtracer.ops.v3 import V3
from tpu_pathtracer.ops.vec import FLT_MAX

import jax.numpy as jnp


def chain(trace_fn, o0, d0):
    """Chained-dispatch timer (data dependency between steps inside one
    jit — CLAUDE.md: independent dispatches pipeline into nonsense)."""
    @jax.jit
    def run(steps, perturb):
        def body(_, carry):
            o, acc = carry
            (t, tri, *_), cnt = trace_fn(o, d0)
            tt = jnp.where(tri >= 0, t, 0.0)
            o = V3(o.x + tt * 0.0, o.y, o.z)
            return o, acc + tt.sum() + cnt[0]
        o = V3(o0.x + perturb * 1e-6, o0.y, o0.z)
        _, acc = jax.lax.fori_loop(0, steps, body,
                                   (o, jnp.float32(0.0)))
        return acc
    return run

argv = sys.argv[1:]
kw_scene = {}
if argv and argv[0] == "--dragon":
    kw_scene = {"nu": 1664, "nv": 262}
    argv = argv[1:]
widths = [int(x) for x in argv] or [32, 64, 128]

print("devices:", jax.devices())
scene, cam = knot_zoo_scene(512, 512, prims_per_leaf=16, **kw_scene)
mesh = scene.mesh


def bench(name, trace_fn, o0, d0, lo=2, hi=12):
    run = chain(trace_fn, o0, d0)
    float(run(lo, 0))
    float(run(hi, 0))

    def tme(steps):
        best = 1e9
        for r in range(1, 4):
            t0 = time.perf_counter()
            v = float(run(steps, r))
            best = min(best, time.perf_counter() - t0)
            assert v == v
        return best
    per = (tme(hi) - tme(lo)) / (hi - lo)
    print(f"    {name}: {per * 1e3:7.2f} ms/trav ({n / per / 1e6:5.1f} "
          f"Mrays/s)", flush=True)
    return per


rays_sets = [("coherent", primary_rays(scene, cam)),
             ("bounce", bounce_rays(scene))]

for w in widths:
    pm = build_packet_mesh(mesh, max_width=w)
    print(f"width={pm.width} clusters={pm.cl_first} smem={pm.smem_nodes} "
          f"quant={pm.quant}", flush=True)
    kw = dict(smem_nodes=pm.smem_nodes, top_rows=pm.top_rows,
              nodes_top=pm.nodes_top, quant=pm.quant, qparams=pm.qparams)

    def trace(o, d, pm=pm, kw=kw):
        return packet_trace(o, d, FLT_MAX, pm.nodes, pm.blocks,
                            pm.tri_feat, pm.cl_first, pm.width, 1e-3,
                            stride=pm.stride, cpb=pm.cpb, **kw)

    for rname, (o0, d0) in rays_sets:
        (_, ia, *_), cnt = trace(o0, d0)
        print(f"  {rname}: counts {[int(x) for x in cnt]} "
              f"hits {(np.asarray(ia) >= 0).sum()}", flush=True)
        bench(f"w={pm.width:3d} {rname:8s}", trace, o0, d0)
