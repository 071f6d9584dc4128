"""A/B: 4-ary (grandchild) node step vs binary, fused body (TPU).

_advance4 covers two tree levels per scalar round trip above the last
interior level. Expected: node-phase-share * ~35% win (node phase is
22-34% on bounce loads, knot/dragon). Exact traversal (same leaf set,
same MT order).

Usage: python experiments/quad_ab.py [--dragon]
"""

import sys

import jax

from tpu_pathtracer.models.shapes import knot_zoo_scene
from tpu_pathtracer.ops.pallas_bvh import build_packet_mesh, packet_trace
from tpu_pathtracer.ops.vec import FLT_MAX
from experiments.incoh_phase import bounce_rays, primary_rays, timed  # noqa

kw = {"nu": 1664, "nv": 262} if "--dragon" in sys.argv else {}
w = 64
print("devices:", jax.devices(), flush=True)

scene, cam = knot_zoo_scene(512, 512, prims_per_leaf=w, **kw)
pm = build_packet_mesh(scene.mesh, max_width=w)
print(f"tris={scene.mesh.num_tris} width={w} quant={pm.quant}", flush=True)
for name, rays in (("coherent", primary_rays(scene, cam)),
                   ("bounce", bounce_rays(scene))):
    for quad in (False, True):
        def trace_override(o, d0=rays[1], qd=quad):
            return packet_trace(
                o, d0, FLT_MAX, pm.nodes, pm.blocks, pm.tri_feat,
                pm.cl_first, pm.width, 1e-3, stride=pm.stride, cpb=pm.cpb,
                smem_nodes=pm.smem_nodes, top_rows=pm.top_rows,
                nodes_top=pm.nodes_top, quant=pm.quant,
                qparams=pm.qparams, quad=qd)

        per, steps, leafs = timed(pm, *rays, trace=trace_override)
        print(f"  {name:9s} quad={int(quad)}: {per * 1e3:7.2f} ms/trav"
              f" steps/pkt={steps:6.1f} leafs/pkt={leafs:6.1f}",
              flush=True)
