"""A/B: fused node->leaf loop body vs the classic one-action body (TPU).

The phase split (incoh_phase + knot_share) put the per-iteration
scalar round trip at ~300 ns; the fused body visits a descended-to
leaf inside the same while iteration, cutting iterations from
(steps + leafs) toward max(steps, pops). Same traversal order, same
results. Times one nearest-hit traversal on coherent primaries and
bounce-like rays for knot (f32 SMEM nodes) and optionally dragon
(quantized SMEM nodes).

Usage: python experiments/fused_ab.py [--dragon]
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
print(f"tris={scene.mesh.num_tris} width={w}", flush=True)
for name, rays in (("coherent", primary_rays(scene, cam)),
                   ("bounce", bounce_rays(scene))):
    for fused in (False, True):
        def trace_override(o, d0=rays[1], fz=fused):
            return packet_trace(
                o, d0, FLT_MAX, pm.nodes, pm.blocks, pm.tri_feat,
                pm.cl_first, pm.width, 1e-3, stride=pm.stride, cpb=pm.cpb,
                smem_nodes=pm.smem_nodes, top_rows=pm.top_rows,
                nodes_top=pm.nodes_top, quant=pm.quant,
                qparams=pm.qparams, fused=fz)

        per, steps, leafs = timed(pm, *rays, trace=trace_override)
        print(f"  {name:9s} fused={int(fused)}: {per * 1e3:7.2f} ms/trav"
              f" steps/pkt={steps:6.1f} leafs/pkt={leafs:6.1f}",
              flush=True)
