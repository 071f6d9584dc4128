"""Hardware smoke test: quantized node tables + stale-leaf cull.

Compares quant vs f32-table traversal and culled vs uncculled on a small
knot mesh — results must be identical; prints leaf-visit telemetry so
the cull rate is visible. Fails fast (~2 min compile) before committing
an hour-long sweep to a kernel Mosaic might reject.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.models.shapes import knot_zoo_scene
from tpu_pathtracer.ops.pallas_bvh import build_packet_mesh, packet_trace, \
    packet_occluded
from tpu_pathtracer.ops.v3 import V3
from tpu_pathtracer.ops.vec import FLT_MAX

print("devices:", jax.devices(), flush=True)

scene, cam = knot_zoo_scene(128, 128, nu=128, nv=64, prims_per_leaf=32)
mesh = scene.mesh
pm = build_packet_mesh(mesh, max_width=32, quant_nodes=False)
pmq = build_packet_mesh(mesh, max_width=32, quant_nodes=True)
print(f"tris={mesh.num_tris} nodes f32={pm.nodes.shape} "
      f"quant={pmq.nodes.shape} qparams={pmq.qparams}", flush=True)

n = 8192
rng = np.random.default_rng(3)
o = rng.uniform(-10, 10, (3, n))
d = rng.standard_normal((3, n))
d /= np.linalg.norm(d, axis=0, keepdims=True)
ov = V3(*(jnp.asarray(c, jnp.float32) for c in o))
dv = V3(*(jnp.asarray(c, jnp.float32) for c in d))

runs = {}
for name, m, kw in [
    ("f32+cull", pm, dict(smem_nodes=pm.smem_nodes)),
    ("f32-nocull", pm, dict(smem_nodes=pm.smem_nodes, leaf_cull=False)),
    ("quant+cull", pmq, dict(smem_nodes=True, quant=True,
                             qparams=pmq.qparams)),
]:
    (t, tri, *_), cnt = packet_trace(
        ov, dv, FLT_MAX, m.nodes, m.blocks, m.tri_feat, m.cl_first,
        m.width, 1e-3, stride=m.stride, cpb=m.cpb, **kw)
    occ, scnt = packet_occluded(
        ov, dv, 12.0, m.nodes, m.blocks, m.cl_first, m.width, 1e-3,
        stride=m.stride, cpb=m.cpb, **kw)
    runs[name] = (np.asarray(t), np.asarray(tri), np.asarray(occ))
    print(f"{name}: hits={int((tri >= 0).sum())} occ={int(occ.sum())} "
          f"leafs={int(cnt[2])} shadow_leafs={int(scnt[2])}", flush=True)

t0, tri0, occ0 = runs["f32-nocull"]
for name in ("f32+cull", "quant+cull"):
    t1, tri1, occ1 = runs[name]
    np.testing.assert_array_equal(tri0, tri1)
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(occ0, occ1)
print("EXACT-MATCH OK", flush=True)
