"""Probe: dragon-class BVH4 table sizes (f32 vs uint16-quantized).

The 872k-tri dragon skips the SAH BVH4 auto-attach because its f32
node table exceeds the 400 KB SMEM budget (ops/bvh4.attach_bvh4).
This measures the actual table, the quantized alternative (the heap
kernel's 3-word uint16 packing, ops/pallas_bvh.py `_node_bounds4`),
and saves the vertex arrays for host-side iteration.
"""

import time

import numpy as np

t0 = time.time()
from tpu_pathtracer.models.shapes import knot_zoo_scene  # noqa: E402

scene, cam = knot_zoo_scene(512, 512, nu=1664, nv=262)
print('scene built', round(time.time() - t0, 1), flush=True)
mesh = scene.mesh
v0 = np.asarray(mesh.v0)
v1 = np.asarray(mesh.v1)
v2 = np.asarray(mesh.v2)
print('pulled', v0.shape, round(time.time() - t0, 1), flush=True)

from tpu_pathtracer.native import native_bvh4_binary  # noqa: E402
from tpu_pathtracer.ops.bvh4 import A_NS, TRI_NS, _collapse4  # noqa: E402

sane = np.isfinite(v0).all(1)
t1 = time.time()
built = native_bvh4_binary(v0[sane], v1[sane], v2[sane], 64, 16,
                           ci=TRI_NS * 64 / A_NS, ct=1.0)
print('native binary build s:', round(time.time() - t1, 2), flush=True)
bmin, bmax, c0, c1, order, lf, lc, db = built
print('binary nodes:', len(c0), 'depth:', db, flush=True)
t1 = time.time()
bounds, refs, clusters, depth4 = _collapse4(bmin, bmax, c0, c1, lf, lc)
print('collapse s:', round(time.time() - t1, 2), 'n4:', len(refs) // 4,
      'clusters:', len(clusters), flush=True)
fb = (bounds.size + refs.size) * 4
qb = (len(refs) // 4 * 12 + refs.size) * 4
print(f'f32 {fb >> 10} KB quant {qb >> 10} KB depth4 {depth4}', flush=True)
np.save('/tmp/dragon_v0.npy', v0)
np.save('/tmp/dragon_v1.npy', v1)
np.save('/tmp/dragon_v2.npy', v2)
print('saved verts', flush=True)
