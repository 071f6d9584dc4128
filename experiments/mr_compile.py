"""Fast hardware compile-check for the multirow packet kernel.

The kernel passes interpret-mode tests but Mosaic layout inference
rejects it ("Invalid relayout ... replicated in destination but not in
source for 'vector<8x128xi32>'"). This script compiles the real kernel
on a tiny mesh (remote compile fails in ~1 s) so kernel variants can be
bisected quickly.

Usage: python experiments/mr_compile.py [--run]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.models.shapes import knot_zoo_scene
from pallas_bvh_mr import (build_packet_mr,
                                              packet_occluded_mr,
                                              packet_trace_mr)
from tpu_pathtracer.ops.v3 import V3
from tpu_pathtracer.ops.vec import FLT_MAX

print("devices:", jax.devices())

scene, cam = knot_zoo_scene(64, 64, nu=64, nv=32, prims_per_leaf=32)
mesh = scene.mesh
pm = build_packet_mr(mesh, max_width=32)
print(f"tris={mesh.num_tris} cl_first={pm.cl_first} B={pm.n_blocks}")

n = 2048
rng = np.random.default_rng(0)
o = V3(*(jnp.asarray(rng.uniform(8, 12, n), jnp.float32) for _ in range(3)))
d = rng.standard_normal((3, n))
d /= np.linalg.norm(d, axis=0, keepdims=True)
d = V3(*(jnp.asarray(c, jnp.float32) for c in d))

for name, fn in (
    ("trace", lambda: packet_trace_mr(
        o, d, FLT_MAX, pm.ntab, pm.blocks, pm.tri_feat, pm.cl_first,
        pm.width, pm.n_blocks, 1e-3)),
    ("occluded", lambda: packet_occluded_mr(
        o, d, 14.0, pm.ntab, pm.blocks, pm.cl_first, pm.width,
        pm.n_blocks, 1e-3)),
):
    try:
        out = fn()
        jax.block_until_ready(out)
        if name == "trace":
            (t, tri, *_), cnt = out
            print(f"{name}: OK  hits={int((tri >= 0).sum())} "
                  f"cnt={[int(c) for c in cnt]}")
        else:
            occ, cnt = out
            print(f"{name}: OK  occ={int(occ.sum())} "
                  f"cnt={[int(c) for c in cnt]}")
    except Exception as e:
        msg = str(e)
        key = [ln for ln in msg.splitlines() if "Mosaic" in ln or
               "relayout" in ln.lower() or "INTERNAL" in ln][:3]
        print(f"{name}: FAILED")
        for ln in key:
            print("   ", ln[:300])
        sys.exit(1)
