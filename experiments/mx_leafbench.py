"""Kernel-level A/B: exact packet traversal vs MXU-leaf variant (TPU).

Times one full nearest-hit traversal of coherence-sorted primary camera
rays over the knot mesh, with data dependencies chained inside one jit
(slope method — see experiments/tpu_micro.timed_slope for why).

Usage: python experiments/mx_leafbench.py [nu nv [n_rays]]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.engine.wavefront import _ray_sort_key
from tpu_pathtracer.models.shapes import knot_zoo_scene
from tpu_pathtracer.ops.pallas_bvh import build_packet_mesh, packet_trace
from tpu_pathtracer.ops.pallas_bvh_mx import build_packet_mx, packet_trace_mx
from tpu_pathtracer.ops.v3 import V3
from tpu_pathtracer.ops.vec import FLT_MAX

nu = int(sys.argv[1]) if len(sys.argv) > 1 else 512
nv = int(sys.argv[2]) if len(sys.argv) > 2 else 128
n = int(sys.argv[3]) if len(sys.argv) > 3 else 65536

print("devices:", jax.devices())
scene, cam = knot_zoo_scene(512, 512, nu=nu, nv=nv)
mesh = scene.mesh
print("tris:", mesh.num_tris)

# sorted primary rays for a 256x256 crop => coherent like the engine path
side = int(np.sqrt(n))
pix = jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(side * side)
origin, direction = cam.generate_rays(
    pix, jnp.zeros((n,), jnp.uint32), side, side)
key = _ray_sort_key(scene, origin, direction)
_, ox, oy, oz, dx, dy, dz = jax.lax.sort(
    (key, origin.x, origin.y, origin.z,
     direction.x, direction.y, direction.z), num_keys=1)
o0, d0 = V3(ox, oy, oz), V3(dx, dy, dz)

pm = build_packet_mesh(mesh, max_width=32)
mxm = build_packet_mx(mesh, max_width=32)


def chain(trace_fn):
    @jax.jit
    def run(steps, perturb):
        def body(_, carry):
            o, acc = carry
            (t, tri, *_), cnt = trace_fn(o)
            tt = jnp.where(tri >= 0, t, 0.0)
            o = V3(o.x + tt * 0.0, o.y, o.z)  # data dep, no drift
            return o, acc + tt.sum() + cnt[0] + cnt[1]
        o = V3(o0.x + perturb * 1e-6, o0.y, o0.z)
        _, acc = jax.lax.fori_loop(0, steps, body,
                                   (o, jnp.float32(0.0)))
        return acc
    return run


def bench(name, fn, lo=2, hi=12):
    run = chain(fn)
    float(run(lo, 0))
    float(run(hi, 0))

    def t(steps):
        best = 1e9
        for r in range(1, 4):
            t0 = time.perf_counter()
            v = float(run(steps, r))
            best = min(best, time.perf_counter() - t0)
            assert v == v
        return best
    per = (t(hi) - t(lo)) / (hi - lo)
    print(f"{name}: {per * 1e3:.2f} ms/traversal "
          f"({n / per / 1e6:.1f} Mrays/s)")
    return per


bench("exact", lambda o: packet_trace(
    o, d0, FLT_MAX, pm.nodes, pm.blocks, pm.tri_feat, pm.cl_first,
    pm.width, 1e-3, stride=pm.stride, cpb=pm.cpb,
    smem_nodes=pm.smem_nodes, top_rows=pm.top_rows, nodes_top=pm.nodes_top))
for p in (3, 6):
    bench(f"mx p={p}", lambda o, p=p: packet_trace_mx(
        o, d0, FLT_MAX, mxm.pm.nodes, mxm.gblocks, mxm.tri_geom,
        mxm.pm.cl_first, mxm.pm.width, 1e-3, center=mxm.center, passes=p,
        smem_nodes=mxm.pm.smem_nodes, top_rows=mxm.pm.top_rows,
        nodes_top=mxm.pm.nodes_top))
