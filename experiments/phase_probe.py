"""Width sweep of the packet kernels with phase telemetry (TPU).

For each leaf width, times one nearest-hit traversal of coherent
primary rays (slope method, data-dep chained in one jit) for the exact
scalar kernel and the MXU leaf kernel, and prints per-packet telemetry
(node steps, leaf-cluster visits) so per-step / per-visit costs can be
regressed across widths:

    t_traversal ~= a(width) * node_steps + b(width) * leaf_visits

Usage: python experiments/phase_probe.py [--dragon] [width ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.engine.wavefront import _ray_sort_key
from tpu_pathtracer.models.shapes import knot_zoo_scene
from tpu_pathtracer.ops.pallas_bvh import build_packet_mesh, packet_trace
from pallas_bvh_mr import build_packet_mr, packet_trace_mr
from tpu_pathtracer.ops.pallas_bvh_mx import build_packet_mx, packet_trace_mx
from tpu_pathtracer.ops.v3 import V3
from tpu_pathtracer.ops.vec import FLT_MAX

argv = sys.argv[1:]
kw = {}
if argv and argv[0] == "--dragon":
    kw = {"nu": 1664, "nv": 262}
    argv = argv[1:]
widths = [int(w) for w in argv] or [32, 64, 128]
n = 65536

print("devices:", jax.devices())


def make_rays(scene, cam):
    side = int(np.sqrt(n))
    pix = jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(side * side)
    origin, direction = cam.generate_rays(
        pix, jnp.zeros((n,), jnp.uint32), side, side)
    key = _ray_sort_key(scene, origin, direction)
    _, ox, oy, oz, dx, dy, dz = jax.lax.sort(
        (key, origin.x, origin.y, origin.z,
         direction.x, direction.y, direction.z), num_keys=1)
    return V3(ox, oy, oz), V3(dx, dy, dz)


def chain(trace_fn):
    @jax.jit
    def run(steps, perturb):
        def body(_, carry):
            o, acc = carry
            (t, tri, *_), cnt = trace_fn(o)
            tt = jnp.where(tri >= 0, t, 0.0)
            o = V3(o.x + tt * 0.0, o.y, o.z)  # data dep, no drift
            return o, acc + tt.sum() + cnt[0]
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
    _, cnt = fn(o0)
    packets = n // 1024
    print(f"  {name}: {per * 1e3:6.2f} ms/trav ({n / per / 1e6:5.1f} Mrays/s)"
          f"  steps/pkt={float(cnt[0] + cnt[1]) / packets:7.1f}"
          f"  leafs/pkt={float(cnt[2]) / packets:7.1f}", flush=True)
    return per


for w in widths:
    scene, cam = knot_zoo_scene(512, 512, prims_per_leaf=w, **kw)
    mesh = scene.mesh
    o0, d0 = make_rays(scene, cam)
    pm = build_packet_mesh(mesh, max_width=w)
    print(f"width={w} tris={mesh.num_tris} smem_nodes={pm.smem_nodes} "
          f"top_rows={pm.top_rows}")
    bench("exact", lambda o: packet_trace(
        o, d0, FLT_MAX, pm.nodes, pm.blocks, pm.tri_feat, pm.cl_first,
        pm.width, 1e-3, stride=pm.stride, cpb=pm.cpb,
        smem_nodes=pm.smem_nodes, top_rows=pm.top_rows,
        nodes_top=pm.nodes_top))
    try:
        pmr = build_packet_mr(mesh, max_width=w)
        bench("multirow", lambda o: packet_trace_mr(
            o, d0, FLT_MAX, pmr.ntab, pmr.blocks, pmr.tri_feat,
            pmr.cl_first, pmr.width, pmr.n_blocks, 1e-3))
    except Exception as e:
        import traceback
        traceback.print_exc()
        print(f"  multirow: FAILED ({e!r})"[:200], flush=True)
    if pm.width * 4 < 128:  # MX gblock minor dim must fill a lane tile
        continue
    mxm = build_packet_mx(mesh, max_width=w)
    bench("mx p3 ", lambda o: packet_trace_mx(
        o, d0, FLT_MAX, mxm.pm.nodes, mxm.gblocks, mxm.tri_geom,
        mxm.pm.cl_first, mxm.pm.width, 1e-3, center=mxm.center, passes=3,
        smem_nodes=mxm.pm.smem_nodes, top_rows=mxm.pm.top_rows,
        nodes_top=mxm.pm.nodes_top))
