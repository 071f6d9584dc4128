"""A/B the tree_min leaf-loop restructure on hardware (TPU).

tree_min replaces the serial per-triangle running-closest chain
(cmp -> or -> not -> select, x width) with a streaming pairwise
(t, w) min-tree against the visit-ENTRY closest — same op count,
chain depth log2(width)x3 instead of width x4. Bit-exact by
construction (ties keep the lower triangle index). This probe
times one nearest-hit traversal of sorted coherent primaries for
both variants and asserts identical (t, tri) outputs.

Usage: python experiments/treemin_probe.py [--dragon] [width ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.engine.wavefront import _ray_sort_key
from tpu_pathtracer.models.shapes import knot_zoo_scene
from tpu_pathtracer.ops.pallas_bvh import build_packet_mesh, packet_trace
from tpu_pathtracer.ops.v3 import V3
from tpu_pathtracer.ops.vec import FLT_MAX

argv = sys.argv[1:]
kw = {}
if argv and argv[0] == "--dragon":
    kw = {"nu": 1664, "nv": 262}
    argv = argv[1:]
widths = [int(w) for w in argv] or [64]
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


def chain(trace_fn, o0):
    @jax.jit
    def run(steps, perturb):
        def body(_, carry):
            o, acc = carry
            (t, tri, *_), cnt = trace_fn(o)
            tt = jnp.where(tri >= 0, t, 0.0)
            o = V3(o.x + tt * 0.0, o.y, o.z)
            return o, acc + tt.sum() + cnt[0]
        o = V3(o0.x + perturb * 1e-6, o0.y, o0.z)
        _, acc = jax.lax.fori_loop(0, steps, body,
                                   (o, jnp.float32(0.0)))
        return acc
    return run


def bench(name, fn, o0, lo=2, hi=12):
    run = chain(fn, o0)
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
    print(f"  {name}: {per * 1e3:6.2f} ms/trav ({n / per / 1e6:5.1f} "
          f"Mrays/s)", flush=True)
    return per


for w in widths:
    scene, cam = knot_zoo_scene(512, 512, prims_per_leaf=w, **kw)
    mesh = scene.mesh
    o0, d0 = make_rays(scene, cam)
    pm = build_packet_mesh(mesh, max_width=w)
    print(f"width={w} tris={mesh.num_tris} smem_nodes={pm.smem_nodes} "
          f"quant={pm.quant}")

    def trace(o, tree_min):
        return packet_trace(
            o, d0, FLT_MAX, pm.nodes, pm.blocks, pm.tri_feat, pm.cl_first,
            pm.width, 1e-3, stride=pm.stride, cpb=pm.cpb,
            smem_nodes=pm.smem_nodes, top_rows=pm.top_rows,
            nodes_top=pm.nodes_top, quant=pm.quant, qparams=pm.qparams,
            tree_min=tree_min)

    (t_a, tri_a, *_), _ = trace(o0, False)
    (t_b, tri_b, *_), _ = trace(o0, True)
    t_a, tri_a, t_b, tri_b = map(np.asarray, (t_a, tri_a, t_b, tri_b))
    same_t = np.array_equal(t_a, t_b)
    same_i = np.array_equal(tri_a, tri_b)
    print(f"  exactness: t identical={same_t} tri identical={same_i} "
          f"(hits={int((tri_a >= 0).sum())})")
    if not same_i:
        d = np.nonzero(tri_a != tri_b)[0]
        print(f"    {d.size} tri mismatches, first {d[:5]}; "
              f"t equal there: {np.array_equal(t_a[d], t_b[d])}")
    bench("exact    ", lambda o: trace(o, False), o0)
    bench("tree_min ", lambda o: trace(o, True), o0)
