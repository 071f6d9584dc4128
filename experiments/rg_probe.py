"""A/B the regrouped packet kernel vs the scalar kernel on hardware.

Coherent primaries (mostly dense visits -> expect near parity) and
bounce-like rays (sparse visits -> the demand-regroup win), on the
real knot/dragon meshes. Verifies winner equality (tri ids identical,
t within FMA-contraction tolerance) and times one traversal of 131k
sorted rays via the chained-dispatch method.

Usage: python experiments/rg_probe.py [--dragon] [dense_thresh ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from experiments.incoh_phase import bounce_rays, n, primary_rays
from tpu_pathtracer.engine.wavefront import _ray_sort_key
from tpu_pathtracer.models.shapes import knot_zoo_scene
from tpu_pathtracer.ops.pallas_bvh import packet_trace
from tpu_pathtracer.ops.pallas_bvh_rg import build_packet_rg, packet_trace_rg
from tpu_pathtracer.ops.v3 import V3
from tpu_pathtracer.ops.vec import FLT_MAX

argv = sys.argv[1:]
kw_scene = {}
if argv and argv[0] == "--dragon":
    kw_scene = {"nu": 1664, "nv": 262}
    argv = argv[1:]
thresholds = [int(x) for x in argv] or [160]

print("devices:", jax.devices())
scene, cam = knot_zoo_scene(512, 512, prims_per_leaf=64, **kw_scene)
mesh = scene.mesh
rg = build_packet_rg(mesh, max_width=64)
pm = rg.pm
print(f"tris={int(mesh.num_tris)} clusters={pm.cl_first} width={pm.width} "
      f"smem={pm.smem_nodes} quant={pm.quant}", flush=True)


kw = dict(smem_nodes=pm.smem_nodes, top_rows=pm.top_rows,
          nodes_top=pm.nodes_top, quant=pm.quant, qparams=pm.qparams)


def trace_a(o, d, tree_min=False, prefetch=False):
    return packet_trace(o, d, FLT_MAX, pm.nodes, pm.blocks, pm.tri_feat,
                        pm.cl_first, pm.width, 1e-3, stride=pm.stride,
                        cpb=pm.cpb, tree_min=tree_min, prefetch=prefetch,
                        **kw)


def trace_b(o, d, dt, prof=None):
    return packet_trace_rg(o, d, FLT_MAX, pm.nodes, pm.blocks,
                           rg.blocks_rg, pm.tri_feat, pm.cl_first,
                           pm.width, 1e-3, stride=pm.stride,
                           dense_thresh=dt, prof=prof, **kw)


def chain(trace_fn, o0, d0):
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


for rname, rays in (("coherent", primary_rays(scene, cam)),
                    ("bounce", bounce_rays(scene))):
    o0, d0 = rays  # already coherence-sorted by incoh_phase helpers
    print(f"  {rname}:", flush=True)
    (ta, ia, *_), cnt_a = trace_a(o0, d0)
    ta, ia = np.asarray(ta), np.asarray(ia)
    print(f"    scalar counts {[int(x) for x in cnt_a]} "
          f"hits {(ia >= 0).sum()}", flush=True)
    for dt in thresholds:
        (tb, ib, *_), cnt_b = trace_b(o0, d0, dt)
        tb, ib = np.asarray(tb), np.asarray(ib)
        rel = np.abs(ta - tb) / np.maximum(np.abs(ta), 1e-30)
        same_i = np.array_equal(ia, ib)
        # at equal-t ties across the dense/sparse boundary tri may
        # differ; confirm every tri mismatch has equal t
        mism = ia != ib
        tie_ok = bool(np.all(ta[mism] == tb[mism])) if mism.any() else True
        print(f"    rg(dt={dt}): counts {[int(x) for x in cnt_b]} "
              f"hits {(ib >= 0).sum()} t maxrel {rel.max():.2e} "
              f"tri eq {same_i} (mism {int(mism.sum())}, ties_ok "
              f"{tie_ok})", flush=True)
    bench("scalar   ", trace_a, o0, d0)
    # sibling-pair prefetch (bit-exact; see _kernel_nearest pf)
    (tp_, ip_, *_), _ = trace_a(o0, d0, prefetch=True)
    tp_, ip_ = np.asarray(tp_), np.asarray(ip_)
    print(f"    pf bit-exact: tri {np.array_equal(ia, ip_)} "
          f"t {np.array_equal(ta, tp_)}", flush=True)
    bench("scalar pf", lambda o, d: trace_a(o, d, prefetch=True), o0, d0)
    # min-tree leaf reduction (dependency diet), with and without pf
    (tc_, ic_, *_), _ = trace_a(o0, d0, tree_min=True)
    tc_, ic_ = np.asarray(tc_), np.asarray(ic_)
    print(f"    tm bit-exact: tri {np.array_equal(ia, ic_)} "
          f"t {np.array_equal(ta, tc_)}", flush=True)
    bench("scalar tm", lambda o, d: trace_a(o, d, tree_min=True), o0, d0)
    bench("scalar tm+pf",
          lambda o, d: trace_a(o, d, tree_min=True, prefetch=True),
          o0, d0)
    for dt in thresholds:
        bench(f"rg dt={dt:4d}", lambda o, d, dt=dt: trace_b(o, d, dt),
              o0, d0)
