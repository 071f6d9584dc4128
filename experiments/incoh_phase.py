"""Node-vs-leaf cost split for INCOHERENT bounce packets (TPU).

phase_probe regressed per-step/per-visit costs on coherent primaries;
knot_share showed bounce packets take ~3.4x the node steps. This probe
measures the exact packet kernel on two ray sets over the same mesh —
coherent camera primaries and synthetic diffuse bounce rays (surface
origins + cosine-hemisphere directions, production sort) — and solves

    t = a * node_steps + b * leaf_visits

per width from the two (time, steps, leafs) points. The a/b split on
the *bounce* set says which phase to attack for the knot/dragon gap.

Usage: python experiments/incoh_phase.py [--dragon] [width ...]
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

n = 131072


def sort_rays(scene, origin, direction):
    key = _ray_sort_key(scene, origin, direction)
    _, ox, oy, oz, dx, dy, dz = jax.lax.sort(
        (key, origin.x, origin.y, origin.z,
         direction.x, direction.y, direction.z), num_keys=1)
    return V3(ox, oy, oz), V3(dx, dy, dz)


def primary_rays(scene, cam):
    side = int(np.sqrt(n))
    pix = jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(side * side)
    o, d = cam.generate_rays(pix, jnp.zeros((n,), jnp.uint32), side, side)
    return sort_rays(scene, o, d)


def bounce_rays(scene):
    """Diffuse bounce stand-ins: origins on random surface points,
    cosine-hemisphere directions around the face normal."""
    mesh = scene.mesh
    nt = int(mesh.num_tris)  # not shape[0]: padded slots hold NaN verts
    rng = np.random.default_rng(7)
    ti = rng.integers(0, nt, n)
    v0 = np.asarray(mesh.v0)[ti]
    e1 = np.asarray(mesh.v1)[ti] - v0
    e2 = np.asarray(mesh.v2)[ti] - v0
    r1, r2 = rng.random(n), rng.random(n)
    flip = r1 + r2 > 1.0
    r1 = np.where(flip, 1.0 - r1, r1)
    r2 = np.where(flip, 1.0 - r2, r2)
    p = v0 + r1[:, None] * e1 + r2[:, None] * e2
    nrm = np.cross(e1, e2)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
    # cosine hemisphere around nrm
    u1, u2 = rng.random(n), rng.random(n)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    lx, ly, lz = r * np.cos(phi), r * np.sin(phi), np.sqrt(1 - u1)
    a = np.where(np.abs(nrm[:, 2:3]) < 0.9, [0.0, 0.0, 1.0], [1.0, 0.0, 0.0])
    t1 = np.cross(a, nrm)
    t1 /= np.maximum(np.linalg.norm(t1, axis=1, keepdims=True), 1e-12)
    t2 = np.cross(nrm, t1)
    d = lx[:, None] * t1 + ly[:, None] * t2 + lz[:, None] * nrm
    o = p + 1e-3 * nrm
    origin = V3(*(jnp.asarray(o[:, i], jnp.float32) for i in range(3)))
    direction = V3(*(jnp.asarray(d[:, i], jnp.float32) for i in range(3)))
    return sort_rays(scene, origin, direction)


def timed(pm, o0, d0, trace=None):
    if trace is None:
        def trace(o):
            return packet_trace(
                o, d0, FLT_MAX, pm.nodes, pm.blocks, pm.tri_feat,
                pm.cl_first, pm.width, 1e-3, stride=pm.stride, cpb=pm.cpb,
                smem_nodes=pm.smem_nodes, top_rows=pm.top_rows,
                nodes_top=pm.nodes_top, quant=pm.quant, qparams=pm.qparams)

    @jax.jit
    def run(steps, perturb):
        def body(_, carry):
            o, acc = carry
            (t, tri, *_), cnt = trace(o)
            tt = jnp.where(tri >= 0, t, 0.0)
            return V3(o.x + tt * 0.0, o.y, o.z), acc + tt.sum() + cnt[0]
        o = V3(o0.x + perturb * 1e-6, o0.y, o0.z)
        _, acc = jax.lax.fori_loop(0, steps, body, (o, jnp.float32(0.0)))
        return acc

    float(run(2, 0)), float(run(12, 0))

    def t(steps):
        best = 1e9
        for r in range(1, 4):
            t0 = time.perf_counter()
            v = float(run(steps, r))
            best = min(best, time.perf_counter() - t0)
            assert v == v
        return best
    per = (t(12) - t(2)) / 10
    _, cnt = trace(o0)
    packets = n // 1024
    steps = float(cnt[0] + cnt[1]) / packets
    leafs = float(cnt[2]) / packets
    return per, steps, leafs


if __name__ != "__main__":
    widths = []
else:
    argv = sys.argv[1:]
    kw = {}
    if argv and argv[0] == "--dragon":
        kw = {"nu": 1664, "nv": 262}
        argv = argv[1:]
    widths = [int(w) for w in argv] or [32, 64]
    print("devices:", jax.devices(), flush=True)

for w in widths:
    scene, cam = knot_zoo_scene(512, 512, prims_per_leaf=w, **kw)
    pm = build_packet_mesh(scene.mesh, max_width=w)
    print(f"width={w} tris={scene.mesh.num_tris} "
          f"smem_nodes={pm.smem_nodes}", flush=True)
    rows = {}
    for name, rays in (("coherent", primary_rays(scene, cam)),
                       ("bounce", bounce_rays(scene))):
        per, steps, leafs = timed(pm, *rays)
        rows[name] = (per, steps, leafs)
        print(f"  {name:9s}: {per * 1e3:7.2f} ms/trav "
              f"steps/pkt={steps:7.1f} leafs/pkt={leafs:7.1f}", flush=True)
    (tc, sc, lc), (ti_, si, li) = rows["coherent"], rows["bounce"]
    packets = n / 1024
    det = sc * li - si * lc
    if abs(det) > 1e-6:
        a = (tc * li - ti_ * lc) / det / packets
        b = (ti_ * sc - tc * si) / det / packets
        print(f"  solve: a={a * 1e9:6.1f} ns/step b={b * 1e9:6.1f} ns/leaf"
              f" -> bounce split node {a * si / (a * si + b * li) * 100:4.1f}%"
              f" leaf {b * li / (a * si + b * li) * 100:4.1f}%", flush=True)
