"""Offline sweep of the SAH builder's cost constants (ct, n_bins).

The BVH4 builder (ops/bvh4.py + the native bvh4_build_binary) takes a
leaf-termination constant ct (node-step cost of *not* splitting,
relative to A_NS) and a bin count.  ct=1.0 / n_bins=16 were the first
guess; with the native builder at ~0.1 s/build the whole grid can be
swept through the packet-trace simulator (experiments/topo_sim.py) on
CPU.  The simulator charges A_NS per *binary* node step while the real
collapsed BVH4 kernel covers ~2 binary levels per step, so the model
cost is printed under both weightings (A and A/2) — a pick should be
robust to either before an e2e A/B is spent on it.

Usage: JAX_PLATFORMS=cpu python experiments/sah_cost_sweep.py [scene ...]
"""

import sys
import time

import numpy as np

from experiments.topo_sim import (A_NS, TRI_NS, WIDTH, PACKET, Tree,
                                  sample_packets, trace_packet)
from tpu_pathtracer.native import native_bvh4_binary


def tree_from_native(v0, v1, v2, width, n_bins, ct):
    r = native_bvh4_binary(v0, v1, v2, width, n_bins,
                           ci=TRI_NS * width / A_NS, ct=ct)
    if r is None:
        raise SystemExit("native builder unavailable")
    bmin, bmax, c0, c1, order, lf, lc, depth = r
    t = Tree()
    t.bmin = bmin
    t.bmax = bmax
    leaf = c0 < 0
    t.c0 = np.where(leaf, -(lf + 1), c0).astype(np.int64)
    t.c1 = np.where(leaf, lc, c1).astype(np.int64)
    t.tv0 = v0[order]
    t.te1 = (v1 - v0)[order]
    t.te2 = (v2 - v0)[order]
    t.n_leaves = int(leaf.sum())
    t.depth = depth
    return t


def main():
    from tpu_pathtracer.models.shapes import terrain_zoo_scene
    from tpu_pathtracer.models.mesh import procedural_staircase_scene
    from experiments.incoh_phase import bounce_rays, primary_rays, n

    which = sys.argv[1:] or ["terrain", "stairs"]
    for name in which:
        if name == "stairs":
            scene, cam = procedural_staircase_scene(
                512, 512, prims_per_leaf=WIDTH, sub=16)
        else:
            scene, cam = terrain_zoo_scene(512, 512, prims_per_leaf=WIDTH)
        mesh = scene.mesh
        sane = np.isfinite(np.asarray(mesh.v0)).all(1)
        v0 = np.asarray(mesh.v0)[sane]
        v1 = np.asarray(mesh.v1)[sane]
        v2 = np.asarray(mesh.v2)[sane]
        print(f"{name}: {v0.shape[0]} tris", flush=True)

        packs = {}
        for rname, rays in (("coherent", primary_rays(scene, cam)),
                            ("bounce", bounce_rays(scene))):
            o3 = sample_packets([rays[0].x, rays[0].y, rays[0].z], n)
            d3 = sample_packets([rays[1].x, rays[1].y, rays[1].z], n)
            packs[rname] = (np.stack(o3, 1).astype(np.float32),
                            np.stack(d3, 1).astype(np.float32))

        for n_bins in (16, 32):
            for ct in (0.3, 0.6, 1.0, 1.8, 3.0):
                t0 = time.time()
                tree = tree_from_native(v0, v1, v2, WIDTH, n_bins, ct)
                fill = v0.shape[0] / (tree.n_leaves * WIDTH)
                line = (f"  bins={n_bins:2d} ct={ct:3.1f}: "
                        f"{tree.n_leaves:5d} leaves fill={fill:.2f} "
                        f"d{tree.depth:2d} |")
                for rname, (o, d) in packs.items():
                    tot_s = tot_v = 0
                    n_pk = o.shape[0] // PACKET
                    for p in range(n_pk):
                        sl = slice(p * PACKET, (p + 1) * PACKET)
                        s, v = trace_packet(tree, 0, o[sl], d[sl])
                        tot_s += s
                        tot_v += v
                    leaf_ns = TRI_NS * WIDTH * tot_v / n_pk
                    full = (A_NS * tot_s / n_pk + leaf_ns) \
                        * (131072 / PACKET) / 1e6
                    half = (A_NS / 2 * tot_s / n_pk + leaf_ns) \
                        * (131072 / PACKET) / 1e6
                    line += (f" {rname}: s={tot_s / n_pk:5.0f} "
                             f"v={tot_v / n_pk:5.0f} "
                             f"A={full:6.2f} A/2={half:6.2f} |")
                print(line + f" ({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
