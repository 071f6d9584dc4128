"""Leaf-cluster width sweep for the packet BVH (TPU).

The staircase-hires analysis (PERFORMANCE.md) shows each packet visits
~110 leaf clusters — the *union* of lane needs, so leaf work, not node
work, is the wall. Narrower clusters cull finer (fewer triangles tested)
at the price of more node steps and half-empty 8 KB DMA blocks. This
sweeps prims_per_leaf/packet_width together on one scene.

Usage: python experiments/width_sweep.py [--knot|--dragon] [--exact]
           [spp] [width ...]

``--exact`` flips ``mx_leaf`` off (scalar leaf loop) for an A/B at each
width; default benches the MXU leaf path.
"""

import sys
import time

import jax.numpy as jnp
import numpy as np

MX = True


def run(width, spp, scene_kind):
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.engine.regen import _render_regen_jit

    if scene_kind in ("knot", "dragon"):
        from tpu_pathtracer.models.shapes import knot_zoo_scene
        cfg = RenderConfig(nx=512, ny=512, ns=spp, max_depth=50,
                           textures=False, rays_per_chunk=65536,
                           packet_width=width, mx_leaf=MX)
        kw = ({"nu": 1664, "nv": 262} if scene_kind == "dragon" else {})
        scene, cam = knot_zoo_scene(512, 512, prims_per_leaf=width, **kw)
    else:
        from tpu_pathtracer.models.mesh import procedural_staircase_scene
        cfg = RenderConfig(nx=1200, ny=800, ns=spp, max_depth=64,
                           rays_per_chunk=65536, packet_width=width,
                           mx_leaf=MX)
        scene, cam = procedural_staircase_scene(1200, 800,
                                                prims_per_leaf=width,
                                                sub=20)
    np.asarray(_render_regen_jit(scene, cam, cfg, jnp.uint32(1),
                                 jnp.uint32(0), normalize=False))
    t0 = time.perf_counter()
    fb = _render_regen_jit(scene, cam, cfg, jnp.uint32(spp),
                           jnp.uint32(0), normalize=False)
    fb.block_until_ready()
    a = np.asarray(fb)
    el = time.perf_counter() - t0
    print(f"{scene_kind} width={width:4d}: {el:7.3f} s "
          f"({el/spp*1e3:5.0f} ms/spp) mean={a.mean()/spp:.6f}", flush=True)


def main():
    global MX
    argv = sys.argv[1:]
    kind = "stairs"
    while argv and argv[0].startswith("--"):
        if argv[0] in ("--knot", "--dragon"):
            kind = argv[0][2:]
        elif argv[0] == "--exact":
            MX = False
        argv = argv[1:]
    spp = int(argv[0]) if argv else 2
    widths = [int(w) for w in argv[1:]] or [128, 64, 32]
    for w in widths:
        run(w, spp, kind)


if __name__ == "__main__":
    main()
