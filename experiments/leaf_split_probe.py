"""Leaf-visit entry-split telemetry on hardware (VERDICT r4 item 1b).

The BVH4 kernels' non-speculative double-buffer prefetch covers only
pop-entered leaf visits (stack top peeked at the previous visit);
descend-entered visits pay the sync DMA path (~388 ns vs ~140 ns,
experiments/dma_probe.py). The new leaf_pop counter measures the split
on real renders, sizing the ceiling of a descend-entered prefetch
before building one.

Run: timeout 1800 python experiments/leaf_split_probe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def probe(name, scene, cam, cfg):
    import jax
    import jax.numpy as jnp

    from tpu_pathtracer.engine.regen import render_regen

    scfg = cfg.replace(stats=True)
    t0 = time.time()
    _, stats = jax.jit(lambda s, c: render_regen(s, c, scfg,
                                                 ns=jnp.uint32(cfg.ns))
                       )(scene, cam)
    nl, nlp = int(stats.leaf_visits), int(stats.leaf_pop)
    nb, nsg = int(stats.nodes_both), int(stats.nodes_single)
    frac = nlp / max(nl, 1)
    # ceiling: descend-entered visits that could drop 388->140 ns
    save_ms = (nl - nlp) * 248e-6
    print(f"{name}: steps={nb + nsg} leaf={nl} pop-entered={nlp} "
          f"({frac:.1%}) descend-entered={nl - nlp} "
          f"prefetch-ceiling~{save_ms:.0f} ms/frame "
          f"[{time.time() - t0:.0f}s]")


def main():
    import jax

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.mesh import procedural_staircase_scene
    from tpu_pathtracer.models.shapes import (knot_zoo_scene,
                                              terrain_zoo_scene)

    print("devices:", jax.devices())
    cfg = RenderConfig(nx=256, ny=256, ns=4, max_depth=50, textures=False)
    scene, cam = knot_zoo_scene(cfg.nx, cfg.ny)
    print("knot bvh4:", scene.mesh.bvh4 is not None)
    probe("knot-102k 256x256@4spp", scene, cam, cfg)

    tscene, tcam = terrain_zoo_scene(cfg.nx, cfg.ny)
    print("terrain bvh4:", tscene.mesh.bvh4 is not None)
    probe("terrain-168k 256x256@4spp", tscene, tcam, cfg)

    hcfg = RenderConfig(nx=600, ny=400, ns=2, max_depth=64)
    hscene, hcam = procedural_staircase_scene(hcfg.nx, hcfg.ny,
                                              prims_per_leaf=64, sub=20)
    print("stairs-hires bvh4:", hscene.mesh.bvh4 is not None)
    probe("stairs-hires-154k 600x400@2spp", hscene, hcam, hcfg)


if __name__ == "__main__":
    main()
