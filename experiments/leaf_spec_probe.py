"""Accuracy of the cheapest pre-vote leaf-DMA predictor (VERDICT r4
item 1a): at a BVH4 node step, the child refs r0..r3 are scalar SMEM
reads available BEFORE the ~300 ns vote round trip; a speculative DMA
of the FIRST LEAF REF IN TABLE ORDER could start under the vote wait.
This probe counts, on real renders, how often a descend-into-leaf
actually descends into that predicted cluster.

Break-even (from dma_probe numbers): save ~248 ns when right, pay up
to ~300 ns drain when wrong -> needs ~55%+ accuracy to be worth
building. NEE is disabled so the shadow kernel's (unprobed) counters
don't pollute the sums; bounce-ray distribution is unchanged.

Run: timeout 1800 python experiments/leaf_spec_probe.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")


def probe(name, scene, cam, cfg):
    import jax
    import jax.numpy as jnp

    from tpu_pathtracer.engine.regen import render_regen

    import dataclasses
    scene = dataclasses.replace(scene, use_nee=False)
    scfg = cfg.replace(stats=True)
    t0 = time.time()
    _, stats = jax.jit(lambda s, c: render_regen(s, c, scfg,
                                                 ns=jnp.uint32(cfg.ns))
                       )(scene, cam)
    desc = int(stats.nodes_both)      # probe: leaf-descends
    hit = int(stats.nodes_single)     # probe: predictor correct
    print(f"{name}: leaf-descends={desc} predictor-hits={hit} "
          f"accuracy={hit / max(desc, 1):.1%} [{time.time() - t0:.0f}s]")


def main():
    import jax

    import tpu_pathtracer.ops.pallas_bvh4 as P4
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.mesh import procedural_staircase_scene
    from tpu_pathtracer.models.shapes import (knot_zoo_scene,
                                              terrain_zoo_scene)

    P4.packet_trace4 = functools.partial(P4.packet_trace4,
                                         spec_probe=True)
    print("devices:", jax.devices())
    cfg = RenderConfig(nx=256, ny=256, ns=4, max_depth=50, textures=False)
    scene, cam = knot_zoo_scene(cfg.nx, cfg.ny)
    probe("knot-102k 256x256@4spp", scene, cam, cfg)

    tscene, tcam = terrain_zoo_scene(cfg.nx, cfg.ny)
    probe("terrain-168k 256x256@4spp", tscene, tcam, cfg)

    hcfg = RenderConfig(nx=600, ny=400, ns=2, max_depth=64,
                        textures=False)
    hscene, hcam = procedural_staircase_scene(hcfg.nx, hcfg.ny,
                                              prims_per_leaf=64, sub=20)
    probe("stairs-hires-154k 600x400@2spp", hscene, hcam, hcfg)


if __name__ == "__main__":
    main()
