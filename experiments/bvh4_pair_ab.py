"""e2e A/B of the all-leaf-children prefetch (config.bvh4_pair) in the
BVH4 nearest kernel — the heap pf2 idea (which measured -3.6/-4.0% on
dragon/rocks) translated to the explicit stack: every leaf child of a
node step is DMA'd pre-vote into its own child slot, so the descended
leaf AND its later-popped siblings are guaranteed-covered (zero
misprediction — unlike the failed 1-copy speculation, bvh4_spec_ab).

Within-run off/pair/off2 bracketing per scene.

Usage: timeout 3600 python experiments/bvh4_pair_ab.py [knot terrain stairs]
"""

import dataclasses
import sys

sys.path.insert(0, "/root/repo")

import jax

from bench import _render_batched
from experiments.bvh4_e2e_ab import _scene
from tpu_pathtracer.ops.bvh4 import attach_bvh4


def main():
    which = sys.argv[1:] or ["knot", "terrain", "stairs"]
    print("devices:", jax.devices(), flush=True)
    for name in which:
        scene, cam, cfg = _scene(name)
        if scene.mesh.bvh4 is None:
            scene = dataclasses.replace(
                scene, mesh=attach_bvh4(scene.mesh, width=64))
        variants = (
            ("off", cfg),
            ("pair", dataclasses.replace(cfg, bvh4_pair=True)),
            ("off2", cfg),
        )
        print(f"{name}:", flush=True)
        means = {}
        for tag, c in variants:
            best, mean = 1e9, 0.0
            for _ in range(2):
                el, img = _render_batched(scene, cam, c, cfg.ns, cfg.ns)
                best, mean = min(best, el), img.mean()
            means[tag] = mean
            print(f"  {tag:5s}: {best:.3f} s "
                  f"({best / cfg.ns * 1e3:.1f} ms/spp) mean={mean:.5f}",
                  flush=True)
        assert len(set(means.values())) == 1, f"radiance drift: {means}"


if __name__ == "__main__":
    main()
