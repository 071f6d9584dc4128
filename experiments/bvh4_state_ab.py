"""e2e A/B of BVH4 kernel state options (TPU): scratch-ref lane state
(config.bvh4_scratch) x double-buffered leaf DMA (config.bvh4_pf).

scratch: the per-lane closest/besti (8,128) tiles move from the
while-loop carry into VMEM scratch refs, so the node/leaf lax.cond
joins carry only scalars — testing whether tile materialization /
relayout at the two branch boundaries of every trip is a real part of
the measured per-trip serialization (the leaf-phase bound,
PERFORMANCE.md round 3 "regrouped leaf phase").

pf: the explicit-stack leaf prefetch (non-speculative), off pending
this A/B.

Within-run off/X/off2 per scene (run-to-run variance is +/-4%).

Usage: PYTHONPATH=. python experiments/bvh4_state_ab.py [terrain stairs knot]
"""

import dataclasses
import sys

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
            ("scr", dataclasses.replace(cfg, bvh4_scratch=True)),
            ("pf", dataclasses.replace(cfg, bvh4_pf=True)),
            ("both", dataclasses.replace(cfg, bvh4_pf=True,
                                         bvh4_scratch=True)),
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
