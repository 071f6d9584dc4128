"""e2e A/B of the descend-entered speculative leaf DMA
(config.bvh4_spec) in the BVH4 nearest kernel.

The split counter measured 52-65% of leaf visits descend-entered
(paying the ~388 ns sync DMA the pop-prefetch can't cover), and the
first-leaf-ref-in-table-order predictor hits 53-59% of actual leaf
descends (leaf_spec_probe). The spec variant issues that cluster's
copy into a dedicated 3rd SMEM slot BEFORE the vote round trip, so a
correct guess turns sync into (mostly-)hidden. Bit-identical
(tests/test_bvh4.py).

Within-run off/spec/off2 bracketing per scene (run-to-run variance
+/-4%; only within-run deltas are meaningful).

Usage: timeout 3000 python experiments/bvh4_spec_ab.py [knot terrain stairs]
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
            ("spec", dataclasses.replace(cfg, bvh4_spec=True)),
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
