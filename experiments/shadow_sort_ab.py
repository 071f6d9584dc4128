"""Shadow-packet sort key A/B (VERDICT r3 item 4) — TPU, within-run.

NEE shadow rays all aim at one light, so the generic scatter key's
direction octant is origin-correlated. Candidates (config.shadow_sort):
  scatter  octant(dir)<<15 | morton15(origin)   (prod)
  origin   morton15(origin) only
  light    octant(light-origin)<<15 | morton15(origin)

The reference measured shadow traversal at ~50% of its render time
(TODO.txt:559); our r2 measurement says ~18% on staircase-hires after
the any-hit/tail-compaction work — so even a 15% shadow-visit cut is
only ~3% e2e, and the A/B must be within-run to clear the ±4% session
noise.

Usage: python experiments/shadow_sort_ab.py [knot stairs ...]
"""

import sys
import time

import jax

from bench import _render_batched
from tpu_pathtracer.config import RenderConfig


def _scene(name):
    if name == "knot":
        from tpu_pathtracer.models.shapes import knot_zoo_scene
        cfg = RenderConfig(nx=512, ny=512, ns=8, max_depth=50,
                           textures=False)
        scene, cam = knot_zoo_scene(cfg.nx, cfg.ny)
    elif name == "stairs":
        from tpu_pathtracer.models.mesh import procedural_staircase_scene
        cfg = RenderConfig(nx=1200, ny=800, ns=2, max_depth=64)
        scene, cam = procedural_staircase_scene(1200, 800,
                                                prims_per_leaf=64, sub=20)
    else:
        raise SystemExit(f"unknown scene {name}")
    return scene, cam, cfg


def main():
    which = sys.argv[1:] or ["knot", "stairs"]
    print("devices:", jax.devices(), flush=True)
    for name in which:
        scene, cam, cfg = _scene(name)
        for mode in ("scatter", "origin", "light", "scatter"):
            c = cfg.replace(shadow_sort=mode)
            best, mean = 1e9, 0.0
            for _ in range(2):
                el, img = _render_batched(scene, cam, c, cfg.ns, cfg.ns)
                best, mean = min(best, el), img.mean()
            print(f"  {name} {mode:8s}: {best:.3f} s "
                  f"({best / cfg.ns * 1e3:.1f} ms/spp) "
                  f"mean={mean:.6f}", flush=True)


if __name__ == "__main__":
    main()
