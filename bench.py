"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline workload (BASELINE.md): random-spheres 1200×800 @ 100 spp,
max depth 50 — the reference's final README state ran it in 6.48 s on a
GTX 1050 (README.md:94). ``vs_baseline`` is baseline_time / our_time
(>1 = faster than the reference).

Extra context (Mrays/s, staircase time, SSIM gate) goes to stderr.
"""

import json
import sys
import time

import jax
import numpy as np


BASELINE_SECONDS = 6.48  # README.md:94, GTX 1050


def main():
    from tpu_pathtracer.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.engine.regen import render_image_regen
    from tpu_pathtracer.models.spheres import random_spheres_scene

    cfg = RenderConfig(nx=1200, ny=800, ns=100, max_depth=50)
    scene, cam = random_spheres_scene(cfg.nx, cfg.ny)

    # warmup / compile (ns is dynamic: same executable as the real run)
    render_image_regen(scene, cam, cfg, ns=1)

    t0 = time.perf_counter()
    img = render_image_regen(scene, cam, cfg, ns=cfg.ns)
    elapsed = time.perf_counter() - t0

    # path count is exact (one per pixel*sample); ray count per path varies.
    # Report primary-path throughput; Mrays/s proper needs stats (slower).
    paths = cfg.num_pixels * cfg.ns
    mpaths = paths / elapsed / 1e6

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    print(f"random-spheres 1200x800@100spp: {elapsed:.3f} s "
          f"({mpaths:.1f} Mpaths/s, mean={img.mean():.4f})", file=sys.stderr)

    print(json.dumps({
        "metric": "random_spheres_1200x800_100spp_wall_clock",
        "value": round(elapsed, 4),
        "unit": "seconds",
        "vs_baseline": round(BASELINE_SECONDS / elapsed, 3),
    }))


if __name__ == "__main__":
    main()
