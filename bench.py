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
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.engine.render import render_image
    from tpu_pathtracer.models.spheres import random_spheres_scene
    from tpu_pathtracer.engine.wavefront import Stats

    cfg = RenderConfig(nx=1200, ny=800, ns=100, max_depth=50, stats=False)
    scene, cam = random_spheres_scene(cfg.nx, cfg.ny)

    # warmup / compile
    wcfg = cfg.replace(ns=1)
    render_image(scene, cam, wcfg)

    t0 = time.perf_counter()
    img = render_image(scene, cam, cfg)
    elapsed = time.perf_counter() - t0

    # ray accounting for Mrays/s: count actual rays with stats on a
    # subsampled run (stats add masked-sum overhead; estimate rate from the
    # full-res timing and the stats-run ray count scaled by spp).
    scfg = cfg.replace(ns=4, stats=True)
    _, stats = render_image(scene, cam, scfg, report_stats=True)
    rays_per_spp = (stats["primary"] + stats["secondary"]
                    if isinstance(stats, dict) else
                    (stats.primary + stats.secondary)) / 4.0
    total_rays = rays_per_spp * cfg.ns
    mrays = total_rays / elapsed / 1e6

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    print(f"random-spheres 1200x800@100spp: {elapsed:.3f} s "
          f"({mrays:.1f} Mrays/s, mean={img.mean():.4f})", file=sys.stderr)

    print(json.dumps({
        "metric": "random_spheres_1200x800_100spp_wall_clock",
        "value": round(elapsed, 4),
        "unit": "seconds",
        "vs_baseline": round(BASELINE_SECONDS / elapsed, 3),
    }))


if __name__ == "__main__":
    main()
