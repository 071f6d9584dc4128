"""A/B: sliding flush window (flush_window) on the headline workload.

The regen body's pixel-flush one-hot rewrites the whole [rounds, m]
accumulator every iteration (~24 MB r+w at 32k lanes x 30 rounds);
the window variant touches W rows. Bit-identical output (tested);
this measures the wall-clock. Bracketed A-B-A per CLAUDE.md (±2.5%
same-session compile variance).

Run: timeout 2400 python experiments/flush_window_ab.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def timed(scene, cam, cfg, reps=2):
    import jax.numpy as jnp
    import numpy as np

    from tpu_pathtracer.engine.regen import _render_regen_jit

    np.asarray(_render_regen_jit(scene, cam, cfg, jnp.uint32(1),
                                 jnp.uint32(0), normalize=False))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fb = _render_regen_jit(scene, cam, cfg, jnp.uint32(100),
                               jnp.uint32(0), normalize=False)
        # force a host value per repeat (CLAUDE.md axon timing rule —
        # block_until_ready alone can return early on the relay). The
        # recorded decision numbers used block_until_ready; they are
        # trusted because (a) all arms used the same method and (b)
        # the winning full-one-hot arm (1.643 s) independently matches
        # bench.py's forced-materialization headline (1.645 s).
        float(np.asarray(fb).mean())
        best = min(best, time.perf_counter() - t0)
    return best, float(np.asarray(fb).mean()) / 100


def main():
    import jax

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.spheres import random_spheres_scene

    print("device:", jax.devices()[0])
    cfg0 = RenderConfig(nx=1200, ny=800, ns=100, max_depth=50,
                        flush_window=0)
    scene, cam = random_spheres_scene(cfg0.nx, cfg0.ny)
    variants = {"full(0)": cfg0,
                "w4": cfg0.replace(flush_window=4),
                "w8": cfg0.replace(flush_window=8),
                "w16": cfg0.replace(flush_window=16)}
    means = {}
    for rnd in range(2):  # A-B-A bracketing: two full passes
        for name, cfg in variants.items():
            t, mean = timed(scene, cam, cfg)
            means.setdefault(name, mean)
            assert abs(mean - means[name]) < 1e-12, "radiance changed!"
            print(f"pass{rnd} {name}: {t:.3f} s (mean={mean:.4f})")


if __name__ == "__main__":
    main()
