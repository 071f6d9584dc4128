"""SAH vs median on the hires staircase (indoor packet worst case)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_scene(use_native: bool):
    import tpu_pathtracer.native as nat
    nat._TRIED = True
    nat._LIB = None
    if use_native:
        nat._TRIED = False
        assert nat._load() is not None
    from tpu_pathtracer.models.mesh import procedural_staircase_scene
    return procedural_staircase_scene(1200, 800, prims_per_leaf=128, sub=20)


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.engine.regen import _render_regen_jit

    cfg = RenderConfig(nx=1200, ny=800, ns=spp, max_depth=64,
                       rays_per_chunk=65536)
    print("device:", jax.devices()[0])
    for name, use_native in (("median", False), ("sah", True)):
        scene, cam = build_scene(use_native)
        np.asarray(_render_regen_jit(scene, cam, cfg, jnp.uint32(1),
                                     jnp.uint32(0), normalize=False))
        t0 = time.perf_counter()
        fb = _render_regen_jit(scene, cam, cfg, jnp.uint32(spp),
                               jnp.uint32(0), normalize=False)
        fb.block_until_ready()
        a = np.asarray(fb)
        el = time.perf_counter() - t0
        print(f"{name}: {el:.3f} s ({el/spp*1e3:.0f} ms/spp) "
              f"mean={a.mean()/spp:.5f}")


if __name__ == "__main__":
    main()
