"""Packed (4 KB) vs legacy (8 KB) BVH4 cluster blocks — TPU within-run.

leafmt_probe decomposition (r4): the per-visit overhead is entirely
the cluster DMA (sync +480 ns, double-buffered +200 ns over the
~700 ns MT). The packed layout halves the copied bytes; this measures
the e2e effect. The legacy arm is rebuilt from the packed blocks by
inverse transform, so both arms share the identical tree/tri order.

Usage: python experiments/packed_blk_ab.py [knot terrain dragon stairs]
"""

import dataclasses
import sys

import jax.numpy as jnp
import numpy as np
import jax

from bench import _render_batched
from tpu_pathtracer.config import RenderConfig


def _legacy_blocks(b4):
    """(C, 8, 128) packed -> (C, 16, 128) legacy, same values."""
    C = b4.blocks.shape[0]
    w = b4.width
    flat = np.asarray(b4.blocks).reshape(C, 1024)[:, : 12 * w]
    comps = flat.reshape(C, 12, w)
    blk = np.zeros((C, 16, 128), np.float32)
    blk[:, :12, :w] = comps
    return dataclasses.replace(b4, blocks=jnp.asarray(blk))


def _scene(name):
    if name == "terrain":
        from tpu_pathtracer.models.shapes import terrain_zoo_scene
        cfg = RenderConfig(nx=512, ny=512, ns=8, max_depth=50,
                           textures=False)
        scene, cam = terrain_zoo_scene(cfg.nx, cfg.ny)
    elif name == "knot":
        from tpu_pathtracer.models.shapes import knot_zoo_scene
        cfg = RenderConfig(nx=512, ny=512, ns=8, max_depth=50,
                           textures=False)
        scene, cam = knot_zoo_scene(cfg.nx, cfg.ny)
    elif name == "stairs":
        from tpu_pathtracer.models.mesh import procedural_staircase_scene
        cfg = RenderConfig(nx=1200, ny=800, ns=2, max_depth=64)
        scene, cam = procedural_staircase_scene(1200, 800,
                                                prims_per_leaf=64,
                                                sub=20)
    elif name == "big":
        from tpu_pathtracer.models.shapes import terrain_big_zoo_scene
        cfg = RenderConfig(nx=512, ny=512, ns=4, max_depth=50,
                           textures=False)
        scene, cam = terrain_big_zoo_scene(cfg.nx, cfg.ny)
    else:
        raise SystemExit(f"unknown scene {name}")
    return scene, cam, cfg


def main():
    which = sys.argv[1:] or ["knot", "terrain"]
    print("devices:", jax.devices(), flush=True)
    for name in which:
        scene, cam, cfg = _scene(name)
        assert scene.mesh.bvh4 is not None \
            and scene.mesh.bvh4.blocks.shape[1] == 8
        legacy = dataclasses.replace(
            scene, mesh=dataclasses.replace(
                scene.mesh, bvh4=_legacy_blocks(scene.mesh.bvh4)))
        for tag, sc in (("packed", scene), ("legacy", legacy),
                        ("packed2", scene)):
            best, mean = 1e9, 0.0
            for _ in range(2):
                el, img = _render_batched(sc, cam, cfg, cfg.ns, cfg.ns)
                best, mean = min(best, el), img.mean()
            print(f"  {name} {tag:7s}: {best:.3f} s "
                  f"({best / cfg.ns * 1e3:.1f} ms/spp) "
                  f"mean={mean:.6f}", flush=True)


if __name__ == "__main__":
    main()
