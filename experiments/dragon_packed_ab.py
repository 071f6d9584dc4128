"""Packed (4 KB, cpb=1) heap cluster blocks on the dragon — TPU A/B.

At width 64 the heap kernel's ``packed=True`` layout is a single
cluster per (8,128) block: cpb=1, stride=64, all SMEM indices still
compile-time static (the r2 "packed blocks -12%" result was cpb>1 at
width 16/32 with dynamic row offsets). It halves every leaf DMA — the
per-visit overhead the r4 decomposition measured as the entire
leaf-phase gap — at the cost of disabling the speculative pair
prefetch (stride<128), which on the dragon was worth only ~0.7%
(oct_e2e_ab r3).

Usage: python experiments/dragon_packed_ab.py [ns]
"""

import dataclasses
import sys

import jax

from bench import _render_batched
from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.models.shapes import knot_zoo_scene
from tpu_pathtracer.ops.pallas_bvh import build_packet_mesh


def main():
    ns = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print("devices:", jax.devices(), flush=True)
    cfg = RenderConfig(nx=512, ny=512, ns=ns, max_depth=50,
                       textures=False)
    scene, cam = knot_zoo_scene(cfg.nx, cfg.ny, nu=1664, nv=262)
    pm_legacy = build_packet_mesh(scene.mesh, packed=False)
    pm_packed = build_packet_mesh(scene.mesh, packed=True)
    print(f"legacy: stride={pm_legacy.stride} cpb={pm_legacy.cpb} "
          f"blocks={pm_legacy.blocks.shape}", flush=True)
    print(f"packed: stride={pm_packed.stride} cpb={pm_packed.cpb} "
          f"blocks={pm_packed.blocks.shape}", flush=True)

    # monkeypatch the packet-mesh builder choice via a prebuilt view:
    # make_view builds the packet mesh itself, so instead A/B through
    # config-free dispatch by attaching prebuilt PacketMesh... simplest:
    # patch build_packet_mesh's default.
    import tpu_pathtracer.engine.wavefront as wf
    import tpu_pathtracer.ops.pallas_bvh as pb
    orig = pb.build_packet_mesh

    for i, (tag, packed) in enumerate((("packed", True),
                                       ("legacy", False),
                                       ("packed2", True))):
        def patched(mesh, max_width=128, **kw):
            kw["packed"] = packed
            return orig(mesh, max_width=max_width, **kw)
        pb.build_packet_mesh = patched
        # distinct config objects so the engine's jit cache re-traces;
        # packet_threshold 8190..8192 never changes dispatch (the mesh
        # is far above all three) so the work is identical
        c = cfg.replace(packet_threshold=8192 - i)
        best, mean = 1e9, 0.0
        for _ in range(2):
            el, img = _render_batched(scene, cam, c, ns, ns)
            best, mean = min(best, el), img.mean()
        print(f"  dragon {tag:7s}: {best:.3f} s "
              f"({best / ns * 1e3:.1f} ms/spp) mean={mean:.6f}",
              flush=True)
    pb.build_packet_mesh = orig


if __name__ == "__main__":
    main()
