"""Dragon multi-packet re-A/B after scratch refs + packed blocks (r4).

The r3 multi-packet verdict (every packs>1 variant loses 2-10% e2e)
predates two state-diet changes that targeted exactly its failure
mode (a): packet_scratch moved the per-pack (8,128) closest/occ tiles
out of the while carry (branch-boundary spills scale with P), and
packed blocks halved the leaf DMA. The isolated-latency win stands
(338/211/142 ns per node step at P=1/2/4, dual_probe); this checks
whether the production mp kernels can cash it NOW on the dragon (the
only production heap-kernel workload; node phase ~155 ms of its
413 ms/spp).

Usage: python experiments/dragon_mp_ab.py [ns]
"""

import sys

import jax

from bench import _render_batched
from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.models.shapes import knot_zoo_scene


def main():
    ns = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print("devices:", jax.devices(), flush=True)
    cfg = RenderConfig(nx=512, ny=512, ns=ns, max_depth=50,
                       textures=False)
    scene, cam = knot_zoo_scene(cfg.nx, cfg.ny, nu=1664, nv=262)
    for tag, c in (("p1", cfg), ("p2", cfg.replace(packet_packs=2)),
                   ("p4", cfg.replace(packet_packs=4)),
                   ("p1b", cfg.replace(packet_threshold=8191))):
        best, mean = 1e9, 0.0
        for _ in range(2):
            el, img = _render_batched(scene, cam, c, ns, ns)
            best, mean = min(best, el), img.mean()
        print(f"  dragon {tag:4s}: {best:.3f} s "
              f"({best / ns * 1e3:.1f} ms/spp) mean={mean:.6f}",
              flush=True)


if __name__ == "__main__":
    main()
