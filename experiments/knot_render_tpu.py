"""End-to-end TPU render timing for the large-mesh packet-BVH path.

Usage: python experiments/knot_render_tpu.py [nu nv spp [nx ny]]
"""

import sys
import time

import jax
import numpy as np

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.engine.regen import render_sample_range
from tpu_pathtracer.models.shapes import knot_zoo_scene

nu = int(sys.argv[1]) if len(sys.argv) > 1 else 512
nv = int(sys.argv[2]) if len(sys.argv) > 2 else 100
spp = int(sys.argv[3]) if len(sys.argv) > 3 else 4
nx = int(sys.argv[4]) if len(sys.argv) > 4 else 512
ny = int(sys.argv[5]) if len(sys.argv) > 5 else 512
pool = int(sys.argv[6]) if len(sys.argv) > 6 else 0

print("devices:", jax.devices())
cfg = RenderConfig(nx=nx, ny=ny, ns=spp, max_depth=50, textures=False,
                   rays_per_chunk=pool)
scene, cam = knot_zoo_scene(nx, ny, nu=nu, nv=nv)
print(f"tris={scene.mesh.num_tris} image={nx}x{ny} spp={spp}")

t0 = time.perf_counter()
img = render_sample_range(scene, cam, cfg, 0, 1)  # warm: compile + 1 spp
t_compile = time.perf_counter() - t0
print(f"first spp (incl compile): {t_compile:.1f} s; mean={img.mean():.4f}")

t0 = time.perf_counter()
acc = img.copy()
done = 1
while done < spp:
    take = min(2, spp - done)
    acc += render_sample_range(scene, cam, cfg, done, take)
    done += take
dt = time.perf_counter() - t0
per_spp = dt / max(spp - 1, 1)
paths = nx * ny * (spp - 1)
print(f"steady: {per_spp:.2f} s/spp  ({paths / dt / 1e6:.2f} Mpaths/s)")
img = acc / spp

from tpu_pathtracer.utils.image import write_png  # noqa: E402
write_png("/tmp/knot_tpu.png", img)
print("wrote /tmp/knot_tpu.png mean", float(img.mean()))
