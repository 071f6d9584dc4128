"""Hardware A/B: heap-kernel scratch-ref lane state (config.
packet_scratch) on the dragon-class 872k-tri knot, vs the carry-tile
baseline. The heap kernel has more cond joins per trip than BVH4
(fused body + quad nesting), so the scalars-only-join win could exceed
BVH4's +1-2%. Interleaved ABAB within-run; images must be
bit-identical.
"""

import time

import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.engine.regen import _render_regen_jit
from tpu_pathtracer.models.shapes import knot_zoo_scene

t0 = time.time()
cfg = RenderConfig(nx=512, ny=512, ns=4, max_depth=50, textures=False)
scene, cam = knot_zoo_scene(cfg.nx, cfg.ny, nu=1664, nv=262)
print("scene built", round(time.time() - t0, 1), flush=True)

cfg_a = cfg.replace(packet_scratch=False)
cfg_b = cfg.replace(packet_scratch=True)


def frame(c, s0):
    fb = _render_regen_jit(scene, cam, c, jnp.uint32(4),
                           jnp.uint32(s0), normalize=False)
    fb.block_until_ready()
    return np.asarray(fb)


for name, c in (("carry", cfg_a), ("scratch", cfg_b)):
    t1 = time.time()
    img = frame(c, 0)
    print(f"{name} compile+warm {time.time() - t1:.1f} s "
          f"mean={img.mean():.5f}", flush=True)

imgs = {}
times = {"carry": [], "scratch": []}
for rep in range(3):
    for name, c in (("carry", cfg_a), ("scratch", cfg_b)):
        t1 = time.time()
        img = frame(c, 1)
        el = time.time() - t1
        times[name].append(el)
        imgs[name] = img
        print(f"rep{rep} {name}: {el:.3f} s "
              f"({el / cfg.ns * 1e3:.1f} ms/spp)", flush=True)

diff = np.abs(imgs["carry"] - imgs["scratch"]).max()
print(f"max |carry - scratch| (same samples) = {diff:.3e}")
ba, bb = min(times["carry"]), min(times["scratch"])
print(f"BEST carry {ba / cfg.ns * 1e3:.1f} ms/spp  "
      f"scratch {bb / cfg.ns * 1e3:.1f} ms/spp  ratio {ba / bb:.3f}x")
