"""Pool-size re-probe after the round-3 carry diet (TPU).

The r1 sweep read >128k lanes as a regression (HBM carry spill), but
the u/v defer dropped two (8,128) carry tiles per packet and the fused
body shrank the loop. Re-test 128k/192k/256k on the knot end-to-end.

Usage: python experiments/pool_probe.py [--dragon]
"""

import sys
import time

import jax
import jax.numpy as jnp

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.engine.regen import _render_regen_jit
from tpu_pathtracer.models.shapes import knot_zoo_scene

kw = {"nu": 1664, "nv": 262} if "--dragon" in sys.argv else {}
print("devices:", jax.devices(), flush=True)
scene, cam = knot_zoo_scene(512, 512, **kw)
for pool in (131072, 196608, 262144):
    cfg = RenderConfig(nx=512, ny=512, ns=16, max_depth=50,
                       rays_per_chunk=pool)
    fb = _render_regen_jit(scene, cam, cfg, jnp.uint32(1),
                           jnp.uint32(0), normalize=False)
    fb.block_until_ready()
    t0 = time.perf_counter()
    fb = _render_regen_jit(scene, cam, cfg, jnp.uint32(8),
                           jnp.uint32(1), normalize=False)
    fb.block_until_ready()
    per = (time.perf_counter() - t0) / 8
    print(f"pool={pool}: {per * 1e3:7.1f} ms/spp "
          f"(mean={float(jnp.mean(fb)) / 9:.5f})", flush=True)
