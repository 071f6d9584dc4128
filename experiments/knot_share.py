"""Where do the knot's 228 ms/spp go? (TPU)

The coherent-ray probe implies only ~45 ms/spp of traversal — a 5x gap
to the measured frame. This renders with stats on and compares the
render's EFFECTIVE node-steps-per-packet against the probe's coherent
84/packet (w=64): if bounce packets take many more steps, incoherence
is the gap (H1); if steps match, the frame is dominated by non-kernel
overhead (H2) and the optimization target changes entirely.
"""

import time

import jax
import jax.numpy as jnp

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.engine.regen import render_regen
from tpu_pathtracer.models.shapes import knot_zoo_scene

print("devices:", jax.devices(), flush=True)
cfg = RenderConfig(nx=512, ny=512, ns=4, max_depth=50, stats=True)
scene, cam = knot_zoo_scene(512, 512)
fn = jax.jit(lambda s, c, n: render_regen(s, c, cfg, ns=n))
img, st = fn(scene, cam, jnp.uint32(1))
jax.block_until_ready(img)
t0 = time.perf_counter()
img, st = fn(scene, cam, jnp.uint32(4))
jax.block_until_ready(img)
wall = (time.perf_counter() - t0) / 4
p, s, sh = int(st.primary), int(st.secondary), int(st.shadows)
nb, nsg = int(st.nodes_both), int(st.nodes_single)
spp = 4
near_rays = p + s
packets = near_rays / 1024 + sh / 1024
print(f"wall {wall * 1e3:.1f} ms/spp (stats on)")
print(f"rays/spp: primary {p // spp} secondary {s // spp} "
      f"shadow {sh // spp}")
print(f"node steps/spp: both {nb // spp} single {nsg // spp} "
      f"-> steps/packet {(nb + nsg) / packets:.1f} (probe coherent: 84)")
est_node_ns = 150
print(f"node-phase est: {(nb + nsg) / spp * est_node_ns / 1e6:.1f} ms/spp"
      f" @ {est_node_ns} ns/step")
