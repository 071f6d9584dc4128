"""Where do the knot's 228 ms/spp go? (TPU)

The coherent-ray probe implies only ~45 ms/spp of traversal — a 5x gap
to the measured frame. This renders with stats on and compares the
render's EFFECTIVE node-steps-per-packet against the probe's coherent
84/packet (w=64): if bounce packets take many more steps, incoherence
is the gap (H1); if steps match, the frame is dominated by non-kernel
overhead (H2) and the optimization target changes entirely.
"""

import sys
import time

import jax
import jax.numpy as jnp

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.engine.regen import render_regen
from tpu_pathtracer.models.shapes import knot_zoo_scene

print("devices:", jax.devices(), flush=True)
if "--stairs" in sys.argv:
    from tpu_pathtracer.models.mesh import procedural_staircase_scene

    cfg = RenderConfig(nx=1200, ny=800, ns=2, max_depth=64, stats=True)
    scene, cam = procedural_staircase_scene(1200, 800, prims_per_leaf=64,
                                            sub=20)
else:
    kw = {"nu": 1664, "nv": 262} if "--dragon" in sys.argv else {}
    cfg = RenderConfig(nx=512, ny=512, ns=4, max_depth=50, stats=True)
    scene, cam = knot_zoo_scene(512, 512, **kw)
fn = jax.jit(lambda s, c, n: render_regen(s, c, cfg, ns=n))
img, st = fn(scene, cam, jnp.uint32(1))
jax.block_until_ready(img)
t0 = time.perf_counter()
img, st = fn(scene, cam, jnp.uint32(4))
jax.block_until_ready(img)
wall = (time.perf_counter() - t0) / 4
p, s, sh = int(st.primary), int(st.secondary), int(st.shadows)
nb, nsg = int(st.nodes_both), int(st.nodes_single)
nl = int(st.leaf_visits)
spp = 4
near_rays = p + s
packets = near_rays / 1024 + sh / 1024
print(f"wall {wall * 1e3:.1f} ms/spp (stats on)")
print(f"rays/spp: primary {p // spp} secondary {s // spp} "
      f"shadow {sh // spp}")
print(f"node steps/spp: both {nb // spp} single {nsg // spp} "
      f"-> steps/packet {(nb + nsg) / packets:.1f} (probe coherent: 84)")
print(f"leaf visits/spp: {nl // spp} -> leafs/packet {nl / packets:.1f}")
# per-packet phase costs solved by experiments/incoh_phase.py (w=64):
a_ns, b_ns = 300.0, 1179.0
node_ms = (nb + nsg) / spp * a_ns / 1e6
leaf_ms = nl / spp * b_ns / 1e6
tot = node_ms + leaf_ms
print(f"phase est @ a={a_ns:.0f}ns/step b={b_ns:.0f}ns/leaf: "
      f"node {node_ms:.1f} + leaf {leaf_ms:.1f} = {tot:.1f} ms/spp "
      f"({tot / (wall * 1e3) * 100:.0f}% of wall; leaf share "
      f"{leaf_ms / tot * 100:.0f}%)")
