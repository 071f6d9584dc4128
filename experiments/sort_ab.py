"""Bounce-coherence A/B: sort-key variants x pool size (TPU).

knot_share measured bounce packets at 3.4x the node steps of coherent
primaries — the visit union, not kernel cost, dominates the frame. Two
candidate levers, each a fresh compile:

  key=v1   — production key: 3-bit direction octant + 15-bit origin
             morton (engine/wavefront._ray_sort_key)
  key=v2   — 6-bit direction (octant + axis-dominance permutation) +
             15-bit origin morton: bounce rays from one surface patch
             split by direction cone, shrinking per-packet direction
             spread at the cost of splitting origin clusters
  pool     — 65536 (production) vs 131072 lanes: a bigger sort window
             makes denser key-neighborhoods per 1024-lane packet, but
             >~128k regressed in round 1 (HBM carry spill)

Usage: python experiments/sort_ab.py
"""

import time

import jax
import jax.numpy as jnp

import tpu_pathtracer.engine.wavefront as wf
from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.engine.regen import _render_regen_jit
from tpu_pathtracer.models.shapes import knot_zoo_scene
from tpu_pathtracer.ops.v3 import V3

print("devices:", jax.devices(), flush=True)

_key_v1 = wf._ray_sort_key


def _key_v2(scene, origin, direction):
    base = _key_v1(scene, origin, direction)  # octant<<15 | morton15
    ax = jnp.abs(direction.x)
    ay = jnp.abs(direction.y)
    az = jnp.abs(direction.z)
    perm = ((ax > ay).astype(jnp.uint32)
            | ((ay > az).astype(jnp.uint32) << 1)
            | ((ax > az).astype(jnp.uint32) << 2))
    return (base >> 15 << 18) | (perm << 15) | (base & 0x7FFF)


scene, cam = knot_zoo_scene(512, 512)
for key_name, key_fn in (("v1", _key_v1), ("v2", _key_v2)):
    wf._ray_sort_key = key_fn
    for pool in (65536, 131072):
        # packet_threshold is semantically inert here (mesh is far
        # above either value) but busts the jit cache per key variant —
        # the sort key is closed over, not part of the cache key
        cfg = RenderConfig(nx=512, ny=512, ns=16, max_depth=50,
                           rays_per_chunk=pool,
                           packet_threshold=8192 if key_name == "v1"
                           else 8191)
        fb = _render_regen_jit(scene, cam, cfg, jnp.uint32(1),
                               jnp.uint32(0), normalize=False)
        fb.block_until_ready()
        t0 = time.perf_counter()
        fb = _render_regen_jit(scene, cam, cfg, jnp.uint32(8),
                               jnp.uint32(1), normalize=False)
        fb.block_until_ready()
        per = (time.perf_counter() - t0) / 8
        print(f"key={key_name} pool={pool}: {per * 1e3:7.1f} ms/spp "
              f"(mean={float(jnp.mean(fb)) / 9:.5f})", flush=True)
wf._ray_sort_key = _key_v1
