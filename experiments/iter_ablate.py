"""Per-iteration cost ablation of the exact packet kernel (TPU).

Compiles stripped variants of ``_kernel_nearest`` that visit the SAME
node/leaf sequence (traversal state untouched) but skip leaf work:

    full    — production kernel (DMA + unrolled MT)
    nomt    — leaf = DMA + pop only (no triangle tests)
    noleaf  — leaf = pop only (no DMA either)

full-nomt   = MT cost;  nomt-noleaf = DMA-wait cost;
noleaf      = node steps + pop cycles + loop/cond overhead.

The stripped variants return garbage hits — they are timing probes only.
The visit sequence matches the production kernel only while cl stays
t_max (no hits commit), which holds since MT is skipped: the stripped
kernels visit MORE than production (no cl culling), so per-iteration
costs derived here are lower bounds. Telemetry counts are printed for
the honest denominator.

Usage: python experiments/iter_ablate.py [width]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pathtracer.engine.wavefront import _ray_sort_key
from tpu_pathtracer.models.shapes import knot_zoo_scene
from tpu_pathtracer.ops.pallas_bvh import (
    ROWS, _advance, _ctz32, _mt_scalar_tri, _node_bounds, _pad_rays,
    _slab, build_packet_mesh, packet_trace)
from tpu_pathtracer.ops.v3 import V3
from tpu_pathtracer.ops.vec import FLT_MAX

w = int(sys.argv[1]) if len(sys.argv) > 1 else 64
n = 65536

print("devices:", jax.devices())
scene, cam = knot_zoo_scene(512, 512, prims_per_leaf=w)
mesh = scene.mesh
side = int(np.sqrt(n))
pix = jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(side * side)
origin, direction = cam.generate_rays(
    pix, jnp.zeros((n,), jnp.uint32), side, side)
key = _ray_sort_key(scene, origin, direction)
_, ox, oy, oz, dx, dy, dz = jax.lax.sort(
    (key, origin.x, origin.y, origin.z,
     direction.x, direction.y, direction.z), num_keys=1)
o0, d0 = V3(ox, oy, oz), V3(dx, dy, dz)
pm = build_packet_mesh(mesh, max_width=w)
assert pm.smem_nodes and pm.cpb == 1


def _kernel_ablate(ox, oy, oz, dx, dy, dz, tmax, nodes, blocks, t_out,
                   cnt_out, *, cl_first, width, stride, t_min, mode):
    def scoped(blk, sem, ntab):
        nd = pltpu.make_async_copy(nodes, ntab, sem)
        nd.start()
        nd.wait()
        o1, o2, o3 = ox[:, :], oy[:, :], oz[:, :]
        d1, d2, d3 = dx[:, :], dy[:, :], dz[:, :]
        i1, i2, i3 = 1.0 / d1, 1.0 / d2, 1.0 / d3
        n1, n2, n3 = i1 < 0.0, i2 < 0.0, i3 < 0.0
        shp = o1.shape

        def node_fn(carry):
            idx, bs, nb, nl, closest, acc = carry
            l = idx * 2
            bl, br = _node_bounds(True, 0, nodes, ntab, l)
            lhit = _slab(bl, o1, o2, o3, i1, i2, i3, n1, n2, n3, closest)
            rhit = _slab(br, o1, o2, o3, i1, i2, i3, n1, n2, n3, closest)
            new_idx, new_bs, both, single = _advance(idx, bs, lhit, rhit,
                                                     closest, l)
            nb = nb + both.astype(jnp.int32) + single.astype(jnp.int32)
            return (new_idx, new_bs, nb, nl, closest, acc)

        def leaf_fn(carry):
            idx, bs, nb, nl, closest, acc = carry
            nl = nl + 1
            c = idx - cl_first
            if mode != "noleaf":
                dma = pltpu.make_async_copy(blocks.at[c], blk, sem)
                dma.start()
                dma.wait()
            if mode == "full":
                for t_i in range(width):
                    t, u, v, bad = _mt_scalar_tri(
                        blk, 0, t_i, stride, o1, o2, o3, d1, d2, d3,
                        t_min, closest)
                    acc = acc + jnp.where(bad, 0.0, t)
            elif mode != "noleaf":
                acc = acc + blk[0, 0]  # keep the DMA live
            m = jnp.where(bs > 0, _ctz32(bs), 0)
            new_bs = (bs >> m.astype(jnp.uint32)) ^ jnp.uint32(1)
            new_idx = (idx >> m) ^ 1
            return (new_idx, new_bs, nb, nl, closest, acc)

        def body(carry):
            return jax.lax.cond(carry[0] >= cl_first, leaf_fn, node_fn,
                                carry)

        init = (jnp.int32(1), jnp.uint32(1), jnp.int32(0), jnp.int32(0),
                tmax[:, :], jnp.zeros(shp, jnp.float32))
        _, _, nb, nl, _, acc = jax.lax.while_loop(
            lambda c: c[0] > 0, body, init)
        ii = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
        t_out[:, :] = acc
        cnt_out[:, :] = jnp.where(
            (ii == 0) & (jj == 0), nb,
            jnp.where((ii == 0) & (jj == 1), nl, 0))

    pl.run_scoped(scoped, blk=pltpu.SMEM(blocks.shape[1:], jnp.float32),
                  sem=pltpu.SemaphoreType.DMA(()),
                  ntab=pltpu.SMEM(nodes.shape, jnp.float32))


@functools.partial(jax.jit, static_argnames=("mode",))
def trace_ablate(origin, direction, mode):
    n_pad = ((n + ROWS * 128 - 1) // (ROWS * 128)) * (ROWS * 128)
    t_max_b = jnp.full((n,), FLT_MAX, jnp.float32)
    args = [
        _pad_rays(origin.x, 0.0, n_pad), _pad_rays(origin.y, 0.0, n_pad),
        _pad_rays(origin.z, 0.0, n_pad),
        _pad_rays(direction.x, 1.0, n_pad),
        _pad_rays(direction.y, 0.0, n_pad),
        _pad_rays(direction.z, 0.0, n_pad),
        _pad_rays(t_max_b, 0.0, n_pad), pm.nodes, pm.blocks,
    ]
    ray_spec = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    node_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    blk_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    acc, cnt = pl.pallas_call(
        functools.partial(_kernel_ablate, cl_first=pm.cl_first,
                          width=pm.width, stride=pm.stride, t_min=1e-3,
                          mode=mode),
        grid=(n_pad // (ROWS * 128),),
        in_specs=[ray_spec] * 7 + [node_spec, blk_spec],
        out_specs=(ray_spec, ray_spec),
        out_shape=(jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
    )(*args)
    return acc, (cnt[::ROWS, 0].sum(), cnt[::ROWS, 1].sum())


def chain(mode):
    @jax.jit
    def run(steps, perturb):
        def body(_, carry):
            o, acc2 = carry
            a, cnt = trace_ablate(o, V3(dx, dy, dz), mode)
            s = a.sum()
            o = V3(o.x + s * 0.0, o.y, o.z)
            return o, acc2 + s + cnt[0]
        o = V3(o0.x + perturb * 1e-6, o0.y, o0.z)
        _, acc2 = jax.lax.fori_loop(0, steps, body, (o, jnp.float32(0.0)))
        return acc2
    return run


for mode in ("full", "nomt", "noleaf"):
    run = chain(mode)
    float(run(2, 0))
    float(run(12, 0))

    def t(steps):
        best = 1e9
        for r in range(1, 4):
            t0 = time.perf_counter()
            v = float(run(steps, r))
            best = min(best, time.perf_counter() - t0)
            assert v == v
        return best
    per = (t(12) - t(2)) / 10
    _, cnt = trace_ablate(o0, d0, mode)
    pk = n // 1024
    print(f"{mode:7s}: {per * 1e3:6.2f} ms/trav  steps/pkt="
          f"{float(cnt[0]) / pk:7.1f} leafs/pkt={float(cnt[1]) / pk:7.1f}",
          flush=True)
