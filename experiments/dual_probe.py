"""Dual/quad-packet node-phase probe (TPU).

The packet kernel's node step costs ~300 ns but only ~40 ns of it is
VPU slab work — the rest is the scalar<->vector round trip: issue slab
ops, reduce votes to scalars, stall until the reduction lands, advance.
If P independent packets ride one kernel block ((8P,128) rays, P scalar
traversal states) with the body shaped as phase-1 "issue ALL packets'
slabs + vote reductions", phase-2 "consume votes, advance each packet",
the in-order vector queue executes packet B's slabs during packet A's
vote stall — amortizing the round-trip latency ~P ways. This probe
measures pure node-phase traversal (leaves pop immediately, closest
fixed at t_max) for P in {1, 2, 4} on real trees + real sorted bounce
rays. Convoying (the block runs until its slowest packet finishes) is
included in the measurement.

Usage: python experiments/dual_probe.py [--dragon-ish] [P ...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pathtracer.models.shapes import knot_zoo_scene
from tpu_pathtracer.ops.pallas_bvh import (_advance, _slab,
                                           build_packet_mesh)
from experiments.incoh_phase import bounce_rays

_FLT_MAX = 3.4028235e38


def _kernel(ox, oy, oz, dx, dy, dz, nodes, steps_out, *, cl_first, P):
    def scoped(ntab, sem):
        nd = pltpu.make_async_copy(nodes, ntab, sem)
        nd.start()
        nd.wait()

        tiles = []
        for p in range(P):
            r = slice(8 * p, 8 * (p + 1))
            o1, o2, o3 = ox[r, :], oy[r, :], oz[r, :]
            d1, d2, d3 = dx[r, :], dy[r, :], dz[r, :]
            i1, i2, i3 = 1.0 / d1, 1.0 / d2, 1.0 / d3
            tiles.append((o1, o2, o3, i1, i2, i3,
                          i1 < 0.0, i2 < 0.0, i3 < 0.0))
        closest = jnp.full((8, 128), _FLT_MAX, jnp.float32)

        from tpu_pathtracer.ops.pallas_bvh import _pop

        def body(carry):
            idxs, bss, ns_ = carry
            # phase 1: issue every live packet's slabs + vote reductions
            # (branchless: a packet sitting on a leaf or dead reads a
            # CLAMPED row — garbage discarded below — so the SMEM loads
            # never go out of bounds and the instruction stream stays
            # straight-line across packets)
            votes = []
            for p in range(P):
                o1, o2, o3, i1, i2, i3, n1, n2, n3 = tiles[p]
                l = jnp.minimum(idxs[p], cl_first - 1) * 2
                b = l * 6
                bl = tuple(ntab[b + i] for i in range(6))
                br = tuple(ntab[b + 6 + i] for i in range(6))
                lhit = _slab(bl, o1, o2, o3, i1, i2, i3, n1, n2, n3,
                             closest)
                rhit = _slab(br, o1, o2, o3, i1, i2, i3, n1, n2, n3,
                             closest)
                votes.append((lhit, rhit, l))
            # phase 2: consume votes, advance scalar states
            new_idxs, new_bss, new_ns = [], [], []
            for p in range(P):
                lhit, rhit, l = votes[p]
                ni, nb, _, _ = _advance(idxs[p], bss[p], lhit, rhit,
                                        closest, l)
                # a packet ON a leaf this trip just pops (the probe has
                # no MT phase); the advance result is discarded
                pi, pb = _pop(idxs[p], bss[p])
                at_leaf = idxs[p] >= cl_first
                ni = jnp.where(at_leaf, pi, ni)
                nb = jnp.where(at_leaf, pb, nb)
                dead = idxs[p] <= 0
                ni = jnp.where(dead, 0, ni)
                nb = jnp.where(dead, jnp.uint32(0), nb)
                new_idxs.append(ni)
                new_bss.append(nb)
                new_ns.append(
                    ns_[p] + jnp.where(dead | at_leaf, 0, 1))
            return (tuple(new_idxs), tuple(new_bss), tuple(new_ns))

        def cond(carry):
            idxs, _, _ = carry
            alive = idxs[0] > 0
            for p in range(1, P):
                alive = alive | (idxs[p] > 0)
            return alive

        init = (tuple(jnp.int32(1) for _ in range(P)),
                tuple(jnp.uint32(1) for _ in range(P)),
                tuple(jnp.int32(0) for _ in range(P)))
        _, _, ns_ = jax.lax.while_loop(cond, body, init)
        tot = ns_[0]
        for p in range(1, P):
            tot = tot + ns_[p]
        ii = jax.lax.broadcasted_iota(jnp.int32, (8 * P, 128), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (8 * P, 128), 1)
        steps_out[:, :] = jnp.where((ii == 0) & (jj == 0), tot, 0)

    pl.run_scoped(scoped, ntab=pltpu.SMEM(nodes.shape, jnp.float32),
                  sem=pltpu.SemaphoreType.DMA(()))


@functools.partial(jax.jit, static_argnames=("cl_first", "P"))
def probe(origin, direction, nodes, cl_first: int, P: int):
    n = origin.x.shape[0]
    rows = 8 * P
    n_pad = ((n + rows * 128 - 1) // (rows * 128)) * (rows * 128)

    def pad(a, fill):
        if n_pad != n:
            a = jnp.concatenate(
                [a, jnp.full((n_pad - n,), fill, a.dtype)])
        return a.reshape(-1, 128)

    args = [pad(origin.x, 0.0), pad(origin.y, 0.0), pad(origin.z, 0.0),
            pad(direction.x, 1.0), pad(direction.y, 0.0),
            pad(direction.z, 0.0), nodes]
    spec = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, cl_first=cl_first, P=P),
        grid=(n_pad // (rows * 128),),
        in_specs=[spec] * 6 + [pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
    )(*args)
    return out[:: 8, 0].sum()


def main():
    argv = sys.argv[1:]
    kw = {}
    if argv and argv[0] == "--dragon-ish":
        kw = {"nu": 832, "nv": 131}  # 218k tris: SMEM f32 table limit-ish
        argv = argv[1:]
    ps = [int(x) for x in argv] or [1, 2, 4]
    print("devices:", jax.devices(), flush=True)
    scene, cam = knot_zoo_scene(512, 512, prims_per_leaf=64, **kw)
    pm = build_packet_mesh(scene.mesh, max_width=64)
    assert pm.smem_nodes and not pm.quant, "probe wants a flat f32 table"
    o0, d0 = bounce_rays(scene)

    V3 = type(o0)
    for P in ps:
        # chain data deps inside ONE jit (CLAUDE.md: python-loop timing
        # measures ~240 ms/dispatch tunnel latency)
        @jax.jit
        def run(reps, perturb, P=P):
            def body(_, carry):
                acc, px = carry
                s = probe(V3(o0.x + px * 1e-6, o0.y, o0.z), d0,
                          pm.nodes, pm.cl_first, P)
                return acc + s, px + s.astype(jnp.float32) * 0.0
            acc, _ = jax.lax.fori_loop(
                0, reps, body, (jnp.int32(0), perturb))
            return acc

        lo, hi = 2, 12
        int(run(lo, jnp.float32(0)))
        int(run(hi, jnp.float32(0)))

        def t(reps):
            best = 1e9
            for r in range(1, 4):
                t0 = time.perf_counter()
                s = int(run(reps, jnp.float32(r)))
                best = min(best, time.perf_counter() - t0)
            return best, s
        (tl, _), (th, s) = t(lo), t(hi)
        steps = s // hi
        per = (th - tl) / (hi - lo)
        print(f"P={P}: {per * 1e3:7.2f} ms/trav for {steps} steps -> "
              f"{per / steps * 1e9:6.1f} ns/step", flush=True)


if __name__ == "__main__":
    main()
