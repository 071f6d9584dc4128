"""Pure leaf-MT floor probe (TPU): what does one 64-tri visit cost with
ZERO traversal around it?

The in-traversal phase split (incoh_phase, r3) measured ~1179 ns per
64-tri leaf visit and called it ~2x the VPU op floor — but that floor
assumed ~37 vector ops/tri; a careful recount of _mt_scalar_tri is ~58
vector ops + 12 scalar loads (~70 issue slots). This kernel runs V
back-to-back fully-unrolled 64-tri MT visits against an SMEM-resident
cluster (no DMA, no stack, no cond, no votes) and takes the slope over
V: the true pure-MT per-visit cost on this hardware. The difference to
the in-traversal per-visit cost is the per-visit overhead
(DMA wait + cond joins + pop + bookkeeping) — VERDICT r3 item 1 wants
whichever of the two is the real headroom attacked (or the floor
proven).

Usage: python experiments/leafmt_probe.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from tpu_pathtracer.ops.pallas_bvh import _mt_scalar_tri

ROWS, WIDTH = 8, 64


def _kernel(ox, oy, oz, dx, dy, dz, tmax, blocks, t_out, *, visits,
            mode):
    """mode: 'pure' (SMEM-resident cluster, zero per-visit machinery),
    'dma' (per-visit sync start+wait, rotating clusters), 'db'
    (double-buffered copy: issue next under current MT), 'cond' (pure
    + one lax.cond boundary per visit — the branch-join cost)."""
    C = blocks.shape[0]

    def scoped(blk, sem, s0=None, s1=None):
        dma = pltpu.make_async_copy(blocks.at[0], blk.at[pl.ds(0, 16)],
                                    sem)
        dma.start()
        dma.wait()
        o1, o2, o3 = ox[:, :], oy[:, :], oz[:, :]
        d1, d2, d3 = dx[:, :], dy[:, :], dz[:, :]
        shp = o1.shape

        def mt(i, closest, besti, base):
            rows = [base + r for r in range(16)]
            for w in range(WIDTH):
                t, u, v, bad = _mt_scalar_tri(
                    blk, 0, w, 128, o1, o2, o3, d1, d2, d3,
                    1e-3, closest, rows=rows)
                closest = jnp.where(bad, closest, t)
                besti = jnp.where(bad, besti, i * WIDTH + w)
            return closest, besti

        if mode == "db":
            # prime both slots; steady state: visit i waits slot i%2,
            # runs MT, then re-issues that slot for visit i+2 (the copy
            # completes under visit i+1's MT)
            pltpu.make_async_copy(blocks.at[0],
                                  blk.at[pl.ds(0, 16)], s0).start()
            pltpu.make_async_copy(blocks.at[1],
                                  blk.at[pl.ds(16, 16)], s1).start()

            def visit(i, st):
                closest, besti = st
                par = jax.lax.rem(i, 2)

                @pl.when(par == 0)
                def _():
                    pltpu.make_async_copy(
                        blocks.at[0], blk.at[pl.ds(0, 16)], s0).wait()

                @pl.when(par == 1)
                def _():
                    pltpu.make_async_copy(
                        blocks.at[0], blk.at[pl.ds(16, 16)], s1).wait()
                closest, besti = mt(i, closest, besti, par * 16)
                nc = jax.lax.rem(i + 2, C)

                @pl.when(par == 0)
                def _():
                    pltpu.make_async_copy(
                        blocks.at[nc], blk.at[pl.ds(0, 16)],
                        s0).start()

                @pl.when(par == 1)
                def _():
                    pltpu.make_async_copy(
                        blocks.at[nc], blk.at[pl.ds(16, 16)],
                        s1).start()
                return closest, besti
        elif mode == "db2":
            # dynamic-slot double buffer: no parity pl.when branches —
            # traced pl.ds target offsets + an indexed semaphore array
            pltpu.make_async_copy(blocks.at[0],
                                  blk.at[pl.ds(0, 16)], s0.at[0]).start()
            pltpu.make_async_copy(blocks.at[1],
                                  blk.at[pl.ds(16, 16)],
                                  s0.at[1]).start()

            def visit(i, st):
                closest, besti = st
                par = jax.lax.rem(i, 2)
                base = par * 16
                pltpu.make_async_copy(
                    blocks.at[0], blk.at[pl.ds(base, 16)],
                    s0.at[par]).wait()
                closest, besti = mt(i, closest, besti, base)
                nc = jax.lax.rem(i + 2, C)
                pltpu.make_async_copy(
                    blocks.at[nc], blk.at[pl.ds(base, 16)],
                    s0.at[par]).start()
                return closest, besti
        elif mode == "dma":
            def visit(i, st):
                closest, besti = st
                c = jax.lax.rem(i, C)
                d = pltpu.make_async_copy(blocks.at[c],
                                          blk.at[pl.ds(0, 16)], sem)
                d.start()
                d.wait()
                return mt(i, closest, besti, 0)
        elif mode == "cond":
            def visit(i, st):
                return jax.lax.cond(
                    i >= 0, lambda s: mt(i, s[0], s[1], 0),
                    lambda s: s, st)
        else:
            def visit(i, st):
                return mt(i, st[0], st[1], 0)

        closest, besti = jax.lax.fori_loop(
            0, visits, visit,
            (tmax[:, :], jnp.full(shp, -1, jnp.int32)))
        if mode == "db":
            # drain the two copies issued by the last two visits
            pltpu.make_async_copy(blocks.at[0],
                                  blk.at[pl.ds(0, 16)], s0).wait()
            pltpu.make_async_copy(blocks.at[0],
                                  blk.at[pl.ds(16, 16)], s1).wait()
        if mode == "db2":
            pltpu.make_async_copy(blocks.at[0],
                                  blk.at[pl.ds(0, 16)], s0.at[0]).wait()
            pltpu.make_async_copy(blocks.at[0],
                                  blk.at[pl.ds(16, 16)],
                                  s0.at[1]).wait()
        t_out[:, :] = closest + besti.astype(jnp.float32) * 1e-30

    kw = dict(blk=pltpu.SMEM((32, 128), jnp.float32),
              sem=pltpu.SemaphoreType.DMA(()))
    if mode == "db":
        kw["s0"] = pltpu.SemaphoreType.DMA(())
        kw["s1"] = pltpu.SemaphoreType.DMA(())
    elif mode == "db2":
        kw["s0"] = pltpu.SemaphoreType.DMA((2,))
    pl.run_scoped(scoped, **kw)


@functools.partial(jax.jit, static_argnames=("visits", "mode"))
def run(ox, oy, oz, dx, dy, dz, tmax, blocks, visits, mode="pure"):
    ray = pl.BlockSpec((ROWS, 128), lambda: (0, 0),
                       memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    return pl.pallas_call(
        functools.partial(_kernel, visits=visits, mode=mode),
        in_specs=[ray] * 7 + [hbm],
        out_specs=ray,
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
    )(ox, oy, oz, dx, dy, dz, tmax, blocks)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    # one 64-tri cluster in the production block layout (16,128):
    # rows 0-2 v0, 3-5 e1, 6-8 e2, 9-11 n, lanes 0..63 live
    C = 611  # rotating clusters: dma/db modes stride HBM like a render
    v0 = rng.uniform(-5, 5, (C, WIDTH, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (C, WIDTH, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (C, WIDTH, 3)).astype(np.float32)
    n = np.cross(e1, e2)
    comps = np.zeros((C, 16, 128), np.float32)
    comps[:, 0:3, :WIDTH] = v0.transpose(0, 2, 1)
    comps[:, 3:6, :WIDTH] = e1.transpose(0, 2, 1)
    comps[:, 6:9, :WIDTH] = e2.transpose(0, 2, 1)
    comps[:, 9:12, :WIDTH] = n.transpose(0, 2, 1)
    blocks = jnp.asarray(comps)

    o = rng.uniform(-8, 8, (3, ROWS, 128)).astype(np.float32)
    d = rng.randn(3, ROWS, 128).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    args = [jnp.asarray(o[0]), jnp.asarray(o[1]), jnp.asarray(o[2]),
            jnp.asarray(d[0]), jnp.asarray(d[1]), jnp.asarray(d[2]),
            jnp.full((ROWS, 128), 3.4e38, jnp.float32), blocks]

    def t(visits, mode, reps=12):
        float(run(*args, visits=visits, mode=mode)[0, 0])
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(*args, visits=visits, mode=mode)[0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    # big V so the slope term dwarfs the ~24 ms fixed dispatch
    lo, hi = 1024, 17408
    for mode in (sys.argv[1:] or ["pure", "cond", "db", "dma"]):
        t(lo, mode), t(hi, mode)  # warm both executables
        t_lo = min(t(lo, mode), t(lo, mode))
        t_hi = min(t(hi, mode), t(hi, mode))
        per_visit = (t_hi - t_lo) / (hi - lo)
        print(f"{mode:5s}: {per_visit*1e9:6.0f} ns/visit "
              f"({per_visit*1e9/WIDTH:5.2f} ns/tri)   "
              f"[t({lo})={t_lo*1e3:.2f} ms t({hi})={t_hi*1e3:.2f} ms]",
              flush=True)


if __name__ == "__main__":
    main()
