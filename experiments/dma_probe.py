"""Exposed HBM->SMEM DMA latency in a leaf-visit-shaped loop (TPU).

The scalar packet kernel's leaf phase does a synchronous 4 KB cluster
DMA (start+wait) before every MT loop; if the wait is a substantial
share of the measured ~1.2 us/visit, prefetching the cluster during
the node step's vote shadow (double buffer) is the next lever.

Two kernels, identical data-independent cluster chains (stride-611
walk, defeats any locality): (a) sync start+wait+consume per iter;
(b) double-buffered — start iter i+1's copy before waiting iter i's.
Slope over two iteration counts isolates per-iter cost; the a-b delta
is the recoverable latency.

Usage: python experiments/dma_probe.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 2048          # clusters
R, L = 8, 128     # 8 x 128 x 4B = 4 KB per cluster (128-lane tiling)

print("devices:", jax.devices())
blocks = jnp.arange(C * R * L, dtype=jnp.float32).reshape(C, R, L) * 1e-6


def _out(acc, out):
    out[:, :] = jnp.zeros((8, 128), jnp.float32) + acc


def kern_sync(blocks, out, *, k):
    def scoped(b0, sem):
        def body(i, acc):
            c = (i * 611) % C
            cp = pltpu.make_async_copy(blocks.at[c], b0, sem)
            cp.start()
            cp.wait()
            return acc + b0[0, 0]
        acc = jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        _out(acc, out)
    pl.run_scoped(scoped, b0=pltpu.SMEM((R, L), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA(()))


def kern_db(blocks, out, *, k):
    # double buffer: even iters consume b0, odd consume b1; iter i
    # starts i+1's copy before waiting i's. Processed in pairs so the
    # buffer choice is static.
    def scoped(b0, b1, s0, s1):
        pltpu.make_async_copy(blocks.at[0], b0, s0).start()

        def body(j, acc):
            i0 = j * 2
            c1 = ((i0 + 1) * 611) % C
            pltpu.make_async_copy(blocks.at[c1], b1, s1).start()
            pltpu.make_async_copy(blocks.at[0], b0, s0).wait()
            acc = acc + b0[0, 0]
            c2 = ((i0 + 2) * 611) % C
            pltpu.make_async_copy(blocks.at[c2], b0, s0).start()
            pltpu.make_async_copy(blocks.at[0], b1, s1).wait()
            return acc + b1[0, 0]
        acc = jax.lax.fori_loop(0, k // 2, body, jnp.float32(0.0))
        # drain the last started copy
        pltpu.make_async_copy(blocks.at[0], b0, s0).wait()
        acc = acc + 0.0 * b0[0, 0]
        _out(acc, out)
    pl.run_scoped(scoped, b0=pltpu.SMEM((R, L), jnp.float32),
                  b1=pltpu.SMEM((R, L), jnp.float32),
                  s0=pltpu.SemaphoreType.DMA(()),
                  s1=pltpu.SemaphoreType.DMA(()))


def run(kern, k):
    f = pl.pallas_call(
        functools.partial(kern, k=k),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    g = jax.jit(lambda b: f(b))
    float(g(blocks)[0, 0])   # warm; float() forces a real round trip

    def t():
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            assert float(g(blocks)[0, 0]) == float(g(blocks)[0, 0])
            best = min(best, (time.perf_counter() - t0) / 2)
        return best
    return t()


for name, kern in (("sync", kern_sync), ("double-buffered", kern_db)):
    lo, hi = 16384, 131072
    tlo, thi = run(kern, lo), run(kern, hi)
    per = (thi - tlo) / (hi - lo)
    print(f"  {name:16s}: {per * 1e9:7.1f} ns/visit-DMA   "
          f"(abs {tlo * 1e3:.2f} / {thi * 1e3:.2f} ms)", flush=True)
