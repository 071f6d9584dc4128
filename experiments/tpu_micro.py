"""TPU micro-benchmarks that decide the large-mesh traversal design.

Measures (all with data dependencies chained inside one jit, per
CLAUDE.md — python-loop timing measures tunnel latency):
  E1  XLA row-gather from a small (VMEM-size) table
  E2  XLA row-gather from an HBM-size table
  E3  Pallas per-lane gather via take_along_axis (does Mosaic support it,
      and how fast)
  E4  Pallas scalar dynamic row read + broadcast against a lane tile
      (the packet-traversal inner step)
  E5  Pallas HBM->VMEM cluster DMA latency (blocking, per-leaf fetch)
  E6  XLA sort of ray keys with payloads (re-coherence pass cost)
  E7  one-hot MXU fetch from a 16k table (per-step alternative to gather)

Usage: run on the real TPU, one experiment per dispatch:
  python experiments/tpu_micro.py E1 E3 E4 ...
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 131072  # lane count (the regen pool upper scale)


def timed(fn, *args, iters=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    return dt, out


# ---------------------------------------------------------------- E1/E2
def xla_gather_bench(table_rows, row_w, steps):
    table = jnp.asarray(
        np.random.RandomState(0).rand(table_rows, row_w), jnp.float32)
    idx0 = jnp.asarray(
        np.random.RandomState(1).randint(0, table_rows, N), jnp.uint32)

    @jax.jit
    def run(table, idx0):
        def body(_, carry):
            idx, acc = carry
            rows = table[idx]  # [N, row_w] gather
            acc = acc + rows[:, 0]
            # chain: next idx depends on fetched data
            idx = (idx * jnp.uint32(1664525)
                   + rows[:, 1].astype(jnp.uint32)) % table_rows
            return idx, acc
        idx, acc = jax.lax.fori_loop(0, steps, body,
                                     (idx0, jnp.zeros((N,), jnp.float32)))
        return acc.sum()

    dt, _ = timed(run, table, idx0)
    per_step = dt / steps
    print(f"  rows={table_rows} row_w={row_w}: {per_step*1e3:.3f} ms/step "
          f"({per_step/N*1e9:.2f} ns/lane)")


def e1():
    print("E1: XLA row-gather, small table")
    xla_gather_bench(16384, 16, 50)
    xla_gather_bench(16384, 1, 50)


def e2():
    print("E2: XLA row-gather, big table")
    xla_gather_bench(262144, 16, 30)
    xla_gather_bench(262144, 80, 20)


# ------------------------------------------------------------------- E3
def e3():
    print("E3: Pallas per-lane gather via take_along_axis")
    T = 16384

    def kernel(table_ref, idx_ref, out_ref, *, steps):
        def body(_, carry):
            idx, acc = carry
            rows = jnp.take_along_axis(table_ref[:, :], idx, axis=1)
            acc = acc + rows
            idx = (idx * 1664525 + acc.astype(jnp.int32)) % T
            idx = jnp.where(idx < 0, idx + T, idx)
            return idx, acc
        idx0 = idx_ref[:, :]
        _, acc = jax.lax.fori_loop(0, steps, body,
                                   (idx0, jnp.zeros((8, 128), jnp.float32)))
        out_ref[:, :] = acc

    steps = 100
    table = jnp.asarray(np.random.RandomState(0).rand(8, T), jnp.float32)
    idx = jnp.asarray(np.random.RandomState(1).randint(0, T, (8, 128)),
                      jnp.int32)
    try:
        f = pl.pallas_call(
            functools.partial(kernel, steps=steps),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        dt, _ = timed(jax.jit(lambda t, i: f(t, i)), table, idx)
        per = dt / steps
        print(f"  (8,128) gather from (8,{T}): {per*1e6:.2f} us/step"
              f" -> {per/1024*1e9:.2f} ns/lane")
    except Exception as ex:
        print(f"  UNSUPPORTED: {type(ex).__name__}: {str(ex)[:300]}")


# ------------------------------------------------------------------- E4
def e4():
    print("E4: Pallas scalar row read + broadcast step (packet traversal)")
    T = 16384

    def kernel(table_ref, x_ref, out_ref, *, steps):
        def body(_, carry):
            i, acc = carry
            row = table_ref[i, :]  # (8,) scalar-ish row read
            # broadcast 6 box scalars against the (8,128) lane tile
            t0 = (x_ref[:, :] - row[0]) * row[3]
            t1 = (x_ref[:, :] - row[1]) * row[4]
            t2 = (x_ref[:, :] - row[2]) * row[5]
            near = jnp.maximum(jnp.maximum(t0, t1), t2)
            acc = acc + near
            vote = jnp.sum(near) > 0.0
            i = jnp.where(vote, (i * 5 + 1) % T, (i * 3 + 7) % T)
            return i, acc
        _, acc = jax.lax.fori_loop(
            0, steps, body, (jnp.int32(1), jnp.zeros((8, 128), jnp.float32)))
        out_ref[:, :] = acc

    steps = 2000
    table = jnp.asarray(np.random.RandomState(0).rand(T, 8), jnp.float32)
    x = jnp.asarray(np.random.RandomState(1).rand(8, 128), jnp.float32)
    try:
        f = pl.pallas_call(
            functools.partial(kernel, steps=steps),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        dt, _ = timed(jax.jit(lambda t, i: f(t, i)), table, x)
        print(f"  scalar-row step: {dt/steps*1e9:.1f} ns/step")
    except Exception as ex:
        print(f"  UNSUPPORTED: {type(ex).__name__}: {str(ex)[:300]}")


# ------------------------------------------------------------------- E5
def e5():
    print("E5: Pallas blocking cluster DMA HBM->VMEM")
    C, R, W = 4096, 16, 128  # 4096 clusters x 8KB

    def kernel(blocks_hbm, out_ref, *, steps):
        def body(scratch, sem):
            def step(_, carry):
                c, acc = carry
                dma = pltpu.make_async_copy(blocks_hbm.at[c], scratch, sem)
                dma.start()
                dma.wait()
                acc = acc + scratch[0, :][None, :]
                c = (c * 5 + 1) % C
                return c, acc
            _, acc = jax.lax.fori_loop(
                0, steps, step,
                (jnp.int32(0), jnp.zeros((1, W), jnp.float32)))
            out_ref[:, :] = acc
        pl.run_scoped(body, scratch=pltpu.VMEM((R, W), jnp.float32),
                      sem=pltpu.SemaphoreType.DMA(()))

    steps = 500
    blocks = jnp.asarray(np.random.RandomState(0).rand(C, R, W), jnp.float32)
    try:
        f = pl.pallas_call(
            functools.partial(kernel, steps=steps),
            out_shape=jax.ShapeDtypeStruct((1, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        dt, _ = timed(jax.jit(lambda b: f(b)), blocks)
        print(f"  blocking 8KB DMA: {dt/steps*1e6:.2f} us/fetch")
    except Exception as ex:
        print(f"  UNSUPPORTED: {type(ex).__name__}: {str(ex)[:300]}")


# ------------------------------------------------------------------- E6
def e6():
    print("E6: XLA sort with payloads at N=131072")
    keys = jnp.asarray(np.random.RandomState(0).randint(0, 1 << 20, N),
                       jnp.uint32)
    pay = [jnp.asarray(np.random.RandomState(i).rand(N), jnp.float32)
           for i in range(1, 7)]

    @jax.jit
    def run(keys, *pay):
        def body(_, carry):
            k, ps = carry
            out = jax.lax.sort((k,) + ps, num_keys=1)
            k2 = out[0] ^ jnp.uint32(12345)  # chain
            return k2, out[1:]
        k, ps = jax.lax.fori_loop(0, 10, body, (keys, tuple(pay)))
        return k.sum() + sum(p.sum() for p in ps)

    dt, _ = timed(run, keys, *pay)
    print(f"  sort(1 key + 6 payloads): {dt/10*1e3:.2f} ms/sort")


# ------------------------------------------------------------------- E7
def e7():
    print("E7: one-hot MXU fetch from 16k-row table (per 256-lane tile)")
    T, C = 16384, 8

    def kernel(table_ref, idx_ref, out_ref, *, steps):
        def body(_, carry):
            idx, acc = carry  # idx (1, 256) int32
            i_row = idx[0, :][None, :]
            acc2 = jnp.zeros((C, 256), jnp.float32)
            CH = 2048
            def chunk(k, a):
                base = k * CH
                rows = jax.lax.broadcasted_iota(jnp.int32, (CH, 256), 0)
                sel = (rows + base == i_row).astype(jnp.bfloat16)
                blk = table_ref[:, pl.ds(base, CH)].astype(jnp.bfloat16)
                return a + jnp.dot(blk, sel,
                                   preferred_element_type=jnp.float32)
            acc2 = jax.lax.fori_loop(0, T // CH, chunk, acc2)
            acc = acc + acc2
            idx = (idx * 1664525 + acc[0, :][None, :].astype(jnp.int32)) % T
            idx = jnp.where(idx < 0, idx + T, idx)
            return idx, acc
        idx0 = idx_ref[:, :]
        _, acc = jax.lax.fori_loop(0, steps, body,
                                   (idx0, jnp.zeros((C, 256), jnp.float32)))
        out_ref[:, :] = acc

    steps = 50
    table = jnp.asarray(np.random.RandomState(0).rand(C, T), jnp.float32)
    idx = jnp.asarray(np.random.RandomState(1).randint(0, T, (1, 256)),
                      jnp.int32)
    try:
        f = pl.pallas_call(
            functools.partial(kernel, steps=steps),
            out_shape=jax.ShapeDtypeStruct((C, 256), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        dt, _ = timed(jax.jit(lambda t, i: f(t, i)), table, idx)
        per = dt / steps
        print(f"  one-hot fetch 16k x 8cols for 256 lanes: "
              f"{per*1e6:.2f} us/step ({per/256*1e9:.1f} ns/lane)")
    except Exception as ex:
        print(f"  UNSUPPORTED: {type(ex).__name__}: {str(ex)[:300]}")


ALL = {"E1": e1, "E2": e2, "E3": e3, "E4": e4, "E5": e5, "E6": e6, "E7": e7}

if __name__ == "__main__":
    which = sys.argv[1:] or list(ALL)
    print("devices:", jax.devices())
    for name in which:
        ALL[name.upper()]()
