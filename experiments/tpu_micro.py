"""TPU micro-benchmarks that decide the large-mesh traversal design.

Measures (all with data dependencies chained inside one jit):
  E1  XLA row-gather from a small (VMEM-size) table
  E2  XLA row-gather from an HBM-size table
  E3  Pallas per-lane gather via take_along_axis (does Mosaic support it,
      and how fast)
  E4  Pallas scalar dynamic row read + broadcast against a lane tile
      (the packet-traversal inner step)
  E5  Pallas HBM->VMEM cluster DMA latency (blocking, per-leaf fetch)
  E6  XLA sort of ray keys with payloads (re-coherence pass cost)
  E7  one-hot MXU fetch from a 16k-row table (per-step gather alternative)

Timing methodology: see timed_slope — the axon relay requires host value
fetches, perturbed inputs, and step-count slopes.

Usage (real TPU, one process at a time):
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


def timed_slope(fn, lo, hi, reps=3):
    """Time fn(steps, perturb) at two step counts -> seconds/step.

    IMPORTANT (measured): through the axon relay, block_until_ready does
    NOT wait for completion and the relay caches identical dispatches —
    timings must (a) fetch the result value to host, (b) perturb inputs
    every call, (c) difference two step counts to cancel the ~30 ms
    dispatch+fetch latency. Calibration: 2048^3 bf16 matmul chain measures
    158 TFLOP/s with this method (v5e peak ~197).
    """
    float(fn(lo, 0))  # warm compiles
    float(fn(hi, 0))

    def t(steps):
        best = 1e9
        for r in range(1, reps + 1):
            t0 = time.perf_counter()
            v = float(fn(steps, r))
            best = min(best, time.perf_counter() - t0)
            assert v == v, "NaN result"
        return best

    d_lo, d_hi = t(lo), t(hi)
    return (d_hi - d_lo) / (hi - lo)


# ---------------------------------------------------------------- E1/E2
def xla_gather_bench(table_rows, row_w, lo, hi):
    table = jnp.asarray(
        np.random.RandomState(0).rand(table_rows, row_w), jnp.float32)
    idx0 = jnp.asarray(
        np.random.RandomState(1).randint(0, table_rows, N), jnp.uint32)

    @jax.jit
    def run(steps, perturb):
        def body(_, carry):
            idx, acc = carry
            rows = table[idx]  # [N, row_w] gather
            acc = acc + rows[:, 0]
            idx = (idx * jnp.uint32(1664525)
                   + rows[:, row_w - 1].astype(jnp.uint32)) % table_rows
            return idx, acc
        idx, acc = jax.lax.fori_loop(
            0, steps, body,
            (idx0 + jnp.uint32(perturb), jnp.zeros((N,), jnp.float32)))
        return acc.sum()

    per_step = timed_slope(run, lo, hi)
    print(f"  rows={table_rows} row_w={row_w}: {per_step*1e3:.3f} ms/step "
          f"({per_step/N*1e9:.2f} ns/lane)")


def e1():
    print("E1: XLA row-gather, small table, 131072 lanes")
    xla_gather_bench(16384, 16, 10, 60)
    xla_gather_bench(16384, 1, 10, 60)


def e2():
    print("E2: XLA row-gather, big table, 131072 lanes")
    xla_gather_bench(262144, 16, 10, 40)
    xla_gather_bench(262144, 80, 5, 25)


def _pallas_steps_runner(kernel, table, extra, out_shape):
    """Build fn(steps, perturb) -> float for a pallas kernel that reads a
    (1,1) SMEM steps scalar as its first argument."""
    f = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(extra)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(steps, perturb):
        out = f(jnp.asarray([steps], jnp.int32),
                table + jnp.float32(perturb) * 1e-6, *extra)
        return out.astype(jnp.float32).sum()

    return run


# ------------------------------------------------------------------- E3
def e3():
    print("E3: Pallas per-lane gather via take_along_axis, (8,128) lanes")
    T = 16384

    def kernel(steps_ref, table_ref, idx_ref, out_ref):
        def body(_, carry):
            idx, acc = carry
            rows = jnp.take_along_axis(table_ref[:, :], idx, axis=1)
            acc = acc + rows
            idx = (idx * 1664525 + acc.astype(jnp.int32)) % T
            idx = jnp.where(idx < 0, idx + T, idx)
            return idx, acc
        _, acc = jax.lax.fori_loop(
            0, steps_ref[0], body,
            (idx_ref[:, :], jnp.zeros((8, 128), jnp.float32)))
        out_ref[:, :] = acc

    table = jnp.asarray(np.random.RandomState(0).rand(8, T), jnp.float32)
    idx = jnp.asarray(np.random.RandomState(1).randint(0, T, (8, 128)),
                      jnp.int32)
    try:
        run = _pallas_steps_runner(
            kernel, table, [idx], jax.ShapeDtypeStruct((8, 128), jnp.float32))
        per = timed_slope(run, 100, 1100)
        print(f"  gather (8,128) from (8,{T}): {per*1e6:.2f} us/step"
              f" -> {per/1024*1e9:.2f} ns/lane")
    except Exception as ex:
        print(f"  UNSUPPORTED: {type(ex).__name__}: {str(ex)[:300]}")


# ------------------------------------------------------------------- E4
def e4():
    print("E4: Pallas scalar row read + broadcast step (packet traversal)")
    T = 16384

    def kernel(steps_ref, table_ref, x_ref, out_ref):
        def body(_, carry):
            i, acc = carry
            row = table_ref[i, :]  # (8,) dynamic row read
            t0 = (x_ref[:, :] - row[0]) * row[3]
            t1 = (x_ref[:, :] - row[1]) * row[4]
            t2 = (x_ref[:, :] - row[2]) * row[5]
            near = jnp.maximum(jnp.maximum(t0, t1), t2)
            acc = acc + near
            vote = jnp.sum(near) > 0.0
            i = jnp.where(vote, (i * 5 + 1) % T, (i * 3 + 7) % T)
            return i, acc
        _, acc = jax.lax.fori_loop(
            0, steps_ref[0], body,
            (jnp.int32(1), jnp.zeros((8, 128), jnp.float32)))
        out_ref[:, :] = acc

    table = jnp.asarray(np.random.RandomState(0).rand(T, 8), jnp.float32)
    x = jnp.asarray(np.random.RandomState(1).rand(8, 128), jnp.float32)
    try:
        run = _pallas_steps_runner(
            kernel, table, [x], jax.ShapeDtypeStruct((8, 128), jnp.float32))
        per = timed_slope(run, 2000, 62000)
        print(f"  scalar-row step: {per*1e9:.1f} ns/step")
    except Exception as ex:
        print(f"  UNSUPPORTED: {type(ex).__name__}: {str(ex)[:300]}")


# ------------------------------------------------------------------- E5
def e5():
    print("E5: Pallas blocking cluster DMA HBM->VMEM (8KB blocks)")
    C, R, W = 4096, 16, 128

    def kernel(steps_ref, blocks_hbm, out_ref):
        def body(scratch, sem):
            def step(_, carry):
                c, acc = carry
                dma = pltpu.make_async_copy(blocks_hbm.at[c], scratch, sem)
                dma.start()
                dma.wait()
                acc = acc + scratch[0, :][None, :]
                c = (c * 5 + acc[0, 0].astype(jnp.int32) % 3 + 1) % C
                return c, acc
            _, acc = jax.lax.fori_loop(
                0, steps_ref[0], step,
                (jnp.int32(0), jnp.zeros((1, W), jnp.float32)))
            out_ref[:, :] = acc
        pl.run_scoped(body, scratch=pltpu.VMEM((R, W), jnp.float32),
                      sem=pltpu.SemaphoreType.DMA(()))

    blocks = jnp.asarray(np.random.RandomState(0).rand(C, R, W), jnp.float32)
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

        @jax.jit
        def run(steps, perturb):
            out = f(jnp.asarray([steps], jnp.int32),
                    blocks + jnp.float32(perturb) * 1e-6)
            return out.astype(jnp.float32).sum()

        per = timed_slope(run, 2000, 102000)
        print(f"  blocking 8KB DMA: {per*1e6:.2f} us/fetch")
    except Exception as ex:
        print(f"  UNSUPPORTED: {type(ex).__name__}: {str(ex)[:300]}")


# ------------------------------------------------------------------- E6
def e6():
    print("E6: XLA sort with payloads at N=131072")
    keys0 = jnp.asarray(np.random.RandomState(0).randint(0, 1 << 20, N),
                        jnp.uint32)
    pay = tuple(jnp.asarray(np.random.RandomState(i).rand(N), jnp.float32)
                for i in range(1, 7))

    @jax.jit
    def run(steps, perturb):
        def body(_, carry):
            k, ps = carry
            out = jax.lax.sort((k,) + ps, num_keys=1)
            k2 = out[0] ^ jnp.uint32(12345)  # chain + unsort-ish
            return k2, out[1:]
        k, ps = jax.lax.fori_loop(
            0, steps, body, (keys0 + jnp.uint32(perturb), pay))
        return k.astype(jnp.float32).sum() + sum(p.sum() for p in ps)

    per = timed_slope(run, 5, 305)
    print(f"  sort(1 key + 6 payloads): {per*1e3:.2f} ms/sort")


# ------------------------------------------------------------------- E7
def e7():
    print("E7: one-hot MXU fetch from 16k-row table (per 256-lane tile)")
    T, C = 16384, 8

    def kernel(steps_ref, table_ref, idx_ref, out_ref):
        def body(_, carry):
            idx, acc = carry  # idx (1, 256) int32
            i_row = idx[0, :][None, :]
            CH = 2048

            def chunk(k, a):
                base = k * CH
                rows = jax.lax.broadcasted_iota(jnp.int32, (CH, 256), 0)
                sel = (rows + base == i_row).astype(jnp.bfloat16)
                blk = table_ref[:, pl.ds(base, CH)].astype(jnp.bfloat16)
                return a + jnp.dot(blk, sel,
                                   preferred_element_type=jnp.float32)
            acc2 = jax.lax.fori_loop(0, T // CH, chunk,
                                     jnp.zeros((C, 256), jnp.float32))
            acc = acc + acc2
            idx = (idx * 1664525 + acc[0, :][None, :].astype(jnp.int32)) % T
            idx = jnp.where(idx < 0, idx + T, idx)
            return idx, acc
        _, acc = jax.lax.fori_loop(
            0, steps_ref[0], body,
            (idx_ref[:, :], jnp.zeros((C, 256), jnp.float32)))
        out_ref[:, :] = acc

    table = jnp.asarray(np.random.RandomState(0).rand(C, T), jnp.float32)
    idx = jnp.asarray(np.random.RandomState(1).randint(0, T, (1, 256)),
                      jnp.int32)
    try:
        run = _pallas_steps_runner(
            kernel, table, [idx], jax.ShapeDtypeStruct((C, 256), jnp.float32))
        per = timed_slope(run, 50, 2050)
        print(f"  one-hot 16k x 8 cols for 256 lanes: {per*1e6:.2f} us/step"
              f" ({per/256*1e9:.1f} ns/lane)")
    except Exception as ex:
        print(f"  UNSUPPORTED: {type(ex).__name__}: {str(ex)[:300]}")


ALL = {"E1": e1, "E2": e2, "E3": e3, "E4": e4, "E5": e5, "E6": e6, "E7": e7}


# ------------------------------------------------------------------- E8
def e8():
    print("E8: leaf phase A — DMA cluster to SMEM, scalar-broadcast tris")
    C, R, W = 1024, 16, 128

    def kernel(steps_ref, blocks_hbm, ox_ref, out_ref):
        def body(scratch, sem):
            o1 = ox_ref[:, :]

            def step(_, carry):
                c, best = carry
                dma = pltpu.make_async_copy(blocks_hbm.at[c], scratch, sem)
                dma.start()
                dma.wait()

                def tri(w, best):
                    # 9 scalar comps -> MT-ish math on the (8,128) lane tile
                    v0x = scratch[0, w]; v0y = scratch[1, w]; v0z = scratch[2, w]
                    e1x = scratch[3, w]; e1y = scratch[4, w]; e1z = scratch[5, w]
                    e2x = scratch[6, w]; e2y = scratch[7, w]; e2z = scratch[8, w]
                    hx = o1 * e2z - v0y * e2y
                    hy = o1 * e2x - v0z * e2z
                    hz = o1 * e2y - v0x * e2x
                    a = e1x * hx + e1y * hy + e1z * hz
                    f = 1.0 / jnp.where(jnp.abs(a) < 1e-7, 1.0, a)
                    sx = o1 - v0x; sy = o1 - v0y; sz = o1 - v0z
                    u = f * (sx * hx + sy * hy + sz * hz)
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    v = f * (o1 * qx + o1 * qy + o1 * qz)
                    t = f * (e2x * qx + e2y * qy + e2z * qz)
                    ok = (u > 0) & (v > 0) & (u + v < 1) & (t > 0.001) & (t < best)
                    return jnp.where(ok, t, best)
                best = jax.lax.fori_loop(0, W, tri, best)
                c = (c * 5 + best[0, 0].astype(jnp.int32) % 3 + 1) % C
                return c, best
            _, best = jax.lax.fori_loop(
                0, steps_ref[0], step,
                (jnp.int32(0), jnp.full((8, 128), 1e30, jnp.float32)))
            out_ref[:, :] = best
        pl.run_scoped(body, scratch=pltpu.SMEM((R, W), jnp.float32),
                      sem=pltpu.SemaphoreType.DMA(()))

    blocks = jnp.asarray(np.random.RandomState(0).rand(C, R, W), jnp.float32)
    ox = jnp.asarray(np.random.RandomState(1).rand(8, 128), jnp.float32)
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.HBM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

        @jax.jit
        def run(steps, perturb):
            out = f(jnp.asarray([steps], jnp.int32),
                    blocks + jnp.float32(perturb) * 1e-6, ox)
            return out.astype(jnp.float32).sum()

        per = timed_slope(run, 200, 5200)
        print(f"  SMEM leaf (128 tris x 1024 lanes): {per*1e6:.2f} us/leaf")
    except Exception as ex:
        print(f"  UNSUPPORTED: {type(ex).__name__}: {str(ex)[:300]}")


# ------------------------------------------------------------------- E9
def e9():
    print("E9: leaf phase B — DMA cluster to VMEM, 3D-broadcast chunks")
    C, R, W, WCH = 1024, 16, 128, 32

    def kernel(steps_ref, blocks_hbm, ox_ref, out_ref):
        def body(scratch, sem):
            o1 = ox_ref[:, :][None, :, :]

            def step(_, carry):
                c, best = carry
                dma = pltpu.make_async_copy(blocks_hbm.at[c], scratch, sem)
                dma.start()
                dma.wait()

                def chunk(k, best):
                    sl = pl.ds(k * WCH, WCH)
                    g = lambda r: scratch[r, sl].reshape(WCH, 1, 1)
                    v0x, v0y, v0z = g(0), g(1), g(2)
                    e1x, e1y, e1z = g(3), g(4), g(5)
                    e2x, e2y, e2z = g(6), g(7), g(8)
                    hx = o1 * e2z - v0y * e2y
                    hy = o1 * e2x - v0z * e2z
                    hz = o1 * e2y - v0x * e2x
                    a = e1x * hx + e1y * hy + e1z * hz
                    f = 1.0 / jnp.where(jnp.abs(a) < 1e-7, 1.0, a)
                    sx = o1 - v0x; sy = o1 - v0y; sz = o1 - v0z
                    u = f * (sx * hx + sy * hy + sz * hz)
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    v = f * (o1 * qx + o1 * qy + o1 * qz)
                    t = f * (e2x * qx + e2y * qy + e2z * qz)
                    ok = (u > 0) & (v > 0) & (u + v < 1) & (t > 0.001)
                    ts = jnp.where(ok, t, 1e30)
                    return jnp.minimum(best, jnp.min(ts, axis=0))
                best = jax.lax.fori_loop(0, W // WCH, chunk, best)
                c = (c * 5 + best[0, 0].astype(jnp.int32) % 3 + 1) % C
                return c, best
            _, best = jax.lax.fori_loop(
                0, steps_ref[0], step,
                (jnp.int32(0), jnp.full((8, 128), 1e30, jnp.float32)))
            out_ref[:, :] = best
        pl.run_scoped(body, scratch=pltpu.VMEM((R, W), jnp.float32),
                      sem=pltpu.SemaphoreType.DMA(()))

    blocks = jnp.asarray(np.random.RandomState(0).rand(C, R, W), jnp.float32)
    ox = jnp.asarray(np.random.RandomState(1).rand(8, 128), jnp.float32)
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.HBM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

        @jax.jit
        def run(steps, perturb):
            out = f(jnp.asarray([steps], jnp.int32),
                    blocks + jnp.float32(perturb) * 1e-6, ox)
            return out.astype(jnp.float32).sum()

        per = timed_slope(run, 200, 5200)
        print(f"  VMEM 3D leaf (128 tris x 1024 lanes): {per*1e6:.2f} us/leaf")
    except Exception as ex:
        print(f"  UNSUPPORTED: {type(ex).__name__}: {str(ex)[:300]}")


ALL["E8"] = e8
ALL["E9"] = e9

if __name__ == "__main__":
    which = sys.argv[1:] or list(ALL)
    print("devices:", jax.devices())
    for name in which:
        ALL[name.upper()]()
