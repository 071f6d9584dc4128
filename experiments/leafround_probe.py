"""Hardware probe: multirow leaf round (TPU).

Prices one leaf round of the 8-row packet kernel: 8 per-row cluster ids
leave vector domain (vreg -> VMEM -> SMEM local DMA -> scalar loads),
8 cluster DMAs (HBM (C,R,128) dim-0 slices -> (8,R,128) VMEM scratch)
land in flight together, the scratch is transposed sublane-wise
((8,R,128) -> (R,8,128)) so each triangle-component operand becomes one
static (8,1)-slice lane-broadcast, and the Moller-Trumbore loop runs
fully unrolled with per-row operands.

Baseline to beat: the production 1024-lane packet kernel's leaf visit
(one cluster for all 1024 rays) costs ~0.84 us at w=64 (iter_ablate).
A leaf round here serves 8 DIFFERENT clusters x 128 rays in one go.

Usage: python experiments/leafround_probe.py [w ...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

widths = [int(s) for s in sys.argv[1:]] or [32, 64]
MODE = int(__import__("os").environ.get("LEAF_MODE", "2"))  # 0=MT only, 1=+ids, 2=full
ITERS_LO, ITERS_HI = 256, 2048
C = 1024  # clusters in the synthetic mesh

print("devices:", jax.devices())

rng = np.random.default_rng(0)
rays = jnp.asarray(rng.standard_normal((7, 8, 128)), jnp.float32)


def _kernel(steps_ref, rays_ref, blocks_ref, out_ref, *, R, w):
    o1 = rays_ref[0]
    o2 = rays_ref[1]
    o3 = rays_ref[2]
    d1 = rays_ref[3]
    d2 = rays_ref[4]
    d3 = rays_ref[5]

    def scoped(idbuf, ids, scratch, idsem, sems):
        def round_(_, carry):
            idxv, closest = carry
            if MODE >= 1:
                # --- ids leave vector domain ----------------------------
                idbuf[:, :] = jnp.broadcast_to(idxv, (8, 128))
                pltpu.make_async_copy(idbuf, ids, idsem).start()
                pltpu.make_async_copy(idbuf, ids, idsem).wait()
            if MODE >= 2:
                # --- 8 cluster DMAs, all in flight ----------------------
                for r in range(8):
                    pltpu.make_async_copy(
                        blocks_ref.at[ids[r, 0]], scratch.at[r],
                        sems.at[r]).start()
                for r in range(8):
                    pltpu.make_async_copy(
                        blocks_ref.at[ids[r, 0]], scratch.at[r],
                        sems.at[r]).wait()
            # --- sublane transpose: row-major clusters -> operand form ---
            xt = jnp.swapaxes(scratch[...], 0, 1)  # (R, 8, 128)

            def rd(c, j):
                off = c * w + j
                tile = xt[off // 128]          # (8,128), static index
                col = off % 128
                return jnp.broadcast_to(tile[:, col:col + 1], (8, 128))

            # --- unrolled per-row MT over the cluster -------------------
            for j in range(w):
                v0x = rd(0, j)
                v0y = rd(1, j)
                v0z = rd(2, j)
                g1x = rd(3, j)
                g1y = rd(4, j)
                g1z = rd(5, j)
                g2x = rd(6, j)
                g2y = rd(7, j)
                g2z = rd(8, j)
                n1 = rd(9, j)
                n2 = rd(10, j)
                n3 = rd(11, j)
                a = -(d1 * n1 + d2 * n2 + d3 * n3)
                parallel = jnp.abs(a) < 1e-7
                f = 1.0 / jnp.where(parallel, 1.0, a)
                sx = o1 - v0x
                sy = o2 - v0y
                sz = o3 - v0z
                qx = sy * d3 - sz * d2
                qy = sz * d1 - sx * d3
                qz = sx * d2 - sy * d1
                u = f * (qx * g2x + qy * g2y + qz * g2z)
                v = -(f * (qx * g1x + qy * g1y + qz * g1z))
                t = f * (sx * n1 + sy * n2 + sz * n3)
                bad = (parallel | (jnp.minimum(u, v) < 0.0)
                       | (u + v > 1.0) | jnp.logical_not(t > 1e-3)
                       | jnp.logical_not(t < closest))
                closest = jnp.where(bad, closest, t)
            # --- advance ids with a data dependency ---------------------
            dep = jax.lax.bitcast_convert_type(
                closest[:, :1], jnp.int32) & 1
            idxv = (idxv * 5 + 1 + dep) & (C - 1)
            return idxv, closest

        rowi = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        idx0 = (rowi * 37 + 1) & (C - 1)
        cl0 = jnp.full((8, 128), 1e30, jnp.float32)
        _, cl = jax.lax.fori_loop(0, steps_ref[0], round_, (idx0, cl0))
        out_ref[:, :] = cl

    pl.run_scoped(
        scoped,
        idbuf=pltpu.VMEM((8, 128), jnp.int32),
        ids=pltpu.SMEM((8, 128), jnp.int32),
        scratch=pltpu.VMEM((8, R, 128), jnp.float32),
        idsem=pltpu.SemaphoreType.DMA(()),
        sems=pltpu.SemaphoreType.DMA((8,)))


@functools.partial(jax.jit, static_argnames=("R", "w"))
def run(steps, blocks, R, w):
    return pl.pallas_call(
        functools.partial(_kernel, R=R, w=w),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(jnp.asarray([steps], jnp.int32), rays, blocks)


for w in widths:
    R = max(16 * w // 128, 1)
    blocks = jnp.asarray(rng.standard_normal((C, R, 128)), jnp.float32)
    try:
        run(ITERS_LO, blocks, R, w).block_until_ready()
    except Exception:
        import traceback
        traceback.print_exc()
        print(f"w={w}: FAILED", flush=True)
        continue

    def t(steps):
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            run(steps, blocks, R, w).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best
    per = (t(ITERS_HI) - t(ITERS_LO)) / (ITERS_HI - ITERS_LO)
    print(f"w={w:4d} (R={R}) mode={MODE}: {per * 1e9:8.1f} ns per 8-row leaf round "
          f"(baseline visit ~840 ns at w=64 serving 1024 rays/1 cluster)",
          flush=True)
