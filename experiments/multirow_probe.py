"""Hardware probe: primitive costs for the 8-row packet kernel (TPU).

A synthetic node-step loop on 8 independent rows per (8,128) vreg:
  - 12 per-row scalar SMEM loads at traced indices (2 children x 6
    bounds), assembled into (8,1) vectors via an iota-select chain
  - two slab tests on (8,128) with (8,1)-broadcast bounds
  - per-row votes as axis=1 lane reductions (keepdims)
  - vectorized advance: per-row ctz/shift/select on (8,1) uint32

Reports ns per iteration (= per 8 node steps). Production scalar
baseline: ~150 ns per single node step (iter_ablate).

Usage: python experiments/multirow_probe.py [n_nodes]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
ITERS_LO, ITERS_HI = 64, 512

print("devices:", jax.devices())

rng = np.random.default_rng(0)
ntab = jnp.asarray(rng.standard_normal(N * 6), jnp.float32)
rays = jnp.asarray(rng.standard_normal((7, 8, 128)), jnp.float32)

_ROWI = None


def _vec8(scalars):
    """(8,1) f32 vector from 8 traced scalars (iota-select chain)."""
    out = jnp.full((8, 1), scalars[0], jnp.float32)
    for r in range(1, 8):
        out = jnp.where(_ROWI == r, scalars[r], out)
    return out


def _ctz8(x):
    """Vectorized count-trailing-zeros on (8,1) uint32."""
    n = jnp.zeros((8, 1), jnp.int32)
    for half, mask in ((16, 0xFFFF), (8, 0xFF), (4, 0xF), (2, 0x3),
                      (1, 0x1)):
        zero = (x & jnp.uint32(mask)) == 0
        n = n + jnp.where(zero, half, 0)
        x = jnp.where(zero, x >> jnp.uint32(half), x)
    return n


def _kernel(steps_ref, rays_ref, ntab_hbm, out_ref, *, mode):
    global _ROWI
    _ROWI = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def scoped(ntab_s, sem):
        nd = pltpu.make_async_copy(ntab_hbm, ntab_s, sem)
        nd.start()
        nd.wait()
        o1 = rays_ref[0]
        o2 = rays_ref[1]
        o3 = rays_ref[2]
        i1 = 1.0 / rays_ref[3]
        i2 = 1.0 / rays_ref[4]
        i3 = 1.0 / rays_ref[5]
        cl = rays_ref[6] * 0.0 + 1e30
        n1, n2, n3 = i1 < 0.0, i2 < 0.0, i3 < 0.0

        def read_row(r, idx_s):
            b = idx_s * 6
            return [ntab_s[b + i] for i in range(6)]

        def slab(bv, closest):
            # bv: list of 6 (8,1) vectors
            t0x = (bv[0] - o1) * i1
            t1x = (bv[3] - o1) * i1
            t0y = (bv[1] - o2) * i2
            t1y = (bv[4] - o2) * i2
            t0z = (bv[2] - o3) * i3
            t1z = (bv[5] - o3) * i3
            lox = jnp.where(n1, t1x, t0x)
            hix = jnp.where(n1, t0x, t1x)
            loy = jnp.where(n2, t1y, t0y)
            hiy = jnp.where(n2, t0y, t1y)
            loz = jnp.where(n3, t1z, t0z)
            hiz = jnp.where(n3, t0z, t1z)
            tmin = jnp.maximum(jnp.maximum(lox, loy),
                               jnp.maximum(loz, 1e-4))
            tmax = jnp.minimum(jnp.minimum(hix, hiy),
                               jnp.minimum(hiz, closest))
            return jnp.where(tmax < tmin, 1e30, tmin)

        def body(_, carry):
            idxv, bsv, acc = carry
            if mode == "assemble":
                # extract 8 scalars from the idx vector, read 2x6 bounds
                scal = [jnp.sum(jnp.where(_ROWI == r, idxv, 0))
                        for r in range(8)]
                bl = [[], [], [], [], [], []]
                br = [[], [], [], [], [], []]
                for r in range(8):
                    l = scal[r] * 2
                    for i in range(6):
                        bl[i].append(ntab_s[l * 6 + i])
                        br[i].append(ntab_s[l * 6 + 6 + i])
                blv = [_vec8(c) for c in bl]
                brv = [_vec8(c) for c in br]
            else:
                # fixed bounds: isolates slab+vote+advance cost
                blv = [jnp.full((8, 1), 0.1 * i, jnp.float32)
                       for i in range(6)]
                brv = [jnp.full((8, 1), 0.1 * i + 0.05, jnp.float32)
                       for i in range(6)]
            lhit = slab(blv, cl)
            rhit = slab(brv, cl)
            tl = lhit < cl
            tr = rhit < cl
            both = tl & tr
            pref = jnp.sum(jnp.where(both, jnp.where(rhit < lhit, 1, -1),
                                     0), axis=1, keepdims=True)
            nl = jnp.sum(tl.astype(jnp.int32), axis=1, keepdims=True)
            nr = jnp.sum(tr.astype(jnp.int32), axis=1, keepdims=True)
            vl = nl > 0
            vr = nr > 0
            swap = (pref > 0).astype(jnp.int32)
            bothv = vl & vr
            single = vl ^ vr
            m = jnp.where(bsv > 0, _ctz8(bsv), 0)
            bs_p = (bsv >> m.astype(jnp.uint32)) ^ jnp.uint32(1)
            idx_p = (idxv >> m) ^ 1
            l2 = idxv * 2
            child_both = l2 + swap
            child_single = jnp.where(vl, l2, l2 + 1)
            new_idx = jnp.where(bothv, child_both,
                                jnp.where(single, child_single, idx_p))
            new_bs = jnp.where(bothv,
                               (bsv << jnp.uint32(1)) + jnp.uint32(1),
                               jnp.where(single, bsv << jnp.uint32(1),
                                         bs_p))
            # keep indices in range (synthetic walk)
            new_idx = (new_idx & (N // 2 - 1)) | 1
            new_bs = new_bs & jnp.uint32(0xFFFF)
            new_bs = jnp.where(new_bs == 0, jnp.uint32(1), new_bs)
            return (new_idx, new_bs, acc + lhit + rhit)

        idx0 = (jnp.abs(_ROWI) % (N // 2 - 1)) + 1
        bs0 = jnp.full((8, 1), 0x15, jnp.uint32)
        acc0 = jnp.zeros((8, 128), jnp.float32)
        _, _, acc = jax.lax.fori_loop(0, steps_ref[0], body,
                                      (idx0, bs0, acc0))
        out_ref[:, :] = acc

    pl.run_scoped(scoped, ntab_s=pltpu.SMEM(ntab.shape, jnp.float32),
                  sem=pltpu.SemaphoreType.DMA(()))


@functools.partial(jax.jit, static_argnames=("mode",))
def run(steps, mode):
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(jnp.asarray([steps], jnp.int32), rays, ntab)


for mode in ("fixed", "assemble"):
    try:
        a = run(ITERS_LO, mode)
        a.block_until_ready()
    except Exception as e:
        import traceback; traceback.print_exc(); print(f"{mode}: FAILED")
        continue

    def t(steps):
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            run(steps, mode).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best
    per = (t(ITERS_HI) - t(ITERS_LO)) / (ITERS_HI - ITERS_LO)
    print(f"{mode:9s}: {per * 1e9:7.1f} ns/iter (= per 8 node steps; "
          f"scalar baseline ~150 ns/step)", flush=True)
