"""Hardware probe: gather-based 8-row node round (TPU).

The multirow kernel needs per-row node bounds WITHOUT leaving vector
domain. For a component table organized as (S,128) f32 (node-pair id
p at [p >> 7, p & 127]), the fetch for 8 rows chains two
tpu.dynamic_gather ops:

    z   = take_along_axis(tab, sub_idx, axis=0)   # row r <- tab[p_r>>7]
    out = take_along_axis(z, lane_idx, axis=1)    # col j <- z[r, p_r&127]

yielding out[r, :] = tab[p_r >> 7, p_r & 127] broadcast across lanes —
exactly the slab-test operand shape. This probe times a synthetic
node round (12 component fetches + 2 slabs + votes + fully vectorized
advance incl. float-exponent ctz) per table height S.

Usage: python experiments/gather_probe.py [S ...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sizes = [int(s) for s in sys.argv[1:]] or [8, 16, 32, 64, 128]
ITERS_LO, ITERS_HI = 1024, 8192

print("devices:", jax.devices())

rng = np.random.default_rng(0)
rays = jnp.asarray(rng.standard_normal((7, 8, 128)), jnp.float32)


def _ctz8v(x):
    """(8,1) uint32 ctz via float exponent: ctz(x) = exp(f32(x & -x)).
    Casts via int32 (uint32->f32 convert is unsupported); valid while
    bit 31 is clear — tree depth < 31 always holds here."""
    xi = x.astype(jnp.int32)
    low = xi & -xi
    f = low.astype(jnp.float32)          # exact: power of two
    bits = jax.lax.bitcast_convert_type(f, jnp.int32)
    return (bits >> 23) - 127


def _kernel(steps_ref, rays_ref, tabs_ref, out_ref, *, S):
    o1 = rays_ref[0]
    o2 = rays_ref[1]
    o3 = rays_ref[2]
    i1 = 1.0 / rays_ref[3]
    i2 = 1.0 / rays_ref[4]
    i3 = 1.0 / rays_ref[5]
    cl = rays_ref[6] * 0.0 + 1e30
    n1, n2, n3 = i1 < 0.0, i2 < 0.0, i3 < 0.0

    B = S // 8  # (8,128) vreg blocks per component table

    def fetch(c, sub8, lane8, blk8):
        """tab[idx] for 8 per-row ids spanning B blocks: gather every
        block (source must fit one vreg), then select by block id."""
        out = None
        for b in range(B):
            tab = tabs_ref[c, b]
            z = jnp.take_along_axis(tab, sub8, axis=0,
                                    mode="promise_in_bounds")
            g = jnp.take_along_axis(z, lane8, axis=1,
                                    mode="promise_in_bounds")
            out = g if out is None else jnp.where(blk8 == b, g, out)
        return out

    def slab(bv, closest):
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
        tmin = jnp.maximum(jnp.maximum(lox, loy), jnp.maximum(loz, 1e-4))
        tmax = jnp.minimum(jnp.minimum(hix, hiy), jnp.minimum(hiz, closest))
        return jnp.where(tmax < tmin, 1e30, tmin)

    def body(_, carry):
        idxv, bsv, acc = carry
        # idxv: (8,1) int32 node-pair ids in [0, S*128)
        sub8 = jnp.broadcast_to((idxv >> 7) & 7, (8, 128))
        lane8 = jnp.broadcast_to(idxv & 127, (8, 128))
        blk8 = jnp.broadcast_to(idxv >> 10, (8, 128))
        bl = [fetch(c, sub8, lane8, blk8) for c in range(6)]
        br = [fetch(c + 6, sub8, lane8, blk8) for c in range(6)]
        lhit = slab(bl, cl)
        rhit = slab(br, cl)
        tl = lhit < cl
        tr = rhit < cl
        both = tl & tr
        pref = jnp.sum(jnp.where(both, jnp.where(rhit < lhit, 1, -1), 0),
                       axis=1, keepdims=True)
        vl = jnp.any(tl, axis=1, keepdims=True)
        vr = jnp.any(tr, axis=1, keepdims=True)
        swap = (pref > 0).astype(jnp.int32)
        bothv = vl & vr
        single = vl ^ vr
        m = jnp.where(bsv > 0, _ctz8v(bsv), 0)
        bs_p = (bsv >> m.astype(jnp.uint32)) ^ jnp.uint32(1)
        idx_p = (idxv >> m) ^ 1
        l2 = idxv * 2
        child_both = l2 + swap
        child_single = jnp.where(vl, l2, l2 + 1)
        new_idx = jnp.where(bothv, child_both,
                            jnp.where(single, child_single, idx_p))
        new_bs = jnp.where(bothv, (bsv << jnp.uint32(1)) + jnp.uint32(1),
                           jnp.where(single, bsv << jnp.uint32(1), bs_p))
        new_idx = (new_idx & (S * 128 - 1))
        new_bs = new_bs & jnp.uint32(0xFFFF)
        new_bs = jnp.where(new_bs == 0, jnp.uint32(1), new_bs)
        return (new_idx, new_bs, acc + lhit + rhit)

    rowi = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    idx0 = (rowi * 37 + 1) & (S * 128 - 1)
    bs0 = jnp.full((8, 1), 0x15, jnp.uint32)
    acc0 = jnp.zeros((8, 128), jnp.float32)
    _, _, acc = jax.lax.fori_loop(0, steps_ref[0], body,
                                  (idx0, bs0, acc0))
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("S",))
def run(steps, tabs, S):
    return pl.pallas_call(
        functools.partial(_kernel, S=S),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(jnp.asarray([steps], jnp.int32), rays, tabs)


for S in sizes:
    tabs = jnp.asarray(rng.standard_normal((12, max(S // 8, 1), 8, 128)),
                       jnp.float32)
    try:
        run(ITERS_LO, tabs, S).block_until_ready()
    except Exception:
        import traceback
        traceback.print_exc()
        print(f"S={S}: FAILED", flush=True)
        continue

    def t(steps):
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            run(steps, tabs, S).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best
    per = (t(ITERS_HI) - t(ITERS_LO)) / (ITERS_HI - ITERS_LO)
    print(f"S={S:4d} ({S * 128} node-pairs): {per * 1e9:7.1f} ns per "
          f"8-row node round (scalar baseline ~150 ns/step)", flush=True)
