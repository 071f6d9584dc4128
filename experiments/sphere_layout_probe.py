"""Sphere-kernel layout probe (TPU): is the headline kernel above its
op floor, and does the MT-style scalar-broadcast layout beat it?

The production kernel (ops/pallas_spheres._kernel_feat) works on
(TILE=256, S=512) tiles: rays along sublanes via (256,1) columns,
spheres along lanes, winner via cross-lane min+argmin per chunk. Op
budget says ~27 VPU ops/pair -> ~1.6 us/grid-step floor, but it
measures ~4.5 us — the layout (column broadcasts, lane reductions,
one-hot rebuild) eats ~3x.

The alternative is the leaf-MT layout that measures AT the issue
floor (leafmt_probe): rays in (8,128) lane tiles, spheres
scalar-broadcast from SMEM, winner tracked by sequential
select — no cross-lane ops at all. Same arithmetic op-for-op
(oc-form), same first-wins tie-break -> bit-identical results.

Usage: python experiments/sphere_layout_probe.py
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

_FLT_MAX = 3.4028235e38
ROWS = 8
S = 512
M = 1 << 14


def _kernel_sbf(ox, oy, oz, dx, dy, dz, tmax, sph, feat_t, t_out,
                i_out, f_out, *, t_min, n_s, n_c):
    """Scalar-broadcast hit + in-kernel one-hot MXU feature fetch in
    the (8,128)-lane layout: sel (S, 1024) from iota vs i_best
    reshaped (1,1024); 3-term bf16 exact contraction like the
    production kernel."""
    def scoped(tab, sem):
        d = pltpu.make_async_copy(sph, tab, sem)
        d.start()
        d.wait()
        o1, o2, o3 = ox[:, :], oy[:, :], oz[:, :]
        d1, d2, d3 = dx[:, :], dy[:, :], dz[:, :]
        tmax_v = tmax[:, :]
        shp = o1.shape
        t_best = tmax_v
        i_best = jnp.full(shp, -1, jnp.int32)
        for s in range(n_s):
            ccx = tab[0, s]
            ccy = tab[1, s]
            ccz = tab[2, s]
            rr2 = tab[3, s]
            ocx = o1 - ccx
            ocy = o2 - ccy
            ocz = o3 - ccz
            b = ocx * d1 + ocy * d2 + ocz * d3
            c = ocx * ocx + ocy * ocy + ocz * ocz - rr2
            disc = b * b - c
            ok = disc > 0.0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t1 = -b - sq
            t2 = -b + sq
            ts0 = jnp.where(t1 > t_min, t1, t2)
            win = ok & (ts0 > t_min) & (ts0 < t_best)
            t_best = jnp.where(win, ts0, t_best)
            i_best = jnp.where(win, s, i_best)
        hi = feat_t[:, :].astype(jnp.bfloat16)
        r1_ = feat_t[:, :] - hi.astype(jnp.float32)
        mid = r1_.astype(jnp.bfloat16)
        lo = (r1_ - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        row0 = jax.lax.broadcasted_iota(jnp.int32, (n_s, ROWS * 128), 0)
        i_row = i_best.reshape(1, ROWS * 128)
        sel = (row0 == i_row).astype(jnp.bfloat16)
        acc = jnp.dot(hi, sel, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(mid, sel, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(lo, sel, preferred_element_type=jnp.float32)
        t_out[:, :] = jnp.where(i_best >= 0, t_best, _FLT_MAX)
        i_out[:, :] = i_best
        f_out[:, :] = acc

    pl.run_scoped(scoped, tab=pltpu.SMEM((4, S), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA(()))


@functools.partial(jax.jit, static_argnames=("t_min", "n_s", "n_c"))
def run_sbf(ox, oy, oz, dx, dy, dz, tmax, sph, feat_t, t_min, n_s,
            n_c):
    n = ox.shape[0]
    ray = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    fspec = pl.BlockSpec((n_c, ROWS * 128), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    ftab = pl.BlockSpec((n_c, S), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    shp2 = (n // 128, 128)
    t, idx, f = pl.pallas_call(
        functools.partial(_kernel_sbf, t_min=t_min, n_s=n_s, n_c=n_c),
        grid=(n // (ROWS * 128),),
        in_specs=[ray] * 7 + [hbm, ftab],
        out_specs=(ray, ray, fspec),
        out_shape=(jax.ShapeDtypeStruct(shp2, jnp.float32),
                   jax.ShapeDtypeStruct(shp2, jnp.int32),
                   jax.ShapeDtypeStruct((n_c, n), jnp.float32)),
    )(ox.reshape(shp2), oy.reshape(shp2), oz.reshape(shp2),
      dx.reshape(shp2), dy.reshape(shp2), dz.reshape(shp2),
      tmax.reshape(shp2), sph, feat_t)
    return t.reshape(-1), idx.reshape(-1), f


def _kernel_sb(ox, oy, oz, dx, dy, dz, tmax, sph, t_out, i_out,
               *, t_min, n_s):
    def scoped(tab, sem):
        d = pltpu.make_async_copy(sph, tab, sem)
        d.start()
        d.wait()
        o1, o2, o3 = ox[:, :], oy[:, :], oz[:, :]
        d1, d2, d3 = dx[:, :], dy[:, :], dz[:, :]
        tmax_v = tmax[:, :]
        shp = o1.shape
        t_best = tmax_v
        i_best = jnp.full(shp, -1, jnp.int32)
        for s in range(n_s):
            ccx = tab[0, s]
            ccy = tab[1, s]
            ccz = tab[2, s]
            rr2 = tab[3, s]
            ocx = o1 - ccx
            ocy = o2 - ccy
            ocz = o3 - ccz
            b = ocx * d1 + ocy * d2 + ocz * d3
            c = ocx * ocx + ocy * ocy + ocz * ocz - rr2
            disc = b * b - c
            ok = disc > 0.0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t1 = -b - sq
            t2 = -b + sq
            ts0 = jnp.where(t1 > t_min, t1, t2)
            win = ok & (ts0 > t_min) & (ts0 < t_best)
            t_best = jnp.where(win, ts0, t_best)
            i_best = jnp.where(win, s, i_best)
        t_out[:, :] = jnp.where(i_best >= 0, t_best, _FLT_MAX)
        i_out[:, :] = i_best

    pl.run_scoped(scoped, tab=pltpu.SMEM((4, S), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA(()))


@functools.partial(jax.jit, static_argnames=("t_min", "n_s"))
def run_sb(ox, oy, oz, dx, dy, dz, tmax, sph, t_min, n_s):
    n = ox.shape[0]
    ray = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    shp2 = (n // 128, 128)
    t, idx = pl.pallas_call(
        functools.partial(_kernel_sb, t_min=t_min, n_s=n_s),
        grid=(n // (ROWS * 128),),
        in_specs=[ray] * 7 + [hbm],
        out_specs=(ray, ray),
        out_shape=(jax.ShapeDtypeStruct(shp2, jnp.float32),
                   jax.ShapeDtypeStruct(shp2, jnp.int32)),
    )(ox.reshape(shp2), oy.reshape(shp2), oz.reshape(shp2),
      dx.reshape(shp2), dy.reshape(shp2), dz.reshape(shp2),
      tmax.reshape(shp2), sph)
    return t.reshape(-1), idx.reshape(-1)


def main():
    from tpu_pathtracer.models.spheres import random_spheres_scene
    from tpu_pathtracer.ops.pallas_spheres import spheres_hit_feat
    from tpu_pathtracer.ops.v3 import V3

    print("devices:", jax.devices(), flush=True)
    scene, cam = random_spheres_scene(1200, 800)
    sc = scene.sphere_center
    sr = scene.sphere_radius
    ns = sc.shape[0]
    print("spheres:", ns, flush=True)
    cx = jnp.zeros((4, S), jnp.float32)
    cx = cx.at[0, :ns].set(sc[:, 0]).at[1, :ns].set(sc[:, 1]) \
        .at[2, :ns].set(sc[:, 2]) \
        .at[3, :ns].set(sr * sr * jnp.where(sr > 0, 1.0, -1.0)) \
        .at[3, ns:].set(-1.0)

    rng = np.random.RandomState(0)
    o = rng.uniform(-8, 8, (3, M)).astype(np.float32)
    o[1] += 10
    d = rng.randn(3, M).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    ov = V3(*(jnp.asarray(o[k]) for k in range(3)))
    dv = V3(*(jnp.asarray(d[k]) for k in range(3)))
    cv = V3(sc[:, 0], sc[:, 1], sc[:, 2])
    feat = jnp.concatenate([sc, sr[:, None],
                            jnp.ones((ns, 14), jnp.float32)], axis=1)
    tmax = jnp.full((M,), _FLT_MAX, jnp.float32)

    # correctness: scalar-broadcast must match the production kernel
    t_ref, i_ref, _ = spheres_hit_feat(ov, dv, cv, sr, feat, 1e-3,
                                       _FLT_MAX)
    t_sb, i_sb = run_sb(ov.x, ov.y, ov.z, dv.x, dv.y, dv.z, tmax, cx,
                        1e-3, S)
    t_ref = np.asarray(t_ref)
    t_sb = np.asarray(t_sb)
    i_ref = np.asarray(i_ref)
    i_sb = np.asarray(i_sb)
    print("idx equal:", (i_ref == i_sb).mean(),
          "t equal:", (t_ref == t_sb).mean(), flush=True)

    # timing: chain by origin perturbation inside one jit
    @jax.jit
    def loop_prod(steps, r):
        def body(_, carry):
            o, acc = carry
            t, idx, f = spheres_hit_feat(o, dv, cv, sr, feat, 1e-3,
                                         _FLT_MAX)
            o = V3(o.x + t * 1e-9, o.y, o.z)
            return o, acc + t
        o, acc = jax.lax.fori_loop(
            0, steps, body,
            (V3(ov.x + r * 1e-6, ov.y, ov.z), jnp.zeros((M,))))
        return jnp.sum(jnp.where(jnp.isfinite(acc), acc, 0.0))

    @jax.jit
    def loop_sb(steps, r):
        def body(_, carry):
            ox, acc = carry
            t, idx = run_sb(ox, ov.y, ov.z, dv.x, dv.y, dv.z, tmax,
                            cx, 1e-3, S)
            ox = ox + t * 1e-9
            return ox, acc + t
        ox, acc = jax.lax.fori_loop(
            0, steps, body, (ov.x + r * 1e-6, jnp.zeros((M,))))
        return jnp.sum(jnp.where(jnp.isfinite(acc), acc, 0.0))

    def slope(fn, lo=8, hi=264, reps=8):
        float(fn(lo, 0))
        float(fn(hi, 0))
        def t(steps):
            best = 1e9
            for r in range(reps):
                t0 = time.perf_counter()
                v = float(fn(steps, r + 1))
                best = min(best, time.perf_counter() - t0)
            return best
        return (t(hi) - t(lo)) / (hi - lo)

    # new layout + in-kernel one-hot fetch
    C = feat.shape[1]
    feat_tt = feat.T  # (C, S) already padded? pad S
    feat_tt = jnp.concatenate(
        [feat_tt, jnp.zeros((C, S - ns), jnp.float32)], axis=1)
    t_f, i_f, f_f = run_sbf(ov.x, ov.y, ov.z, dv.x, dv.y, dv.z, tmax,
                            cx, feat_tt, 1e-3, S, C)
    # exactness of the fetched features vs a numpy gather
    fn = np.asarray(f_f)
    idxs = np.maximum(np.asarray(i_f), 0)
    ref_feats = np.asarray(feat)[idxs].T * (np.asarray(i_f) >= 0)
    print("feat exact:", (fn == ref_feats).mean(),
          "idx equal:", (np.asarray(i_f) == i_ref).mean(), flush=True)

    @jax.jit
    def loop_sbf(steps, r):
        def body(_, carry):
            ox, acc = carry
            t, idx, f = run_sbf(ox, ov.y, ov.z, dv.x, dv.y, dv.z,
                                tmax, cx, feat_tt, 1e-3, S, C)
            ox = ox + t * 1e-9
            return ox, acc + t + f[0, :]
        ox, acc = jax.lax.fori_loop(
            0, steps, body, (ov.x + r * 1e-6, jnp.zeros((M,))))
        return jnp.sum(jnp.where(jnp.isfinite(acc), acc, 0.0))

    pa = slope(loop_prod)
    pb = slope(loop_sb)
    pc = slope(loop_sbf)
    print(f"production (feat) : {pa*1e6:8.1f} us/iter (16k rays x 512 spheres)")
    print(f"scalar-broadcast  : {pb*1e6:8.1f} us/iter (no feature fetch)")
    print(f"sb + onehot fetch : {pc*1e6:8.1f} us/iter")
    print(f"ratios: prod/sb {pa/pb:.2f}x  prod/sbf {pa/pc:.2f}x")


if __name__ == "__main__":
    main()
