"""TPU micro-prototype of the regrouped (demand-packed) leaf phase.

demand_sim.py measured the packet-union leaf phase at 80x (knot) /
368x (dragon) the demanded MT work on bounce packets — IF the
regrouping constant is small enough (break-even 92 / 422 ns/pair).
This probe implements the windowed pair-regroup MT phase in ISOLATION
as a Pallas kernel on synthetic demand data and times it per window,
so the go/no-go on a production kernel rests on measured Mosaic costs.

Orientation (shapecast_probe.py findings): slots S live in the LANE
dimension; (8,128)<->(1,1024) reshapes and dot_general with
contract-dim-0 operands are the legal moves; free-standing (N,1)
columns built by reshape crash Mosaic.

  window = K leaf visits; visit v's demand mask m_v is an (8,128)
  lane tile; demanding lanes get slots vpref[v] + rank_v(r) (rank =
  exclusive lane-prefix of m_v; vpref = scalar cumsum of the per-visit
  vote counts the leaf_cull vote already produces).
  - per-slot scalars (v(s), k(s), cid(s)) from SMEM loops on (1,S)
  - C_TT (K,S) visit one-hot: one iota compare vs v_of_s
  - G' (R,S) ray ownership: enc = 2*rank + mask fetched to slots by
    dot_general(ENC (K,R), C_TT (K,S)) [2-term exact bf16 split]
  - ray fetch F (24,S) = RayCT24T (24,R) @ G' (3-term split, exact)
  - tri fetch T_all (1024,S) = dot_general(TriStack (3K,1024cw),
    C_TT3 (3K,S)) [K-stacked 3-term, exact]
  - MT on (W,S) tiles with (1,S) ray rows; column-min per slot
  - scatter: 3 row-min passes over (R,S) [t, tie-slot, besti]

Usage: python experiments/regroup_probe.py [upto ...]
  upto in {ct, g, ray, tri, mt, full}; default runs all cumulatively.
"""

import os

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    if jax.default_backend() != "cpu":
        import jax.extend.backend as _jeb
        _jeb.clear_backends()
        jax.config.update("jax_platforms", "cpu")

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 1024          # pair slots per window
K = 64            # leaf visits per window
W = 64            # triangles per cluster
R = 1024          # rays per packet
FLT_MAX = 3.4028235e38
T_MIN = 1e-3
BIG = float(2 ** 30)


def split3(x):
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _row(x):
    """(8,128) tile -> (1,R) row (flat row-major ray order; legal)."""
    return x.reshape(1, R)


def _lane_exclusive_prefix(m):
    """Exclusive prefix sum of an (8,128) 0/1 tile in flat row-major
    order (lane log-scan + sublane carry)."""
    x = m.astype(jnp.int32)
    s = x
    for sh in (1, 2, 4, 8, 16, 32, 64):
        sp = pltpu.roll(s, sh, 1)
        mask = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) >= sh
        s = s + jnp.where(mask, sp, 0)
    row_tot = s[:, 127:128]  # (8,1) row totals
    carry = jnp.zeros_like(s)
    for sh in (1, 2, 4):
        rp = pltpu.roll(row_tot, sh, 0)
        maskr = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) >= sh
        row_tot_sh = jnp.where(maskr, rp, 0)
        carry = carry + row_tot_sh
        row_tot = row_tot + row_tot_sh
    return s - x + carry[:, 0:1]


def _kernel(ox, oy, oz, dx, dy, dz, cl0, mt_in, tri_stack, vpref, cids,
            t_out, i_out, *, upto: str, interpret: bool = False):
    # CPU-interpret runs bf16 dots with bf16 accumulation (CLAUDE.md);
    # HIGHEST restores f32 accumulation for the exactness check only.
    prec = jax.lax.Precision.HIGHEST if interpret else None

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    def dotT(a, b):
        # contract dim 0 of BOTH operands: (K,M),(K,N) -> (M,N)
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    # ---- per-visit rank scans -> enc rows (production: incremental
    # during the node phase, stored to a (K,8,128) scratch)
    encs = []
    for v in range(K):
        mi = mt_in[v] > 0.5
        rank = _lane_exclusive_prefix(mi)
        encs.append(2 * rank + mi.astype(jnp.int32))
    enc_t = jnp.stack(encs, axis=0).reshape(K, R)   # (K,R) i32
    enc_hi = (enc_t >> 8).astype(jnp.bfloat16)      # values <= 8
    enc_lo = (enc_t & 255).astype(jnp.bfloat16)

    # ---- per-slot scalar rows from SMEM loops (all (1,S))
    iota_sr = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    v_of_s = jnp.zeros((1, S), jnp.int32)
    vpref_s = jnp.zeros((1, S), jnp.int32)
    cid_s = jnp.zeros((1, S), jnp.float32)
    for v in range(K):
        sel = iota_sr >= vpref[v]
        v_of_s = jnp.where(sel, v, v_of_s)
        vpref_s = jnp.where(sel, vpref[v], vpref_s)
        cid_s = jnp.where(sel, cids[v].astype(jnp.float32), cid_s)
    k_s = iota_sr - vpref_s                          # (1,S)
    used = iota_sr < vpref[K]                        # (1,S) slot in use
    if upto == "ct":
        t_out[:, :] = (cid_s + k_s.astype(jnp.float32)).reshape(8, 128)
        i_out[:, :] = jnp.where(used, v_of_s, -1).reshape(8, 128)
        return

    # ---- C_TT (K,S) one-hot + G' (R,S) ray ownership
    iota_kv = jax.lax.broadcasted_iota(jnp.int32, (K, S), 0)
    ctt_b = (iota_kv == v_of_s) & used
    ctt = ctt_b.astype(jnp.bfloat16)
    ef = dotT(enc_hi, ctt) * 256.0 + dotT(enc_lo, ctt)   # (R,S)
    want = (2 * k_s + 1).astype(jnp.float32)             # (1,S)
    g_b = ef == want                                     # (R,S)
    g = g_b.astype(jnp.bfloat16)
    if upto == "g":
        t_out[:, :] = jnp.sum(g.astype(jnp.float32), axis=1,
                              keepdims=True).reshape(8, 128)
        i_out[:, :] = jnp.sum(ctt_b.astype(jnp.int32), axis=0,
                              keepdims=True).reshape(8, 128)
        return

    # ---- ray fetch F (24,S): RayCT24T built once per packet
    rows = []
    for comp in (ox, oy, oz, dx, dy, dz, cl0, cl0):
        rows.extend(split3(_row(comp[:, :])))        # 3 x (1,R) bf16
    rayct_t = jnp.concatenate(rows, axis=0)          # (24,R) bf16
    f = dot(rayct_t, g.astype(jnp.bfloat16))         # (24,S) f32

    def comp3(i):
        return f[3 * i:3 * i + 1, :] + f[3 * i + 1:3 * i + 2, :] \
            + f[3 * i + 2:3 * i + 3, :]              # (1,S)
    o1p, o2p, o3p = comp3(0), comp3(1), comp3(2)
    d1p, d2p, d3p = comp3(3), comp3(4), comp3(5)
    clp = comp3(6)
    if upto == "ray":
        t_out[:, :] = (o1p + o2p + o3p + clp).reshape(8, 128)
        i_out[:, :] = (d1p + d2p + d3p).astype(jnp.int32).reshape(8, 128)
        return

    # ---- tri fetch T_all (1024cw, S): K-stacked 3-term contraction
    ctt3 = jnp.concatenate([ctt, ctt, ctt], axis=0)  # (3K,S)
    t_all = dotT(tri_stack[:, :], ctt3)              # (1024,S) f32

    if upto == "tri":
        t_out[:, :] = jnp.sum(t_all[:8, :] * 0.5, axis=0,
                              keepdims=True).reshape(8, 128)
        i_out[:, :] = jnp.zeros((8, 128), jnp.int32)
        return

    # ---- dense 2D MT on (W,S) tiles, ray rows broadcast
    def tc(c):
        return t_all[c * W:(c + 1) * W, :]           # (W,S)
    n1, n2, n3 = tc(9), tc(10), tc(11)
    a = -(d1p * n1 + d2p * n2 + d3p * n3)
    par = jnp.abs(a) < 1e-7
    fi = 1.0 / jnp.where(par, 1.0, a)
    sx = o1p - tc(0)
    sy = o2p - tc(1)
    sz = o3p - tc(2)
    qx = sy * d3p - sz * d2p
    qy = sz * d1p - sx * d3p
    qz = sx * d2p - sy * d1p
    u = fi * (qx * tc(6) + qy * tc(7) + qz * tc(8))
    v = -(fi * (qx * tc(3) + qy * tc(4) + qz * tc(5)))
    tt = fi * (sx * n1 + sy * n2 + sz * n3)
    bad = (par | (jnp.minimum(u, v) < 0.0) | (u + v > 1.0)
           | jnp.logical_not(tt > T_MIN) | jnp.logical_not(tt < clp))
    tw = jnp.where(bad, FLT_MAX, tt)                 # (W,S)
    t_slot = jnp.min(tw, axis=0, keepdims=True)      # (1,S)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, S), 0)
    w_slot = jnp.min(jnp.where(tw == t_slot, iota_w, jnp.int32(W)),
                     axis=0, keepdims=True)          # (1,S)
    besti_s = cid_s * W + w_slot.astype(jnp.float32)
    if upto == "mt":
        t_out[:, :] = t_slot.reshape(8, 128)
        i_out[:, :] = besti_s.astype(jnp.int32).reshape(8, 128)
        return

    # ---- scatter: 3 row-min passes over (R,S)
    tb = jnp.where(g_b, t_slot, FLT_MAX)             # (R,S)
    minv = jnp.min(tb, axis=1, keepdims=True)        # (R,1)
    tie = g_b & (t_slot == minv)
    mins = jnp.min(jnp.where(tie, iota_sr, jnp.int32(S)), axis=1,
                   keepdims=True)                    # (R,1) earliest slot
    bb = jnp.where(iota_sr == mins, besti_s, jnp.float32(BIG))
    minb = jnp.min(bb, axis=1, keepdims=True)        # (R,1)
    clc = _row(cl0[:, :])                            # (1,R)
    hit = minv.reshape(1, R) < clc
    t_out[:, :] = jnp.where(hit, minv.reshape(1, R), clc).reshape(8, 128)
    i_out[:, :] = jnp.where(hit, minb.reshape(1, R), -1.0) \
        .astype(jnp.int32).reshape(8, 128)


@functools.partial(jax.jit, static_argnames=("upto", "interpret"))
def run_window(ox, oy, oz, dx, dy, dz, cl0, mt_in, tri_stack, vpref, cids,
               upto="full", interpret=False):
    spec8 = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, upto=upto, interpret=interpret),
        in_specs=[spec8] * 9 + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2,
        out_specs=(spec8, spec8),
        out_shape=(jax.ShapeDtypeStruct((8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((8, 128), jnp.int32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 << 20),
    )(ox, oy, oz, dx, dy, dz, cl0, mt_in, tri_stack, vpref, cids)


def make_inputs(rng, pairs_target=840):
    o = rng.uniform(-1, 1, (3, 8, 128)).astype(np.float32)
    d = rng.uniform(-1, 1, (3, 8, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    cl0 = np.full((8, 128), 8.0, np.float32)
    p = pairs_target / (K * R)
    m = (rng.uniform(size=(K, 8, 128)) < p).astype(np.float32)
    counts = m.reshape(K, -1).sum(1).astype(np.int64)
    vpref = np.zeros(K + 1, np.int32)
    vpref[1:] = np.cumsum(counts)
    assert vpref[-1] <= S, vpref[-1]
    cids = rng.integers(0, 13000, K).astype(np.int32)
    # synthetic clusters: comp-major (16 comps x W tris), geometry near
    # the ray origins so some hits land
    tri = rng.uniform(-1.5, 1.5, (K, 16 * W)).astype(np.float32)
    hi = tri.astype(jnp.bfloat16)
    r1 = tri - np.asarray(hi, np.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - np.asarray(mid, np.float32)).astype(jnp.bfloat16)
    tri_stack = np.concatenate([np.asarray(hi), np.asarray(mid),
                                np.asarray(lo)], axis=0)  # (3K,1024) bf16
    return (o[0], o[1], o[2], d[0], d[1], d[2], cl0, m,
            tri_stack, vpref, cids, tri)


def numpy_ref(o1, o2, o3, d1, d2, d3, cl0, m, tri, vpref, cids):
    t_ref = cl0.reshape(-1).astype(np.float32).copy()
    i_ref = np.full(R, -1, np.int64)
    for v in range(K):  # visit order == slot order == tie-break order
        mask = m[v].reshape(-1) > 0.5
        comps = tri[v].reshape(16, W)
        v0, e1, e2, nn = comps[0:3], comps[3:6], comps[6:9], comps[9:12]
        for r in np.nonzero(mask)[0]:
            o = np.array([o1.reshape(-1)[r], o2.reshape(-1)[r],
                          o3.reshape(-1)[r]], np.float32)
            d = np.array([d1.reshape(-1)[r], d2.reshape(-1)[r],
                          d3.reshape(-1)[r]], np.float32)
            a = (-(d @ nn)).astype(np.float32)
            par = np.abs(a) < 1e-7
            f = (np.float32(1.0) / np.where(par, np.float32(1.0), a)
                 ).astype(np.float32)
            s = (o[:, None] - v0).astype(np.float32)
            q = np.cross(s.T, d[None, :]).T.astype(np.float32)
            u = (f * np.einsum("ct,ct->t", q, e2)).astype(np.float32)
            vv = (-(f * np.einsum("ct,ct->t", q, e1))).astype(np.float32)
            tt = (f * np.einsum("ct,ct->t", s, nn)).astype(np.float32)
            cap = np.float32(cl0.reshape(-1)[r])
            badm = (par | (np.minimum(u, vv) < 0) | (u + vv > 1.0)
                    | ~(tt > T_MIN) | ~(tt < cap))
            twn = np.where(badm, FLT_MAX, tt)
            w = int(twn.argmin())
            # strict <: earlier visit wins ties (slot order)
            if twn[w] < t_ref[r] and twn[w] < cap:
                t_ref[r] = twn[w]
                i_ref[r] = int(cids[v]) * W + w
    return t_ref.reshape(8, 128), i_ref.reshape(8, 128)


def main():
    uptos = sys.argv[1:] or ["ct", "g", "ray", "tri", "mt", "full"]
    print("devices:", jax.devices())
    interpret = jax.devices()[0].platform == "cpu"
    rng = np.random.default_rng(7)
    (o1, o2, o3, d1, d2, d3, cl0, m, tri_stack, vpref, cids,
     tri) = make_inputs(rng)
    args = tuple(map(jnp.asarray, (o1, o2, o3, d1, d2, d3, cl0, m,
                                   tri_stack, vpref, cids)))

    if "full" in uptos:
        t_hw, i_hw = run_window(*args, upto="full", interpret=interpret)
        t_ref, i_ref = numpy_ref(o1, o2, o3, d1, d2, d3, cl0, m, tri,
                                 vpref, cids)
        t_hw = np.asarray(t_hw)
        i_hw = np.asarray(i_hw)
        ok_t = np.array_equal(t_hw, t_ref)
        hits = int((i_ref >= 0).sum())
        ok_i = np.array_equal(i_hw[i_ref >= 0], i_ref[i_ref >= 0])
        # FMA contraction (XLA) vs numpy mul+add gives ~1-ulp t diffs;
        # the production gate is kernel-vs-kernel, so report ulp stats
        rel = np.abs(t_hw - t_ref) / np.maximum(np.abs(t_ref), 1e-30)
        n_diff = int((t_hw != t_ref).sum())
        print(f"exactness: t identical={ok_t} (diffs={n_diff}, "
              f"max rel={rel.max():.2e}) besti identical={ok_i} "
              f"(hits={hits}, pairs={int(vpref[-1])})")
        assert rel.max() < 1e-6 and ok_i
    if interpret:
        return

    for upto in uptos:
        @jax.jit
        def chain(steps, pert, upto=upto):
            def body(_, carry):
                oxx, acc = carry
                t_o, i_o = run_window(oxx, *args[1:], upto=upto)
                return oxx + t_o * 0.0, acc + t_o.sum()
            oxx = args[0] + pert * 1e-6
            _, acc = jax.lax.fori_loop(0, steps, body,
                                       (oxx, jnp.float32(0.0)))
            return acc

        float(chain(4, 0))
        float(chain(1028, 0))

        def tme(steps):
            best = 1e9
            for rr in range(1, 4):
                t0 = time.perf_counter()
                vv = float(chain(steps, rr))
                best = min(best, time.perf_counter() - t0)
                assert vv == vv
            return best
        per = (tme(1028) - tme(4)) / 1024
        print(f"  upto={upto:5s}: {per * 1e6:8.1f} us/window "
              f"(prod 64-visit equivalent ~75.5 us)", flush=True)


if __name__ == "__main__":
    main()
