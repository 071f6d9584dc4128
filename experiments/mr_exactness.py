"""Exactness checks for the multirow packet kernel (decision record).

The multirow kernel (pallas_bvh_mr.py, 8 independent 128-ray packets
per tile) measured SLOWER than the single-state packet kernel at every
width (PERFORMANCE.md round 3) and is not wired into the production
dispatch — it lives in experiments/ as a measured decision record.
These are the exactness tests that used to live in
tests/test_packet_bvh.py, runnable standalone:

    python experiments/mr_exactness.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from tpu_pathtracer.ops import bvh as B
from tpu_pathtracer.ops.pallas_bvh import build_packet_mesh, packet_trace
from tpu_pathtracer.ops.v3 import V3
from tpu_pathtracer.ops.vec import FLT_MAX

from pallas_bvh_mr import (build_packet_mr, packet_occluded_mr,
                           packet_trace_mr)


def _mesh(t=2000, seed=0, ppl=16):
    rng = np.random.RandomState(seed)
    base = rng.uniform(-10, 10, (t, 3)).astype(np.float32)
    v1 = base + rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    v2 = base + rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    tc = rng.rand(t, 6).astype(np.float32)
    mid = rng.randint(0, 5, t).astype(np.int32)
    return B.build_bvh(base, v1, v2, tc, mid, prims_per_leaf=ppl)


def _rays(n, seed=1):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ov = V3(*(jnp.asarray(o[:, k]) for k in range(3)))
    dv = V3(*(jnp.asarray(d[:, k]) for k in range(3)))
    return o, d, ov, dv


def test_multirow_trace_exact_vs_brute_force():
    """The multirow kernel (8 independent 128-ray packets per tile,
    queued leaf phases) must match brute force exactly: the policy-Q
    stale-cull only enlarges visit sets, never skips a winner."""
    mesh = _mesh(t=2000, ppl=16)
    pm = build_packet_mr(mesh, max_width=32)
    o, d, ov, dv = _rays(600)
    ref = B.brute_force(mesh, jnp.asarray(o), jnp.asarray(d), 1e-3,
                        FLT_MAX)
    (t, tri, u, v, nx, ny, nz, tu, tv, mid), cnts = packet_trace_mr(
        ov, dv, FLT_MAX, pm.ntab, pm.blocks, pm.tri_feat, pm.cl_first,
        pm.width, pm.n_blocks, 1e-3, interpret=True)
    assert int(cnts[2]) > 0  # leaf-visit telemetry fires

    rt, ri = np.asarray(ref.t), np.asarray(ref.tri_id)
    np.testing.assert_array_equal(ri >= 0, np.asarray(tri) >= 0)
    hit = ri >= 0
    np.testing.assert_array_equal(ri[hit], np.asarray(tri)[hit])
    np.testing.assert_allclose(rt[hit], np.asarray(t)[hit], rtol=2e-6)
    np.testing.assert_allclose(np.asarray(ref.u)[hit],
                               np.asarray(u)[hit], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.v)[hit],
                               np.asarray(v)[hit], atol=1e-5)

    occ, _c = packet_occluded_mr(ov, dv, 14.0, pm.ntab, pm.blocks,
                                 pm.cl_first, pm.width, pm.n_blocks,
                                 1e-3, interpret=True)
    truth = hit & (np.asarray(ref.t) < 14.0)
    np.testing.assert_array_equal(np.asarray(occ), truth)
    print("multirow vs brute force: OK")


def test_multirow_matches_packet_kernel():
    """Multirow and single-state packet kernels agree bit-for-bit on
    hits (both compute the same MT arithmetic on the true winner)."""
    mesh = _mesh(t=3000, seed=7, ppl=8)
    pm1 = build_packet_mesh(mesh, max_width=32)
    pmr = build_packet_mr(mesh, max_width=32)
    o, d, ov, dv = _rays(700, seed=8)
    (t1, tri1, u1, v1, *_), _ = packet_trace(
        ov, dv, FLT_MAX, pm1.nodes, pm1.blocks, pm1.tri_feat,
        pm1.cl_first, pm1.width, 1e-3, interpret=True, stride=pm1.stride,
        cpb=pm1.cpb, smem_nodes=pm1.smem_nodes)
    (t2, tri2, u2, v2, *_), _ = packet_trace_mr(
        ov, dv, FLT_MAX, pmr.ntab, pmr.blocks, pmr.tri_feat,
        pmr.cl_first, pmr.width, pmr.n_blocks, 1e-3, interpret=True)
    np.testing.assert_array_equal(np.asarray(tri1), np.asarray(tri2))
    hit = np.asarray(tri1) >= 0
    np.testing.assert_array_equal(np.asarray(t1)[hit],
                                  np.asarray(t2)[hit])
    np.testing.assert_array_equal(np.asarray(u1)[hit],
                                  np.asarray(u2)[hit])
    np.testing.assert_array_equal(np.asarray(v1)[hit],
                                  np.asarray(v2)[hit])
    print("multirow vs packet kernel: OK")


if __name__ == "__main__":
    test_multirow_trace_exact_vs_brute_force()
    test_multirow_matches_packet_kernel()
