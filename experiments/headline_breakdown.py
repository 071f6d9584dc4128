"""Where does the headline iteration go? (TPU)

Times, all with data deps chained inside one jit (CLAUDE.md timing rule):
  A  spheres_hit_feat kernel alone over the 16k-lane pool
  B  full bounce_step (kernel + scatter + NEE-off + RR + masks)
  C  full regen body (B + reap/flush/restart + camera regen)

B−A = scatter/material/bookkeeping cost; C−B = regeneration overhead.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.models.spheres import random_spheres_scene
from tpu_pathtracer.engine.wavefront import (bounce_step, make_view,
                                             BounceState)
from tpu_pathtracer.ops.v3 import V3

import os
M = int(os.environ.get("POOL_M", 1 << 15))


def timed_slope(fn, lo, hi, reps=3):
    float(fn(lo, 0))
    float(fn(hi, 0))

    def t(steps):
        best = 1e9
        for r in range(1, reps + 1):
            t0 = time.perf_counter()
            v = float(fn(steps, r))
            best = min(best, time.perf_counter() - t0)
            assert v == v
        return best

    return (t(hi) - t(lo)) / (hi - lo)


def main():
    cfg = RenderConfig(nx=1200, ny=800, ns=100, max_depth=50,
                       rays_per_chunk=M)
    scene, cam = random_spheres_scene(cfg.nx, cfg.ny)
    view = make_view(scene, cfg)
    print("device:", jax.devices()[0])

    lane = jnp.arange(M, dtype=jnp.uint32)
    o0, d0 = cam.generate_rays(lane, jnp.uint32(0), cfg.nx, cfg.ny)

    # --- A: kernel alone, chained via origin perturbation
    from tpu_pathtracer.ops.pallas_spheres import spheres_hit_feat

    @jax.jit
    def run_a(steps, perturb):
        def body(_, carry):
            o, acc = carry
            t, idx, f = spheres_hit_feat(o, d0, view.sph_c, view.sph_r,
                                         view.sph_feat, cfg.epsilon,
                                         3.4e38)
            o = V3(o.x + t * 1e-9, o.y, o.z)
            return o, acc + t
        o, acc = jax.lax.fori_loop(
            0, steps, body,
            (V3(o0.x + perturb * 1e-6, o0.y, o0.z), jnp.zeros((M,))))
        return jnp.sum(jnp.where(jnp.isfinite(acc), acc, 0.0))

    per_a = timed_slope(run_a, 5, 105)
    print(f"A kernel-only:  {per_a*1e3:.3f} ms/iter")

    # --- B: full bounce_step chained
    @jax.jit
    def run_b(steps, perturb):
        st = BounceState(
            origin=V3(o0.x + perturb * 1e-6, o0.y, o0.z), direction=d0,
            color=V3.zeros((M,)), attenuation=V3.ones((M,)),
            specular=jnp.zeros((M,), bool), inside=jnp.zeros((M,), bool),
            alive=jnp.ones((M,), bool), from_mesh=jnp.zeros((M,), bool))

        def body(i, st):
            st2, _ = bounce_step(scene, view, cfg, st, lane,
                                 jnp.uint32(0), i)
            # keep shapes/liveness stable so the loop doesn't die out
            return st2._replace(alive=st.alive,
                                origin=st2.origin,
                                direction=st2.direction)
        st = jax.lax.fori_loop(0, steps, body, st)
        return jnp.sum(st.color.x) + jnp.sum(st.origin.x)

    per_b = timed_slope(run_b, 5, 105)
    print(f"B bounce_step:  {per_b*1e3:.3f} ms/iter  (B-A = {1e3*(per_b-per_a):.3f})")

    # --- C: whole regen render per-iteration (iters returned by engine)
    from tpu_pathtracer.engine.regen import render_regen

    @jax.jit
    def run_c(ns, perturb):
        fb, iters = render_regen(scene, cam, cfg, ns=ns,
                                 s0=perturb, normalize=False,
                                 return_iters=True)
        return jnp.sum(fb) * 0 + iters

    # iterations scale with ns; time two ns values, count iters exactly
    def c_time(ns):
        best, iters = 1e9, 0
        float(run_c(jnp.uint32(ns), jnp.uint32(0)))
        for r in range(3):
            t0 = time.perf_counter()
            iters = float(run_c(jnp.uint32(ns), jnp.uint32(r + 1)))
            best = min(best, time.perf_counter() - t0)
        return best, iters

    t_lo, it_lo = c_time(2)
    t_hi, it_hi = c_time(10)
    per_c = (t_hi - t_lo) / (it_hi - it_lo)
    print(f"C regen body:   {per_c*1e3:.3f} ms/iter  (C-B = {1e3*(per_c-per_b):.3f})"
          f"  [{it_lo:.0f} -> {it_hi:.0f} iters]")


if __name__ == "__main__":
    main()
