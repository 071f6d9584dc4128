"""Decompose the regen-body bookkeeping (C-B = 33 us/iter at the 32k
pool, headline_breakdown) into its parts — VERDICT r4 item 5.

Reimplements render_regen's loop body verbatim (minus stats) as a
fori_loop with a STATIC step count (no dynamic-termination variance),
then times slope over steps for variants with one piece removed:

  full      — the whole body (flush + restart + camera + bounce)
  noflush   — out-row one-hot accumulation removed
  nocam     — camera.generate_rays removed (restart reuses old rays)
  norestart — no reap/restart logic at all (bounce only + masks)

Run: timeout 2400 python experiments/regen_body_split.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.engine.wavefront import BounceState, bounce_step, make_view
from tpu_pathtracer.models.spheres import random_spheres_scene
from tpu_pathtracer.ops.v3 import V3
from tpu_pathtracer.ops.v3 import where as vwhere

M = 1 << 15
N = 1200 * 800
ROUNDS = (N + M - 1) // M


def make_runner(scene, cam, cfg, view, flush=True, camgen=True,
                restart=True, rounds=ROUNDS):
    lane = jnp.arange(M, dtype=jnp.uint32)
    round_iota = jnp.arange(rounds, dtype=jnp.int32)[:, None]
    ns = jnp.uint32(64)
    ROUNDS = rounds

    @jax.jit
    def run(steps, perturb):
        zf = jnp.zeros((M,), jnp.float32) + perturb * 0.0
        zb = zf != 0.0
        o0, d0 = cam.generate_rays(lane, jnp.uint32(0), cfg.nx, cfg.ny)
        state = BounceState(
            origin=V3(o0.x + perturb * 1e-6, o0.y, o0.z), direction=d0,
            color=V3.zeros((M,)), attenuation=V3.ones((M,)),
            specular=zb, inside=zb, alive=~zb, from_mesh=zb)
        out_x = jnp.zeros((ROUNDS, M)) + zf[None, :]
        out_y = jnp.zeros((ROUNDS, M)) + zf[None, :]
        out_z = jnp.zeros((ROUNDS, M)) + zf[None, :]
        acc = V3.zeros((M,))
        cur_sample = zf.astype(jnp.uint32)
        rnd = zf.astype(jnp.int32)
        bounce = zf.astype(jnp.int32)
        done = zb

        def body(i, carry):
            (out_x, out_y, out_z, state, acc, cur_sample, rnd, bounce,
             done) = carry
            if restart:
                dead = ~state.alive & ~done
                acc = vwhere(dead, acc + state.color, acc)
                color = vwhere(dead, V3.zeros((M,)), state.color)
                flushm = dead & (cur_sample >= ns)
                if flush:
                    onehot = (round_iota == rnd[None, :]) & flushm[None, :]
                    out_x = out_x + jnp.where(onehot, acc.x[None, :], 0.0)
                    out_y = out_y + jnp.where(onehot, acc.y[None, :], 0.0)
                    out_z = out_z + jnp.where(onehot, acc.z[None, :], 0.0)
                acc = vwhere(flushm, V3.zeros((M,)), acc)
                rnd = jnp.where(flushm, rnd + 1, rnd)
                cur_sample = jnp.where(flushm, 0, cur_sample)
                done = done | (dead & (rnd >= ROUNDS))
                start = dead & ~done
                pixel = lane + rnd.astype(jnp.uint32) * M
                if camgen:
                    o2, d2 = cam.generate_rays(pixel, cur_sample,
                                               cfg.nx, cfg.ny)
                else:
                    o2, d2 = state.origin, state.direction
                state = BounceState(
                    origin=vwhere(start, o2, state.origin),
                    direction=vwhere(start, d2, state.direction),
                    color=color,
                    attenuation=vwhere(start, V3.ones((M,)),
                                       state.attenuation),
                    specular=jnp.where(start, False, state.specular),
                    inside=jnp.where(start, False, state.inside),
                    alive=state.alive | start,
                    from_mesh=jnp.where(start, False, state.from_mesh))
                bounce = jnp.where(start, 0, bounce)
                cur_sample = jnp.where(start, cur_sample + 1, cur_sample)
            else:
                pixel = lane
                state = state._replace(alive=jnp.ones((M,), bool))
            state, _ = bounce_step(scene, view, cfg, state, pixel,
                                   cur_sample, bounce)
            bounce = bounce + 1
            state = state._replace(
                alive=state.alive & (bounce < cfg.max_depth))
            return (out_x, out_y, out_z, state, acc, cur_sample, rnd,
                    bounce, done)

        carry = (out_x, out_y, out_z, state, acc, cur_sample, rnd,
                 bounce, done)
        carry = jax.lax.fori_loop(0, steps, body, carry)
        return (jnp.sum(carry[0][0]) + jnp.sum(carry[3].color.x)
                + jnp.sum(carry[4].x))

    return run


def slope(run, lo=20, hi=220, reps=3):
    float(run(lo, 0))
    float(run(hi, 0))

    def t(steps):
        best = 1e9
        for r in range(1, reps + 1):
            t0 = time.perf_counter()
            v = float(run(steps, r))
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(v)
        return best
    return (t(hi) - t(lo)) / (hi - lo)


def main():
    print("device:", jax.devices()[0])
    cfg = RenderConfig(nx=1200, ny=800, ns=100, max_depth=50,
                       rays_per_chunk=M)
    scene, cam = random_spheres_scene(cfg.nx, cfg.ny)
    view = make_view(scene, cfg)
    variants = {
        "full": dict(),
        "noflush": dict(flush=False),
        "nocam": dict(camgen=False),
        "norestart": dict(restart=False),
        # tiny out carry: same logic, 1-row accumulator — isolates the
        # cost of carrying the [30, m] out arrays through the loop
        "tinyout": dict(rounds=1),
        "norestart_tiny": dict(restart=False, rounds=1),
    }
    for name, kw in variants.items():
        per = slope(make_runner(scene, cam, cfg, view, **kw))
        print(f"{name:10s}: {per * 1e3:.3f} ms/iter")


if __name__ == "__main__":
    main()
