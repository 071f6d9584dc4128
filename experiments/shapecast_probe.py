"""Which vector shape casts / layout moves does Mosaic accept on this
toolchain? Each case compiles a tiny kernel on the TPU and reports
ok/fail — the legal moves determine the regrouped-kernel orientation
design (see regroup_probe.py).

Usage: python experiments/shapecast_probe.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CASES = {}


def case(name):
    def deco(fn):
        CASES[name] = fn
        return fn
    return deco


@case("reshape (8,128)->(1024,1)")
def _(x):  # x (8,128)
    return x.reshape(1024, 1) * 2.0


@case("reshape (8,128)->(1,1024)")
def _(x):
    return x.reshape(1, 1024) * 2.0


@case("reshape (1,1024)->(8,128)")
def _(x):
    return (x.reshape(1, 1024) * 1.0).reshape(8, 128)


@case("reshape (1024,1)<-(8,128) via [:,None] of row")
def _(x):
    r = x.reshape(1, 1024)
    return r[0, :][:, None] * 2.0


@case("(1024,1)->(8,128)")
def _(x):
    c = x.reshape(1, 1024)[0, :][:, None] * 1.0
    return c.reshape(8, 128)


@case("transpose (8,128)->(128,8)")
def _(x):
    return x.T * 2.0


@case("transpose (64,1024)")
def _(x):
    y = jnp.broadcast_to(x.reshape(1, 1024), (64, 1024)) * 1.0
    return y.T[:128] * 2.0


@case("dot_general lhs-contract-dim0")
def _(x):
    a = jnp.broadcast_to(x.reshape(1, 1024), (64, 1024)).astype(jnp.bfloat16)
    b = jnp.broadcast_to(x.reshape(1, 1024), (64, 1024)).astype(jnp.bfloat16)
    # contract a dim0 with b dim0 -> (1024, 1024)
    r = jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return r[:8, :128]


@case("dot_general rhs-contract-dim1 (A @ B^T)")
def _(x):
    a = jnp.broadcast_to(x.reshape(1, 1024), (256, 1024)).astype(jnp.bfloat16)
    r = jax.lax.dot_general(a, a, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return r[:8, :128]


@case("reshape (64,8,128)->(64,1024)")
def _(x):
    y = jnp.broadcast_to(x[None], (64, 8, 128)) * 1.0
    return y.reshape(64, 1024)[:8, :128]


@case("reshape (768,1024)->(6144,128) + dim0 slice")
def _(x):
    y = jnp.broadcast_to(x.reshape(1, 1024), (768, 1024)) * 1.0
    z = y.reshape(6144, 128)
    return z[8 * 3:8 * 4, :]


@case("broadcast (1024,1)x(1,64)")
def _(x):
    c = x.reshape(1, 1024)[0, :][:, None]
    r = x.reshape(1, 1024)[0, :64][None, :]
    return (c * r)[:8, :128]


@case("column-min (1024,1024)->(1,1024)")
def _(x):
    y = jnp.broadcast_to(x.reshape(1, 1024), (1024, 1024)) * 1.0
    return jnp.min(y, axis=0, keepdims=True).reshape(8, 128)


@case("row-min (1024,64)->(1024,1) + argmin")
def _(x):
    c = x.reshape(1, 1024)[0, :][:, None]
    y = c * jnp.ones((1, 64), jnp.float32)
    m = jnp.min(y, axis=1, keepdims=True)
    a = jnp.argmin(y, axis=1).astype(jnp.int32)[:, None]
    return (m + a.astype(jnp.float32)).reshape(8, 128)


@case("iota (1024,1024) 2ops build")
def _(x):
    i0 = jax.lax.broadcasted_iota(jnp.int32, (1024, 1024), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (1024, 1024), 1)
    g = (i0 == i1).astype(jnp.bfloat16)
    return g[:8, :128].astype(jnp.float32)


def main():
    print("devices:", jax.devices())
    x = jnp.arange(1024, dtype=jnp.float32).reshape(8, 128)
    for name, fn in CASES.items():
        def kern(x_ref, o_ref, fn=fn):
            r = fn(x_ref[:, :])
            tot = jnp.sum(r.astype(jnp.float32))
            o_ref[:, :] = jnp.full((8, 128), tot, jnp.float32)
        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=96 << 20),
            )(x)
            out.block_until_ready()
            print(f"  OK   {name}")
        except Exception as e:
            msg = str(e).split("\n")[0][:110]
            print(f"  FAIL {name}: {msg}")


if __name__ == "__main__":
    main()
