"""Batched 3-vector helpers over ``[..., 3]`` arrays.

The reference's ``vec3`` class (vec3.h:9–198) becomes structure-of-arrays
``jnp`` math: every op here maps 1:1 onto the VPU with no AoS pointer
chasing. Free functions mirror vec3.h: ``dot`` (vec3.h:87), ``cross``
(vec3.h:91), ``unit_vector`` (vec3.h:194), component min/max
(vec3.h:109–136), ``max_component`` (vec3.h:117).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

FLT_MAX = jnp.float32(3.4028235e38)


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis. vec3.h:87."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched cross product. vec3.h:91."""
    return jnp.cross(a, b)


def squared_length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * a, axis=-1)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(squared_length(a))


def unit_vector(a: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Normalize over trailing axis; safe for zero vectors. vec3.h:194."""
    return a * jax.lax.rsqrt(jnp.maximum(squared_length(a), eps))[..., None]


def max_component(a: jnp.ndarray) -> jnp.ndarray:
    """Index of the largest component (reference returns argmax over
    components, used for the BVH split axis — vec3.h:117,
    helper_structs.h:106)."""
    return jnp.argmax(a, axis=-1)


def max3(a: jnp.ndarray) -> jnp.ndarray:
    """max(vec3) — largest component value (vec3.h:117 semantics as used by
    Russian roulette, kernels.cu:515)."""
    return jnp.max(a, axis=-1)


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection. material.h:23–25."""
    return v - 2.0 * dot(v, n)[..., None] * n


def refract(uv: jnp.ndarray, n: jnp.ndarray, etai_over_etat: jnp.ndarray) -> jnp.ndarray:
    """Snell refraction; returns the parallel component only under TIR the
    same way the reference does. material.h:15–21."""
    cos_theta = jnp.minimum(dot(-uv, n), 1.0)
    r_out_parallel = etai_over_etat[..., None] * (uv + cos_theta[..., None] * n)
    sqlen = squared_length(r_out_parallel)
    perp_scale = jnp.where(sqlen >= 1.0, 0.0, -jnp.sqrt(jnp.maximum(1.0 - sqlen, 0.0)))
    return r_out_parallel + perp_scale[..., None] * n


def schlick(cosine: jnp.ndarray, ref_idx: jnp.ndarray) -> jnp.ndarray:
    """Schlick Fresnel approximation. material.h:9–13."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def where3(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Select over [..., 3] with a [...]-shaped mask."""
    return jnp.where(mask[..., None], a, b)
