"""Counter-based RNG + closed-form samplers.

The reference keeps one serial xorshift32 stream per pixel across all
samples and bounces (rnd.h:5–17, seeded kernels.cu:542). That stream is
inherently sequential and cannot be reproduced under parallel/wavefront
execution (SURVEY.md §3.4), so we replace it with a *counter-based* hash
RNG: every draw is a pure function of ``(pixel_id, sample, bounce, slot)``.
This makes results bit-identical under any chunking, compaction, or
multi-chip tiling — the determinism contract the reference can't offer.

The hash is a PCG-style integer permutation (two rounds), statistically
ample for Monte-Carlo rendering and extremely cheap on the VPU (a handful
of integer ops per draw, no threefry rounds).

Rejection samplers (rnd.h:20–26, :43–49) are replaced with closed-form
transforms with the *same* target distributions: data-dependent rejection
loops are hostile to fixed-shape SIMD execution.
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32

# Salts decorrelating the per-bounce draw blocks from the camera block.
SALT_CAMERA = 0x01000193
SALT_BOUNCE = 0x85EBCA6B

# Slot indices within a bounce's draw block. The reference consumes its
# serial stream in this order (SURVEY.md §3.4); we give each consumer a
# fixed slot instead.
S_BSDF0 = 0  # diffuse dir u1 / fresnel draw
S_BSDF1 = 1
S_BSDF2 = 2
S_BSDF3 = 3  # fuzz sphere / sss free-flight
S_BSDF4 = 4
S_BSDF5 = 5
S_NEE0 = 6  # eps1, kernels.cu:374
S_NEE1 = 7  # eps2, kernels.cu:375
S_ROULETTE = 8  # kernels.cu:516
NUM_BOUNCE_SLOTS = 9

# Camera block slots (jitter + lens disk; kernels.cu:549–550, camera.h:9).
S_JITTER_U = 0
S_JITTER_V = 1
S_LENS0 = 2
S_LENS1 = 3
NUM_CAMERA_SLOTS = 4


def pcg_hash(x: jnp.ndarray) -> jnp.ndarray:
    """PCG-RXS-M-XS output permutation over an LCG step (uint32 → uint32)."""
    x = x.astype(_U32)
    state = x * _U32(747796405) + _U32(2891336453)
    word = ((state >> ((state >> _U32(28)) + _U32(4))) ^ state) * _U32(277803737)
    return (word >> _U32(22)) ^ word


def wang_hash(x: jnp.ndarray) -> jnp.ndarray:
    """Wang hash, kept for parity with the reference's seeder (rnd.h:31–39)."""
    x = x.astype(_U32) ^ _U32(61) ^ (x.astype(_U32) >> _U32(16))
    x = x * _U32(9)
    x = x ^ (x >> _U32(4))
    x = x * _U32(0x27D4EB2D)
    x = x ^ (x >> _U32(15))
    return x


def _combine(a: jnp.ndarray, b) -> jnp.ndarray:
    """boost-style hash_combine with a pcg finisher."""
    b = jnp.asarray(b, dtype=_U32)
    a = a.astype(_U32)
    return pcg_hash(a ^ (b + _U32(0x9E3779B9) + (a << _U32(6)) + (a >> _U32(2))))


def uniform_from_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 → float32 in [0, 1) using the top 24 bits — same 24-bit
    resolution as the reference (rnd.h:17)."""
    return (bits >> _U32(8)).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def bounce_base(pixel_id: jnp.ndarray, sample: jnp.ndarray,
                bounce: jnp.ndarray) -> jnp.ndarray:
    """Per-lane base counter for one bounce's draw block."""
    return _combine(_combine(pcg_hash(pixel_id), sample),
                    jnp.asarray(bounce, _U32) + _U32(SALT_BOUNCE))


def camera_base(pixel_id: jnp.ndarray, sample: jnp.ndarray) -> jnp.ndarray:
    """Per-lane base counter for the primary-ray draw block."""
    return _combine(_combine(pcg_hash(pixel_id), sample), SALT_CAMERA)


def slot_uniform(base: jnp.ndarray, slot: int) -> jnp.ndarray:
    """The ``slot``-th uniform of a draw block — a dense [N] array
    (component-SoA friendly: no [N, slots] minor-dim lane padding)."""
    return uniform_from_bits(pcg_hash(base + _U32(slot) * _U32(0x9E3779B9)))


def bounce_uniforms(pixel_id: jnp.ndarray, sample: jnp.ndarray, bounce: jnp.ndarray,
                    num_slots: int = NUM_BOUNCE_SLOTS) -> jnp.ndarray:
    """Draw block for one bounce: shape ``pixel_id.shape + (num_slots,)``.

    Each element is hash(pixel, sample, bounce, slot) — fully parallel.
    (Interleaved variant of :func:`slot_uniform` — same values.)
    """
    base = bounce_base(pixel_id, sample, bounce)
    slots = jnp.arange(num_slots, dtype=_U32)
    bits = pcg_hash(base[..., None] + slots * _U32(0x9E3779B9))
    return uniform_from_bits(bits)


def camera_uniforms(pixel_id: jnp.ndarray, sample: jnp.ndarray) -> jnp.ndarray:
    """Draw block for primary-ray generation: ``[..., NUM_CAMERA_SLOTS]``."""
    base = camera_base(pixel_id, sample)
    slots = jnp.arange(NUM_CAMERA_SLOTS, dtype=_U32)
    bits = pcg_hash(base[..., None] + slots * _U32(0x9E3779B9))
    return uniform_from_bits(bits)


def in_unit_sphere_v3(u1: jnp.ndarray, u2: jnp.ndarray, u3: jnp.ndarray):
    """Uniform point in the unit ball as component-SoA V3 (same transform
    as :func:`in_unit_sphere`)."""
    from tpu_pathtracer.ops.v3 import V3

    z = 1.0 - 2.0 * u1
    phi = (2.0 * jnp.pi) * u2
    s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    r = jnp.cbrt(u3)
    return V3(r * s * jnp.cos(phi), r * s * jnp.sin(phi), r * z)


def in_unit_disk_xy(u1: jnp.ndarray, u2: jnp.ndarray):
    """Uniform point in the unit disk → (x, y) component arrays."""
    r = jnp.sqrt(u1)
    theta = (2.0 * jnp.pi) * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def in_unit_sphere(u1: jnp.ndarray, u2: jnp.ndarray, u3: jnp.ndarray) -> jnp.ndarray:
    """Uniform point in the unit ball, closed form.

    Replaces the reference's rejection loop (rnd.h:43–49): direction uniform
    on the sphere (z = 1-2u, phi = 2πu) scaled by radius ∛u — identical
    distribution, fixed op count.
    """
    z = 1.0 - 2.0 * u1
    phi = (2.0 * jnp.pi) * u2
    s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    r = jnp.cbrt(u3)
    return jnp.stack([r * s * jnp.cos(phi), r * s * jnp.sin(phi), r * z], axis=-1)


def on_unit_sphere(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Uniform direction on the unit sphere, closed form."""
    z = 1.0 - 2.0 * u1
    phi = (2.0 * jnp.pi) * u2
    s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=-1)


def in_unit_disk(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Uniform point in the unit disk (z=0), closed form.

    Replaces rnd.h:20–26's rejection loop: r = √u, θ = 2πu.
    """
    r = jnp.sqrt(u1)
    theta = (2.0 * jnp.pi) * u2
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), jnp.zeros_like(r)], axis=-1)
