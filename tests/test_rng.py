"""RNG: determinism, distribution, parity with the reference's wang_hash."""

import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.ops import rng as R


def test_wang_hash_reference_values():
    # wang_hash is bit-compatible with rnd.h:31–39; values computed by the
    # C algorithm by hand.
    def wang_py(seed):
        seed = (seed ^ 61) ^ (seed >> 16)
        seed = (seed * 9) & 0xFFFFFFFF
        seed = seed ^ (seed >> 4)
        seed = (seed * 0x27D4EB2D) & 0xFFFFFFFF
        seed = seed ^ (seed >> 15)
        return seed

    xs = np.array([0, 1, 2, 12345, 0xDEADBEEF], np.uint32)
    got = np.asarray(R.wang_hash(jnp.asarray(xs)))
    want = np.array([wang_py(int(x)) for x in xs], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_uniforms_in_range_and_deterministic():
    pid = jnp.arange(1000, dtype=jnp.uint32)
    a = R.bounce_uniforms(pid, jnp.uint32(3), jnp.uint32(2))
    b = R.bounce_uniforms(pid, jnp.uint32(3), jnp.uint32(2))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (1000, R.NUM_BOUNCE_SLOTS)
    assert float(a.min()) >= 0.0 and float(a.max()) < 1.0
    # different bounce → decorrelated
    c = R.bounce_uniforms(pid, jnp.uint32(3), jnp.uint32(3))
    assert abs(float(jnp.corrcoef(a[:, 0], c[:, 0])[0, 1])) < 0.1


def test_uniform_statistics():
    pid = jnp.arange(20000, dtype=jnp.uint32)
    u = np.asarray(R.bounce_uniforms(pid, jnp.uint32(0), jnp.uint32(0)))
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1.0 / 12.0) < 0.01


def test_in_unit_sphere_distribution():
    pid = jnp.arange(30000, dtype=jnp.uint32)
    u = R.bounce_uniforms(pid, jnp.uint32(0), jnp.uint32(0))
    p = np.asarray(R.in_unit_sphere(u[:, 0], u[:, 1], u[:, 2]))
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0 + 1e-6
    # uniform in ball: E[r^3] = 1/2 (r^3 ~ U[0,1])
    assert abs((r ** 3).mean() - 0.5) < 0.01
    assert np.abs(p.mean(axis=0)).max() < 0.02


def test_in_unit_disk_distribution():
    pid = jnp.arange(30000, dtype=jnp.uint32)
    u = R.camera_uniforms(pid, jnp.uint32(0))
    p = np.asarray(R.in_unit_disk(u[:, 0], u[:, 1]))
    r = np.linalg.norm(p[:, :2], axis=-1)
    assert np.all(p[:, 2] == 0)
    assert r.max() <= 1.0 + 1e-6
    assert abs((r ** 2).mean() - 0.5) < 0.01
