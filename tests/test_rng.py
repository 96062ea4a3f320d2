"""Counter-based RNG unit tests (qcdgpu_tpu.ops.rng)."""

import numpy as np
import jax.numpy as jnp

from qcdgpu_tpu.ops import rng


def test_threefry_deterministic_and_key_sensitive():
    x = jnp.arange(1024, dtype=jnp.uint32)
    a0, a1 = rng.threefry2x32(jnp.uint32(1), jnp.uint32(2), x, jnp.uint32(0))
    b0, b1 = rng.threefry2x32(jnp.uint32(1), jnp.uint32(2), x, jnp.uint32(0))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(b0))
    c0, _ = rng.threefry2x32(jnp.uint32(1), jnp.uint32(3), x, jnp.uint32(0))
    # different key -> essentially everything differs
    assert np.mean(np.asarray(a0) == np.asarray(c0)) < 0.01
    d0, _ = rng.threefry2x32(jnp.uint32(1), jnp.uint32(2), x, jnp.uint32(1))
    assert np.mean(np.asarray(a0) == np.asarray(d0)) < 0.01


def test_avalanche():
    """Flipping one counter bit flips ~half the output bits."""
    x = jnp.zeros((256,), jnp.uint32)
    y = jnp.full((256,), 1 << 7, jnp.uint32)
    a0, a1 = rng.threefry2x32(jnp.uint32(5), jnp.uint32(6), x, x)
    b0, b1 = rng.threefry2x32(jnp.uint32(5), jnp.uint32(6), y, x)
    diff = np.unpackbits(
        np.asarray(a0 ^ b0).view(np.uint8)
    ).mean()
    assert 0.4 < diff < 0.6


def test_uniform_open_interval_and_moments():
    sidx = jnp.arange(1 << 16, dtype=jnp.uint32)
    key = rng.make_base_key(123)
    u = np.asarray(rng.site_uniforms(key, sidx, 4))
    assert u.min() > 0.0 and u.max() < 1.0
    # mean 1/2, var 1/12, E[u^3] = 1/4 within MC error (~1/sqrt(n))
    n = u.size
    tol = 5.0 / np.sqrt(n)
    assert abs(u.mean() - 0.5) < tol
    assert abs(u.var() - 1.0 / 12.0) < tol
    assert abs((u**3).mean() - 0.25) < tol


def test_site_uniform_slots_distinct():
    sidx = jnp.arange(128, dtype=jnp.uint32)
    key = rng.make_base_key(0)
    u = np.asarray(rng.site_uniforms(key, sidx, 6))
    # no accidental slot aliasing
    for i in range(6):
        for j in range(i + 1, 6):
            assert not np.allclose(u[i], u[j])


def test_stage_key_traced_sweep():
    import jax

    key = rng.make_base_key(9)

    @jax.jit
    def f(s):
        k = rng.stage_key(key, s, 3)
        return rng.site_uniforms(k, jnp.arange(8, dtype=jnp.uint32), 2)

    a, b = np.asarray(f(0)), np.asarray(f(1))
    assert not np.allclose(a, b)
    np.testing.assert_array_equal(a, np.asarray(f(0)))


def test_normals_moments():
    sidx = jnp.arange(1 << 15, dtype=jnp.uint32)
    key = rng.make_base_key(77)
    z = np.asarray(rng.site_normals(key, sidx, 4))
    n = z.size
    assert abs(z.mean()) < 5.0 / np.sqrt(n)
    assert abs(z.var() - 1.0) < 10.0 / np.sqrt(n)
