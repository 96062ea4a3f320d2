"""Accuracy of the polynomial sampler transcendentals (ops/fastmath.py).

The sampler consumes uniforms from the 24-bit open-(0,1) grid
(ops.rng._bits_to_uniform); these tests sweep a dense sample of exactly
that grid plus its extremes and bound the error far below statistical
resolvability (the KS suites in test_update.py validate the samplers
built on these paths end-to-end).
"""

import numpy as np
import jax.numpy as jnp

from qcdgpu_tpu.ops import fastmath as fm


def _grid(step=4099):
    # coprime stride through the full 24-bit grid + both extremes
    h = np.arange(0, 1 << 24, step, dtype=np.int64)
    h = np.concatenate([h, [0, (1 << 24) - 1]])
    return ((h.astype(np.float64) + 0.5) / (1 << 24)).astype(np.float32)


def test_log_u01_accuracy():
    u = _grid()
    got = np.asarray(fm.log_u01(jnp.asarray(u)), np.float64)
    ref = np.log(u.astype(np.float64))
    # mixed bound: relative away from log(1) = 0, absolute at the top edge
    err = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-3)
    assert np.max(err) < 2e-7


def test_log_u01_at_one():
    # f32(1.0) is the rounded top of the grid; log must be exactly 0
    assert float(fm.log_u01(jnp.float32(1.0))) == 0.0


def test_cos_sin_2pi_accuracy():
    u = _grid()
    ref_c = np.cos(2 * np.pi * u.astype(np.float64))
    ref_s = np.sin(2 * np.pi * u.astype(np.float64))
    got_c = np.asarray(fm.cos_2pi(jnp.asarray(u)), np.float64)
    got_s, got_c2 = fm.sincos_2pi(jnp.asarray(u))
    assert np.max(np.abs(got_c - ref_c)) < 1e-6
    assert np.max(np.abs(np.asarray(got_c2, np.float64) - ref_c)) < 1e-6
    assert np.max(np.abs(np.asarray(got_s, np.float64) - ref_s)) < 1e-6


def test_unit_circle():
    # direction sampling needs sin^2 + cos^2 ~= 1 (unitarity of the flip)
    u = _grid()
    s, c = fm.sincos_2pi(jnp.asarray(u))
    r2 = np.asarray(s, np.float64) ** 2 + np.asarray(c, np.float64) ** 2
    assert np.max(np.abs(r2 - 1.0)) < 3e-6


def test_f64_fallback():
    import pytest

    x = jnp.asarray(np.linspace(0.01, 0.99, 101), jnp.float64)
    if x.dtype != jnp.float64:
        pytest.skip("jax x64 disabled in this process")
    np.testing.assert_allclose(np.asarray(fm.log_u01(x)), np.log(np.asarray(x)))
