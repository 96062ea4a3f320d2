"""Polynomial transcendental kernels for the sampler hot path.

The Kennedy–Pendleton heat-bath costs ~45 transcendental evaluations per
link update (SURVEY.md §8 cost breakdown) — the binding constraint on TPU
sweep throughput.  These replacements exploit what the general-purpose
lowerings cannot assume:

- ``log_u01``: the argument is a uniform in (0, 1) — always a positive
  normal float, never 0/inf/nan — so the cephes-style mantissa/exponent
  split needs no special-case handling.
- ``sincos_2pi``: the phase is ``2*pi*r`` with r in [0, 1) — range
  reduction is a single round, and sin/cos share the fold, the squared
  argument, and the quadrant sign.

Accuracy (validated in tests/test_fastmath.py over the full 24-bit
uniform grid): log rel err < 1.2e-7, sin/cos abs err < 8e-7 — far below
anything statistically resolvable (the acceptance bar is 1e-4 on the
plaquette; the KS suites in tests/test_update.py run on these paths).
The same jnp ops trace identically under XLA and Mosaic, so the XLA and
Pallas engines keep drawing bit-identical samples from each other.

These are elementwise f32 functions; callers guarantee the domain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_F = jnp.float32

# cephes logf polynomial for log(1 + t), |t| <= sqrt(2) - 1.
# A degree-4 near-minimax alternative (5 coeffs, 2.6e-6 abs ln error —
# still 3 orders below KS-test resolution, tests/test_update.py validated
# on it) was measured end-to-end through the production bench config in
# round 5 and REJECTED: 7.13/7.15 ms/sweep (deg-8) vs 7.21/7.16 (deg-4)
# over two A/B runs — the 4 FMAs x 24 ln/link are NOT the binding
# resource in the Y-tiled kernel, so the extra accuracy is free
# (docs/validation/sampler_study.json, tools/sampler_study.py).
_LOG_COEF = (
    7.0376836292e-2, -1.1514610310e-1, 1.1676998740e-1, -1.2420140846e-1,
    1.4249322787e-1, -1.6668057665e-1, 2.0000714765e-1, -2.4999993993e-1,
    3.3333331174e-1,
)

# Taylor coefficients of cos(2*pi*f) in s = f**2 (|f| <= 1/4):
# (-1)^k (2*pi)^(2k) / (2k)!
_COS_COEF = (-26.426256783374378, 60.24464137187666, -85.45681720669372,
             64.93939402266829, -19.739208802178716, 1.0)
# sin(2*pi*f) / f in s = f**2: (-1)^k (2*pi)^(2k+1) / (2k+1)!
_SIN_COEF = (3.8199525848482803, -15.094642576822984, 42.058693944897634,
             -76.70585975306136, 81.60524927607504, -41.341702240399755,
             6.283185307179586)


def log_u01(x):
    """ln(x) for x a positive normal f32 in (0, 1] (uniform variates)."""
    if x.dtype != jnp.float32:  # non-f32 paths are never hot
        return jnp.log(x)
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    m = jax.lax.bitcast_convert_type(
        (bits & 0x007FFFFF) | 0x3F800000, jnp.float32
    )
    big = m > _F(1.41421356)
    m = jnp.where(big, _F(0.5) * m, m)
    e = jnp.where(big, e + 1, e).astype(jnp.float32)
    t = m - _F(1.0)
    z = t * t
    p = _F(_LOG_COEF[0])
    for c in _LOG_COEF[1:]:
        p = p * t + _F(c)
    y = t * z * p - _F(0.5) * z + e * _F(-2.12194440e-4)
    return t + y + e * _F(0.693359375)


def _fold_quadrant(r):
    """r in [0, 1) -> (f, sign) with f in [-1/4, 1/4], sign = (-1)^round(2r)."""
    k = jnp.round(_F(2.0) * r)
    f = r - _F(0.5) * k
    # (-1)^k without int conversion: k is exactly 0, 1, or 2 here
    sign = _F(1.0) - _F(2.0) * (k - _F(2.0) * jnp.floor(k * _F(0.5)))
    return f, sign


def _poly_s(coef, s):
    p = _F(coef[0])
    for c in coef[1:]:
        p = p * s + _F(c)
    return p


def cos_2pi(r):
    """cos(2*pi*r) for r in [0, 1)."""
    if r.dtype != jnp.float32:
        return jnp.cos(_TWO_PI_64 * r)
    f, sign = _fold_quadrant(r)
    return sign * _poly_s(_COS_COEF, f * f)


def cos2_2pi(r):
    """cos(2*pi*r)**2 for r in [0, 1).

    The Kennedy–Pendleton trial consumes only the SQUARE of the angle
    cosine (samplers.kp_trial_quat: ``c * c``), so the quadrant sign of
    the fold — a round/floor/select chain per element — is dead work:
    (sign * p)**2 == p**2."""
    if r.dtype != jnp.float32:
        c = jnp.cos(_TWO_PI_64 * r)
        return c * c
    k = jnp.round(_F(2.0) * r)
    f = r - _F(0.5) * k
    p = _poly_s(_COS_COEF, f * f)
    return p * p


def sincos_2pi(r):
    """(sin(2*pi*r), cos(2*pi*r)) for r in [0, 1), sharing the fold."""
    if r.dtype != jnp.float32:
        return jnp.sin(_TWO_PI_64 * r), jnp.cos(_TWO_PI_64 * r)
    f, sign = _fold_quadrant(r)
    s = f * f
    return sign * f * _poly_s(_SIN_COEF, s), sign * _poly_s(_COS_COEF, s)


_TWO_PI_64 = 6.283185307179586
