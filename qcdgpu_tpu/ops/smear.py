"""APE link smearing (and its alpha -> 1 "cooling" limit).

Extension beyond QCDGPU: smearing suppresses ultraviolet fluctuations so
that the clover topological charge (ops/measure.py topological_charge)
approaches near-integer values on Monte Carlo configurations — the
standard companion workflow for field-theoretic Q_L.

One APE step replaces every link simultaneously by the SU(N) projection
of a convex mix of itself and its six staple paths:

    U_mu(x) -> Proj_SU(N)[ (1 - alpha) U_mu(x) + (alpha / 6) S_mu(x) ]

where S_mu(x) = sum_{nu != mu} of the forward + backward staple PATHS
x -> x + mu (exactly dagger(staples.staple_sum), whose convention is
Re tr(U A) = plaquette sums).

The projection is the POLAR projection W = X (X^+ X)^(-1/2) with a
det(W)^(1/N) phase division — the unique choice that is exactly gauge
covariant, Proj(g X h) = g Proj(X) h (Gram-Schmidt row projection, fine
for roundoff reunitarization, is NOT: it does not commute with left
gauge factors).  For SU(2) the quaternion normalization IS the polar
projection (a sum of scaled SU(2) matrices is itself a positive scalar
times an SU(2) matrix), so alpha = 1 reproduces action-minimizing
cooling exactly there.

Exact structural facts pinned by tests/test_smear.py: cold starts and
abelian (Cartan-embedded) constant-flux backgrounds are fixed points
(their staple mix is a positive real multiple of the link, which the
projection removes), smearing commutes with random gauge transforms,
and the mean plaquette increases on thermalized fields.
"""

from __future__ import annotations

import jax.numpy as jnp

from .lattice import NDIM
from .staples import staple_sum
from .sun import dagger, mat_to_quat, quat_to_mat


def project_sun_polar(x):
    """Gauge-covariant SU(N) polar projection of [N, N, *site_dims].

    SU(2): quaternion normalization (exact polar form).  SU(3):
    W = X (X^+ X)^(-1/2) via a batched 3x3 eigendecomposition, then the
    principal det^(1/3) phase is divided out (continuous at X near
    SU(3), where the phase is ~0).
    """
    n = x.shape[0]
    if n == 2:
        q = mat_to_quat(x)
        q = q / jnp.sqrt(jnp.sum(q * q, axis=0))
        return quat_to_mat(q, x.dtype)
    xm = jnp.moveaxis(x, (0, 1), (-2, -1))  # [*sites, N, N]
    h = jnp.conj(jnp.swapaxes(xm, -1, -2)) @ xm
    ev, v = jnp.linalg.eigh(h)
    ev = jnp.maximum(ev, 1e-30)
    inv_sqrt = (v * (1.0 / jnp.sqrt(ev))[..., None, :]) @ jnp.conj(
        jnp.swapaxes(v, -1, -2)
    )
    wm = xm @ inv_sqrt
    d = jnp.linalg.det(wm)
    wm = wm / (d ** (1.0 / 3.0))[..., None, None]
    return jnp.moveaxis(wm, (-2, -1), (0, 1)).astype(x.dtype)


def ape_smear_step(u, alpha):
    """One simultaneous APE step on a [4, N, N, *site_dims] link field."""
    new = []
    for mu in range(NDIM):
        s = dagger(staple_sum(u, mu))
        x = (1.0 - alpha) * u[mu] + (alpha / 6.0) * s
        new.append(project_sun_polar(x))
    return jnp.stack(new)


def ape_smear(u, alpha=0.5, n_iter=1):
    """n_iter APE smearing steps (alpha = 1 with several iterations is
    projection cooling)."""
    for _ in range(n_iter):
        u = ape_smear_step(u, alpha)
    return u
