"""4D lattice geometry: shifts, parity masks, global site indices.

Dense layout: a link field is ``U[mu, a, b, X, Y, Z, T]`` (mu = 0..3 mapping
to lattice axes x, y, z, t; matrix dims lead per qcdgpu_tpu.ops.sun).  Site
axes of a per-direction field ``[N, N, X, Y, Z, T]`` are 2 + mu.

Neighbor access is `jnp.roll` with periodic boundary conditions.  Under
jit + NamedSharding over the site axes, XLA's SPMD partitioner turns these
rolls into collective-permutes of one-deep boundary slices — i.e. exactly the
halo exchange QCDGPU performs by hand through host memory (SURVEY.md §2
"Multi-device decomposition"), but over ICI and fused into the compute.
"""

from __future__ import annotations


import numpy as np
import jax.numpy as jnp

NDIM = 4
SITE_AXIS0 = 2  # first site axis of an [N, N, X, Y, Z, T] field


def shift(f, mu, d):
    """f'(x) = f(x + d * mu_hat) for a [N, N, *dims] field (periodic)."""
    return jnp.roll(f, -d, axis=SITE_AXIS0 + mu)


def shift2(f, mu, dmu, nu, dnu):
    """Two-axis shift: f'(x) = f(x + dmu*mu_hat + dnu*nu_hat)."""
    return jnp.roll(
        jnp.roll(f, -dmu, axis=SITE_AXIS0 + mu), -dnu, axis=SITE_AXIS0 + nu
    )


def parity_mask(dims, parity):
    """Boolean [X, Y, Z, T] mask of sites with (x+y+z+t) % 2 == parity.

    Built from broadcasted iota so that, under SPMD partitioning, every shard
    computes its *global* parity — no shard-offset bookkeeping needed.
    """
    acc = jnp.zeros(dims, jnp.int32)
    for ax in range(NDIM):
        acc = acc + jax_iota(dims, ax)
    return (acc % 2) == parity


def site_index(dims):
    """uint32 [X, Y, Z, T] global linear site index (row-major over dims)."""
    idx = jnp.zeros(dims, jnp.uint32)
    stride = 1
    for ax in reversed(range(NDIM)):
        idx = idx + jax_iota(dims, ax).astype(jnp.uint32) * np.uint32(stride)
        stride *= dims[ax]
    return idx


def jax_iota(dims, axis):
    import jax

    return jax.lax.broadcasted_iota(jnp.int32, tuple(dims), axis)


def volume(dims):
    return int(np.prod(dims))
