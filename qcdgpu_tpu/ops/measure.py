"""On-device observables: mean plaquette, Wilson action, Polyakov loop.

All reductions happen on device inside the jit-ed step (XLA fuses the
plaquette products into the reduction); the host only ever sees a handful of
scalars per measurement — the TPU equivalent of QCDGPU's workgroup
tree-reduction measurement kernels (kernel/su*_measurements_cl.cl,
su*_polyakov_cl.cl; SURVEY.md §2 "Measurement kernels").

Observable vector layout (see OBS_NAMES):
  plq      — mean plaquette (1/N) Re tr P, averaged over all 6 planes
  plq_s    — spatial planes only (xy, xz, yz)
  plq_t    — temporal planes only (xt, yt, zt)
  action   — Wilson action density S / (beta * 6 * V) = 1 - plq
  poly_re  — Re of the volume-averaged Polyakov loop (1/N normalized)
  poly_im  — Im of the same
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .lattice import NDIM, shift
from .sun import dagger, mul, retrace, trace

OBS_NAMES = ("plq", "plq_s", "plq_t", "action", "poly_re", "poly_im")
TIME_AXIS = 3  # mu index of the temporal direction


def plaquette_retrace(u, mu, nu):
    """Re tr P_{mu,nu}(x) field: [*site_dims]."""
    a = mul(u[mu], shift(u[nu], mu, +1))
    b = mul(u[nu], shift(u[mu], nu, +1))
    return retrace(mul(a, dagger(b)))


def mean_plaquette(u):
    """(plq_total, plq_spatial, plq_temporal) scalars."""
    n = u.shape[1]
    s_sum = 0.0
    t_sum = 0.0
    for mu in range(NDIM):
        for nu in range(mu + 1, NDIM):
            p = jnp.mean(plaquette_retrace(u, mu, nu)) / n
            if nu == TIME_AXIS:
                t_sum = t_sum + p
            else:
                s_sum = s_sum + p
    return (s_sum + t_sum) / 6.0, s_sum / 3.0, t_sum / 3.0


def polyakov_loop(u):
    """Volume-averaged Polyakov loop from the full link field."""
    return polyakov_from_ut(u[TIME_AXIS])


def polyakov_from_ut(ut):
    """Volume-averaged Polyakov loop (complex), 1/N-normalized.

    ut: the temporal links [N, N, X, Y, Z, T].
    L(xvec) = (1/N) tr prod_t U_t(xvec, t); returns mean over space.

    The time product is a log-depth pairwise tree (V_k = U_{2k} U_{2k+1},
    recursively), with matrix components held as SEPARATE arrays all the
    way through — no jnp.stack inside the tree.  Stack/concatenate act as
    fusion barriers on TPU and each would materialize a full field; the
    de-stacked tree is pure elementwise arithmetic on strided slices,
    which XLA fuses per level.
    """
    n = ut.shape[0]
    cur = [[ut[i, j] for j in range(n)] for i in range(n)]

    def pairmul(a, b):
        out = []
        for i in range(n):
            row = []
            for k in range(n):
                acc = a[i][0] * b[0][k]
                for j in range(1, n):
                    acc = acc + a[i][j] * b[j][k]
                row.append(acc)
            out.append(row)
        return out

    while cur[0][0].shape[-1] > 1:
        if cur[0][0].shape[-1] % 2 == 1:
            # identity-pad the tail so every element has a pair
            eye = jnp.eye(n, dtype=ut.dtype)
            cur = [
                [
                    jnp.concatenate(
                        [cur[i][j],
                         jnp.broadcast_to(eye[i, j],
                                          cur[i][j].shape[:-1] + (1,))],
                        axis=-1,
                    )
                    for j in range(n)
                ]
                for i in range(n)
            ]
        even = [[c[..., 0::2] for c in row] for row in cur]
        odd = [[c[..., 1::2] for c in row] for row in cur]
        cur = pairmul(even, odd)
    loop = cur[0][0][..., 0]
    for i in range(1, n):
        loop = loop + cur[i][i][..., 0]
    loop = loop / n  # [X, Y, Z]
    return jnp.mean(jnp.real(loop)), jnp.mean(jnp.imag(loop))


def measure_all(u):
    """The standard observable vector (see OBS_NAMES), as a length-6 array."""
    plq, plq_s, plq_t = mean_plaquette(u)
    pre, pim = polyakov_loop(u)
    action = 1.0 - plq
    return jnp.stack(
        [
            jnp.float32(plq),
            jnp.float32(plq_s),
            jnp.float32(plq_t),
            jnp.float32(action),
            jnp.float32(pre),
            jnp.float32(pim),
        ]
    )
