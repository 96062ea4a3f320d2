"""Independent numpy oracle — explicit per-site loops, no vectorized rolls.

Plays the role of QCDGPU's scalar CPU reference implementation
(suncl/suncpu.cpp; SURVEY.md §2 "CPU reference impl"): the same physics with
a deliberately different implementation style, so index/direction bugs in the
vectorized JAX path cannot cancel.

Convention note: the JAX fields are [mu, a, b, X, Y, Z, T]; the oracle works
on per-site 2D matrices U[mu][:, :, x, y, z, t].
"""

from __future__ import annotations

import numpy as np

NDIM = 4


def _mat(u, mu, x):
    return u[(mu, slice(None), slice(None)) + tuple(x)]


def _shifted(x, mu, d, dims):
    y = list(x)
    y[mu] = (y[mu] + d) % dims[mu]
    return tuple(y)


def _sites(dims):
    return np.ndindex(*dims)


def plaquette_matrix(u, x, mu, nu, dims):
    """P = U_mu(x) U_nu(x+mu) U_mu(x+nu)^+ U_nu(x)^+."""
    a = _mat(u, mu, x)
    b = _mat(u, nu, _shifted(x, mu, +1, dims))
    c = _mat(u, mu, _shifted(x, nu, +1, dims)).conj().T
    d = _mat(u, nu, x).conj().T
    return a @ b @ c @ d


def mean_plaquette(u):
    """(total, spatial, temporal) mean of (1/N) Re tr P over sites+planes."""
    dims = u.shape[3:]
    n = u.shape[1]
    s_acc, t_acc = 0.0, 0.0
    ns, nt = 0, 0
    for x in _sites(dims):
        for mu in range(NDIM):
            for nu in range(mu + 1, NDIM):
                p = np.real(np.trace(plaquette_matrix(u, x, mu, nu, dims))) / n
                if nu == 3:
                    t_acc += p
                    nt += 1
                else:
                    s_acc += p
                    ns += 1
    return (s_acc + t_acc) / (ns + nt), s_acc / ns, t_acc / nt


def staple_sum_site(u, x, mu):
    """Sum of the 6 staples of U_mu(x): P_containing = U_mu(x) @ staple."""
    dims = u.shape[3:]
    n = u.shape[1]
    acc = np.zeros((n, n), dtype=u.dtype)
    for nu in range(NDIM):
        if nu == mu:
            continue
        # forward: U_nu(x+mu) U_mu(x+nu)^+ U_nu(x)^+
        acc += (
            _mat(u, nu, _shifted(x, mu, +1, dims))
            @ _mat(u, mu, _shifted(x, nu, +1, dims)).conj().T
            @ _mat(u, nu, x).conj().T
        )
        # backward: U_nu(x+mu-nu)^+ U_mu(x-nu)^+ U_nu(x-nu)
        xm = _shifted(x, nu, -1, dims)
        acc += (
            _mat(u, nu, _shifted(xm, mu, +1, dims)).conj().T
            @ _mat(u, mu, xm).conj().T
            @ _mat(u, nu, xm)
        )
    return acc


def wilson_action(u, beta):
    """S = beta * sum_{x, mu<nu} (1 - (1/N) Re tr P)."""
    dims = u.shape[3:]
    n = u.shape[1]
    s = 0.0
    for x in _sites(dims):
        for mu in range(NDIM):
            for nu in range(mu + 1, NDIM):
                s += 1.0 - np.real(np.trace(plaquette_matrix(u, x, mu, nu, dims))) / n
    return beta * s


def polyakov_loop(u):
    dims = u.shape[3:]
    n = u.shape[1]
    acc = 0.0 + 0.0j
    for xs in np.ndindex(*dims[:3]):
        p = np.eye(n, dtype=u.dtype)
        for t in range(dims[3]):
            p = p @ _mat(u, 3, xs + (t,))
        acc += np.trace(p) / n
    nsp = dims[0] * dims[1] * dims[2]
    return acc / nsp


def random_su3(rs: np.random.RandomState):
    """Haar-ish random SU(3) via QR of a complex gaussian + phase fix."""
    z = rs.randn(3, 3) + 1j * rs.randn(3, 3)
    q, r = np.linalg.qr(z)
    q = q @ np.diag(np.diag(r) / np.abs(np.diag(r)))
    q = q / np.linalg.det(q) ** (1.0 / 3.0)
    return q


def random_su2(rs: np.random.RandomState):
    q = rs.randn(4)
    q /= np.linalg.norm(q)
    return np.array(
        [
            [q[0] + 1j * q[3], q[2] + 1j * q[1]],
            [-q[2] + 1j * q[1], q[0] - 1j * q[3]],
        ]
    )


def random_links(dims, n, seed=0):
    """[4, N, N, *dims] random SU(N) field (numpy, complex128)."""
    rs = np.random.RandomState(seed)
    u = np.zeros((NDIM, n, n) + tuple(dims), dtype=np.complex128)
    gen = random_su2 if n == 2 else random_su3
    for mu in range(NDIM):
        for x in np.ndindex(*dims):
            u[(mu, slice(None), slice(None)) + x] = gen(rs)
    return u


def random_gauge_transform(u, seed=1):
    """U_mu(x) -> g(x) U_mu(x) g(x+mu)^+ with random g — plaquette invariant."""
    dims = u.shape[3:]
    n = u.shape[1]
    rs = np.random.RandomState(seed)
    gen = random_su2 if n == 2 else random_su3
    g = np.zeros((n, n) + tuple(dims), dtype=np.complex128)
    for x in np.ndindex(*dims):
        g[(slice(None), slice(None)) + x] = gen(rs)
    v = np.zeros_like(u)
    for mu in range(NDIM):
        for x in np.ndindex(*dims):
            gx = g[(slice(None), slice(None)) + x]
            gxp = g[(slice(None), slice(None)) + _shifted(x, mu, +1, dims)]
            v[(mu, slice(None), slice(None)) + x] = (
                gx @ _mat(u, mu, x) @ gxp.conj().T
            )
    return v
