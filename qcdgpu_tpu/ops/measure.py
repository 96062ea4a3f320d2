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

Optional extension (cfg.get_fmunu — QCDGPU's `get_Fmunu`/`get_F0mu` options
with `Fmunu_index1/2`, kernel lattice_measurement_Fmunu [mem, reference
mount empty — SURVEY.md header]): per selected color generator T_a and per
plane (mu, nu), the volume-averaged complex trace tr(T_a P_{mu,nu}).  Its
imaginary part is the naive lattice field-strength component
F^a_{mu,nu} ~ (2/g a^2) Im tr(T_a P) used in the package's vacuum
chromo-magnetization studies; spatial planes give the chromo-magnetic
components (QCDGPU's Fmunu), temporal planes the chromo-electric ones
(QCDGPU's F0mu).  Default colors are the Cartan generators: lambda_3 and
lambda_8 for SU(3), sigma_3 for SU(2).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .lattice import NDIM, shift, shift2
from .sun import dagger, mul, retrace, trace

OBS_NAMES = ("plq", "plq_s", "plq_t", "action", "poly_re", "poly_im")
TIME_AXIS = 3  # mu index of the temporal direction

PLANES = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
PLANE_NAMES = ("xy", "xz", "xt", "yz", "yt", "zt")

# SU(2) Pauli matrices sigma_1..3 (generator index a = 1..3)
_PAULI = np.array(
    [
        [[0, 1], [1, 0]],
        [[0, -1j], [1j, 0]],
        [[1, 0], [0, -1]],
    ],
    dtype=np.complex128,
)

# SU(3) Gell-Mann matrices lambda_1..8 (generator index a = 1..8)
_S3 = 1.0 / np.sqrt(3.0)
_GELL_MANN = np.array(
    [
        [[0, 1, 0], [1, 0, 0], [0, 0, 0]],
        [[0, -1j, 0], [1j, 0, 0], [0, 0, 0]],
        [[1, 0, 0], [0, -1, 0], [0, 0, 0]],
        [[0, 0, 1], [0, 0, 0], [1, 0, 0]],
        [[0, 0, -1j], [0, 0, 0], [1j, 0, 0]],
        [[0, 0, 0], [0, 0, 1], [0, 1, 0]],
        [[0, 0, 0], [0, 0, -1j], [0, 1j, 0]],
        [[_S3, 0, 0], [0, _S3, 0], [0, 0, -2 * _S3]],
    ],
    dtype=np.complex128,
)


def generator(n: int, a: int) -> np.ndarray:
    """Hermitian group generator: Pauli sigma_a (N=2) / Gell-Mann lambda_a
    (N=3), 1-based index a in 1..N^2-1 (QCDGPU's Fmunu_index convention)."""
    table = _PAULI if n == 2 else _GELL_MANN
    if not 1 <= a <= n * n - 1:
        raise ValueError(f"generator index {a} out of range for SU({n})")
    return table[a - 1]


def default_fmunu_indices(n: int):
    """The Cartan (diagonal) generators — QCDGPU's default color projection."""
    return (3, 8) if n == 3 else (3,)


def fmunu_obs_names(indices):
    return tuple(
        f"f{a}_{pl}_{c}" for a in indices for pl in PLANE_NAMES for c in ("re", "im")
    )


def plaquette_field(u, mu, nu):
    """Full plaquette matrix field P_{mu,nu}(x): [N, N, *site_dims]."""
    a = mul(u[mu], shift(u[nu], mu, +1))
    b = mul(u[nu], shift(u[mu], nu, +1))
    return mul(a, dagger(b))


# ---------------------------------------------------------------------------
# rectangular Wilson loops W(R, T) — extension beyond QCDGPU, which measures
# only the 1x1 loop (plaquette), action, and Polyakov loop.  Rectangular
# loops are the standard static-quark-potential / string-tension observable
# and cost a handful of roll-multiplies given the link field.
# ---------------------------------------------------------------------------


def wilson_loop_obs_names(pairs):
    return tuple(f"wloop_{r}x{t}" for (r, t) in pairs)


def cfg_wilson_pairs(cfg):
    """The (R, T) extents requested by a SimConfig, as a tuple of tuples."""
    if cfg is None:
        return ()
    return tuple(tuple(p) for p in getattr(cfg, "wilson_loops", ()) or ())


def line_product(u_mu, mu, length):
    """Path-ordered product of `length` consecutive links along mu:
    L(x) = U_mu(x) U_mu(x+mu) ... U_mu(x+(length-1)mu)."""
    acc = u_mu
    for k in range(1, length):
        acc = mul(acc, shift(u_mu, mu, +k))
    return acc


def wilson_loop_means(u, pairs):
    """Volume- and plane-averaged rectangular Wilson loops, one float32 per
    (R, T) pair: R along each spatial direction, T along the time axis,
    (1/N) Re tr averaged over sites and the three (i, t) planes — so
    W(1, 1) equals the temporal mean plaquette plq_t.

    Line products are memoized per (direction, length) and built by
    extending the next-shorter one, so a pair set like {(1,2),(2,2),(3,2)}
    shares the temporal line and each extra extent costs exactly one more
    full-lattice matrix multiply per direction."""
    n = u.shape[1]
    lines = {}

    def line(mu, length):
        if (mu, length) not in lines:
            if length == 1:
                lines[(mu, 1)] = u[mu]
            else:
                lines[(mu, length)] = mul(
                    line(mu, length - 1), shift(u[mu], mu, +(length - 1))
                )
        return lines[(mu, length)]

    out = []
    for (r, t) in pairs:
        pt = line(TIME_AXIS, t)
        acc = 0.0
        for mu in range(TIME_AXIS):
            pr = line(mu, r)
            top = shift(pt, mu, +r)          # temporal line at x + R mu
            left = shift(pr, TIME_AXIS, +t)  # spatial line at x + T t_hat
            w = retrace(mul(mul(pr, top), dagger(mul(pt, left))))
            acc = acc + jnp.mean(w) / n
        out.append(acc / TIME_AXIS)
    return jnp.stack([jnp.float32(x) for x in out])


def fmunu_means(u, indices):
    """Volume-averaged tr(T_a P_{mu,nu}) for each selected color a and plane.

    Returns a float32 vector ordered [a-major, plane, (re, im)] matching
    fmunu_obs_names(indices).  The generator contraction is done entrywise
    on the nonzero entries of T_a (they are sparse), so each plane costs
    one plaquette-field construction plus a few elementwise reductions.
    """
    n = u.shape[1]
    gens = [np.asarray(generator(n, a)) for a in indices]
    out = [[] for _ in indices]
    for (mu, nu) in PLANES:
        p = plaquette_field(u, mu, nu)
        for gi, g in enumerate(gens):
            # tr(T_a P) = sum_{i,j} (T_a)_{ij} P_{ji}
            acc = 0.0
            for i in range(n):
                for j in range(n):
                    if g[i, j] != 0:
                        acc = acc + complex(g[i, j]) * p[j, i]
            tr_mean = jnp.mean(acc)
            out[gi].append(jnp.float32(jnp.real(tr_mean)))
            out[gi].append(jnp.float32(jnp.imag(tr_mean)))
    return jnp.stack([v for per_color in out for v in per_color])


# ---------------------------------------------------------------------------
# topological charge Q from the clover-leaf field strength — extension
# beyond QCDGPU (which measures plaquette/action/Polyakov and the naive
# single-plaquette Fmunu projections above).  The clover discretization is
# the standard O(a^2)-improved field strength used for Q_L; on smooth
# (thermalized + mild coupling) configurations Q_L approaches integer
# values up to renormalization, and on classical abelian backgrounds it is
# exactly computable (see tests/test_qtop.py).
# ---------------------------------------------------------------------------


def clover_leaf_sum(u, mu, nu):
    """Sum of the four counter-clockwise plaquette leaves through x in the
    (mu, nu) plane: [N, N, *site_dims].

    Leaves (all enclosing x, all with the same mu->nu orientation):
      P1 = U_mu(x) U_nu(x+mu) U_mu^+(x+nu) U_nu^+(x)
      P2 = U_nu(x) U_mu^+(x-mu+nu) U_nu^+(x-mu) U_mu(x-mu)
      P3 = U_mu^+(x-mu) U_nu^+(x-mu-nu) U_mu(x-mu-nu) U_nu(x-nu)
      P4 = U_nu^+(x-nu) U_mu(x-nu) U_nu(x+mu-nu) U_mu^+(x)
    """
    um, un = u[mu], u[nu]
    um_m = shift(um, mu, -1)   # U_mu(x - mu)
    un_n = shift(un, nu, -1)   # U_nu(x - nu)
    p1 = mul(mul(um, shift(un, mu, +1)),
             dagger(mul(un, shift(um, nu, +1))))
    p2 = mul(mul(un, dagger(shift2(um, mu, -1, nu, +1))),
             mul(dagger(shift(un, mu, -1)), um_m))
    p3 = mul(mul(dagger(um_m), dagger(shift2(un, mu, -1, nu, -1))),
             mul(shift2(um, mu, -1, nu, -1), un_n))
    p4 = mul(mul(dagger(un_n), shift(um, nu, -1)),
             mul(shift2(un, mu, +1, nu, -1), dagger(um)))
    return p1 + p2 + p3 + p4


def field_strength_clover(u, mu, nu):
    """Anti-hermitian traceless clover field G_munu(x): [N, N, *site_dims].

    G = traceless[(C - C^+)/2] with C the four-leaf clover average, so
    G ~= i a^2 g F_munu + O(a^4) in the continuum limit."""
    n = u.shape[1]
    c = clover_leaf_sum(u, mu, nu)
    g = 0.125 * (c - dagger(c))
    tr = trace(g) / n
    eye = np.eye(n, dtype=np.complex64).reshape(
        (n, n) + (1,) * (g.ndim - 2))
    return g - tr[None, None] * jnp.asarray(eye)


def topological_charge(u):
    """Clover (field-theoretic) topological charge Q_L, one real scalar.

    Q_L = (1/32 pi^2) sum_x eps^{mu nu rho sigma} tr[F F]
        = -(1/4 pi^2) sum_x [tr(G_01 G_23) - tr(G_02 G_13)
                             + tr(G_03 G_12)]    (G = i a^2 g F).

    Materializes six clover fields (~24 plaquette-type products) — an
    opt-in measurement cost, like the Fmunu extension above."""
    n = u.shape[1]

    def trmul(a, b):
        # tr(a @ b) per site, real part (exactly real for anti-hermitian
        # a, b up to f32 rounding)
        acc = 0.0
        for i in range(n):
            for j in range(n):
                acc = acc + jnp.real(a[i, j]) * jnp.real(b[j, i]) \
                    - jnp.imag(a[i, j]) * jnp.imag(b[j, i])
        return acc

    s = (trmul(field_strength_clover(u, 0, 1), field_strength_clover(u, 2, 3))
         - trmul(field_strength_clover(u, 0, 2), field_strength_clover(u, 1, 3))
         + trmul(field_strength_clover(u, 0, 3), field_strength_clover(u, 1, 2)))
    return -jnp.sum(s) / jnp.float32(4.0 * np.pi * np.pi)


def plaquette_retrace(u, mu, nu):
    """Re tr P_{mu,nu}(x) field: [*site_dims]."""
    return retrace(plaquette_field(u, mu, nu))


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

    The time product is a balanced log-depth recursion over CONTIGUOUS
    T ranges, P(a..b) = P(a..m) @ P(m..b), after one transpose that moves
    T off the lane (minor) axis — slicing leading-axis halves is free,
    whereas the naive pairwise tree's stride-2 lane slices cost a vector
    relayout per level per component (measured: 4.7 ms -> <1 ms per
    measurement on SU(3) 32^4).  Matrix components stay SEPARATE arrays
    (no jnp.stack inside the tree — stack is a fusion barrier on TPU).
    """
    n = ut.shape[0]
    utt = jnp.moveaxis(ut, -1, 2)  # [N, N, T, X, Y, Z]
    comp = [[utt[i, j] for j in range(n)] for i in range(n)]
    t_len = utt.shape[2]

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

    def prod_range(lo, hi):
        """Ordered product of U_t over t in [lo, hi) as an n x n list of
        [X, Y, Z] arrays."""
        if hi - lo == 1:
            return [[comp[i][j][lo] for j in range(n)] for i in range(n)]
        mid = (lo + hi) // 2
        return pairmul(prod_range(lo, mid), prod_range(mid, hi))

    prod = prod_range(0, t_len)
    loop = prod[0][0]
    for i in range(1, n):
        loop = loop + prod[i][i]
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


# ---------------------------------------------------------------------------
# config-aware observable vector (standard 6 + optional Fmunu extension)
# ---------------------------------------------------------------------------


def cfg_fmunu_indices(cfg):
    """The resolved Fmunu color indices for a SimConfig (0 = auto/Cartan)."""
    if not getattr(cfg, "get_fmunu", False):
        return ()
    auto = default_fmunu_indices(cfg.group)
    i1 = cfg.fmunu_index1 or auto[0]
    i2 = cfg.fmunu_index2 or (auto[1] if len(auto) > 1 else 0)
    if i2 == i1:
        # e.g. fmunu_index1 explicitly set to the auto second Cartan
        # generator: keep one copy, or the duplicate observable names
        # would silently collapse in dict(zip(names, vals)) downstream
        return (i1,)
    return (i1, i2) if i2 else (i1,)


def measure_obs_names(cfg=None):
    """Names of the observables produced by make_measure_fn(cfg)."""
    if cfg is None:
        return OBS_NAMES
    qtop = ("q_top",) if getattr(cfg, "get_qtop", False) else ()
    return (OBS_NAMES + fmunu_obs_names(cfg_fmunu_indices(cfg))
            + wilson_loop_obs_names(cfg_wilson_pairs(cfg)) + qtop)


def obs_names(cfg=None):
    """Column names of the per-measurement series row (measurement vector
    plus engine-accumulated columns such as the Metropolis acceptance
    rate)."""
    names = measure_obs_names(cfg)
    if cfg is not None and getattr(cfg, "track_acceptance", False):
        names = names + ("acc_rate",)
    if cfg is not None and getattr(cfg, "track_kp_exhaust", False):
        # mutually exclusive with acc_rate (algorithm-gated in SimConfig),
        # so the engines' single tracked-stat accumulator serves both
        names = names + ("kp_exhaust_rate",)
    return names


def make_measure_fn(cfg):
    """u -> observable vector of length len(obs_names(cfg)).

    With cfg.meas_dtype == "double" the observables are evaluated in
    complex128 (QCDGPU's PRECISION=mixed: single-precision updates, double-
    precision measurement sums; requires jax_enable_x64 — CPU/XLA engine).
    """
    indices = cfg_fmunu_indices(cfg)
    pairs = cfg_wilson_pairs(cfg)
    qtop = bool(getattr(cfg, "get_qtop", False))
    qtop_smear = int(getattr(cfg, "qtop_smear", 0) or 0)
    qtop_alpha = float(getattr(cfg, "qtop_alpha", 0.5))

    def fn(u):
        if getattr(cfg, "meas_dtype", "same") == "double":
            u = u.astype(jnp.complex128)
        parts = [measure_all(u)]
        if indices:
            parts.append(fmunu_means(u, indices))
        if pairs:
            parts.append(wilson_loop_means(u, pairs))
        if qtop:
            uq = u
            if qtop_smear:
                from .smear import ape_smear

                uq = ape_smear(u, qtop_alpha, qtop_smear)
            parts.append(jnp.float32(topological_charge(uq))[None])
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    return fn
