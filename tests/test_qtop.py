"""Clover topological charge Q_L (extension beyond QCDGPU's observable set).

Ground truth: on an abelian (Cartan-embedded) two-plane flux background the
clover is EXACT — every leaf is the same constant phase matrix — so
Q_L = (V / 2 pi^2) sin(B1) sin(B2) analytically, approaching the integer
2 k1 k2 in the continuum limit.  Plus the generic invariances: zero on a
cold start, invariance under random gauge transformations, and the
simulation-series plumbing.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qcdgpu_tpu import SimConfig, Simulation
from qcdgpu_tpu.ops.measure import (
    clover_leaf_sum,
    field_strength_clover,
    make_measure_fn,
    measure_obs_names,
    obs_names,
    topological_charge,
)
from qcdgpu_tpu.ops.sun import dagger, mul, trace
from qcdgpu_tpu.sim import cold_start, hot_start
from qcdgpu_tpu.ops import rng


def _abelian_two_flux(n, L, k1=1, k2=1):
    """SU(n) links with constant abelian flux B1 in the xy plane and B2 in
    the zt plane (T_3 = diag(1, -1[, 0]) direction): U_x(y) = e^{i B1 y T3}
    with B1 = 2 pi k1 / L, U_z(t) = e^{i B2 t T3} likewise; U_y = U_t = I.
    Every plaquette (and hence every clover leaf) in xy / zt is exactly
    e^{-i B T3}; all other planes are flat."""
    b1 = 2.0 * np.pi * k1 / L
    b2 = 2.0 * np.pi * k2 / L
    cfg = SimConfig(group=n, dims=(L, L, L, L))
    u = np.asarray(cold_start(cfg)).copy()
    ph1 = np.exp(1j * b1 * np.arange(L))  # indexed by y
    ph2 = np.exp(1j * b2 * np.arange(L))  # indexed by t
    for i, s in ((0, +1), (1, -1)):
        u[0, i, i] = (ph1 ** s)[None, :, None, None]  # U_x(x,y,z,t) ~ y
        u[2, i, i] = (ph2 ** s)[None, None, None, :]  # U_z(x,y,z,t) ~ t
    return jnp.asarray(u), b1, b2


@pytest.mark.parametrize("n", [2, 3])
def test_qtop_cold_start_is_zero(n):
    u = cold_start(SimConfig(group=n, dims=(4, 4, 4, 4)))
    assert abs(float(topological_charge(u))) < 1e-6


@pytest.mark.parametrize("n", [2, 3])
def test_clover_field_antihermitian_traceless(n):
    u = hot_start(SimConfig(group=n, dims=(4, 4, 4, 4)), rng.make_base_key(7))
    g = field_strength_clover(u, 0, 3)
    gd = dagger(g)
    assert float(jnp.max(jnp.abs(g + gd))) < 1e-5          # anti-hermitian
    assert float(jnp.max(jnp.abs(trace(g)))) < 1e-5        # traceless


@pytest.mark.parametrize("n,k1,k2", [(2, 1, 1), (3, 1, 1), (2, 1, 2)])
def test_qtop_abelian_two_flux_exact(n, k1, k2):
    L = 4
    u, b1, b2 = _abelian_two_flux(n, L, k1, k2)
    # the clover in xy is exactly e^{-i B1 T3}: check one leaf sum
    c = clover_leaf_sum(u, 0, 1)
    want = np.zeros((n, n), dtype=complex)
    want[0, 0] = 4 * np.exp(-1j * b1)
    want[1, 1] = 4 * np.exp(+1j * b1)
    if n == 3:
        want[2, 2] = 4.0
    got = np.asarray(c)[:, :, 0, 0, 0, 0]
    assert np.allclose(got, want, atol=1e-5)
    # exact lattice prediction (leaves constant => sum over V sites):
    # Q_L = (V / 2 pi^2) sin(B1) sin(B2); the continuum value of this
    # background is 2 k1 k2 L^2 (per-plaquette phase 2 pi k / L means
    # k L flux quanta per plane), recovered as (sin B / B) -> 1
    v = L ** 4
    expect = v * np.sin(b1) * np.sin(b2) / (2.0 * np.pi ** 2)
    q = float(topological_charge(u))
    assert abs(q - expect) < 1e-4 * max(1.0, abs(expect)), (q, expect)
    if abs(expect) > 1e-6:
        assert np.sign(q) == np.sign(expect)


@pytest.mark.parametrize("n", [2, 3])
def test_qtop_gauge_invariant(n):
    cfg = SimConfig(group=n, dims=(4, 4, 4, 4))
    u = hot_start(cfg, rng.make_base_key(11))
    q0 = float(topological_charge(u))
    # random gauge transform: U_mu(x) -> g(x) U_mu(x) g^+(x + mu)
    from qcdgpu_tpu.ops.lattice import shift

    g = hot_start(cfg, rng.make_base_key(12))[0]  # random SU(n) field
    ut = jnp.stack([
        mul(mul(g, u[mu]), dagger(shift(g, mu, +1))) for mu in range(4)
    ])
    q1 = float(topological_charge(ut))
    assert abs(q0 - q1) < 5e-4, (q0, q1)


def test_qtop_obs_column_and_series():
    cfg = SimConfig(group=2, dims=(4, 4, 4, 4), beta=2.4, get_qtop=True,
                    sweeps_therm=1, sweeps=3, seed=5, start="hot")
    assert measure_obs_names(cfg)[-1] == "q_top"
    assert obs_names(cfg)[-1] == "q_top"
    sim = Simulation(cfg)
    sim.thermalize()
    obs = sim.run()
    assert obs.shape == (3, len(obs_names(cfg)))
    assert np.isfinite(obs).all()
    m = sim.measure()
    assert "q_top" in m
    last = dict(zip(obs_names(cfg), obs[-1]))
    assert abs(m["q_top"] - last["q_top"]) < 1e-6


def test_qtop_pallas_measure_split_interpret():
    """measure_all_split's q_top extension (packed state, interpret mode)
    agrees with the XLA measurement on the same field."""
    from qcdgpu_tpu.ops.pallas.engine import measure_all_split, split_links

    cfg = SimConfig(group=2, dims=(4, 4, 4, 4), get_qtop=True)
    u = hot_start(cfg, rng.make_base_key(3)).astype(jnp.complex64)
    us = split_links(u)
    v = np.asarray(measure_all_split(us, cfg.dims, interpret=True, cfg=cfg))
    names = measure_obs_names(cfg)
    assert v.shape == (len(names),)
    ref = np.asarray(make_measure_fn(cfg)(u))
    idx = names.index("q_top")
    assert abs(v[idx] - ref[idx]) < 1e-5
