"""APE smearing / cooling (ops/smear.py) and its q_top integration.

The load-bearing property is exact gauge covariance of the polar
projection — without it, Q_L on a smeared field would depend on the
gauge of the original configuration.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qcdgpu_tpu import SimConfig, Simulation
from qcdgpu_tpu.ops import rng
from qcdgpu_tpu.ops.lattice import shift
from qcdgpu_tpu.ops.measure import (
    mean_plaquette,
    obs_names,
    topological_charge,
)
from qcdgpu_tpu.ops.smear import ape_smear, project_sun_polar
from qcdgpu_tpu.ops.sun import dagger, mul, unitarity_defect
from qcdgpu_tpu.sim import cold_start, hot_start


def _gauge_transform(u, g):
    return jnp.stack([
        mul(mul(g, u[mu]), dagger(shift(g, mu, +1))) for mu in range(4)
    ])


@pytest.mark.parametrize("n", [2, 3])
def test_project_polar_is_sun_and_covariant(n):
    cfg = SimConfig(group=n, dims=(4, 4, 2, 2))
    # a generic non-unitary field: convex mix of two random SU(n) fields
    a = hot_start(cfg, rng.make_base_key(1))[0]
    b = hot_start(cfg, rng.make_base_key(2))[0]
    x = 0.6 * a + 0.7 * b
    w = project_sun_polar(x)
    assert float(unitarity_defect(w)) < 1e-5
    from qcdgpu_tpu.ops.sun import det

    assert float(jnp.max(jnp.abs(det(w) - 1.0))) < 1e-5
    # exact covariance: Proj(g X h) = g Proj(X) h
    g = hot_start(cfg, rng.make_base_key(3))[0]
    h = hot_start(cfg, rng.make_base_key(4))[0]
    lhs = project_sun_polar(mul(mul(g, x), h))
    rhs = mul(mul(g, w), h)
    assert float(jnp.max(jnp.abs(lhs - rhs))) < 5e-5


@pytest.mark.parametrize("n", [2, 3])
def test_smear_cold_start_fixed_point(n):
    u = cold_start(SimConfig(group=n, dims=(4, 4, 4, 4)))
    us = ape_smear(u, alpha=0.5, n_iter=2)
    assert float(jnp.max(jnp.abs(us - u))) < 1e-5


@pytest.mark.parametrize("n", [2, 3])
def test_smear_raises_plaquette_and_stays_sun(n):
    cfg = SimConfig(group=n, dims=(4, 4, 4, 4),
                    beta=2.4 if n == 2 else 6.0,
                    sweeps_therm=20, seed=9, start="hot")
    sim = Simulation(cfg)
    sim.thermalize()
    u = sim.u
    p0 = float(mean_plaquette(u)[0])
    u1 = ape_smear(u, alpha=0.5, n_iter=1)
    u2 = ape_smear(u, alpha=0.5, n_iter=3)
    p1 = float(mean_plaquette(u1)[0])
    p2 = float(mean_plaquette(u2)[0])
    assert p0 < p1 < p2 <= 1.0, (p0, p1, p2)
    assert max(float(unitarity_defect(u2[mu])) for mu in range(4)) < 1e-5


def test_smear_gauge_covariant_qtop_invariant():
    cfg = SimConfig(group=2, dims=(4, 4, 4, 4))
    u = hot_start(cfg, rng.make_base_key(21))
    g = hot_start(cfg, rng.make_base_key(22))[0]
    ug = _gauge_transform(u, g)
    s = ape_smear(u, alpha=0.5, n_iter=2)
    sg = ape_smear(ug, alpha=0.5, n_iter=2)
    # smearing commutes with the gauge transform...
    assert float(jnp.max(jnp.abs(sg - _gauge_transform(s, g)))) < 5e-4
    # ...so smeared Q_L is gauge invariant
    q = float(topological_charge(s))
    qg = float(topological_charge(sg))
    assert abs(q - qg) < 5e-4, (q, qg)


def test_smear_abelian_flux_fixed_point_preserves_qtop():
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_qtop import _abelian_two_flux

    u, b1, b2 = _abelian_two_flux(2, 4, 1, 1)
    q0 = float(topological_charge(u))
    us = ape_smear(u, alpha=0.5, n_iter=2)
    # the abelian constant-flux background is an exact fixed point
    assert float(jnp.max(jnp.abs(us - u))) < 2e-5
    assert abs(float(topological_charge(us)) - q0) < 1e-3


def test_qtop_smear_config_and_series():
    cfg = SimConfig(group=2, dims=(4, 4, 4, 4), beta=2.4, get_qtop=True,
                    qtop_smear=2, sweeps_therm=5, sweeps=2, seed=5,
                    start="hot")
    sim = Simulation(cfg)
    sim.thermalize()
    obs = sim.run()
    assert obs.shape == (2, len(obs_names(cfg)))
    assert np.isfinite(obs).all()
    # smeared Q_L differs from the unsmeared one on the same chain state
    m_smeared = sim.measure()["q_top"]
    from qcdgpu_tpu.ops.measure import make_measure_fn, measure_obs_names

    raw = dict(zip(measure_obs_names(cfg),
                   np.asarray(make_measure_fn(cfg.replace(qtop_smear=0))(sim.u))))
    assert np.isfinite(m_smeared) and np.isfinite(raw["q_top"])
    with pytest.raises(ValueError):
        SimConfig(qtop_smear=-1)
    with pytest.raises(ValueError):
        SimConfig(qtop_alpha=0.0)
