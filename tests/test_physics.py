"""Physics regression against literature values (SURVEY.md §4, mechanism 3).

The reference's only systematic verification was agreement of observables
with known lattice results at standard couplings.  These are the build's
formalized equivalents (slow: full Markov chains on the CPU backend —
run with RUN_SLOW=1):

  * SU(2), Wilson action, beta = 2.4, 8^4: mean plaquette ~= 0.6300
  * SU(3), Wilson action, beta = 6.0, 8^4: mean plaquette ~= 0.5937
    (BASELINE.md north-star observable; 1e-4 agreement is the multi-chip
    acceptance bar at production statistics — here we gate at 2e-3 with
    short chains)
  * cold and hot starts converge to the same equilibrium (BASELINE
    config 2)
"""

import numpy as np
import pytest

from qcdgpu_tpu import SimConfig, Simulation
from qcdgpu_tpu.utils.stats import analyze_series

pytestmark = pytest.mark.slow

LIT_SU2_B24 = 0.6300
LIT_SU3_B60 = 0.5937


def _run_chain(cfg, therm, sweeps):
    sim = Simulation(cfg)
    sim.thermalize(therm)
    obs = sim.run(sweeps, measure_every=1)
    return analyze_series(obs[:, 0])


def test_su2_beta24_plaquette():
    cfg = SimConfig(group=2, dims=(8, 8, 8, 8), beta=2.4,
                    algorithm="heatbath", seed=11)
    st = _run_chain(cfg, therm=150, sweeps=300)
    assert abs(st.mean - LIT_SU2_B24) < max(3e-3, 5 * st.err), st


def test_su3_beta60_plaquette_heatbath_or():
    cfg = SimConfig(group=3, dims=(8, 8, 8, 8), beta=6.0,
                    algorithm="heatbath", n_or=1, seed=13)
    st = _run_chain(cfg, therm=150, sweeps=300)
    assert abs(st.mean - LIT_SU3_B60) < max(2e-3, 5 * st.err), st


def test_cold_hot_converge():
    base = dict(group=3, dims=(6, 6, 6, 6), beta=6.0,
                algorithm="heatbath", n_or=1)
    cold = _run_chain(SimConfig(start="cold", seed=17, **base), 200, 300)
    hot = _run_chain(SimConfig(start="hot", seed=19, **base), 200, 300)
    err = np.sqrt(cold.err**2 + hot.err**2)
    assert abs(cold.mean - hot.mean) < 5 * max(err, 1e-4), (cold, hot)


def test_metropolis_agrees_with_heatbath():
    """Same target distribution regardless of update algorithm."""
    base = dict(group=2, dims=(6, 6, 6, 6), beta=2.4)
    hb = _run_chain(SimConfig(algorithm="heatbath", seed=23, **base),
                    150, 300)
    mp = _run_chain(
        SimConfig(algorithm="metropolis", n_hit=5, metro_delta=0.4,
                  seed=29, **base),
        400, 600,  # Metropolis mixes slower
    )
    err = np.sqrt(hb.err**2 + mp.err**2)
    assert abs(hb.mean - mp.mean) < 5 * max(err, 1e-4), (hb, mp)
