"""Rectangular Wilson loops W(R, T) (ops/measure.py wilson_loop_means).

Extension beyond QCDGPU (which measures only the 1x1 loop / action /
Polyakov loop).  Pinned properties: cold start gives exactly 1, W(1,1)
reproduces the temporal mean plaquette, values are gauge invariant, and a
brute-force numpy rectangle on a hot field agrees.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qcdgpu_tpu import SimConfig, Simulation
from qcdgpu_tpu.ops import measure, rng, sun
from qcdgpu_tpu.sim import cold_start, hot_start

DIMS = (4, 4, 4, 6)
PAIRS = ((1, 1), (1, 2), (2, 3))


def _hot(group=3, seed=5):
    cfg = SimConfig(group=group, dims=DIMS, beta=5.7)
    return hot_start(cfg, rng.make_base_key(seed))


def test_cold_start_is_one():
    cfg = SimConfig(group=3, dims=DIMS)
    w = np.asarray(measure.wilson_loop_means(cold_start(cfg), PAIRS))
    np.testing.assert_allclose(w, 1.0, atol=1e-6)


@pytest.mark.parametrize("group", [2, 3])
def test_w11_equals_temporal_plaquette(group):
    u = _hot(group)
    w11 = float(measure.wilson_loop_means(u, ((1, 1),))[0])
    _, _, plq_t = measure.mean_plaquette(u)
    assert abs(w11 - float(plq_t)) < 1e-6


def test_gauge_invariance():
    """W(R, T) is a closed-loop trace: g(x)-rotating every link,
    U_mu(x) -> g(x) U_mu(x) g(x+mu)^+, must leave it unchanged."""
    from qcdgpu_tpu.ops.lattice import shift

    u = _hot(3)
    # random SU(3) gauge transform from a hot start's first direction
    g = _hot(3, seed=77)[0]
    rotated = jnp.stack([
        sun.mul(sun.mul(g, u[mu]), sun.dagger(shift(g, mu, +1)))
        for mu in range(4)
    ])
    w0 = np.asarray(measure.wilson_loop_means(u, PAIRS))
    w1 = np.asarray(measure.wilson_loop_means(rotated, PAIRS))
    np.testing.assert_allclose(w0, w1, atol=5e-6)


def test_brute_force_rectangle():
    """W(2, 3) against an explicit per-site numpy path product."""
    r, t = 2, 3
    u = np.asarray(_hot(2, seed=9))
    n = u.shape[1]
    dims = DIMS
    total = 0.0
    count = 0
    for mu in range(3):
        for x in np.ndindex(dims):
            m = np.eye(n, dtype=complex)
            pos = list(x)
            for _ in range(r):  # R links along mu
                m = m @ u[mu][(slice(None), slice(None)) + tuple(pos)]
                pos[mu] = (pos[mu] + 1) % dims[mu]
            for _ in range(t):  # T links along time
                m = m @ u[3][(slice(None), slice(None)) + tuple(pos)]
                pos[3] = (pos[3] + 1) % dims[3]
            for _ in range(r):  # back along -mu
                pos[mu] = (pos[mu] - 1) % dims[mu]
                m = m @ u[mu][(slice(None), slice(None)) + tuple(pos)].conj().T
            for _ in range(t):  # back along -time
                pos[3] = (pos[3] - 1) % dims[3]
                m = m @ u[3][(slice(None), slice(None)) + tuple(pos)].conj().T
            total += m.trace().real / n
            count += 1
    ref = total / count
    ours = float(measure.wilson_loop_means(jnp.asarray(u), ((r, t),))[0])
    assert abs(ours - ref) < 1e-5


def test_simulation_integration_and_config():
    cfg = SimConfig(group=2, dims=DIMS, beta=2.4, wilson_loops=((1, 1), (1, 2)),
                    sweeps_therm=0, seed=3)
    sim = Simulation(cfg)
    assert sim.obs_names[-2:] == ("wloop_1x1", "wloop_1x2")
    obs = sim.run(2, measure_every=1)
    names = list(sim.obs_names)
    w11 = obs[:, names.index("wloop_1x1")]
    plq_t = obs[:, names.index("plq_t")]
    np.testing.assert_allclose(w11, plq_t, atol=1e-5)
    w12 = obs[:, names.index("wloop_1x2")]
    assert np.all(np.abs(w12) < 1.0)
    # config round-trips through JSON (checkpoint header)
    rt = SimConfig.from_dict(
        __import__("json").loads(__import__("json").dumps(cfg.to_dict()))
    )
    assert rt == cfg
    # invalid extents rejected
    with pytest.raises(ValueError, match="wilson loop R"):
        SimConfig(group=2, dims=DIMS, wilson_loops=((4, 1),))
    with pytest.raises(ValueError, match="wilson loop T"):
        SimConfig(group=2, dims=DIMS, wilson_loops=((1, 6),))
