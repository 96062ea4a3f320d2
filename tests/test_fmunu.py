"""Field-strength (Fmunu) measurements, acceptance tracking, mixed precision.

Capability parity targets: QCDGPU's get_Fmunu/get_F0mu options with
Fmunu_index1/2 color selection (kernel lattice_measurement_Fmunu — reference
mount empty, SURVEY.md header), the Metropolis acceptance-rate statistic in
its results file, and PRECISION=mixed (single-precision updates with
double-precision measurement sums).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qcdgpu_tpu import SimConfig, Simulation
from qcdgpu_tpu.ops import measure
from qcdgpu_tpu.ops.measure import (
    cfg_fmunu_indices,
    fmunu_means,
    fmunu_obs_names,
    generator,
    make_measure_fn,
    measure_obs_names,
    obs_names,
)
from qcdgpu_tpu.sim import cold_start


# ---------------------------------------------------------------------------
# generators
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [2, 3])
def test_generators_hermitian_traceless_normalized(n):
    for a in range(1, n * n):
        g = generator(n, a)
        assert np.allclose(g, g.conj().T), (n, a)
        assert abs(np.trace(g)) < 1e-14, (n, a)
        # standard normalization tr(T_a T_b) = 2 delta_ab
        for b in range(1, n * n):
            h = generator(n, b)
            want = 2.0 if a == b else 0.0
            assert abs(np.trace(g @ h) - want) < 1e-12, (n, a, b)


def test_generator_index_range():
    with pytest.raises(ValueError):
        generator(3, 9)
    with pytest.raises(ValueError):
        generator(2, 4)


# ---------------------------------------------------------------------------
# fmunu on constructed backgrounds
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [2, 3])
def test_fmunu_cold_start_is_zero(n):
    cfg = SimConfig(group=n, dims=(4, 4, 4, 4))
    u = cold_start(cfg)
    v = np.asarray(fmunu_means(u, cfg_fmunu_indices(cfg.replace(get_fmunu=True))))
    # P = I on a cold start and every generator is traceless
    assert np.allclose(v, 0.0, atol=1e-6)


@pytest.mark.parametrize("n", [2, 3])
def test_fmunu_abelian_background_flux(n):
    """U_y = I, U_x(x) = exp(i B y T_3) with B = 2 pi k / L_y gives the
    constant plaquette P_xy = exp(-i B T_3), so tr(T_3 P_xy) = -2i sin(B)
    exactly (T_3 = diag(1, -1[, 0]))."""
    L = 4
    k = 1
    B = 2.0 * np.pi * k / L
    cfg = SimConfig(group=n, dims=(L, L, L, L))
    u = np.asarray(cold_start(cfg)).copy()
    phase = np.exp(1j * B * np.arange(L))  # indexed by y
    for i, s in ((0, +1), (1, -1)):
        # diagonal entries of exp(i B y T_3): e^{+iBy}, e^{-iBy}
        u[0, i, i] = (phase ** s)[None, :, None, None]
    u = jnp.asarray(u)
    v = np.asarray(fmunu_means(u, (3,)))
    names = fmunu_obs_names((3,))
    got = dict(zip(names, v))
    assert abs(got["f3_xy_re"] - 0.0) < 1e-5
    assert abs(got["f3_xy_im"] - (-2.0 * np.sin(B))) < 1e-5
    # every other plane is flat
    for nm, val in got.items():
        if not nm.startswith("f3_xy"):
            assert abs(val) < 1e-5, (nm, val)


def test_fmunu_names_and_defaults():
    cfg3 = SimConfig(group=3, get_fmunu=True)
    assert cfg_fmunu_indices(cfg3) == (3, 8)
    cfg2 = SimConfig(group=2, get_fmunu=True)
    assert cfg_fmunu_indices(cfg2) == (3,)
    cfgc = SimConfig(group=3, get_fmunu=True, fmunu_index1=1, fmunu_index2=2)
    assert cfg_fmunu_indices(cfgc) == (1, 2)
    assert len(fmunu_obs_names((3, 8))) == 24
    assert obs_names(cfg3) == measure.OBS_NAMES + fmunu_obs_names((3, 8))
    assert cfg_fmunu_indices(SimConfig(group=3)) == ()
    with pytest.raises(ValueError):
        SimConfig(group=2, fmunu_index1=5)


# ---------------------------------------------------------------------------
# integration: simulation with the extended observable vector
# ---------------------------------------------------------------------------


def test_sim_with_fmunu_series():
    cfg = SimConfig(
        group=3, dims=(4, 4, 4, 4), beta=5.5, get_fmunu=True,
        sweeps_therm=2, sweeps=4, seed=3, start="hot",
    )
    sim = Simulation(cfg)
    sim.thermalize()
    obs = sim.run()
    assert obs.shape == (4, len(obs_names(cfg)))
    assert np.isfinite(obs).all()
    m = sim.measure()
    assert set(m) == set(measure_obs_names(cfg))
    # one-off measurement agrees with the last series row (same state)
    last = dict(zip(obs_names(cfg), obs[-1]))
    assert abs(m["plq"] - last["plq"]) < 1e-6
    assert abs(m["f3_xy_im"] - last["f3_xy_im"]) < 1e-6


def test_metropolis_acceptance_tracking():
    base = dict(
        group=2, dims=(4, 4, 4, 4), beta=2.4, algorithm="metropolis",
        track_acceptance=True, sweeps_therm=0, sweeps=6, seed=1, start="hot",
    )
    cfg = SimConfig(**base)
    sim = Simulation(cfg)
    obs = sim.run()
    names = obs_names(cfg)
    assert names[-1] == "acc_rate"
    acc = obs[:, -1]
    assert ((acc > 0.0) & (acc < 1.0)).all(), acc
    # a much wilder proposal must be accepted less often
    cfg_wild = SimConfig(**{**base, "metro_delta": 2.0})
    acc_wild = Simulation(cfg_wild).run()[:, -1]
    assert acc_wild.mean() < acc.mean()
    # analysis includes the acceptance column
    st = sim.analysis()["acc_rate"]
    assert 0.0 < st.mean < 1.0


def test_track_acceptance_validation():
    with pytest.raises(ValueError):
        SimConfig(algorithm="heatbath", track_acceptance=True)
    # acceptance tracking runs on BOTH engines (in-kernel SMEM counts on
    # Pallas) — an explicit pallas pin is valid config
    SimConfig(algorithm="metropolis", track_acceptance=True,
              engine="pallas")


def test_pallas_measure_split_with_fmunu_interpret():
    """measure_all_split's Fmunu extension (packed state, interpret mode)."""
    from qcdgpu_tpu.ops.pallas.engine import measure_all_split, split_links

    cfg = SimConfig(group=3, dims=(4, 4, 4, 4), get_fmunu=True)
    us = split_links(cold_start(cfg).astype(jnp.complex64))
    v = np.asarray(measure_all_split(us, cfg.dims, interpret=True, cfg=cfg))
    assert v.shape == (len(measure_obs_names(cfg)),)
    ref = dict(zip(measure_obs_names(cfg), v))
    assert abs(ref["plq"] - 1.0) < 1e-6
    assert all(abs(ref[nm]) < 1e-6 for nm in fmunu_obs_names((3, 8)))


def test_resolve_engine_on_cpu():
    from qcdgpu_tpu.sim import resolve_engine

    assert resolve_engine(SimConfig()) == "xla"  # CPU backend in tests
    assert resolve_engine(SimConfig(dims=(8, 8, 8, 8),
                                    mesh=(2, 1, 1, 1))) == "xla"
    assert resolve_engine(SimConfig(engine="pallas")) == "pallas"
    assert resolve_engine(
        SimConfig(algorithm="metropolis", track_acceptance=True)) == "xla"


def test_meas_dtype_double():
    cfg = SimConfig(group=2, dims=(4, 4, 4, 4), beta=2.4, meas_dtype="double",
                    sweeps_therm=0, sweeps=2, seed=0, start="hot")
    sim = Simulation(cfg)
    obs = sim.run()
    assert np.isfinite(obs).all()
    # double-precision measurement of the same state matches the f32 one
    f32 = np.asarray(make_measure_fn(cfg.replace(meas_dtype="same"))(sim.u))
    f64 = np.asarray(make_measure_fn(cfg)(sim.u))
    assert np.allclose(f32, f64, atol=1e-5)


def test_meas_dtype_double_on_pallas_engine():
    """On the Pallas engine "double" means the Kahan-compensated f32
    reductions that are always on — the measurement must be bit-identical
    to meas_dtype='same' and the config must build a runner."""
    from qcdgpu_tpu.ops import rng
    from qcdgpu_tpu.ops.pallas.engine import measure_all_split, split_links
    from qcdgpu_tpu.sim import hot_start, make_chunk_runner

    cfg = SimConfig(group=3, dims=(4, 4, 4, 4), beta=6.0,
                    meas_dtype="double", engine="pallas")
    us = split_links(hot_start(cfg, rng.make_base_key(3)).astype(jnp.complex64))
    a = np.asarray(measure_all_split(us, cfg.dims, interpret=True, cfg=cfg))
    b = np.asarray(measure_all_split(
        us, cfg.dims, interpret=True, cfg=cfg.replace(meas_dtype="same")
    ))
    np.testing.assert_array_equal(a, b)
    make_chunk_runner(cfg.replace(engine="pallas"))
