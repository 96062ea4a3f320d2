"""rng_mode='prngcl:<gen>': simulations driven by PRNGCL generator streams.

QCDGPU lets the user select the device PRNG for the run (init-file PRNG
parameter; SURVEY.md §2 "PRNGCL") and checkpoints its state buffers for
exact resume (§3.5).  These tests pin the same contracts on the stream
mode: chunking invariance (stream state carries across compiled calls),
bit-exact checkpoint/resume, sharded == unsharded, and the ensemble guard.
"""

import numpy as np
import jax
import pytest

from qcdgpu_tpu import SimConfig
from qcdgpu_tpu.sim import Simulation, resolve_engine

CFG = dict(
    group=2, dims=(4, 4, 4, 4), beta=2.4, algorithm="heatbath",
    rng_mode="prngcl:xor128", reunit_every=3, sweeps_therm=0, seed=11,
)


def test_resolves_to_xla_engine():
    # on CPU hosts every stream config resolves to the XLA engine; the
    # whole generator family is Pallas-eligible on TPU now
    # (tests/test_pallas_stream.py covers the in-kernel forms)
    assert resolve_engine(SimConfig(**CFG)) == "xla"
    assert resolve_engine(
        SimConfig(**{**CFG, "rng_mode": "prngcl:ranlux3"})
    ) == "xla"
    # explicit engine='pallas' with a ref-based generator is a valid
    # config (ranlux/ranmar run in-kernel via the lag-window kernels)
    SimConfig(**{**CFG, "rng_mode": "prngcl:ranmar", "engine": "pallas"})
    with pytest.raises(ValueError, match="unknown PRNGCL generator"):
        SimConfig(**{**CFG, "rng_mode": "prngcl:nope"})


def test_run_and_chunking_invariance():
    sim_a = Simulation(SimConfig(**CFG))
    obs_a = sim_a.run(6, measure_every=1)
    sim_b = Simulation(SimConfig(**CFG))
    rows = [sim_b.run(2, measure_every=1) for _ in range(3)]
    obs_b = np.concatenate(rows, axis=0)
    np.testing.assert_array_equal(obs_a, obs_b)
    np.testing.assert_array_equal(np.asarray(sim_a.u), np.asarray(sim_b.u))
    # physics sanity: SU(2) beta=2.4 plaquette from a cold start stays in
    # a broad physical band after a few sweeps
    assert 0.4 < obs_a[-1, 0] < 0.95


def test_checkpoint_resume_bit_exact(tmp_path):
    path = str(tmp_path / "state.npz")
    sim = Simulation(SimConfig(**CFG))
    sim.run(4, measure_every=0)
    sim.save(path)
    obs_tail = sim.run(4, measure_every=1)
    resumed = Simulation.load(path)
    obs_res = resumed.run(4, measure_every=1)
    np.testing.assert_array_equal(obs_tail, obs_res)
    np.testing.assert_array_equal(np.asarray(sim.u), np.asarray(resumed.u))


def test_checkpoint_without_stream_state_rejected(tmp_path):
    from qcdgpu_tpu.utils.checkpoint import save_state

    path = str(tmp_path / "bad.npz")
    cfg = SimConfig(**CFG)
    sim = Simulation(cfg)
    save_state(path, cfg, sim.u, 0)  # no rng_stream recorded
    with pytest.raises(ValueError, match="no PRNGCL stream state"):
        Simulation.load(path)


def test_hot_start_stream_deterministic():
    cfg = SimConfig(**{**CFG, "start": "hot"})
    u1 = np.asarray(Simulation(cfg).u)
    u2 = np.asarray(Simulation(cfg).u)
    np.testing.assert_array_equal(u1, u2)
    u3 = np.asarray(Simulation(cfg.replace(seed=12)).u)
    assert not np.array_equal(u1, u3)
    # links are SU(2) after the Gram-Schmidt projection
    sim = Simulation(cfg)
    assert sim.unitarity_defect() < 1e-5
    # the stream advanced during init: the first sweeps differ from a
    # cold-start run's (weak provenance check)
    sim.run(2, measure_every=0)


def test_metropolis_with_acceptance():
    cfg = SimConfig(**{
        **CFG, "algorithm": "metropolis", "n_hit": 1,
        "track_acceptance": True, "engine": "xla",
    })
    sim = Simulation(cfg)
    obs = sim.run(3, measure_every=1)
    acc = obs[:, list(sim.obs_names).index("acc_rate")]
    assert np.all(acc > 0.05) and np.all(acc <= 1.0)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_scan_chain_mesh_bit_identical():
    """Replica-sharded stream scans == vmap scans chain-for-chain: the
    chain mesh blocks the stacked stream state over "c" and replicates
    the shared 0-d counters (chain_specs + the _packed pre-placement)."""
    from qcdgpu_tpu.models.ensemble import BetaScan

    betas = [2.3, 2.35, 2.4, 2.45]
    cfg = SimConfig(**{**CFG, "rng_mode": "prngcl:ranlux1"})
    vm = BetaScan(cfg, betas=betas, chain_mesh=1)
    obs_vm = vm.run(4, measure_every=2)
    sh = BetaScan(cfg, betas=betas, chain_mesh=4)
    obs_sh = sh.run(4, measure_every=2)
    np.testing.assert_array_equal(np.asarray(vm.us), np.asarray(sh.us))
    np.testing.assert_allclose(obs_vm, obs_sh, rtol=0, atol=2e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_sharded_bit_identical():
    """Per-site streams depend only on their own state, so domain
    decomposition cannot change any draw: sharded == unsharded exactly."""
    from qcdgpu_tpu.parallel import mesh as pmesh

    cfg = SimConfig(**{**CFG, "dims": (4, 4, 4, 8)})
    sim_ref = Simulation(cfg)
    obs_ref = sim_ref.run(4, measure_every=2)

    cfg_sh = cfg.replace(mesh=(1, 1, 2, 2), engine="xla")
    sim_sh = Simulation(cfg_sh)
    obs_sh = sim_sh.run(4, measure_every=2)
    np.testing.assert_array_equal(
        np.asarray(sim_ref.u), np.asarray(sim_sh.u)
    )
    np.testing.assert_allclose(obs_ref, obs_sh, atol=1e-5)


@pytest.mark.parametrize("gen", ["xor128", "ranlux1", "ranmar"])
def test_scan_chain_matches_simulation(gen):
    """Each β-scan chain in stream mode is bit-identical to a standalone
    Simulation with the same per-chain seed schedule (seed + 1000*i) —
    the same contract the threefry scan pins in test_checkpoint_cli.
    ranlux1/ranmar additionally exercise the shared 0-d counter leaves
    (kept unbatched under the chain vmap so the luxury-skip cond keeps an
    unbatched predicate)."""
    from qcdgpu_tpu.models.ensemble import BetaScan

    betas = [2.3, 2.45]
    cfg = SimConfig(**{**CFG, "rng_mode": f"prngcl:{gen}"})
    scan = BetaScan(cfg, betas=betas)
    obs = scan.run(4, measure_every=2)  # [C, n_meas, n_obs]

    for i, b in enumerate(betas):
        cfg_i = cfg.replace(beta=b, seed=CFG["seed"] + 1000 * i)
        sim = Simulation(cfg_i)
        obs_i = sim.run(4, measure_every=2)
        # links bit-exact; observables only up to the vmapped reduction
        # order (same tolerance as the threefry chain-equivalence test)
        np.testing.assert_allclose(obs[i], obs_i, rtol=0, atol=2e-6)
        np.testing.assert_array_equal(np.asarray(scan.us[i]),
                                      np.asarray(sim.u))


def test_scan_hot_start_matches_simulation():
    """Hot starts in stream-mode scans draw from the per-chain streams
    through the vmapped stream_hot_start (shared-counter axes): each
    chain's start state must equal the standalone Simulation's."""
    from qcdgpu_tpu.models.ensemble import BetaScan

    cfg = SimConfig(**{**CFG, "start": "hot", "rng_mode": "prngcl:ranmar"})
    scan = BetaScan(cfg, betas=[2.3, 2.45])
    for i in range(2):
        sim = Simulation(cfg.replace(beta=[2.3, 2.45][i],
                                     seed=CFG["seed"] + 1000 * i))
        np.testing.assert_array_equal(np.asarray(scan.us[i]),
                                      np.asarray(sim.u))


def test_scan_checkpoint_resume_bit_exact(tmp_path):
    from qcdgpu_tpu.models.ensemble import BetaScan

    path = str(tmp_path / "scan.npz")
    scan = BetaScan(SimConfig(**CFG), betas=[2.3, 2.45])
    scan.run(4, measure_every=0)
    scan.save(path)
    obs_tail = scan.run(4, measure_every=2)
    resumed = BetaScan.load(path)
    obs_res = resumed.run(4, measure_every=2)
    np.testing.assert_array_equal(obs_tail, obs_res)
    np.testing.assert_array_equal(np.asarray(scan.us), np.asarray(resumed.us))


@pytest.mark.slow
@pytest.mark.parametrize("gen", ["ranlux3", "mrg32k3a"])
def test_plaquette_parity_vs_threefry(gen):
    """Physics-level RNG parity through the real framework path: the mean
    plaquette of a chain *driven by* a reference-family generator agrees
    with the production threefry chain within combined MC errors (the
    BASELINE config-4 requirement, here with the reference generator
    actually running the Markov chain rather than a numpy model of it)."""
    from qcdgpu_tpu.utils.stats import analyze_series

    dims, beta, therm, meas = (4, 4, 4, 4), 2.4, 150, 300
    base = dict(group=2, dims=dims, beta=beta, algorithm="heatbath",
                sweeps_therm=therm, sweeps=meas, meas_every=1)
    sim_s = Simulation(SimConfig(**base, seed=23, rng_mode=f"prngcl:{gen}"))
    sim_s.thermalize()
    st = analyze_series(sim_s.run()[:, 0])

    sim_t = Simulation(SimConfig(**base, seed=29))
    sim_t.thermalize()
    tf = analyze_series(sim_t.run()[:, 0])

    err = np.sqrt(st.err**2 + tf.err**2)
    assert abs(st.mean - tf.mean) < 4.0 * max(err, 1e-4), (gen, st, tf)
