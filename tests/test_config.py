"""SimConfig validation: invalid combinations fail at construction with a
clear message, not deep inside an engine trace (QCDGPU's compile-time
#define errors surfaced at kernel build; ours surface at config build)."""

import pytest

from qcdgpu_tpu import SimConfig


def test_n_or_range():
    SimConfig(n_or=7)  # 8 * (1 + 7) = 64 stages fits the key namespace
    with pytest.raises(ValueError, match="n_or"):
        SimConfig(n_or=8)
    with pytest.raises(ValueError, match="n_or"):
        SimConfig(n_or=-1)


def test_mesh_must_be_4_tuple():
    with pytest.raises(ValueError, match="mesh"):
        SimConfig(mesh=(2, 2))


def test_pallas_accepts_double_measurement():
    # on the Pallas engine "double" means the Kahan-compensated f32
    # reductions (TPU has no f64) — a valid config, not an error
    SimConfig(engine="pallas", meas_dtype="double")


def test_auto_engine_routes_double_measurement_to_xla_off_tpu():
    # off-TPU the true complex128 path exists (x64 on CPU) and wins;
    # conftest forces the CPU platform, so 'auto' must resolve to XLA here
    from qcdgpu_tpu.sim import resolve_engine

    assert resolve_engine(SimConfig(meas_dtype="double")) == "xla"


def test_pallas_rejects_zt_mesh_for_every_rng_mode():
    # engine-wide constraint: the fused sharded kernels split X/Y only —
    # the same invalid mesh must fail at construction for every rng_mode,
    # not just the PRNGCL-stream branch
    for rng_mode in ("threefry", "hw", "prngcl:xor128"):
        with pytest.raises(ValueError, match="X/Y"):
            SimConfig(engine="pallas", dims=(8, 8, 8, 8),
                      mesh=(1, 1, 2, 1), rng_mode=rng_mode)


def test_dims_divisible_by_mesh_checkerboard():
    with pytest.raises(ValueError, match="even per mesh shard"):
        SimConfig(dims=(4, 4, 4, 4), mesh=(4, 1, 1, 1))


def test_xla_engine_rejects_hw_rng():
    # the XLA path always draws threefry; silently downgrading would
    # misreport the run's rng_mode provenance
    with pytest.raises(ValueError, match="rng_mode"):
        SimConfig(engine="xla", rng_mode="hw")


def test_auto_engine_hw_rng_on_cpu_warns():
    # engine='auto' off-TPU resolves to XLA: the requested hardware PRNG
    # does not exist there, so the runner must say so out loud
    from qcdgpu_tpu.sim import make_chunk_runner

    with pytest.warns(UserWarning, match="threefry"):
        make_chunk_runner(SimConfig(dims=(4, 4, 4, 4), rng_mode="hw"))


def test_auto_engine_zt_mesh_on_tpu_warns():
    # a Z/T-split mesh is valid but demotes an auto-engine TPU run to the
    # XLA engine (~200x slower); that must be loud.  The helper takes the
    # platform explicitly so the TPU branch is testable on the CPU suite.
    from qcdgpu_tpu.sim import _maybe_warn_zt_mesh_fallback

    cfg = SimConfig(dims=(8, 8, 8, 8), mesh=(1, 1, 2, 1))
    with pytest.warns(UserWarning, match="X/Y-only"):
        _maybe_warn_zt_mesh_fallback(cfg, "tpu")
    # X/Y meshes and CPU platforms stay quiet
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        _maybe_warn_zt_mesh_fallback(
            SimConfig(dims=(8, 8, 8, 8), mesh=(2, 1, 1, 1)), "tpu")
        _maybe_warn_zt_mesh_fallback(cfg, "cpu")


def test_continue_start_requires_checkpoint():
    from qcdgpu_tpu.sim import Simulation

    with pytest.raises(ValueError, match="continue"):
        Simulation(SimConfig(dims=(4, 4, 4, 4), start="continue"))


def test_ensemble_accepts_track_acceptance():
    """Ensembles track Metropolis acceptance per chain (the acc_rate
    column obs_names advertises) — the old rejection is gone; the runner
    must build and advertise the widened row."""
    from qcdgpu_tpu.models.ensemble import make_ensemble_runner
    from qcdgpu_tpu.ops.measure import obs_names

    cfg = SimConfig(dims=(4, 4, 4, 4), algorithm="metropolis",
                    track_acceptance=True)
    assert "acc_rate" in obs_names(cfg)
    make_ensemble_runner(cfg, 2)


def test_cli_mesh_parser_requires_four_axes():
    import argparse

    from qcdgpu_tpu.cli import _parse_mesh

    assert _parse_mesh("2,1,1,1") == (2, 1, 1, 1)
    with pytest.raises(argparse.ArgumentTypeError, match="mesh"):
        _parse_mesh("2")


def test_simulation_places_links_on_mesh():
    # library-level domain decomposition: Simulation itself must shard the
    # links over cfg.mesh (previously only the CLI did)
    import jax

    from qcdgpu_tpu.sim import Simulation

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    sim = Simulation(SimConfig(dims=(8, 8, 8, 8), mesh=(2, 1, 1, 1),
                               engine="xla"))
    assert len(sim.u.sharding.device_set) == 2
