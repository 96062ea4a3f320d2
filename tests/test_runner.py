"""Chunk-runner contract: packed entry points, chunking, warmup purity.

The runner (qcdgpu_tpu/runner.py) serves every engine; these tests pin
its host-visible semantics on the CPU XLA engine, where pack/unpack is
the identity:

- run() == pack -> run.packed() -> unpack (one code path);
- the observable series is independent of host-side chunking
  (MEAS_BLOCK_CHUNK splits, ckpt_every splits, remainder sweeps);
- Simulation.warmup() compiles without advancing the Markov chain.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qcdgpu_tpu import SimConfig, Simulation
from qcdgpu_tpu.ops import rng
from qcdgpu_tpu.sim import cold_start, make_chunk_runner

import qcdgpu_tpu.runner as runner_mod


def _cfg(**kw):
    base = dict(group=2, dims=(4, 4, 4, 4), beta=2.4, engine="xla", seed=11,
                reunit_every=0)
    base.update(kw)
    return SimConfig(**base)


def test_packed_equals_canonical():
    cfg = _cfg()
    run = make_chunk_runner(cfg)
    u = cold_start(cfg)
    key = rng.make_base_key(cfg.seed)
    u1, obs1 = run(u, key, 0, 6, 2)
    st, obs2 = run.packed(run.pack(u), key, 0, 6, 2)
    u2 = run.unpack(st)
    assert np.array_equal(np.asarray(u1), np.asarray(u2))
    assert np.array_equal(np.asarray(obs1), np.asarray(obs2))


def test_series_independent_of_chunking(monkeypatch):
    # shrink the measured-block buffer so the multi-call path is exercised
    monkeypatch.setattr(runner_mod, "MEAS_BLOCK_CHUNK", 2)
    cfg = _cfg()
    run_small = make_chunk_runner(cfg)
    u = cold_start(cfg)
    key = rng.make_base_key(cfg.seed)
    u_a, obs_a = run_small(u, key, 0, 7, 1)  # 7 blocks through a 2-buffer
    monkeypatch.setattr(runner_mod, "MEAS_BLOCK_CHUNK", 64)
    run_big = make_chunk_runner(cfg)
    u_b, obs_b = run_big(u, key, 0, 7, 1)
    assert obs_a.shape == (7, obs_b.shape[1])
    assert np.array_equal(np.asarray(obs_a), np.asarray(obs_b))
    assert np.array_equal(np.asarray(u_a), np.asarray(u_b))


def test_remainder_sweeps_run():
    # n_sweeps not a multiple of measure_every: remainder still advances
    cfg = _cfg()
    run = make_chunk_runner(cfg)
    u = cold_start(cfg)
    key = rng.make_base_key(cfg.seed)
    u_r, obs = run(u, key, 0, 5, 2)
    assert obs.shape[0] == 2
    u_f, _ = run(u, key, 0, 5, 0)
    assert np.array_equal(np.asarray(u_r), np.asarray(u_f))


def test_warmup_is_pure():
    cfg = _cfg(sweeps_therm=3, sweeps=4, meas_every=2)
    a = Simulation(cfg)
    a.warmup()
    assert a.sweep_idx == 0 and a.obs_history == []
    b = Simulation(cfg)
    obs_a = a.thermalize().run()
    obs_b = b.thermalize().run()
    assert np.array_equal(obs_a, obs_b)
    assert np.array_equal(np.asarray(a.u), np.asarray(b.u))


def test_sync_returns_finite():
    cfg = _cfg()
    sim = Simulation(cfg)
    v0 = sim.sync()            # canonical layout live
    sim.thermalize(2)
    v1 = sim.sync()            # packed layout live
    assert np.isfinite(v0) and np.isfinite(v1)
