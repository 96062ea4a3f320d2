"""Ensemble (replica) axis: many independent Markov chains in one program.

QCDGPU runs one chain per process; a beta-scan (e.g. the finite-T
deconfinement scan, BASELINE config 3) is a shell loop.  On TPU the ensemble
is a free vmap axis over (links, beta, key): the 8 stage kernels batch
across chains, so a whole beta grid costs one kernel launch per stage
(SURVEY.md §2 "Ensemble / replica parallelism").
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..ops import rng
from ..ops.measure import make_measure_fn, measure_obs_names
from ..sim import cold_start, hot_start, make_sweep_fn


def make_ensemble_runner(cfg: SimConfig):
    """Runner over C chains with per-chain beta.

    Returns run(us [C, ...], betas [C], keys [C, 2], sweep0, n_sweeps,
    measure_every) -> (us', obs [C, n_meas, n_obs]).

    The per-chain beta must enter the sweep as a traced value, so the sweep
    function is built with beta baked out and passed through.  On TPU the
    fused Pallas stage kernels are used (beta rides the scalar-prefetch
    channel, so one compiled kernel serves the whole grid).
    """
    from ..sim import resolve_engine

    if resolve_engine(cfg) == "pallas":
        return _make_pallas_ensemble_runner(cfg)
    sweep = make_sweep_fn_beta(cfg)
    measure_fn = make_measure_fn(cfg)
    # ensemble rows carry the measurement vector only (no acc_rate column)
    n_obs = len(measure_obs_names(cfg))

    @partial(jax.jit, static_argnums=(4, 5))
    def run(us, betas, keys, sweep0, n_sweeps, measure_every):
        def one_chain(u, beta, key):
            def sweeps_only(u, first, count):
                return jax.lax.fori_loop(
                    0, count, lambda i, u: sweep(u, key, first + i, beta), u
                )

            if not measure_every:
                u = sweeps_only(u, sweep0, n_sweeps)
                return u, jnp.zeros((0, n_obs), jnp.float32)

            n_blocks = n_sweeps // measure_every
            rem = n_sweeps - n_blocks * measure_every

            def block(u, b):
                u = sweeps_only(u, sweep0 + b * measure_every, measure_every)
                return u, measure_fn(u)

            u, obs = jax.lax.scan(block, u, jnp.arange(n_blocks))
            if rem:
                u = sweeps_only(u, sweep0 + n_blocks * measure_every, rem)
            return u, obs

        return jax.vmap(one_chain)(us, betas, keys)

    return run


def make_sweep_fn_beta(cfg: SimConfig):
    """sim.make_sweep_fn's sweep already accepts a traced beta override."""
    return make_sweep_fn(cfg)


def _make_pallas_ensemble_runner(cfg: SimConfig, interpret=False):
    """Pallas ensemble runner: vmap over chains of the fused stage kernels
    (the batch axis becomes an extra grid dimension per kernel)."""
    from ..ops.pallas import engine as peng

    sweep = peng.make_pallas_sweep(cfg, interpret=interpret)
    dims = tuple(cfg.dims)
    n_obs = len(measure_obs_names(cfg))

    @partial(jax.jit, static_argnums=(4, 5))
    def run(us, betas, keys, sweep0, n_sweeps, measure_every):
        def one_chain(u, beta, key):
            s = peng.split_links(u)

            def sweeps_only(s, first, count):
                return jax.lax.fori_loop(
                    0, count, lambda i, s: sweep(s, key, first + i, beta), s
                )

            if not measure_every:
                s = sweeps_only(s, sweep0, n_sweeps)
                return (peng.join_links(s, dims),
                        jnp.zeros((0, n_obs), jnp.float32))

            n_blocks = n_sweeps // measure_every
            rem = n_sweeps - n_blocks * measure_every

            def block(s, b):
                s = sweeps_only(s, sweep0 + b * measure_every, measure_every)
                return s, peng.measure_all_split(s, dims, interpret=interpret,
                                                 cfg=cfg)

            s, obs = jax.lax.scan(block, s, jnp.arange(n_blocks))
            if rem:
                s = sweeps_only(s, sweep0 + n_blocks * measure_every, rem)
            return peng.join_links(s, dims), obs

        return jax.vmap(one_chain)(us, betas, keys)

    return run


class BetaScan:
    """Finite-T / coupling scan: one chain per beta on a shared lattice.

    The Polyakov-loop series across the beta grid locates the deconfinement
    transition (BASELINE config 3: 24^3 x 6 across a beta grid).
    """

    def __init__(self, cfg: SimConfig, betas):
        self.cfg = cfg
        self.betas = jnp.asarray(np.asarray(betas, np.float32))
        c = len(betas)
        keys = [rng.make_base_key(cfg.seed + 1000 * i) for i in range(c)]
        self.keys = jnp.stack(keys)
        if cfg.start == "hot":
            us = [hot_start(cfg, self.keys[i]) for i in range(c)]
            self.us = jnp.stack(us)
        else:
            u0 = cold_start(cfg)
            self.us = jnp.broadcast_to(u0, (c,) + u0.shape)
        self._run = make_ensemble_runner(cfg)
        self.sweep_idx = 0

    def thermalize(self, n=None):
        n = self.cfg.sweeps_therm if n is None else n
        self.us, _ = self._run(self.us, self.betas, self.keys, self.sweep_idx, n, 0)
        self.sweep_idx += n
        return self

    def run(self, n=None, measure_every=1):
        n = self.cfg.sweeps if n is None else n
        self.us, obs = self._run(
            self.us, self.betas, self.keys, self.sweep_idx, n, measure_every
        )
        self.sweep_idx += n
        return np.asarray(obs)  # [C, n_meas, n_obs]

    # -- checkpoint (whole-ensemble state; same exactness guarantee as
    #    Simulation.save — counter RNG means (keys, sweep_idx) is the full
    #    PRNG state) ------------------------------------------------------
    def save(self, path: str):
        import json

        from ..utils.checkpoint import FORMAT_VERSION, links_to_host

        np.savez_compressed(
            path,
            version=np.int64(FORMAT_VERSION),
            kind=np.bytes_(b"betascan"),
            config_json=np.bytes_(
                json.dumps(self.cfg.to_dict()).encode()
            ),
            betas=np.asarray(self.betas, np.float32),
            keys=np.asarray(self.keys, np.uint32),
            us_ri=links_to_host(self.us),
            sweep_idx=np.int64(self.sweep_idx),
        )

    @classmethod
    def load(cls, path: str) -> "BetaScan":
        import json

        import jax.numpy as jnp

        from ..config import SimConfig
        from ..utils.checkpoint import FORMAT_VERSION, links_from_host

        with np.load(path, allow_pickle=False) as z:
            if int(z["version"]) != FORMAT_VERSION:
                raise ValueError(f"unsupported version {int(z['version'])}")
            if bytes(z["kind"]) != b"betascan":
                raise ValueError("not a BetaScan checkpoint")
            cfg = SimConfig.from_dict(
                json.loads(bytes(z["config_json"]).decode())
            )
            betas = z["betas"]
            keys = jnp.asarray(z["keys"])
            cdtype = (jnp.complex128 if cfg.dtype == "complex128"
                      else jnp.complex64)
            us = links_from_host(z["us_ri"], cdtype)
            sweep_idx = int(z["sweep_idx"])
        scan = cls(cfg, betas)
        scan.keys = keys
        scan.us = us
        scan.sweep_idx = sweep_idx
        return scan
