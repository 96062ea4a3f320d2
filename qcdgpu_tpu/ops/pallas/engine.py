"""Pallas engine: split-float state layout, sweeps, and measurements.

The engine state is a 4-tuple of per-direction float32 arrays
``[N, N, 2, X, Y, Z*T]`` (re/im split — Mosaic has no complex support; Z*T
flattened onto the lane axis).  A sweep is 8+ fused stage kernels
(ops.pallas.update); observables come from the fused plaquette reduction
(ops.pallas.measure) plus the XLA Polyakov product on the reconstructed
complex field.  Conversions to/from the canonical complex layout happen
once per chunk, not per sweep.

Bit-compatibility: with rng_mode="threefry" the stage kernels consume the
exact same per-site uniforms as the XLA engine (ops.rng keyed by global
site index), so both engines sample identical Markov chains up to f32
rounding-order differences in the matrix arithmetic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...config import SimConfig
from .. import rng
from ..measure import OBS_NAMES, polyakov_from_ut
from . import measure as pmeasure
from . import update as pupdate
from .reunit import reunitarize_dir

NDIM = 4


# ---------------------------------------------------------------------------
# layout conversion
# ---------------------------------------------------------------------------


def split_links(u):
    """Complex [4, N, N, X, Y, Z, T] -> tuple of 4 f32 [N, N, 2, X, Y, Z*T]."""
    x, y, z, t = u.shape[3:]
    out = []
    for mu in range(NDIM):
        m = u[mu]
        s = jnp.stack([jnp.real(m), jnp.imag(m)], axis=2).astype(jnp.float32)
        out.append(s.reshape(s.shape[0], s.shape[1], 2, x, y, z * t))
    return tuple(out)


def join_links(us, dims):
    """Inverse of split_links."""
    x, y, z, t = dims
    mats = []
    for s in us:
        n = s.shape[0]
        s = s.reshape(n, n, 2, x, y, z, t)
        mats.append(s[:, :, 0] + 1j * s[:, :, 1])
    return jnp.stack(mats, axis=0).astype(jnp.complex64)


def join_dir(s, dims):
    """One direction back to complex [N, N, X, Y, Z, T]."""
    x, y, z, t = dims
    n = s.shape[0]
    s = s.reshape(n, n, 2, x, y, z, t)
    return (s[:, :, 0] + 1j * s[:, :, 1]).astype(jnp.complex64)


# ---------------------------------------------------------------------------
# sweep / measurement on split state
# ---------------------------------------------------------------------------


def make_pallas_sweep(cfg: SimConfig, interpret=False):
    """sweep(us, base_key, sweep_idx) -> us'.

    Stage order and RNG stage ids exactly mirror sim.make_sweep_fn so the
    two engines draw the same randomness.
    """
    dims = tuple(cfg.dims)
    kinds = [cfg.algorithm] + ["overrelax"] * cfg.n_or
    kw = dict(
        k_trials=cfg.kp_trials, n_hit=cfg.n_hit, metro_delta=cfg.metro_delta,
        rng_mode=cfg.rng_mode, interpret=interpret,
    )

    def sweep(us, base_key, sweep_idx):
        stage_id = 0
        for kind in kinds:
            for parity in (0, 1):
                for mu in range(NDIM):
                    key2 = rng.stage_key(base_key, sweep_idx, stage_id)
                    new_mu = pupdate.stage_update(
                        us, mu, parity, kind, cfg.beta, key2, dims, **kw
                    )
                    us = us[:mu] + (new_mu,) + us[mu + 1:]
                    stage_id += 1
        if cfg.reunit_every > 0:
            def do_reunit(us):
                return tuple(
                    reunitarize_dir(s, dims, interpret=interpret) for s in us
                )
            us = jax.lax.cond(
                (sweep_idx % cfg.reunit_every) == (cfg.reunit_every - 1),
                do_reunit, lambda x: x, us,
            )
        return us

    return sweep


def measure_all_split(us, dims, interpret=False):
    """Same observable vector as ops.measure.measure_all, from split state."""
    n = us[0].shape[0]
    vol = dims[0] * dims[1] * dims[2] * dims[3]
    sums = pmeasure.plane_sums(us, dims, interpret=interpret) / (n * vol)
    # PLANES order: (0,1),(0,2),(0,3),(1,2),(1,3),(2,3); temporal = nu==3
    plq_s = (sums[0] + sums[1] + sums[3]) / 3.0
    plq_t = (sums[2] + sums[4] + sums[5]) / 3.0
    plq = 0.5 * (plq_s + plq_t)
    ut = join_dir(us[3], dims)
    pre, pim = polyakov_from_ut(ut)
    action = 1.0 - plq
    return jnp.stack([
        jnp.float32(plq), jnp.float32(plq_s), jnp.float32(plq_t),
        jnp.float32(action), jnp.float32(pre), jnp.float32(pim),
    ])


def make_pallas_chunk_runner(cfg: SimConfig, interpret=False):
    """Pallas counterpart of sim.make_chunk_runner (same signature)."""
    sweep = make_pallas_sweep(cfg, interpret=interpret)
    dims = tuple(cfg.dims)

    @partial(jax.jit, static_argnums=(3, 4))
    def run(u, base_key, sweep0, n_sweeps, measure_every):
        us = split_links(u)

        def sweeps_only(us, first, count):
            def body(i, us):
                return sweep(us, base_key, first + i)
            return jax.lax.fori_loop(0, count, body, us)

        if not measure_every:
            us = sweeps_only(us, sweep0, n_sweeps)
            return join_links(us, dims), jnp.zeros((0, len(OBS_NAMES)),
                                                   jnp.float32)

        n_blocks = n_sweeps // measure_every
        rem = n_sweeps - n_blocks * measure_every

        def block(us, b):
            us = sweeps_only(us, sweep0 + b * measure_every, measure_every)
            return us, measure_all_split(us, dims, interpret=interpret)

        us, obs = jax.lax.scan(block, us, jnp.arange(n_blocks))
        if rem:
            us = sweeps_only(us, sweep0 + n_blocks * measure_every, rem)
        return join_links(us, dims), obs

    return run
