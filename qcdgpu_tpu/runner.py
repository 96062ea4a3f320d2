"""Generic chunk runner: compile-count-bounded sweep/measure loops.

Every engine (XLA, Pallas, sharded Pallas) drives its sweeps through
``build_chunk_runner``.  The external contract is

    run(u, base_key, sweep0, n_sweeps, measure_every) -> (u', obs)

with obs a ``[n_sweeps // measure_every, n_obs]`` float32 series.

Compilation strategy: a jitted program whose *sweep count is a traced
scalar* serves every unmeasured stretch, and a fixed-buffer measured
program (``MEAS_BLOCK_CHUNK`` measurement blocks max per call, block
count traced, rows stored by dynamic index) serves every measured
stretch — so one config compiles at most two programs per
measure_every value, independent of how many different run lengths the
host requests.  On a tunneled TPU, where a cold XLA compile of the full
sweep costs minutes, this is the difference between "thermalize(30)
recompiles" and "every run length reuses the same binary" — the role
QCDGPU's on-disk kernel binary cache played for its OpenCL programs
(SURVEY.md §2 "OpenCL wrapper").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .ops.measure import obs_names

# measurement blocks per compiled call: large enough to amortize one
# host->device dispatch over many sweeps, small enough that the row
# buffer stays trivial
MEAS_BLOCK_CHUNK = 64


def build_chunk_runner(cfg, sweep, measure_state, pack=None, unpack=None,
                       with_acc=False, n_obs=None, append_acc=None,
                       acc_init=None):
    """Build the chunk runner for one engine.

    sweep(state, key, sweep_idx) -> state'   (or (state', acc_rate) when
        with_acc — the Metropolis acceptance accumulator; acc_rate may be
        a vector, e.g. per-chain in the ensemble)
    measure_state(state) -> float32 measurement row (no acc column)
    pack / unpack: canonical complex link field <-> engine state
        (identity by default; the Pallas engines use split/join here, so
        conversions happen once per compiled call, not per sweep).
    n_obs: measurement-row width override (the ensemble runner flattens
        [n_chains, n_obs] rows into the buffer).
    append_acc(row, acc_rate) -> row': how the accumulated acceptance
        joins the measurement row (default: scalar appended at the end;
        the ensemble interleaves one acc column per chain).  The returned
        row must be n_obs wide.
    acc_init: zero accumulator matching the sweep's acc_rate shape
        (default 0-d; the ensemble passes zeros([n_chains]) — the
        fori_loop carry must keep one structure across iterations).
    """
    identity_layout = pack is None
    pack = pack or (lambda u: u)
    unpack = unpack or (lambda s: s)
    n_obs = len(obs_names(cfg)) if n_obs is None else int(n_obs)
    if append_acc is None:
        def append_acc(row, acc_rate):
            return jnp.concatenate(
                [row, acc_rate.reshape(1).astype(jnp.float32)]
            )
    if acc_init is None:
        acc_init = jnp.float32(0.0)
    # capture at build time: run_meas freezes the row-buffer size at first
    # trace, so reading the module global again at call time could hand
    # run_packed a LARGER block count than the cached buffer holds
    # (dynamic_update_slice would clamp and silently corrupt the series)
    meas_chunk = MEAS_BLOCK_CHUNK

    def sweeps_carry(carry, key, first, count):
        def body(i, carry):
            st, acc = carry
            r = sweep(st, key, first + i)
            if with_acc:
                st2, a = r
                return st2, acc + a
            return r, acc

        return jax.lax.fori_loop(0, count, body, carry)

    @jax.jit
    def run_nomeas(st, key, sweep0, n):
        st, _ = sweeps_carry((st, acc_init), key, sweep0, n)
        return st

    @partial(jax.jit, static_argnums=(4,))
    def run_meas(st, key, sweep0, n_blocks, me):
        buf = jnp.zeros((meas_chunk, n_obs), jnp.float32)

        def blk(b, carry):
            st, buf = carry
            st, acc = sweeps_carry(
                (st, acc_init), key, sweep0 + b * me, me
            )
            row = measure_state(st)
            if with_acc:
                row = append_acc(row, acc / me)
            return st, jax.lax.dynamic_update_slice(buf, row[None], (b, 0))

        st, buf = jax.lax.fori_loop(0, n_blocks, blk, (st, buf))
        return st, buf

    def run_packed(st, base_key, sweep0, n_sweeps, measure_every):
        """Drive sweeps on engine-layout state (no conversions)."""
        if not measure_every:
            if n_sweeps:
                st = run_nomeas(st, base_key, sweep0, n_sweeps)
            return st, jnp.zeros((0, n_obs), jnp.float32)
        me = int(measure_every)
        n_blocks = n_sweeps // me
        rows = []
        s0 = sweep0
        left = n_blocks
        while left > 0:
            nb = min(left, meas_chunk)
            st, buf = run_meas(st, base_key, s0, nb, me)
            rows.append(buf[:nb])
            left -= nb
            s0 += nb * me
        rem = n_sweeps - n_blocks * me
        if rem:
            st = run_nomeas(st, base_key, s0, rem)
        obs = (jnp.concatenate(rows, axis=0) if rows
               else jnp.zeros((0, n_obs), jnp.float32))
        return st, obs

    def run(u, base_key, sweep0, n_sweeps, measure_every):
        st, obs = run_packed(
            run.pack(u), base_key, sweep0, n_sweeps, measure_every
        )
        return run.unpack(st), obs

    # engine-layout entry points: the Simulation driver keeps state packed
    # across chunk calls (conversions only at checkpoint/one-off-measure
    # boundaries — QCDGPU likewise kept links device-resident between
    # kernel launches and read them back only to save state)
    run.packed = run_packed
    if identity_layout:
        run.pack = lambda u: u
        run.unpack = lambda st: st
    else:
        run.pack = jax.jit(pack)
        run.unpack = jax.jit(unpack)
    return run
