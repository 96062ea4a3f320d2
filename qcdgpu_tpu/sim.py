"""Simulation orchestrator — the TPU counterpart of QCDGPU's model_CL::model.

The whole Markov step is one pure function

    (links, base_key, sweep_idx) -> links'

jit-compiled once; a chunk of sweeps runs on-device under lax.fori_loop with
fused measurements, so the host only sees (links, obs_series) at chunk
boundaries (SURVEY.md §3.2 hot loop, rebuilt functionally per §7).

Checkerboard structure: links of one parity are conditionally independent
given the other parity (SURVEY.md §2 "Parallelism strategies"), so a sweep is
8 dense stages (2 parities x 4 directions), each stage a masked update of an
entire direction field.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .config import SimConfig
from .ops import rng, sun
from .parallel.mesh import is_lattice_sharded
from .ops.lattice import NDIM, parity_mask, site_index
from .ops.measure import make_measure_fn, measure_obs_names, obs_names
from .ops.prng_streams import (
    make_stream,
    make_stream_state_host,
    open01,
    stream_draw_fn,
    stream_mode_name,
)
from .ops.samplers import stage_uniform_count, update_links
from .ops.staples import staple_sum

# stage-id namespace (folded into the per-stage RNG key; keep disjoint)
_STAGE_INIT = 0xF0  # hot-start initialization
_STAGES_PER_SWEEP = 64  # generous upper bound: update+OR stages per sweep


def _cdtype(cfg: SimConfig):
    return jnp.complex128 if cfg.dtype == "complex128" else jnp.complex64


# ---------------------------------------------------------------------------
# initial configurations
# ---------------------------------------------------------------------------


def cold_start(cfg: SimConfig):
    """Unit links (ordered start)."""
    n = cfg.group
    return sun.identity(n, (NDIM,) + tuple(cfg.dims), _cdtype(cfg)).transpose(
        2, 0, 1, 3, 4, 5, 6
    )


def hot_start(cfg: SimConfig, base_key):
    """Disordered start: per-link EXACTLY Haar-random SU(N).

    Gaussian complex (Ginibre) matrix -> sun.reunitarize (Gram–Schmidt on
    the rows; SU(3) third row by conjugate cross product, SU(2) quaternion
    projection).  This is exact Haar, not merely disordered: the Ginibre
    distribution is invariant under right multiplication by any fixed
    V in SU(N), and every projection step is equivariant (GS with
    real-positive normalizers commutes with gV; (aV) x (bV) =
    (a x b) conj(V) for det V = 1; the quaternion components of a 2x2
    Ginibre matrix form an isotropic Gaussian on R^4, so normalizing is
    uniform on S^3 = SU(2)).  The pushforward measure is therefore
    right-invariant, and the invariant probability measure on SU(N) is
    unique — Haar.  Validated against the Haar character identities
    E[tr U] = 0, E[|tr U|^2] = 1, E[(tr U)^2] = 0 (SU(3)), E[|tr U|^4] = 2
    in tests/test_hotstart.py.  (Matches the role of QCDGPU's hot init
    kernel, which used per-element uniforms and was itself not Haar.)
    """
    n = cfg.group
    cdtype = _cdtype(cfg)
    key2 = rng.stage_key(base_key, 0, _STAGE_INIT)
    sidx = site_index(cfg.dims)
    links = []
    for mu in range(NDIM):
        kmu = rng.stage_key(key2, mu, _STAGE_INIT + 1)
        z = rng.site_normals(kmu, sidx, 2 * n * n, slot0=0)
        re = z[: 2 * n * n : 2].reshape((n, n) + tuple(cfg.dims))
        im = z[1 : 2 * n * n : 2].reshape((n, n) + tuple(cfg.dims))
        m = (re + 1j * im).astype(cdtype)
        links.append(sun.reunitarize(m))
    return jnp.stack(links, axis=0)


def stream_hot_start(cfg: SimConfig, draw, rng_state):
    """Hot start drawn from a PRNGCL stream (rng_mode='prngcl:<gen>').

    QCDGPU's hot init kernel consumes the run's selected PRNG, so the whole
    chain — init included — has one randomness provenance; this returns the
    advanced stream state along with the links so the first sweep continues
    the same streams."""
    n = cfg.group
    cdtype = _cdtype(cfg)
    links = []
    rst = rng_state
    for mu in range(NDIM):
        uu, rst = draw(rst, 2 * n * n)
        uu = open01(uu)  # Box–Muller log() needs u > 0
        z = rng.normals_from_uniforms(uu)
        re = z[: n * n].reshape((n, n) + tuple(cfg.dims))
        im = z[n * n :].reshape((n, n) + tuple(cfg.dims))
        links.append(sun.reunitarize((re + 1j * im).astype(cdtype)))
    return jnp.stack(links, axis=0), rst


# ---------------------------------------------------------------------------
# sweep construction
# ---------------------------------------------------------------------------


def make_sweep_fn(cfg: SimConfig, with_acc: bool = False):
    """Build sweep(u, base_key, sweep_idx) -> u' for the configured algorithm.

    One sweep = one update pass (heat-bath or Metropolis) + cfg.n_or
    overrelaxation passes + conditional reunitarization.

    with_acc: the sweep returns (u', acc_rate) where acc_rate is the
    tracked per-sweep statistic — the mean Metropolis acceptance
    (cfg.track_acceptance; QCDGPU's acceptance-rate report) or the mean
    KP trial-exhaustion fraction (cfg.track_kp_exhaust); the two are
    mutually exclusive by algorithm.  See samplers.update_links.

    With rng_mode='prngcl:<gen>' the sweep state is (u, rng_state): each
    update stage consumes pre-drawn uniforms from the per-site PRNGCL
    streams (ops/prng_streams.py) instead of keyed threefry, and the
    advanced stream state rides the carry — QCDGPU's stateful
    PRNG::produce -> update kernel cycle (SURVEY.md §3.2-3.3), made
    functional.
    """
    dims = tuple(cfg.dims)
    kinds = [cfg.algorithm] + ["overrelax"] * cfg.n_or
    stream_gen = stream_mode_name(cfg.rng_mode)
    track_kind = "heatbath" if cfg.track_kp_exhaust else "metropolis"

    def stage(u, randomness, parity, mu, kind, beta=None):
        # randomness: the per-stage threefry key2, or the pre-drawn
        # uniforms block in PRNGCL stream mode
        a = staple_sum(u, mu)
        track = with_acc and kind == track_kind
        kw = dict(
            k_trials=cfg.kp_trials,
            n_hit=cfg.n_hit,
            metro_delta=cfg.metro_delta,
            return_acc=track,
        )
        b = cfg.beta if beta is None else beta
        if stream_gen is None:
            new = update_links(
                u[mu], a, kind, b, randomness, site_index(dims), **kw
            )
        else:
            new = update_links(
                u[mu], a, kind, b, None, None, uniforms=randomness, **kw
            )
        acc = None
        if track:
            new, acc = new
        mask = parity_mask(dims, parity)
        return u.at[mu].set(jnp.where(mask, new, u[mu])), acc

    def finish(u, sweep_idx):
        if cfg.reunit_every > 0:
            u = jax.lax.cond(
                (sweep_idx % cfg.reunit_every) == (cfg.reunit_every - 1),
                lambda x: jnp.stack([sun.reunitarize(x[m]) for m in range(NDIM)]),
                lambda x: x,
                u,
            )
        return u

    def sweep(u, base_key, sweep_idx, beta=None):
        # beta=None uses the static cfg.beta; an array beta supports the
        # vmapped ensemble/beta-scan axis (models/ensemble.py).
        stage_id = 0
        acc_sum = 0.0
        acc_n = 0
        for kind in kinds:
            for parity in (0, 1):
                for mu in range(NDIM):
                    key2 = rng.stage_key(base_key, sweep_idx, stage_id)
                    u, acc = stage(u, key2, parity, mu, kind, beta)
                    if acc is not None:
                        acc_sum = acc_sum + acc
                        acc_n += 1
                    stage_id += 1
        assert stage_id <= _STAGES_PER_SWEEP
        u = finish(u, sweep_idx)
        if with_acc:
            return u, acc_sum / max(acc_n, 1)
        return u

    if stream_gen is None:
        return sweep

    draw = stream_draw_fn(stream_gen)
    n_upd = stage_uniform_count(
        cfg.group, cfg.algorithm, cfg.kp_trials, cfg.n_hit
    )

    def stream_sweep(state, base_key, sweep_idx, beta=None):
        u, rst = state
        acc_sum = 0.0
        acc_n = 0
        for kind in kinds:
            for parity in (0, 1):
                for mu in range(NDIM):
                    if kind == "overrelax":
                        uu = None
                    else:
                        uu, rst = draw(rst, n_upd)
                        uu = open01(uu)
                    u, acc = stage(u, uu, parity, mu, kind, beta)
                    if acc is not None:
                        acc_sum = acc_sum + acc
                        acc_n += 1
        u = finish(u, sweep_idx)
        if with_acc:
            return (u, rst), acc_sum / max(acc_n, 1)
        return u, rst

    return stream_sweep


def resolve_engine(cfg: SimConfig) -> str:
    """Pick the execution engine for this config on this backend.

    The fused Pallas engine (ops/pallas/) runs single-device float32 on
    TPU; everything else (CPU tests, float64, SPMD multi-device meshes)
    uses the XLA reference engine.
    """
    if cfg.engine != "auto":
        return cfg.engine
    stream_gen = stream_mode_name(cfg.rng_mode)
    if stream_gen is not None:
        from .ops.prng_streams import PALLAS_STREAM_GENERATORS

        # every PRNGCL generator runs in-kernel on the fused engine
        # (counter-free ones as statically-unrolled in-kernel steps; ranlux/ranmar as
        # ref-based lag windows with scalar-channel counters — see
        # prng_streams REF_STREAM_GENERATORS), sharded or not: streams
        # are site-local, so X/Y meshes shard them like the links and
        # the general mesh logic below applies unchanged
        if stream_gen not in PALLAS_STREAM_GENERATORS:
            return "xla"
    if cfg.dtype != "complex64":
        return "xla"
    try:
        devs = jax.devices()
        plat = devs[0].platform
    except Exception:
        return "xla"
    on_tpu = plat in ("tpu", "axon")
    if getattr(cfg, "meas_dtype", "same") == "double" and not on_tpu:
        # double-precision measurement sums (QCDGPU's PRECISION=mixed):
        # true complex128 evaluation lives in make_measure_fn on the XLA
        # path, which needs x64 — CPU only.  TPU has no f64 at all, so
        # there "double" means the Pallas engine's Kahan-compensated f32
        # reductions (ops/pallas/measure.py) — the highest-precision
        # measurement sum the hardware admits — and the config proceeds
        # to the fused engine below.
        return "xla"
    n_mesh = int(np.prod(cfg.mesh))
    if n_mesh != 1:
        # multi-device: the fused X/Y-sharded Pallas engine when the mesh
        # splits only the X and/or Y axes on TPU (ops/pallas/sharded.py);
        # otherwise the XLA engine, whose SPMD partitioner turns rolls into
        # halo exchanges for arbitrary 4D meshes (Z/T live on the packed
        # lane axis, where Mosaic halo slicing has no efficient form).
        xy_only = cfg.mesh[2] == 1 and cfg.mesh[3] == 1
        if on_tpu and xy_only and len(devs) >= n_mesh:
            return "pallas"
        return "xla"
    return "pallas" if on_tpu else "xla"


def _maybe_warn_zt_mesh_fallback(cfg: SimConfig, platform: str) -> None:
    """Warn when a Z/T-split mesh demotes an auto-engine TPU run to XLA.

    The fused Pallas engine shards along X/Y only (Z and T live on its
    packed lane axis, ops/pallas/sharded.py) — such meshes land on the XLA
    engine at ~200x lower throughput.  Loud, not silent (the last of the
    slow-fallback triggers after the round-2 Pallas coverage work).
    """
    if (cfg.engine == "auto" and platform in ("tpu", "axon")
            and int(np.prod(cfg.mesh)) != 1
            and (cfg.mesh[2] != 1 or cfg.mesh[3] != 1)):
        import warnings

        warnings.warn(
            f"mesh {cfg.mesh} splits the Z and/or T axis, which the "
            "fused Pallas engine cannot shard; running on the XLA "
            "engine (orders of magnitude slower). Prefer an X/Y-only "
            "mesh, e.g. parallel.mesh.default_mesh_shape(n).",
            stacklevel=3,
        )


def make_chunk_runner(cfg: SimConfig):
    """jit-ed runner: n_sweeps on-device, measuring every measure_every-th.

    Returns run(u, base_key, sweep0, n_sweeps, measure_every) ->
    (u', obs [n_sweeps // measure_every, len(OBS_NAMES)]).

    Dispatches to the fused Pallas engine on TPU (resolve_engine).
    """
    if resolve_engine(cfg) == "pallas":
        if int(np.prod(cfg.mesh)) != 1:
            from .ops.pallas.sharded import make_sharded_chunk_runner
            from .parallel.mesh import make_mesh

            return make_sharded_chunk_runner(cfg, make_mesh(cfg.mesh))
        from .ops.pallas.engine import make_pallas_chunk_runner

        return make_pallas_chunk_runner(cfg)
    if cfg.rng_mode == "hw":
        # engine='auto' resolved to XLA (CPU backend, float64, Z/T mesh,
        # ...) — the XLA path has no hardware-PRNG
        # mode, so the run draws threefry streams instead of silently
        # misreporting rng_mode='hw' provenance
        import warnings

        warnings.warn(
            "rng_mode='hw' requested but the run resolved to the XLA "
            "engine, which always draws threefry streams; results are "
            "produced with rng_mode='threefry'",
            stacklevel=2,
        )
    try:
        _plat = jax.devices()[0].platform
    except Exception:
        _plat = "cpu"
    _maybe_warn_zt_mesh_fallback(cfg, _plat)
    from .runner import build_chunk_runner

    track = cfg.track_acceptance or cfg.track_kp_exhaust
    sweep = make_sweep_fn(cfg, with_acc=track)
    meas = make_measure_fn(cfg)
    stream_gen = stream_mode_name(cfg.rng_mode)
    if stream_gen is not None:
        # stream mode: runner state is (u, rng_state); the Simulation
        # driver owns the rng_state across pack/unpack boundaries.  The
        # initial state is exposed as a thunk, not an array: building it
        # eagerly would pin a second copy in HBM for the runner lifetime
        # (ranmar at 32^4: ~400 MB) and the checkpoint-load path
        # overwrites it without ever reading it.
        run = build_chunk_runner(
            cfg, sweep, lambda st: meas(st[0]), with_acc=track
        )
        run.make_stream_state0 = lambda: make_stream(
            stream_gen, cfg.seed, cfg.dims
        )[0]
        run.stream_draw = stream_draw_fn(stream_gen)
        run.stream_hot_start = lambda: jax.jit(
            partial(stream_hot_start, cfg, run.stream_draw)
        )(run.make_stream_state0())
        run.stream_state_keys = frozenset(
            make_stream_state_host(stream_gen, 0, (2, 2, 2, 2))
        )
        return run
    return build_chunk_runner(
        cfg, sweep, meas, with_acc=track
    )


# ---------------------------------------------------------------------------
# Simulation driver (host-side thin loop)
# ---------------------------------------------------------------------------


def _validate_stream_keys(run, have: set) -> None:
    """Refuse to resume a PRNGCL checkpoint whose stream-state layout does
    not match the resolved engine's (XLA dense vs Pallas packed states are
    different randomness provenances — adopting the wrong one would
    silently change the chain)."""
    want = getattr(run, "stream_state_keys", None)
    if want is not None and have != set(want):
        raise ValueError(
            "PRNGCL stream-state layout mismatch: checkpoint has "
            f"{sorted(have)} but the resolved engine expects "
            f"{sorted(want)} — resume with the same engine "
            "(XLA dense vs Pallas packed states are different "
            "randomness provenances)"
        )


class Simulation:
    """Owns (links, base_key, sweep counter) and drives jit-ed chunks.

    Mirrors the public surface of QCDGPU's model class: lattice_init /
    lattice_simulate / lattice_measure / lattice_analysis / save / load
    (SURVEY.md §1 L4), with functional state underneath.
    """

    def __init__(self, cfg: SimConfig, init_u=None, init_us=None,
                 _stream_rst=None):
        self.cfg = cfg
        self.base_key = rng.make_base_key(cfg.seed)
        self._run = make_chunk_runner(cfg)
        self._measure_jit = jax.jit(make_measure_fn(cfg))
        self._sync_jit = None
        self._defect_jit = None
        self._u = None       # canonical complex link field (lazy)
        self._us = None      # engine-layout state (lazy)
        # PRNGCL stream mode: _stream is the lazy state-0 builder (None
        # for counter-based threefry/hw, whose "state" is (seed,
        # sweep_idx)); _rst holds the live per-site generator state
        self._stream = getattr(self._run, "make_stream_state0", None)
        self._rst = None
        self.sweep_idx = 0
        self.obs_history: list[np.ndarray] = []
        # start states are built under jit: eager op-by-op dispatch of the
        # constructor chains is UNIMPLEMENTED on some TPU runtimes (the
        # axon tunnel rejects eager host-scalar transfers mid-chain) and
        # is one compiled program instead of dozens of dispatches anyway
        if init_u is not None:
            self.u = init_u
        elif init_us is not None:
            # engine-layout (packed) state, e.g. from a packed checkpoint
            # — adopt it directly when the resolved engine runs that
            # layout (the 64^4-class path: the canonical field never
            # materializes), else reconstruct the canonical field once
            if self._stream is not None and _stream_rst is not None:
                # packed STREAM checkpoint (links + per-site generator
                # state in the kernel layout): validate the layout against
                # the resolved engine before adopting — a dense-layout
                # engine must refuse, not silently reseed
                _validate_stream_keys(self._run, set(_stream_rst))
                self._rst = {k: jnp.asarray(v)
                             for k, v in _stream_rst.items()}
                self._us = (tuple(jnp.asarray(a) for a in init_us),
                            self._rst)
            elif (self._stream is None
                    and hasattr(self._run, "packed_cold_start")):
                self._us = tuple(jnp.asarray(a) for a in init_us)
            else:
                from .ops.pallas.engine import join_links

                dims = tuple(cfg.dims)
                self.u = jax.jit(
                    lambda t: join_links(t, dims)
                )(tuple(jnp.asarray(a) for a in init_us))
        elif cfg.start == "hot":
            if self._stream is not None:
                if hasattr(self._run, "packed_stream_hot_start"):
                    # packed-direct (links bit-identical to the dense
                    # path): the canonical field never materializes, and
                    # the sharded stream runner's out_shardings place
                    # links AND generator state straight onto the mesh
                    us, self._rst = self._run.packed_stream_hot_start()
                    self._us = (us, self._rst)
                else:
                    # runner-owned: the XLA stream runner hot-starts in
                    # the dense layout
                    u0, self._rst = self._run.stream_hot_start()
                    self.u = u0
            elif hasattr(self._run, "packed_hot_start"):
                # engine-layout direct (bit-identical: threefry site keys
                # are layout-invariant); the canonical complex field never
                # materializes — at SU(3) 64^4 it wouldn't fit in HBM
                self._us = self._run.packed_hot_start(self.base_key)
            else:
                self.u = jax.jit(partial(hot_start, cfg))(self.base_key)
        elif cfg.start == "continue":
            raise ValueError(
                "start='continue' resumes a checkpoint: use "
                "Simulation.load(path) (CLI: `resume`) or pass init_u"
            )
        else:  # "cold"
            if self._stream is None and hasattr(self._run,
                                                "packed_cold_start"):
                self._us = self._run.packed_cold_start()
            else:
                self.u = jax.jit(partial(cold_start, cfg))()
        if is_lattice_sharded(cfg) and self._us is None:
            # place the links onto the domain-decomposition mesh here (not
            # in the CLI) so library users get a genuinely multi-device XLA
            # program too; the Pallas sharded runner re-packs under
            # shard_map either way, and re-placing an already-placed field
            # is a no-op.  Packed-direct starts (self._us set) skip this:
            # the sharded runner's out_shardings already placed them, and
            # touching self.u would materialize the canonical field the
            # packed path exists to avoid.
            from .parallel.mesh import make_mesh, shard_links

            self.u = shard_links(self.u, make_mesh(cfg.mesh))

    # -- state layouts ----------------------------------------------------
    # The engine-layout state stays device-resident across chunk calls;
    # the canonical complex field is materialized only when something on
    # the host boundary needs it (checkpoint, one-off measurement,
    # resharding).  QCDGPU kept links in device buffers between kernel
    # launches the same way, reading back only to save state.
    @property
    def u(self):
        if self._u is None:
            st = self._us if self._stream is None else self._us[0]
            self._u = self._run.unpack(st)
        return self._u

    @u.setter
    def u(self, value):
        self._u = value
        self._us = None

    @property
    def _stream_state(self):
        """Live PRNGCL stream state; built lazily on first use so the
        checkpoint-load path (which assigns the saved state) never pays
        the host-side generator init."""
        if self._rst is None:
            self._rst = self._stream()
        return self._rst

    @property
    def _packed(self):
        if self._us is None:
            st = self._run.pack(self._u)
            if self._stream is not None:
                st = (st, self._stream_state)
            self._us = st
        return self._us

    def _adopt(self, st):
        """Take ownership of engine state returned by a chunk run."""
        self._us, self._u = st, None
        if self._stream is not None:
            self._rst = st[1]

    # -- simulation -------------------------------------------------------
    def sync(self) -> float:
        """Block until all queued device work on the links has finished.

        jax.block_until_ready is unreliable on the tunneled TPU backend;
        fetching a jitted scalar reduction (real part only — complex
        device->host transfer is unimplemented there) is the portable
        barrier.  Returns the fetched scalar so callers can't be DCE'd.
        """
        if self._sync_jit is None:
            self._sync_jit = jax.jit(
                lambda st: sum(
                    jnp.sum(jnp.real(x)).astype(jnp.float32)
                    for x in jax.tree_util.tree_leaves(st)
                )
            )
        # sync on whichever layout is live (avoid forcing a conversion)
        st = self._us if self._us is not None else self._u
        return float(jax.device_get(self._sync_jit(st)))

    def warmup(self):
        """Compile AND first-execute every program thermalize()/run() will
        use, without advancing the chain: state is functional, so running
        the chunk runner on the current links and discarding the result
        has no side effects.  Executing (not just compiling — one sweep
        plus one measured block) matters: the first execution of a program
        carries one-time device/transfer overheads that would otherwise
        contaminate the first timed phase.  Afterwards, wall-clock timings
        measure steady-state execution — the role QCDGPU's on-disk binary
        cache + cl_event times played."""
        me = self.cfg.meas_every
        st = self._packed
        self._run.packed(st, self.base_key, self.sweep_idx, 1, 0)
        if me:
            self._run.packed(st, self.base_key, self.sweep_idx, me, me)
        self.sync()
        return self

    def thermalize(self, n: Optional[int] = None):
        n = self.cfg.sweeps_therm if n is None else n
        if n <= 0:
            return self
        st, _ = self._run.packed(
            self._packed, self.base_key, self.sweep_idx, n, 0
        )
        self._adopt(st)
        self.sweep_idx += n
        return self

    def run(self, n: Optional[int] = None, measure_every: Optional[int] = None,
            ckpt_path: Optional[str] = None, progress_every: int = 0,
            progress=None):
        """Production sweeps; returns the observable series [n_meas, n_obs].

        With ckpt_path and cfg.ckpt_every > 0, the full state is dumped
        every ckpt_every sweeps (QCDGPU's periodic state save), so a long
        run is resumable after an interruption.

        progress(sweeps_done, n, last_obs_row_or_None) is called after
        every progress_every sweeps (QCDGPU prints per-ITER progress to
        stdout; chunking is free — sweep counts are traced, so no
        recompile, see runner.py).
        """
        n = self.cfg.sweeps if n is None else n
        me = self.cfg.meas_every if measure_every is None else measure_every
        every = self.cfg.ckpt_every if ckpt_path else 0
        if every and me:
            # checkpoint chunk boundaries must land on measurement-block
            # boundaries too: the config-level ckpt_every % meas_every
            # check only covers the default cadence, and a run() override
            # with me > ckpt_every would otherwise chunk into blocks that
            # measure nothing (series silently empty)
            every = -(-every // me) * me
        if progress_every and me:
            # chunk boundaries must land on measurement-block boundaries
            # or the series would depend on the progress cadence (same
            # rule config enforces for ckpt_every)
            progress_every = -(-progress_every // me) * me
        rows = []
        done = 0
        while done < n:
            step = n - done
            if every:
                step = min(step, every - done % every)
            if progress_every:
                step = min(step, progress_every - done % progress_every)
            st, obs = self._run.packed(
                self._packed, self.base_key, self.sweep_idx, step, me
            )
            self._adopt(st)
            self.sweep_idx += step
            done += step
            obs = np.asarray(obs)
            if obs.size:
                rows.append(obs)
                self.obs_history.append(obs)
            if every and done % every == 0:
                self.save(ckpt_path)
            if progress is not None:
                progress(done, n, obs[-1] if obs.size else None)
        return (np.concatenate(rows, axis=0) if rows
                else np.zeros((0, len(obs_names(self.cfg))), np.float32))

    # -- measurement ------------------------------------------------------
    def measure(self) -> dict:
        """One-off measurement (jitted — eager ops cost a host round-trip
        per op, which on a tunneled TPU dominates everything else).

        When engine-layout state is live, measures it directly through the
        fused packed reductions — no canonical-field materialization (the
        join wouldn't fit in HBM at 64^4) and, with meas_dtype='double' on
        TPU, the Kahan-compensated sums instead of a silently-downcast
        complex128 path."""
        mp = getattr(self._run, "measure_packed", None)
        if mp is not None and self._us is not None:
            st = self._us if self._stream is None else self._us[0]
            vals = np.asarray(mp(st))
        else:
            vals = np.asarray(self._measure_jit(self.u))
        return dict(zip(measure_obs_names(self.cfg), vals.tolist()))

    @property
    def obs_names(self):
        """Column names of the observable series rows from run()."""
        return obs_names(self.cfg)

    def unitarity_defect(self) -> float:
        # one jitted reduction: eager op chains are slow per-op round
        # trips on a tunneled TPU and UNIMPLEMENTED on axon (CLAUDE.md)
        if self._defect_jit is None:
            self._defect_jit = jax.jit(
                lambda u: jnp.max(
                    jnp.stack([sun.unitarity_defect(u[m]) for m in range(NDIM)])
                ).astype(jnp.float32)
            )
        return float(jax.device_get(self._defect_jit(self.u)))

    # -- analysis / reporting --------------------------------------------
    def analysis(self):
        from .utils.stats import analyze_series

        obs = np.concatenate(self.obs_history, axis=0) if self.obs_history else None
        if obs is None or obs.size == 0:
            return {}
        return {
            name: analyze_series(obs[:, k])
            for k, name in enumerate(obs_names(self.cfg))
        }

    # -- checkpoint -------------------------------------------------------
    def save(self, path: str):
        from .utils.checkpoint import save_state

        if (self._stream is None and isinstance(self._us, tuple)
                and len(self._us) == 8):
            # live engine-layout state: dump the packed f32 arrays as-is
            # (at 64^4 the canonical-field join would not fit in HBM)
            save_state(
                path, self.cfg, None, self.sweep_idx, self.obs_history,
                us=self._us,
            )
            return
        if (self._stream is not None and isinstance(self._us, tuple)
                and isinstance(self._us[0], tuple) and len(self._us[0]) == 8):
            # Pallas stream engine with live packed state: dump links AND
            # the kernel-layout generator state as-is — the canonical
            # field never materializes (big stream lattices need this for
            # the same HBM reason as above)
            save_state(
                path, self.cfg, None, self.sweep_idx, self.obs_history,
                rng_stream={k: np.asarray(v)
                            for k, v in self._us[1].items()},
                us=self._us[0],
            )
            return
        rng_stream = None
        if self._stream is not None:
            rng_stream = {
                k: np.asarray(v) for k, v in self._stream_state.items()
            }
        save_state(
            path, self.cfg, self.u, self.sweep_idx, self.obs_history,
            rng_stream=rng_stream,
        )

    @classmethod
    def load(cls, path: str) -> "Simulation":
        from .utils.checkpoint import load_state

        cfg, u, sweep_idx, obs_history, rng_stream = load_state(path)
        if isinstance(u, tuple):
            # packed checkpoint; rng_stream present means a packed STREAM
            # state — adopted (and layout-validated) in __init__
            sim = cls(cfg, init_us=u, _stream_rst=rng_stream)
        else:
            sim = cls(cfg, init_u=u)
        if sim._stream is not None and sim._rst is None:
            if rng_stream is None:
                raise ValueError(
                    "checkpoint has no PRNGCL stream state but the config "
                    f"runs rng_mode={cfg.rng_mode!r}; cannot resume exactly"
                )
            _validate_stream_keys(sim._run, set(rng_stream))
            sim._rst = {k: jnp.asarray(v) for k, v in rng_stream.items()}
        sim.sweep_idx = sweep_idx
        sim.obs_history = obs_history
        return sim
