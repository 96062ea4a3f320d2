"""Ensemble (replica) axis: many independent Markov chains in one program.

QCDGPU runs one chain per process; a beta-scan (e.g. the finite-T
deconfinement scan, BASELINE config 3) is a shell loop.  On TPU the ensemble
is a free vmap axis over (links, beta, key): the 8 stage kernels batch
across chains, so a whole beta grid costs one kernel launch per stage
(SURVEY.md §2 "Ensemble / replica parallelism").
"""

from __future__ import annotations



import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..config import SimConfig
from ..ops import rng
from ..ops.measure import make_measure_fn, measure_obs_names
from ..ops.prng_streams import (
    make_stream_state_host,
    stream_draw_fn,
    stream_mode_name,
)
from ..sim import cold_start, hot_start, make_sweep_fn, stream_hot_start


def make_ensemble_runner(cfg: SimConfig, n_chains: int, interpret=False,
                         chain_mesh=None):
    """Runner over C = n_chains chains with per-chain beta.

    Built on the shared chunk runner (qcdgpu_tpu/runner.py) so the
    ensemble inherits its compile-count guarantees (traced sweep counts,
    fixed measurement buffer) and engine-layout entry points.  Runner
    state is (per-chain engine state, betas [C], keys [C, 2]) — betas and
    keys ride through the state rather than a closure so one compiled
    program serves every beta grid of the same length.

    Returns run with the chunk-runner signature; measurement rows are the
    C chains' vectors flattened to [C * n_obs] (reshape on the host).
    On TPU the fused Pallas stage kernels are vmapped across chains (the
    batch axis becomes an extra grid dimension per kernel, with beta on
    the scalar-prefetch channel).

    chain_mesh: optional 1-axis ("c") jax.sharding.Mesh
    (parallel.mesh.make_chain_mesh).  The chain axis is then domain-
    decomposed over devices via shard_map — the replica-parallel (DP
    analogue) axis of SURVEY.md §2: chains are independent Markov chains,
    so the sharded program contains no collectives and is bit-identical
    to the unsharded one chain-for-chain.  Requires n_chains % mesh
    size == 0 and an unsharded lattice (cfg.mesh all ones).
    """
    from ..parallel.mesh import is_lattice_sharded
    from ..runner import build_chunk_runner
    from ..sim import resolve_engine

    lattice_sharded = is_lattice_sharded(cfg)
    if lattice_sharded and chain_mesh is None:
        # chains are vmapped below; without a mesh carrying the lattice
        # axes a cfg.mesh would be silently dropped
        raise ValueError(
            "a lattice-sharded ensemble needs the combined mesh: pass "
            "chain_mesh=parallel.mesh.make_chain_lattice_mesh(C, cfg.mesh)"
            " (BetaScan builds it automatically)"
        )
    if lattice_sharded and "x" not in getattr(chain_mesh, "axis_names", ()):
        raise ValueError(
            "chain_mesh must carry the lattice axes for a sharded lattice "
            "(make_chain_lattice_mesh, axes ('c','x','y','z','t'))"
        )
    # cfg.track_acceptance / cfg.track_kp_exhaust: the per-chain sweep
    # accumulates the tracked statistic (Metropolis acceptance or KP
    # trial exhaustion; in-kernel SMEM counts on the Pallas chain path,
    # sim.make_sweep_fn with_acc on XLA) and every chain contributes its
    # own column — QCDGPU reports acceptance per run, and a scan is C
    # runs (VERDICT r1 weak #8).
    with_acc = bool(cfg.track_acceptance or cfg.track_kp_exhaust)
    if chain_mesh is not None:
        nshards = chain_mesh.shape["c"]
        if n_chains % nshards:
            raise ValueError(
                f"n_chains={n_chains} must divide evenly over the "
                f"{nshards}-device chain mesh"
            )

    n_obs = len(measure_obs_names(cfg)) + with_acc  # + per-chain acc col
    stream_gen = stream_mode_name(cfg.rng_mode)
    # chain x lattice tier: every chain's lattice is X/Y-decomposed with
    # the fused sharded Pallas bodies (ops/pallas/sharded.py
    # make_sharded_stage_fns), vmapped over the shard-local chain block
    # under the combined ("c","x","y") mesh — the layout QCDGPU cannot
    # express (VERDICT r2 weak #6).  Streams/extras fall to the XLA tier
    # below, where XLA's SPMD partitioner shards the vmapped program.
    pallas_lattice_tier = (
        lattice_sharded and stream_gen is None
        and resolve_engine(cfg) == "pallas"
        and cfg.mesh[2] == 1 and cfg.mesh[3] == 1
    )
    if pallas_lattice_tier:
        from ..ops.measure import cfg_fmunu_indices, cfg_wilson_pairs
        from ..ops.pallas import engine as peng
        from ..ops.pallas.sharded import make_sharded_stage_fns

        if (cfg_fmunu_indices(cfg) or cfg_wilson_pairs(cfg)
                or getattr(cfg, "get_qtop", False)):
            raise ValueError(
                "extended observables (fmunu/wilson/qtop) are not "
                "supported on the chain x lattice Pallas path; use "
                "engine='xla' for such scans"
            )
        dims = tuple(cfg.dims)
        chain_sweep, chain_measure_local = make_sharded_stage_fns(
            cfg, cfg.mesh[0], cfg.mesh[1], interpret=interpret
        )
        chain_pack = peng.split_links
        chain_unpack = lambda s: peng.join_links(s, dims)
        chain_measure = chain_measure_local  # shard-local; psums inside
    elif stream_gen is None and resolve_engine(cfg) == "pallas" \
            and not lattice_sharded:
        from ..ops.pallas import engine as peng

        dims = tuple(cfg.dims)
        chain_sweep = peng.make_pallas_sweep(cfg, interpret=interpret,
                                             with_acc=with_acc)
        chain_pack = peng.split_links
        chain_unpack = lambda s: peng.join_links(s, dims)
        chain_measure = lambda s: peng.measure_all_split(
            s, dims, interpret=interpret, cfg=cfg
        )
    else:
        # sim.make_sweep_fn's sweep already accepts a traced beta override
        chain_sweep = make_sweep_fn(cfg, with_acc=with_acc)
        chain_pack = chain_unpack = lambda x: x
        chain_measure = make_measure_fn(cfg)
        if stream_gen is not None:
            # PRNGCL stream mode: the per-chain state is (u, rng_state) —
            # chain_sweep already threads the tuple; measurement unwraps
            # the links.  BetaScan owns the stacked stream states across
            # pack/unpack boundaries (same division of labor as
            # Simulation._rst), so pack/unpack here stay links-only.
            meas = chain_measure
            chain_measure = lambda s: meas(s[0])

    def pack(state):
        us, betas, keys = state
        st = jax.vmap(chain_pack)(us), betas, keys
        if chain_mesh is not None:
            # pre-shard the packed state so each device holds only its
            # block of chains (and the first chunk call needs no reshard);
            # with a sharded lattice the link leaves additionally carry
            # the lattice axes of the combined mesh
            from jax.sharding import NamedSharding

            if pallas_lattice_tier:
                lspec = P("c", None, None, None, "x", "y", None)
            elif lattice_sharded:
                lspec = P("c", None, None, None, "x", "y", "z", "t")
            else:
                lspec = P("c")
            st = jax.lax.with_sharding_constraint(
                st,
                (jax.tree.map(
                    lambda _: NamedSharding(chain_mesh, lspec), st[0]),
                 NamedSharding(chain_mesh, P("c")),
                 NamedSharding(chain_mesh, P("c"))),
            )
        return st

    def unpack(st):
        s, betas, keys = st
        return jax.vmap(chain_unpack)(s), betas, keys

    # chain-axis vmap spec: per-chain state leaves map over axis 0.  In
    # stream mode the 0-d state leaves (ranlux's luxury counter, ranmar's
    # carry — identical across chains by construction, they advance purely
    # with the draw count) stay UNBATCHED: a batched counter would batch
    # the luxury-skip lax.cond predicate, lowering it to a select that
    # executes the expensive skip branch on every single draw.
    if stream_gen is None:
        s_axes = 0
        rst_axes = None
    else:
        # a tiny sample lattice suffices to derive per-leaf vmap axes
        # (np.ndim per leaf); building the full-size host state here would
        # cost tens-to-hundreds of MB of transient work for ranmar at
        # production sizes (it is built for real only in runner pack paths)
        sample = make_stream_state_host(stream_gen, 0, (2, 2, 2, 2))
        rst_axes = {k: (0 if np.ndim(v) else None) for k, v in sample.items()}
        s_axes = (0, rst_axes)

    def sweep_chains(st, _base_key, sweep_idx):
        s, betas, keys = st
        out_axes = (s_axes, 0) if with_acc else s_axes
        r = jax.vmap(
            lambda s1, b, k: chain_sweep(s1, k, sweep_idx, beta=b),
            in_axes=(s_axes, 0, 0), out_axes=out_axes,
        )(s, betas, keys)
        if with_acc:
            s, acc = r
            return (s, betas, keys), acc
        return r, betas, keys

    def measure_chains(st):
        rows = jax.vmap(chain_measure, in_axes=(s_axes,))(st[0])
        return rows.reshape(-1)

    if chain_mesh is None:
        sweep, measure_state = sweep_chains, measure_chains
    elif lattice_sharded and not pallas_lattice_tier:
        # XLA tier: the plain vmapped per-chain program — pack() placed
        # the leaves on the combined mesh, and XLA's SPMD partitioner
        # inserts the lattice halo exchanges while keeping the chain
        # axis embarrassingly parallel (no shard_map needed)
        sweep, measure_state = sweep_chains, measure_chains
    elif pallas_lattice_tier:
        # fused chain x lattice path: shard_map over the combined mesh;
        # inside, sweep_chains vmaps the shard-local sweep bodies over
        # this device's chain block, and each body halo-exchanges over
        # its chain's own ("x","y") sub-block via ppermute
        lspec_l = P("c", None, None, None, "x", "y", None)

        def state_specs(st):
            return (tuple(lspec_l for _ in st[0]), P("c"), P("c"))

        def sweep(st, base_key, sweep_idx):
            specs = state_specs(st)
            out_specs = (specs, P("c")) if with_acc else specs
            return jax.shard_map(
                sweep_chains, mesh=chain_mesh,
                in_specs=(specs, P(None), P()), out_specs=out_specs,
                check_vma=False,
            )(st, base_key, sweep_idx)

        def measure_state(st):
            return jax.shard_map(
                measure_chains, mesh=chain_mesh,
                in_specs=(state_specs(st),), out_specs=P("c"),
                check_vma=False,
            )(st)
    else:
        # blocks of chains per device; inside each shard the body is the
        # plain vmapped per-chain program (any engine), so the Pallas
        # kernels never see the mesh.  Measurement rows come out chain-
        # major ([c_local * n_obs] per shard, concatenated along "c"),
        # matching the unsharded flattening exactly.
        def chain_specs(st):
            # chain-blocked over "c" for stacked leaves; the stream mode's
            # shared 0-d counters are replicated (every shard advances
            # them identically)
            return jax.tree.map(
                lambda x: P("c") if jnp.ndim(x) else P(), st
            )

        def sweep(st, base_key, sweep_idx):
            specs = chain_specs(st)
            out_specs = (specs, P("c")) if with_acc else specs
            return jax.shard_map(
                sweep_chains, mesh=chain_mesh,
                in_specs=(specs, P(None), P()), out_specs=out_specs,
                check_vma=False,
            )(st, base_key, sweep_idx)

        def measure_state(st):
            specs = chain_specs(st)
            return jax.shard_map(
                measure_chains, mesh=chain_mesh,
                in_specs=(specs,), out_specs=P("c"), check_vma=False,
            )(st)

    def append_acc(row, acc_rate):
        # one acc_rate column per chain, interleaved chain-major so the
        # [C, n_obs] reshape downstream (BetaScan.run) stays trivial
        r = row.reshape(n_chains, n_obs - 1)
        return jnp.concatenate(
            [r, acc_rate.reshape(n_chains, 1).astype(jnp.float32)], axis=1
        ).reshape(-1)

    run = build_chunk_runner(
        cfg, sweep, measure_state, pack=pack, unpack=unpack,
        n_obs=n_chains * n_obs, with_acc=with_acc, append_acc=append_acc,
        acc_init=jnp.zeros((n_chains,), jnp.float32),
    )
    if stream_gen is not None:
        # per-chain stream states, seeded on the same schedule as the
        # per-chain threefry keys (cfg.seed + 1000 * chain).  Exposed as
        # a thunk so the checkpoint-load path never pays the C-fold
        # host-side generator init it would immediately overwrite.
        # Stacking happens HOST-side (numpy) — eager jnp.stack on device
        # arrays is UNIMPLEMENTED on some TPU runtimes (CLAUDE.md) — and
        # 0-d counter leaves stay shared/unbatched (see s_axes above).
        def make_stream_state0():
            chains = [
                make_stream_state_host(stream_gen, cfg.seed + 1000 * i,
                                       cfg.dims)
                for i in range(n_chains)
            ]
            return {
                k: jnp.asarray(
                    np.stack([c[k] for c in chains]) if np.ndim(v0) else v0
                )
                for k, v0 in chains[0].items()
            }

        run.make_stream_state0 = make_stream_state0
        run.stream_draw = stream_draw_fn(stream_gen)
        run.stream_axes = rst_axes
    return run


class BetaScan:
    """Finite-T / coupling scan: one chain per beta on a shared lattice.

    The Polyakov-loop series across the beta grid locates the deconfinement
    transition (BASELINE config 3: 24^3 x 6 across a beta grid).
    """

    def __init__(self, cfg: SimConfig, betas, chain_mesh: int = 1,
                 _defer_start: bool = False):
        """chain_mesh: shard the chain axis over this many devices
        (replica parallelism; 1 = single-device vmap, 0 = auto: the
        largest chain count divisor that fits the attached devices).  A
        runtime execution choice like cfg.engine — not persisted in
        checkpoints; pass it to load() again when resuming on a
        multi-chip host.  _defer_start: internal (load()) — skip start-
        state generation because the caller will assign .us directly."""
        self.cfg = cfg
        self._sync_jit = None
        self.betas = jnp.asarray(np.asarray(betas, np.float32))
        c = len(betas)
        # row width per chain, including the acc_rate column when the
        # config tracks Metropolis acceptance (obs_names appends it)
        from ..ops.measure import obs_names

        self._n_obs = len(obs_names(cfg))
        self.chain_mesh = self._resolve_chain_mesh(chain_mesh, cfg, c)
        from ..parallel.mesh import is_lattice_sharded

        cmesh = None
        if is_lattice_sharded(cfg):
            # chain x lattice layout: each chain's lattice decomposed over
            # cfg.mesh, chain blocks over "c" (even chain_mesh=1 needs the
            # combined mesh so the runner can carry the lattice axes)
            from ..parallel.mesh import make_chain_lattice_mesh

            cmesh = make_chain_lattice_mesh(self.chain_mesh, cfg.mesh)
        elif self.chain_mesh > 1:
            from ..parallel.mesh import make_chain_mesh

            cmesh = make_chain_mesh(self.chain_mesh)
        self._cmesh = cmesh
        self._run = make_ensemble_runner(cfg, c, chain_mesh=cmesh)
        # PRNGCL stream mode: _stream lazily builds the stacked per-chain
        # generator states, owned here across pack/unpack boundaries
        # (same scheme as Simulation); None for the counter-based modes
        self._stream = getattr(self._run, "make_stream_state0", None)
        self._rsts = None
        self.sweep_idx = 0
        # start states under jit (vmapped over chains): eager constructor
        # chains are UNIMPLEMENTED on some TPU runtimes (see Simulation)
        from functools import partial

        if _defer_start:
            # load() assigns the checkpointed keys and field directly; the
            # C per-chain key chains would be wasted eager dispatches
            self.keys = None
            self.us = None
        else:
            keys = [rng.make_base_key(cfg.seed + 1000 * i) for i in range(c)]
            self.keys = jnp.stack(keys)
            if cfg.start == "hot":
                if self._stream is not None:
                    ax = self._run.stream_axes
                    us0, self._rsts = jax.jit(jax.vmap(
                        partial(stream_hot_start, cfg, self._run.stream_draw),
                        in_axes=(ax,), out_axes=(0, ax),
                    ))(self._streams_state)
                    self.us = us0
                else:
                    self.us = jax.jit(
                        jax.vmap(partial(hot_start, cfg))
                    )(self.keys)
            elif cfg.start == "continue":
                raise ValueError(
                    "start='continue' resumes a checkpoint: use "
                    "BetaScan.load(path) (CLI: `scan --resume-state`)"
                )
            else:  # "cold"
                u0 = jax.jit(partial(cold_start, cfg))()
                self.us = jnp.broadcast_to(u0, (c,) + u0.shape)

    @staticmethod
    def _resolve_chain_mesh(requested, cfg, n_chains) -> int:
        """0 = auto: widest replica sharding available (chain sharding is
        bit-identical to the vmap path, so auto is safe).  Picks the
        largest divisor of n_chains whose chain blocks — each cfg.mesh's
        worth of devices wide when the lattice is also sharded — fit the
        device count, so e.g. a 4-beta scan on 8 chips runs 4 wide, and a
        2-beta scan of 2x2-sharded lattices runs 2 x (2x2)."""
        if requested:
            return int(requested)
        nd = len(jax.devices()) // int(np.prod(cfg.mesh))
        if nd > 1:
            for d in range(min(nd, n_chains), 0, -1):
                if n_chains % d == 0:
                    return d
        return 1

    # canonical [C, ...] links <-> resident engine-layout ensemble state
    # (same lazy-materialization scheme as Simulation.u / Simulation._packed)
    @property
    def us(self):
        if self._us is None:
            st = self._st
            if self._stream is not None:
                st = (st[0][0], st[1], st[2])
            self._us, self.betas, self.keys = self._run.unpack(st)
        return self._us

    @us.setter
    def us(self, value):
        self._us = value
        self._st = None

    @property
    def _streams_state(self):
        """Live stacked per-chain stream states (lazy; see
        Simulation._stream_state)."""
        if self._rsts is None:
            self._rsts = self._stream()
        return self._rsts

    @property
    def _packed(self):
        if self._st is None:
            st = self._run.pack((self._us, self.betas, self.keys))
            if self._stream is not None:
                rst = self._streams_state
                if self._cmesh is not None:
                    # place the stream state on the chain mesh like pack()
                    # pre-places links/betas/keys: stacked leaves blocked
                    # over "c", shared 0-d counters replicated
                    from jax.sharding import NamedSharding

                    rst = jax.device_put(rst, {
                        k: NamedSharding(
                            self._cmesh, P("c") if jnp.ndim(v) else P()
                        )
                        for k, v in rst.items()
                    })
                    self._rsts = rst
                s, betas, keys = st
                st = ((s, rst), betas, keys)
            self._st = st
        return self._st

    def _adopt(self, st):
        """Take ownership of ensemble state returned by a chunk run."""
        self._st, self._us = st, None
        if self._stream is not None:
            self._rsts = st[0][1]

    def sync(self) -> float:
        """Tunnel-safe device barrier (see Simulation.sync)."""
        if self._sync_jit is None:
            self._sync_jit = jax.jit(
                lambda s: sum(
                    jnp.sum(jnp.real(x)).astype(jnp.float32)
                    for x in jax.tree_util.tree_leaves(s)
                )
            )
        st = self._st if self._st is not None else self._us
        return float(jax.device_get(self._sync_jit(st)))

    def warmup(self, measure_every=None):
        """Compile and first-execute the scan programs without advancing
        any chain (results discarded; see Simulation.warmup for why a real
        execution, not a zero-trip compile, is required)."""
        if measure_every is None:
            measure_every = self.cfg.meas_every
        st = self._packed
        self._run.packed(st, self.keys[0], self.sweep_idx, 1, 0)
        self._run.packed(
            st, self.keys[0], self.sweep_idx, measure_every, measure_every
        )
        self.sync()
        return self

    def thermalize(self, n=None):
        n = self.cfg.sweeps_therm if n is None else n
        st, _ = self._run.packed(
            self._packed, self.keys[0], self.sweep_idx, n, 0
        )
        self._adopt(st)
        self.sweep_idx += n
        return self

    def run(self, n=None, measure_every=None):
        n = self.cfg.sweeps if n is None else n
        if measure_every is None:  # mirror Simulation.run: cfg.meas_every
            measure_every = self.cfg.meas_every
        st, obs = self._run.packed(
            self._packed, self.keys[0], self.sweep_idx, n, measure_every
        )
        self._adopt(st)
        self.sweep_idx += n
        obs = np.asarray(obs)  # [n_meas, C * n_obs]
        c = len(self.betas)
        return obs.reshape(obs.shape[0], c, self._n_obs).transpose(1, 0, 2)

    # -- checkpoint (whole-ensemble state; same exactness guarantee as
    #    Simulation.save — counter RNG means (keys, sweep_idx) is the full
    #    PRNG state) ------------------------------------------------------
    def save(self, path: str):
        import json

        from ..utils.checkpoint import FORMAT_VERSION, links_to_host

        from ..utils.checkpoint import pack_rng_stream

        # PRNGCL stream mode: the stacked per-chain generator states are
        # part of the resumable state (QCDGPU dumps its PRNG buffers the
        # same way)
        extras = pack_rng_stream(
            self._streams_state if self._stream is not None else None
        )
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
            **extras,
        )

    @classmethod
    def load(cls, path: str, chain_mesh: int = 1) -> "BetaScan":
        import json

        import jax.numpy as jnp

        from ..config import SimConfig
        from ..utils.checkpoint import FORMAT_VERSION, links_from_host

        with np.load(path, allow_pickle=False) as z:
            if int(z["version"]) != FORMAT_VERSION:
                raise ValueError(f"unsupported version {int(z['version'])}")
            kind = bytes(z["kind"]) if "kind" in z.files else b"simulation"
            if kind != b"betascan":
                raise ValueError(
                    f"not a BetaScan checkpoint (kind={kind.decode()!r}; "
                    "use `resume` for single-chain Simulation states)"
                )
            cfg = SimConfig.from_dict(
                json.loads(bytes(z["config_json"]).decode())
            )
            betas = z["betas"]
            keys = jnp.asarray(z["keys"])
            cdtype = (jnp.complex128 if cfg.dtype == "complex128"
                      else jnp.complex64)
            us = links_from_host(z["us_ri"], cdtype)
            sweep_idx = int(z["sweep_idx"])
            from ..utils.checkpoint import unpack_rng_stream

            rng_stream = unpack_rng_stream(z)
        scan = cls(cfg, betas, chain_mesh=chain_mesh, _defer_start=True)
        if scan._stream is not None:
            if rng_stream is None:
                raise ValueError(
                    "checkpoint has no PRNGCL stream state but the config "
                    f"runs rng_mode={cfg.rng_mode!r}; cannot resume exactly"
                )
            scan._rsts = {k: jnp.asarray(v) for k, v in rng_stream.items()}
        scan.keys = keys
        scan.us = us
        scan.sweep_idx = sweep_idx
        return scan
