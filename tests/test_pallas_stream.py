"""In-kernel PRNGCL streams on the fused Pallas engine (interpret mode).

The Pallas stream mode is its own randomness provenance (per-site native
generator streams consumed on active-parity stages only — see
engine.make_pallas_sweep), so the pinned contracts are: the stage kernel
consumes exactly the sites' next dense-stream draws (bit-checked against
the XLA update fed with those uniforms), the state advances exactly as
the dense stream does at the active sites, and the runner keeps the
chunking-invariance / determinism guarantees.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qcdgpu_tpu import SimConfig
from qcdgpu_tpu.ops import prng_streams as ps
from qcdgpu_tpu.ops import rng
from qcdgpu_tpu.ops.lattice import parity_mask
from qcdgpu_tpu.ops.pallas import engine as peng
from qcdgpu_tpu.ops.pallas import update as pupdate
from qcdgpu_tpu.ops.samplers import stage_uniform_count, update_links
from qcdgpu_tpu.ops.staples import staple_sum
from qcdgpu_tpu.sim import hot_start, resolve_engine

DIMS = (4, 4, 4, 4)


def _packed_state(name, seed):
    host = ps.make_stream_state_host(name, seed, DIMS)
    words = ps.state_to_words(name, {k: jnp.asarray(v) for k, v in host.items()})
    se, so = peng.split_site_field(words, DIMS)
    return {"words_e": se, "words_o": so}


def test_site_field_split_join_roundtrip():
    v = jnp.arange(np.prod(DIMS) * 3, dtype=jnp.uint32).reshape((3,) + DIMS)
    pair = peng.split_site_field(v, DIMS)
    back = peng.join_site_field(pair, DIMS)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(back))


@pytest.mark.parametrize("name", ["xor128", "mrg32k3a"])
@pytest.mark.parametrize("parity", [0, 1])
def test_stage_kernel_consumes_dense_stream_draws(name, parity):
    """The in-kernel draw at each active site must equal the site's next
    dense-stream draws: feed those same uniforms to the XLA update and
    compare links (engine rounding tolerance) and state (exact)."""
    cfg = SimConfig(group=2, dims=DIMS, beta=2.4, seed=7,
                    rng_mode=f"prngcl:{name}", engine="xla")
    u0 = hot_start(cfg, rng.make_base_key(3))
    us = peng.split_links(u0)
    mu = 1
    n_upd = stage_uniform_count(2, "heatbath", cfg.kp_trials, cfg.n_hit)

    # expected: XLA update fed with every site's first n_upd dense draws
    state0, draw = ps.make_stream(name, cfg.seed, DIMS)
    u_dense, adv = jax.jit(lambda st: draw(st, n_upd))(state0)
    a = staple_sum(u0, mu)
    exp = update_links(u0[mu], a, "heatbath", cfg.beta, None, None,
                       uniforms=ps.open01(u_dense), k_trials=cfg.kp_trials)

    key2 = rng.stage_key(rng.make_base_key(cfg.seed), 0, 0)
    packed = _packed_state(name, cfg.seed)
    new, new_state = pupdate.stage_update(
        us, mu, parity, "heatbath", cfg.beta, key2, DIMS,
        k_trials=cfg.kp_trials, rng_mode=cfg.rng_mode, interpret=True,
        stream_state=packed["words_e" if parity == 0 else "words_o"],
    )
    pair = (new, us[2 * mu + 1]) if parity == 0 else (us[2 * mu], new)
    got = peng.join_dir(pair, DIMS, 2)
    mask = np.asarray(parity_mask(DIMS, parity))
    np.testing.assert_allclose(
        np.asarray(got)[..., mask], np.asarray(exp)[..., mask],
        rtol=0, atol=2e-5,
    )
    # state words advance exactly like the dense stream at active sites
    exp_state = peng.split_site_field(
        ps.state_to_words(name, adv), DIMS
    )[parity]
    np.testing.assert_array_equal(np.asarray(new_state),
                                  np.asarray(exp_state))


def test_runner_determinism_and_chunking():
    cfg = SimConfig(group=2, dims=DIMS, beta=2.4, seed=5,
                    rng_mode="prngcl:xor128", reunit_every=3)
    run = peng.make_pallas_chunk_runner(cfg, interpret=True)
    key = rng.make_base_key(cfg.seed)
    st0 = (run.pack(jax.jit(lambda: jnp.stack(
        [jnp.eye(2, dtype=jnp.complex64)[..., None, None, None, None]
         .repeat(DIMS[0], 2).repeat(DIMS[1], 3).repeat(DIMS[2], 4)
         .repeat(DIMS[3], 5)] * 4))()), run.make_stream_state0())

    st_a, obs_a = run.packed(st0, key, 0, 4, 2)
    rows = []
    st_b = st0
    for k in range(2):
        st_b, o = run.packed(st_b, key, 2 * k, 2, 2)
        rows.append(np.asarray(o))
    np.testing.assert_array_equal(np.asarray(obs_a),
                                  np.concatenate(rows, axis=0))
    for xa, xb in zip(jax.tree_util.tree_leaves(st_a),
                      jax.tree_util.tree_leaves(st_b)):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
    # physics sanity from a cold start
    assert 0.4 < np.asarray(obs_a)[-1, 0] < 0.95


def test_hot_start_matches_xla_mode():
    """Hot starts are drawn in the dense layout shared with the XLA
    stream mode, so the links must be bit-identical across engines."""
    cfg = SimConfig(group=2, dims=DIMS, beta=2.4, seed=9,
                    rng_mode="prngcl:parkmiller")
    run = peng.make_pallas_chunk_runner(cfg, interpret=True)
    u_pallas, rst = run.stream_hot_start()
    from qcdgpu_tpu.sim import stream_hot_start

    state0, draw = ps.make_stream("parkmiller", cfg.seed, DIMS)
    u_xla, dense = jax.jit(lambda st: stream_hot_start(cfg, draw, st))(state0)
    np.testing.assert_array_equal(np.asarray(u_pallas), np.asarray(u_xla))
    exp = peng.split_site_field(ps.state_to_words("parkmiller", dense), DIMS)
    np.testing.assert_array_equal(np.asarray(rst["words_e"]),
                                  np.asarray(exp[0]))


def test_engine_resolution_and_guards():
    base = dict(group=2, dims=DIMS, beta=2.4, rng_mode="prngcl:xor128")
    # CPU hosts resolve to the XLA engine either way
    assert resolve_engine(SimConfig(**base)) in ("xla", "pallas")
    # the full generator family is Pallas-capable now (ranlux/ranmar via
    # the ref-based lag-window kernels) — no config-level rejection
    SimConfig(**{**base, "rng_mode": "prngcl:ranlux3", "engine": "pallas"})
    SimConfig(**{**base, "rng_mode": "prngcl:ranmar", "engine": "pallas"})
    # X/Y meshes shard the streams like the links (site-local, no halos);
    # Z/T meshes stay XLA-engine territory
    SimConfig(**{**base, "engine": "pallas", "mesh": (2, 1, 1, 1)})
    with pytest.raises(ValueError, match="X/Y"):
        SimConfig(**{**base, "engine": "pallas", "mesh": (1, 1, 2, 1)})
    assert resolve_engine(
        SimConfig(**{**base, "mesh": (1, 1, 2, 2)})
    ) == "xla"


def test_sharded_stream_runner_bit_identical():
    """Sharded Pallas streams: per-site generators make the X-sharded
    chain BIT-identical to the unsharded Pallas stream chain (links,
    stream state and scalars), unlike threefry-mode sharding which only
    agrees to rounding order.  Uses ranlux3 so the ref-based lag-window
    kernels run under shard_map with their scalar channel."""
    from qcdgpu_tpu.ops.pallas.engine import make_pallas_chunk_runner
    from qcdgpu_tpu.ops.pallas.sharded import make_sharded_chunk_runner
    from qcdgpu_tpu.parallel.mesh import make_mesh

    sdims = (4, 4, 2, 4)
    cfg = SimConfig(group=2, dims=sdims, beta=2.4, seed=13,
                    rng_mode="prngcl:ranlux3", reunit_every=2)
    key = rng.make_base_key(cfg.seed)

    run_1 = make_pallas_chunk_runner(cfg, interpret=True)
    u0, rst0 = run_1.stream_hot_start()
    st_1, obs_1 = run_1.packed((run_1.pack(u0), rst0), key, 0, 2, 2)

    mesh = make_mesh((2, 1, 1, 1))
    run_n = make_sharded_chunk_runner(
        cfg.replace(mesh=(2, 1, 1, 1)), mesh, interpret=True
    )
    st_n, obs_n = run_n.packed((run_n.pack(u0), rst0), key, 0, 2, 2)
    for a, b in zip(jax.tree_util.tree_leaves(st_1),
                    jax.tree_util.tree_leaves(st_n)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(obs_1), np.asarray(obs_n),
                               rtol=0, atol=1e-6)


# ---------------------------------------------------------------------------
# ref-based in-kernel draws (ranlux / ranmar)
# ---------------------------------------------------------------------------


def _ref_draw_harness(name, words, scalars, n):
    """Run kernel_stream_draw_ref in a standalone interpret-mode kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = words.shape[0]
    words = words.reshape(W, words.shape[1], words.shape[2], -1)
    X, Y, ZT = words.shape[1:]
    enc = ps.encode_kernel_scalars(name, scalars)
    scal = jnp.stack([jnp.asarray(e, jnp.uint32).reshape(()) for e in enc])

    def kern(scal_ref, st_ref, o_st_ref, o_u_ref):
        us = ps.kernel_stream_draw_ref(
            name, st_ref, o_st_ref, scal_ref[0], scal_ref[1], n
        )
        for t in range(n):
            o_u_ref[t, 0] = us[t]

    out_state, out_u = pl.pallas_call(
        kern,
        grid=(X,),
        in_specs=[
            pl.BlockSpec((2,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((W, 1, Y, ZT), lambda i: (0, i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((W, 1, Y, ZT), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((n, 1, Y, ZT), lambda i: (0, i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(words.shape, words.dtype),
            jax.ShapeDtypeStruct((n,) + words.shape[1:], jnp.float32),
        ),
        interpret=True,
    )(scal, words)
    return out_state, out_u


@pytest.mark.parametrize("name", ["ranlux3", "ranlux0", "ranmar"])
@pytest.mark.parametrize("pre", [0, 18])
def test_ref_kernel_draw_bit_matches_dense(name, pre):
    """kernel_stream_draw_ref must reproduce the dense stream draws bit-
    exactly, including across luxury-skip boundaries (pre=18 puts the
    first ranlux skip at draw 6 of the kernel window; pre=0 at draw 24),
    and advance_kernel_scalars must track the dense counters."""
    dims = (2, 2, 2, 4)
    n = 30  # crosses at least one 24-draw luxury boundary either way
    state0, draw = ps.make_stream(name, 11, dims)
    if pre:
        _, state0 = jax.jit(lambda st: draw(st, pre))(state0)
    exp_u, exp_state = jax.jit(lambda st: draw(st, n))(state0)

    words = ps.state_to_words(name, state0)
    scalars = ps.stream_kernel_scalars(name, state0)
    out_state, out_u = _ref_draw_harness(name, words, scalars, n)
    np.testing.assert_array_equal(
        np.asarray(out_u), np.asarray(exp_u).reshape(out_u.shape)
    )

    # state words: rotate the absolute layout back to rolled-canonical
    adv = ps.advance_kernel_scalars(name, scalars, n)
    nlag = 24 if name.startswith("ranlux") else 97
    shift = (nlag - 1 - int(adv["ptr"])) % nlag
    lag = jnp.roll(out_state[:nlag], shift, axis=0)
    exp_words = np.asarray(ps.state_to_words(name, exp_state))
    np.testing.assert_array_equal(
        np.asarray(lag), exp_words[:nlag].reshape(lag.shape)
    )
    if name.startswith("ranlux"):
        np.testing.assert_array_equal(
            np.asarray(out_state[24]),
            exp_words[24].reshape(out_state[24].shape),
        )
        assert int(adv["nb"]) == int(exp_state["nb"])
    else:
        np.testing.assert_allclose(float(adv["c"]), float(exp_state["c"]),
                                   rtol=0, atol=0)


@pytest.mark.parametrize("n", [280, 281, 300, 500])
def test_ranmar_scalar_advance_large_n(n):
    """The closed-form carry advance must stay exact for large per-stage
    draw counts: the naive int32 modmul n*CD overflows (and silently
    desyncs from the native stream) at n >= 281, reachable through
    unvalidated n_hit/kp_trials."""
    dims = (2, 2, 2, 4)
    state0, draw = ps.make_stream("ranmar", 11, dims)
    _, exp_state = jax.jit(lambda st: draw(st, n))(state0)
    adv = ps.advance_kernel_scalars(
        "ranmar", ps.stream_kernel_scalars("ranmar", state0), n
    )
    np.testing.assert_allclose(float(adv["c"]), float(exp_state["c"]),
                               rtol=0, atol=0)
    assert int(adv["ptr"]) == (ps._RANMAR_PTR0 - n) % 97


@pytest.mark.parametrize("name", ["ranlux3", "ranmar"])
def test_ref_stage_kernel_consumes_dense_stream_draws(name):
    """Same contract as the counter-free generators: the in-kernel draw at
    each active site equals the site's next dense-stream draws, across
    TWO consecutive same-parity stages (the second ranlux stage crosses
    the luxury skip at global draw 24)."""
    parity = 0
    cfg = SimConfig(group=2, dims=DIMS, beta=2.4, seed=7,
                    rng_mode=f"prngcl:{name}", engine="xla")
    u0 = hot_start(cfg, rng.make_base_key(3))
    us = peng.split_links(u0)
    n_upd = stage_uniform_count(2, "heatbath", cfg.kp_trials, cfg.n_hit)

    state, draw = ps.make_stream(name, cfg.seed, DIMS)
    packed = _packed_state(name, cfg.seed)
    words = packed["words_e"]
    dense0 = ps.make_stream_state_host(name, cfg.seed, DIMS)
    scalars = ps.stream_kernel_scalars(
        name, {k: jnp.asarray(v) for k, v in dense0.items()}
    )
    u_ref = u0
    key2 = rng.stage_key(rng.make_base_key(cfg.seed), 0, 0)
    for mu in (1, 2):
        # expected: XLA update fed with the sites' next n_upd dense draws
        u_dense, state = jax.jit(lambda st: draw(st, n_upd))(state)
        a = staple_sum(u_ref, mu)
        new_ref = update_links(
            u_ref[mu], a, "heatbath", cfg.beta, None, None,
            uniforms=ps.open01(u_dense), k_trials=cfg.kp_trials,
        )
        exp = jnp.where(parity_mask(DIMS, parity), new_ref, u_ref[mu])
        u_ref = u_ref.at[mu].set(exp)

        new, words, scalars = pupdate.stage_update(
            us, mu, parity, "heatbath", cfg.beta, key2, DIMS,
            k_trials=cfg.kp_trials, rng_mode=cfg.rng_mode, interpret=True,
            stream_state=words, stream_scalars=scalars,
        )
        us = us[:2 * mu] + (new,) + us[2 * mu + 1:]
        got = peng.join_dir((us[2 * mu], us[2 * mu + 1]), DIMS, 2)
        mask = np.asarray(parity_mask(DIMS, parity))
        np.testing.assert_allclose(
            np.asarray(got)[..., mask], np.asarray(exp)[..., mask],
            rtol=0, atol=2e-5,
        )
    # after two stages the counters crossed draw 24: lag window, pointer
    # and counter must all match the dense stream at the active sites
    nlag = 24 if name.startswith("ranlux") else 97
    shift = (nlag - 1 - int(scalars["ptr"])) % nlag
    canon = jnp.concatenate([
        jnp.roll(words[:nlag], shift, axis=0), words[nlag:]
    ]) if name.startswith("ranlux") else jnp.roll(words, shift, axis=0)
    exp_words = peng.split_site_field(
        ps.state_to_words(name, state), DIMS
    )[parity]
    np.testing.assert_array_equal(np.asarray(canon), np.asarray(exp_words))
    if name.startswith("ranlux"):
        assert int(scalars["nb"]) == int(state["nb"])
    else:
        assert float(scalars["c"]) == float(state["c"])


def test_ranlux_runner_determinism_and_chunking():
    cfg = SimConfig(group=2, dims=DIMS, beta=2.4, seed=5,
                    rng_mode="prngcl:ranlux3", reunit_every=3)
    run = peng.make_pallas_chunk_runner(cfg, interpret=True)
    key = rng.make_base_key(cfg.seed)
    st0 = (run.pack(jax.jit(lambda: jnp.stack(
        [jnp.eye(2, dtype=jnp.complex64)[..., None, None, None, None]
         .repeat(DIMS[0], 2).repeat(DIMS[1], 3).repeat(DIMS[2], 4)
         .repeat(DIMS[3], 5)] * 4))()), run.make_stream_state0())

    st_a, obs_a = run.packed(st0, key, 0, 4, 2)
    rows = []
    st_b = st0
    for k in range(2):
        st_b, o = run.packed(st_b, key, 2 * k, 2, 2)
        rows.append(np.asarray(o))
    np.testing.assert_array_equal(np.asarray(obs_a),
                                  np.concatenate(rows, axis=0))
    for xa, xb in zip(jax.tree_util.tree_leaves(st_a),
                      jax.tree_util.tree_leaves(st_b)):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
    # physics sanity from a cold start
    assert 0.4 < np.asarray(obs_a)[-1, 0] < 0.95


def test_packed_stream_checkpoint_roundtrip(tmp_path, monkeypatch):
    """Pallas stream engines checkpoint their PACKED state (links +
    kernel-layout generator words) directly — no canonical-field
    materialization (the same HBM argument as the 64^4 packed path) —
    and resume continues the chain bit-exactly.  A dense-layout engine
    must refuse the packed state, not silently reseed."""
    import os

    import qcdgpu_tpu.sim as sim_mod
    from qcdgpu_tpu import Simulation

    cfg = SimConfig(group=2, dims=DIMS, beta=2.4, seed=5,
                    rng_mode="prngcl:xor128", reunit_every=3)
    monkeypatch.setattr(
        sim_mod, "make_chunk_runner",
        lambda c: peng.make_pallas_chunk_runner(c, interpret=True))
    sim = Simulation(cfg)
    sim.run(2, measure_every=2)
    p = str(tmp_path / "ck")
    sim.save(p)
    assert os.path.isdir(p), "packed stream state must use the dir format"

    sim2 = Simulation.load(p)
    o_a = sim.run(2, measure_every=2)
    o_b = sim2.run(2, measure_every=2)
    np.testing.assert_array_equal(o_a, o_b)

    # the dense XLA stream engine must refuse the packed layout
    monkeypatch.undo()
    with pytest.raises(ValueError, match="layout mismatch"):
        Simulation.load(p)


@pytest.mark.parametrize("name", ["xor128", "ranlux3"])
def test_stream_stage_ytiled_bit_identical(name):
    """PRNGCL stream stages compose with big-lattice Y tiling (QCDGPU's
    BIG_LATTICE mode ran with its full PRNG family — SURVEY.md §2
    multi-device row): per-site generator state tiles alongside the links
    with no halos.  State words and (ref-based) advanced scalars must be
    BIT-identical to the untiled stage (integer/exact recurrences); links
    agree to f32 rounding order only — the compiler contracts FMAs
    differently for different block shapes (same 2e-5 bound as
    test_y_tiled_kernels_match_untiled; every draw is identical, so any
    larger difference is a flipped accept decision = real bug).  Covers
    both stream families: counter-free (xor128) and ref-based lag window
    + scalar channel (ranlux3)."""
    cfg = SimConfig(group=2, dims=DIMS, beta=2.4, seed=7,
                    rng_mode=f"prngcl:{name}")
    u0 = hot_start(cfg, rng.make_base_key(3))
    us = peng.split_links(u0)
    packed = _packed_state(name, cfg.seed)
    key2 = rng.stage_key(rng.make_base_key(cfg.seed), 0, 0)
    kw = dict(k_trials=cfg.kp_trials, rng_mode=cfg.rng_mode, interpret=True,
              stream_state=packed["words_e"])
    if name in ps.REF_STREAM_GENERATORS:
        dense0 = ps.make_stream_state_host(name, cfg.seed, DIMS)
        kw["stream_scalars"] = ps.stream_kernel_scalars(
            name, {k: jnp.asarray(v) for k, v in dense0.items()})
    out_u = pupdate.stage_update(us, 1, 0, "heatbath", cfg.beta, key2,
                                 DIMS, **kw)
    out_t = pupdate.stage_update_ytiled(us, 1, 0, "heatbath", cfg.beta,
                                        key2, DIMS, 2, **kw)
    np.testing.assert_allclose(np.asarray(out_u[0]), np.asarray(out_t[0]),
                               rtol=0, atol=2e-5)
    la = jax.tree_util.tree_leaves(out_u[1:])
    lb = jax.tree_util.tree_leaves(out_t[1:])
    assert len(la) == len(lb) and len(la) >= 1
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_stream_engine_ytiled_matches_untiled():
    """Full tiled chunk runner in a stream mode vs untiled: identical
    draws, so chains agree to f32 rounding order over 2 sweeps (state
    words exactness is covered per-stage above; here chain-level obs/links
    get the engine-equivalence bounds).  16 tiled stage programs: slow to
    compile, so RUN_SLOW; the per-stage twin above runs per-commit."""
    cfg = SimConfig(group=2, dims=DIMS, beta=2.4, seed=5,
                    rng_mode="prngcl:xor128", reunit_every=2)
    key = rng.make_base_key(cfg.seed)
    run_u = peng.make_pallas_chunk_runner(cfg, interpret=True)
    st0 = (run_u.pack(hot_start(cfg, key).astype(jnp.complex64)),
           run_u.make_stream_state0())
    st_a, obs_a = run_u.packed(st0, key, 0, 2, 2)
    run_t = peng.make_pallas_chunk_runner(cfg.replace(y_block=2),
                                          interpret=True)
    st_b, obs_b = run_t.packed(st0, key, 0, 2, 2)
    np.testing.assert_allclose(np.asarray(obs_a), np.asarray(obs_b),
                               rtol=0, atol=5e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st_a),
                    jax.tree_util.tree_leaves(st_b)):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f" and a.dtype.itemsize == 4 and a.ndim >= 6:
            # link arrays: f32 rounding-order drift across block shapes,
            # amplified through 2 sweeps of dependent stages
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-3)
        else:
            # generator words / scalars: exact integer recurrences
            np.testing.assert_array_equal(a, b)
