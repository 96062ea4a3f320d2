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
    with pytest.raises(ValueError, match="draw-count counter"):
        SimConfig(**{**base, "rng_mode": "prngcl:ranlux3",
                     "engine": "pallas"})
    with pytest.raises(ValueError, match="sharded Pallas"):
        SimConfig(**{**base, "engine": "pallas", "mesh": (2, 1, 1, 1)})
    # counter generators with lattice meshes fall back to XLA under auto
    assert resolve_engine(
        SimConfig(**{**base, "mesh": (1, 1, 2, 2)})
    ) == "xla"
