"""Update-kernel tests: exactness of the samplers and sweep invariants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qcdgpu_tpu.config import SimConfig
from qcdgpu_tpu.ops import rng, samplers, sun
from qcdgpu_tpu.ops.lattice import parity_mask
from qcdgpu_tpu.sim import cold_start, hot_start, make_sweep_fn

import oracle


def _kp_analytic_cdf(a, grid):
    """CDF of p(x0) ~ sqrt(1-x0^2) exp(a x0) on [-1, 1], numeric."""
    x = np.linspace(-1.0, 1.0, 20001)
    pdf = np.sqrt(np.maximum(1 - x * x, 0)) * np.exp(a * (x - 1.0))
    cdf = np.cumsum(pdf)
    cdf /= cdf[-1]
    return np.interp(grid, x, cdf)


@pytest.mark.parametrize("a", [0.8, 2.5, 8.0])
def test_kp_marginal_distribution(a):
    """KS test of KP-sampled x0 against the analytic density."""
    n = 1 << 15
    key = rng.make_base_key(42 + int(a * 10))
    sidx = jnp.arange(n, dtype=jnp.uint32)
    k_trials = 12  # high so rejections are negligible for the KS test
    u = rng.site_uniforms(key, sidx, 4 * k_trials + 2)
    utr = u[: 4 * k_trials].reshape(k_trials, 4, n)
    udir = u[4 * k_trials :]
    w, ok = samplers.kp_trial_quat(jnp.full((n,), a, jnp.float32), utr, udir)
    x0 = np.asarray(w[0])[np.asarray(ok)]
    assert ok.mean() > 0.999
    xs = np.sort(x0)
    emp = (np.arange(len(xs)) + 1.0) / len(xs)
    ks = np.max(np.abs(emp - _kp_analytic_cdf(a, xs)))
    # KS critical value ~1.63/sqrt(n) at 1% significance
    assert ks < 2.0 / np.sqrt(len(xs)), f"KS={ks} at a={a}"


def test_kp_direction_uniform_on_sphere():
    n = 1 << 14
    key = rng.make_base_key(3)
    sidx = jnp.arange(n, dtype=jnp.uint32)
    u = rng.site_uniforms(key, sidx, 6)
    utr = u[:4].reshape(1, 4, n)
    w, ok = samplers.kp_trial_quat(jnp.full((n,), 4.0, jnp.float32), utr, u[4:])
    v = np.asarray(w[1:]) / np.maximum(np.linalg.norm(np.asarray(w[1:]), axis=0), 1e-12)
    # each component of a uniform unit vector has mean 0, var 1/3
    for c in range(3):
        assert abs(v[c].mean()) < 5.0 / np.sqrt(n)
        assert abs(v[c].var() - 1.0 / 3.0) < 10.0 / np.sqrt(n)


def test_heatbath_unit_quat_output():
    """Sampled flips are unit quaternions (SU(2) elements)."""
    n = 4096
    rs = np.random.RandomState(0)
    qw = jnp.asarray(rs.randn(4, n).astype(np.float32) * 2.0)
    key = rng.make_base_key(17)
    sidx = jnp.arange(n, dtype=jnp.uint32)
    uu = rng.site_uniforms(key, sidx, samplers.kp_uniforms_per_subgroup(4))
    u = samplers.heatbath_flip(qw, jnp.float32(2.0), uu, 4)
    np.testing.assert_allclose(np.asarray(sun.quat_norm(u)), 1.0, atol=1e-5)


def test_overrelax_preserves_retrace():
    rs = np.random.RandomState(1)
    w_np = rs.randn(3, 3, 64) + 1j * rs.randn(3, 3, 64)
    w = jnp.asarray(w_np)
    for (i, j) in sun.subgroups(3):
        q = sun.extract_block_quat(w, i, j)
        u = samplers.overrelax_flip(q)
        w2 = sun.subgroup_left_mul(u.astype(jnp.float64), i, j, w)
        np.testing.assert_allclose(
            np.asarray(sun.retrace(w2)), np.asarray(sun.retrace(w)), rtol=1e-9
        )
        # and it is an involution-distance move: u != identity generically
        assert float(jnp.max(jnp.abs(u[0] - 1.0))) > 1e-3


@pytest.mark.parametrize("group,alg", [(2, "heatbath"), (3, "heatbath"),
                                       (3, "metropolis")])
def test_sweep_preserves_unitarity_and_changes_parity_only(group, alg):
    cfg = SimConfig(group=group, dims=(4, 4, 4, 4), beta=2.0, algorithm=alg,
                    reunit_every=0, seed=5)
    sweep = make_sweep_fn(cfg)
    u0 = hot_start(cfg, rng.make_base_key(5))
    u1 = jax.jit(sweep)(u0, rng.make_base_key(5), 0)
    for mu in range(4):
        assert float(sun.unitarity_defect(u1[mu])) < 1e-4
        np.testing.assert_allclose(np.asarray(sun.det(u1[mu])), 1.0, atol=1e-4)
    # the sweep actually moved every link (both parities, all dirs)
    moved = np.asarray(jnp.max(jnp.abs(u1 - u0), axis=(1, 2)))
    assert (moved > 1e-6).all() if alg == "heatbath" else (moved > 1e-6).mean() > 0.5


def test_single_stage_touches_one_parity():
    """Masked stage must leave the other parity bit-identical."""
    cfg = SimConfig(group=3, dims=(4, 4, 4, 4), beta=5.0, reunit_every=0)
    from qcdgpu_tpu.ops.staples import staple_sum
    from qcdgpu_tpu.ops.lattice import site_index
    from qcdgpu_tpu.ops.samplers import update_links

    u = hot_start(cfg, rng.make_base_key(8))
    key = rng.stage_key(rng.make_base_key(8), 0, 0)
    mu, parity = 1, 0
    a = staple_sum(u, mu)
    new = update_links(u[mu], a, "heatbath", cfg.beta, key, site_index(cfg.dims))
    mask = parity_mask(cfg.dims, parity)
    u1 = u.at[mu].set(jnp.where(mask, new, u[mu]))
    changed = np.asarray(jnp.any(jnp.abs(u1[mu] - u[mu]) > 0, axis=(0, 1)))
    m = np.asarray(mask)
    assert not changed[~m].any()
    assert changed[m].mean() > 0.99


def test_cold_start_first_sweep_plaquette_drops():
    from qcdgpu_tpu.ops.measure import mean_plaquette

    cfg = SimConfig(group=3, dims=(4, 4, 4, 4), beta=6.0, reunit_every=0)
    u = cold_start(cfg)
    p0 = float(mean_plaquette(u)[0])
    assert abs(p0 - 1.0) < 1e-6
    sweep = make_sweep_fn(cfg)
    u = jax.jit(sweep)(u, rng.make_base_key(0), 0)
    p1 = float(mean_plaquette(u)[0])
    assert 0.3 < p1 < 0.95


def test_metropolis_acceptance_moves_toward_equilibrium():
    from qcdgpu_tpu.ops.measure import mean_plaquette

    cfg = SimConfig(group=3, dims=(4, 4, 4, 4), beta=6.0,
                    algorithm="metropolis", n_hit=3, reunit_every=0)
    sweep = jax.jit(make_sweep_fn(cfg))
    u = hot_start(cfg, rng.make_base_key(1))
    p_hot = float(mean_plaquette(u)[0])
    for s in range(10):
        u = sweep(u, rng.make_base_key(1), s)
    p = float(mean_plaquette(u)[0])
    assert p > p_hot + 0.1  # beta=6 equilibrium is ordered; must rise fast


def test_kp_exhaust_rate_tracking():
    """cfg.track_kp_exhaust: the measured identity-fallback rate of the
    fixed-K KP sampler (VERDICT r2 #7 — the eps ~ 1e-6 exactness footnote
    of samplers.py becomes data).  Strong coupling at K=1 exhausts often;
    the production point beta=6/K=4 must be ~1e-6-class.  Tracking must
    not perturb the chain (the accumulator rides outside the update)."""
    from qcdgpu_tpu.ops.measure import obs_names
    from qcdgpu_tpu.sim import make_chunk_runner

    dims = (4, 4, 4, 4)
    key = rng.make_base_key(1)
    base = SimConfig(group=3, dims=dims, beta=0.5, kp_trials=1,
                     engine="xla", seed=1, start="hot", reunit_every=0)
    u0 = hot_start(base, key)

    cfg = base.replace(track_kp_exhaust=True)
    assert obs_names(cfg)[-1] == "kp_exhaust_rate"
    u_t, obs = make_chunk_runner(cfg)(u0, key, 0, 2, 2)
    rate_k1 = float(np.asarray(obs)[:, -1].mean())
    assert 0.3 < rate_k1 < 1.0  # beta=0.5, K=1: rejection-dominated

    u_p, _ = make_chunk_runner(base)(u0, key, 0, 2, 2)
    assert np.array_equal(np.asarray(u_t), np.asarray(u_p))

    cfg6 = cfg.replace(beta=6.0, kp_trials=4)
    _, obs6 = make_chunk_runner(cfg6)(u0, key, 0, 2, 2)
    assert float(np.asarray(obs6)[:, -1].max()) < 1e-4
