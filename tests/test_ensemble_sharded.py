"""Chain-sharded ensemble (replica parallelism over a device mesh).

Chains are independent Markov chains, so sharding the chain axis over the
mesh must be BIT-identical to the single-device vmap ensemble — the
strongest possible acceptance test, in the same spirit as the lattice
decomposition's sharded-vs-unsharded equality (SURVEY.md §4
"distributed").  Runs on the 8-device virtual CPU mesh from conftest.
"""

import numpy as np
import jax
import pytest

from qcdgpu_tpu import SimConfig
from qcdgpu_tpu.models.ensemble import BetaScan, make_ensemble_runner

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

CFG = dict(group=2, dims=(4, 4, 4, 4), beta=2.4, reunit_every=3,
           sweeps_therm=2, sweeps=4, seed=11, start="hot")
BETAS = [2.2, 2.3, 2.4, 2.5]


def _run_scan(chain_mesh):
    scan = BetaScan(SimConfig(**CFG), BETAS, chain_mesh=chain_mesh)
    scan.thermalize()
    obs = scan.run(4, measure_every=2)  # [C, n_meas, n_obs]
    return np.asarray(scan.us), obs


def test_chain_sharded_scan_bit_identical():
    us_ref, obs_ref = _run_scan(1)
    us_sh, obs_sh = _run_scan(4)
    np.testing.assert_array_equal(us_ref, us_sh)
    np.testing.assert_array_equal(obs_ref, obs_sh)


def test_chain_sharded_state_placement():
    """The packed ensemble state is actually distributed over the mesh."""
    scan = BetaScan(SimConfig(**CFG), BETAS, chain_mesh=4)
    st = scan._packed
    leaves = jax.tree_util.tree_leaves(st)
    shardings = {str(x.sharding.spec) for x in leaves if hasattr(x, "sharding")}
    assert any("'c'" in s for s in shardings), shardings


def test_chain_sharded_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "scan.npz")
    scan = BetaScan(SimConfig(**CFG), BETAS, chain_mesh=4)
    scan.thermalize()
    scan.save(path)
    # resume unsharded from a sharded run (and vice versa): same chain
    resumed = BetaScan.load(path, chain_mesh=1)
    obs_a = resumed.run(2, measure_every=2)
    resumed_sh = BetaScan.load(path, chain_mesh=2)
    obs_b = resumed_sh.run(2, measure_every=2)
    np.testing.assert_array_equal(obs_a, obs_b)


def test_chain_mesh_auto_resolution():
    cfg = SimConfig(**CFG)
    # 4 chains on 8 devices: largest divisor that fits = 4 (not 1, not 8)
    assert BetaScan._resolve_chain_mesh(0, cfg, 4) == 4
    assert BetaScan._resolve_chain_mesh(0, cfg, 8) == 8
    assert BetaScan._resolve_chain_mesh(0, cfg, 12) == 6
    assert BetaScan._resolve_chain_mesh(0, cfg, 7) == 7
    assert BetaScan._resolve_chain_mesh(2, cfg, 4) == 2  # explicit wins
    # sharded lattice: the lattice sub-mesh consumes devices, chains get
    # the rest (8 devices / 2-wide lattice -> up to 4 chain shards)
    sh = SimConfig(**{**CFG, "dims": (8, 4, 4, 4), "mesh": (2, 1, 1, 1)})
    assert BetaScan._resolve_chain_mesh(0, sh, 4) == 4
    sh4 = SimConfig(**{**CFG, "dims": (8, 8, 4, 4), "mesh": (2, 2, 1, 1)})
    assert BetaScan._resolve_chain_mesh(0, sh4, 4) == 2


def test_chain_mesh_validation():
    with pytest.raises(ValueError, match="divide evenly"):
        from qcdgpu_tpu.parallel.mesh import make_chain_mesh

        make_ensemble_runner(SimConfig(**CFG), 3, chain_mesh=make_chain_mesh(2))
    with pytest.raises(ValueError, match="lattice axes"):
        # a sharded lattice needs the combined mesh, not a plain "c" mesh
        from qcdgpu_tpu.parallel.mesh import make_chain_mesh

        cfg = SimConfig(**{**CFG, "dims": (8, 4, 4, 4), "mesh": (2, 1, 1, 1)})
        make_ensemble_runner(cfg, 4, chain_mesh=make_chain_mesh(2))


# ---------------------------------------------------------------------------
# chain x lattice: both parallelism axes in one program (VERDICT r2 weak #6)
# ---------------------------------------------------------------------------


def test_chain_lattice_xla_tier_bit_identical():
    """Chains vmapped over an XLA-tier combined mesh: the SPMD partitioner
    shards the lattice inside each chain block; site-keyed RNG makes the
    result bit-identical to the unsharded-lattice ensemble."""
    from qcdgpu_tpu.parallel.mesh import make_chain_lattice_mesh

    cfg = SimConfig(**CFG)
    scan_ref = BetaScan(cfg, BETAS[:2], chain_mesh=1)
    scan_ref.thermalize(2)
    obs_ref = scan_ref.run(4, measure_every=2)

    cfg_sh = cfg.replace(mesh=(2, 1, 1, 1))
    scan_sh = BetaScan(cfg_sh, BETAS[:2], chain_mesh=2)  # 2 x (2x1) = 4 dev
    assert scan_sh._cmesh is not None
    assert set(scan_sh._cmesh.axis_names) == {"c", "x", "y", "z", "t"}
    scan_sh.thermalize(2)
    obs_sh = scan_sh.run(4, measure_every=2)
    # links are bit-identical (site-local updates, global site keys);
    # observables agree to reduction order only — XLA re-associates the
    # partitioned measurement sums (same bound as tests/test_sharding.py)
    np.testing.assert_allclose(obs_sh, obs_ref, rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(scan_ref.us),
                                  np.asarray(scan_sh.us))


def test_chain_lattice_pallas_tier():
    """The fused chain x lattice path: per-chain X/Y-sharded Pallas sweep
    bodies vmapped over the chain block under a ("c","x","y") mesh — the
    layout QCDGPU cannot express (2 chains x 2x2 lattice shards = 8
    devices).  Agrees with the unsharded-lattice Pallas ensemble to f32
    rounding order (same threefry draws, global site keys)."""
    from functools import partial

    import jax.numpy as jnp

    from qcdgpu_tpu.ops import rng
    from qcdgpu_tpu.parallel.mesh import make_chain_lattice_mesh
    from qcdgpu_tpu.sim import hot_start

    cfg = SimConfig(group=2, dims=(4, 4, 2, 4), beta=2.4, reunit_every=2,
                    seed=11, engine="pallas")
    betas = jnp.asarray([2.3, 2.5], jnp.float32)
    keys = jnp.stack([rng.make_base_key(11 + 1000 * i) for i in range(2)])
    us0 = jax.vmap(partial(hot_start, cfg))(keys).astype(jnp.complex64)

    run_ref = make_ensemble_runner(cfg, 2, interpret=True)
    stA, obsA = run_ref((us0, betas, keys), keys[0], 0, 2, 2)

    cfg_sh = cfg.replace(mesh=(2, 2, 1, 1))
    cmesh = make_chain_lattice_mesh(2, (2, 2, 1, 1))
    run_sh = make_ensemble_runner(cfg_sh, 2, interpret=True,
                                  chain_mesh=cmesh)
    stB, obsB = run_sh((us0, betas, keys), keys[0], 0, 2, 2)

    np.testing.assert_allclose(np.asarray(obsB), np.asarray(obsA),
                               rtol=0, atol=1e-5)
    dl = float(np.max(np.abs(np.asarray(stB[0]) - np.asarray(stA[0]))))
    assert dl < 2e-5, dl
