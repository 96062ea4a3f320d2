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
    # sharded lattice: chain sharding stays off in auto mode
    sh = SimConfig(**{**CFG, "dims": (8, 4, 4, 4), "mesh": (2, 1, 1, 1)})
    assert BetaScan._resolve_chain_mesh(0, sh, 4) == 1


def test_chain_mesh_validation():
    with pytest.raises(ValueError, match="divide evenly"):
        from qcdgpu_tpu.parallel.mesh import make_chain_mesh

        make_ensemble_runner(SimConfig(**CFG), 3, chain_mesh=make_chain_mesh(2))
    with pytest.raises(ValueError, match="unsharded lattice"):
        from qcdgpu_tpu.parallel.mesh import make_chain_mesh

        cfg = SimConfig(**{**CFG, "dims": (8, 4, 4, 4), "mesh": (2, 1, 1, 1)})
        make_ensemble_runner(cfg, 4, chain_mesh=make_chain_mesh(2))
