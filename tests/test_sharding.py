"""Multi-device decomposition tests on the 8-device virtual CPU mesh.

The key acceptance test (SURVEY.md §4 "distributed"): a sharded sweep must be
BIT-identical to the unsharded one — possible because the RNG is keyed by
global site index and the per-link update has no cross-site reductions.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qcdgpu_tpu import SimConfig
from qcdgpu_tpu.ops import rng
from qcdgpu_tpu.parallel import mesh as pmesh
from qcdgpu_tpu.sim import hot_start, make_chunk_runner, make_sweep_fn

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.mark.parametrize(
    "mesh_shape",
    [(1, 1, 1, 8), (1, 1, 2, 4), (1, 2, 2, 2)],
)
def test_sharded_sweep_bit_identical(mesh_shape):
    cfg = SimConfig(group=3, dims=(4, 4, 4, 8), beta=5.7, reunit_every=0, seed=3)
    key = rng.make_base_key(3)
    u0 = hot_start(cfg, key)
    sweep = jax.jit(make_sweep_fn(cfg))
    u_ref = sweep(u0, key, 0)
    u_ref = sweep(u_ref, key, 1)

    mesh = pmesh.make_mesh(mesh_shape)
    u_sh = pmesh.shard_links(u0, mesh)
    u_out = sweep(u_sh, key, 0)
    u_out = sweep(u_out, key, 1)
    np.testing.assert_array_equal(np.asarray(u_ref), np.asarray(u_out))


def test_sharded_chunk_runner_observables_match():
    cfg = SimConfig(group=2, dims=(4, 4, 4, 8), beta=2.4, reunit_every=5, seed=9)
    key = rng.make_base_key(9)
    u0 = hot_start(cfg, key)
    run = make_chunk_runner(cfg)
    u_ref, obs_ref = run(u0, key, 0, 6, 2)

    mesh = pmesh.make_mesh((1, 1, 2, 4))
    u_sh = pmesh.shard_links(u0, mesh)
    u_out, obs_sh = run(u_sh, key, 0, 6, 2)
    # links bit-identical; observables only up to reduction order
    np.testing.assert_array_equal(np.asarray(u_ref), np.asarray(u_out))
    np.testing.assert_allclose(np.asarray(obs_ref), np.asarray(obs_sh), atol=1e-5)


def test_mesh_helpers():
    # X/Y-major: the fused sharded Pallas engine accepts X/Y meshes only,
    # so the default must keep Z/T unsharded until X and Y saturate
    assert pmesh.default_mesh_shape(8) == (4, 2, 1, 1)
    assert pmesh.default_mesh_shape(4) == (2, 2, 1, 1)
    assert pmesh.default_mesh_shape(2) == (2, 1, 1, 1)
    assert pmesh.default_mesh_shape(1) == (1, 1, 1, 1)
    # odd remainder rides T; caps honor the checkerboard limit dims//2
    assert pmesh.default_mesh_shape(3) == (1, 1, 1, 3)
    assert pmesh.default_mesh_shape(8, dims=(4, 4, 32, 32)) == (2, 2, 2, 1)
    assert pmesh.default_mesh_shape(256, dims=(32,) * 4) == (16, 16, 1, 1)
    m = pmesh.make_mesh((1, 1, 2, 4))
    assert m.shape == {"x": 1, "y": 1, "z": 2, "t": 4}
    with pytest.raises(ValueError):
        pmesh.make_mesh((2, 2, 2, 2))  # 16 > 8 devices
