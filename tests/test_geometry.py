"""Staples / plaquette / Polyakov vs the independent numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from qcdgpu_tpu.ops import measure
from qcdgpu_tpu.ops.lattice import parity_mask, site_index
from qcdgpu_tpu.ops.staples import staple_sum

import oracle

DIMS = (4, 2, 2, 4)


@pytest.fixture(scope="module")
def u_np():
    return oracle.random_links(DIMS, 3, seed=11)


@pytest.fixture(scope="module")
def u(u_np):
    return jnp.asarray(u_np)


def test_mean_plaquette_matches_oracle(u, u_np):
    got = [float(x) for x in measure.mean_plaquette(u)]
    want = oracle.mean_plaquette(u_np)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_polyakov_matches_oracle(u, u_np):
    pre, pim = measure.polyakov_loop(u)
    want = oracle.polyakov_loop(u_np)
    np.testing.assert_allclose([float(pre), float(pim)], [want.real, want.imag],
                               rtol=1e-10, atol=1e-10)


def test_staples_match_oracle(u, u_np):
    for mu in range(4):
        a = np.asarray(staple_sum(u, mu))
        for x in [(0, 0, 0, 0), (1, 0, 1, 3), (3, 1, 0, 2), (2, 1, 1, 1)]:
            want = oracle.staple_sum_site(u_np, x, mu)
            got = a[(slice(None), slice(None)) + x]
            np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_staple_action_identity(u, u_np):
    """sum_mu,x Re tr(U_mu(x) A_mu(x)) counts every plaquette 4 times."""
    from qcdgpu_tpu.ops import sun

    total = 0.0
    for mu in range(4):
        a = staple_sum(u, mu)
        total += float(jnp.sum(sun.retrace(sun.mul(u[mu], a))))
    n = 3
    plq, _, _ = oracle.mean_plaquette(u_np)
    n_plaq = 6 * int(np.prod(DIMS))
    np.testing.assert_allclose(total, 4.0 * plq * n * n_plaq, rtol=1e-9)


def test_gauge_invariance(u_np):
    """Plaquette/action/Polyakov-magnitude are gauge invariant."""
    v_np = oracle.random_gauge_transform(u_np, seed=5)
    u_j, v_j = jnp.asarray(u_np), jnp.asarray(v_np)
    p1 = [float(x) for x in measure.mean_plaquette(u_j)]
    p2 = [float(x) for x in measure.mean_plaquette(v_j)]
    np.testing.assert_allclose(p1, p2, rtol=1e-9, atol=1e-10)


def test_parity_mask_and_site_index():
    m0 = np.asarray(parity_mask(DIMS, 0))
    m1 = np.asarray(parity_mask(DIMS, 1))
    assert (m0 ^ m1).all()
    for x in np.ndindex(*DIMS):
        assert m0[x] == (sum(x) % 2 == 0)
    idx = np.asarray(site_index(DIMS))
    assert idx.dtype == np.uint32
    flat = idx.ravel()
    assert len(np.unique(flat)) == flat.size
    assert idx[0, 0, 0, 0] == 0 and idx[0, 0, 0, 1] == 1
