"""Unit tests for SU(N) algebra (qcdgpu_tpu.ops.sun)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qcdgpu_tpu.ops import sun
from oracle import random_links, random_su2, random_su3


def _field_from(mats):
    """Stack a list of numpy [N,N] matrices into an [N, N, L] field."""
    return jnp.asarray(np.stack(mats, axis=-1))


@pytest.fixture
def rs():
    return np.random.RandomState(7)


def test_mul_dagger_trace_matches_numpy(rs):
    a = rs.randn(3, 3, 5) + 1j * rs.randn(3, 3, 5)
    b = rs.randn(3, 3, 5) + 1j * rs.randn(3, 3, 5)
    got = np.asarray(sun.mul(jnp.asarray(a), jnp.asarray(b)))
    want = np.einsum("ijs,jks->iks", a, b)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sun.dagger(jnp.asarray(a))), a.conj().transpose(1, 0, 2), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sun.retrace(jnp.asarray(a))),
        np.real(np.einsum("iis->s", a)),
        rtol=1e-6,
    )


def test_det_su3_is_one(rs):
    mats = [random_su3(rs) for _ in range(6)]
    d = np.asarray(sun.det(_field_from(mats)))
    np.testing.assert_allclose(d, 1.0, atol=1e-10)


def test_det_su2_is_one(rs):
    mats = [random_su2(rs) for _ in range(6)]
    d = np.asarray(sun.det(_field_from(mats)))
    np.testing.assert_allclose(d, 1.0, atol=1e-12)


def test_quat_roundtrip_and_mul(rs):
    q = rs.randn(4, 9)
    q /= np.linalg.norm(q, axis=0)
    m = sun.quat_to_mat(jnp.asarray(q, jnp.float32), jnp.complex64)
    # SU(2) check
    assert float(sun.unitarity_defect(m)) < 1e-6
    np.testing.assert_allclose(np.asarray(sun.det(m)), 1.0, atol=1e-6)
    # roundtrip
    q2 = np.asarray(sun.mat_to_quat(m))
    np.testing.assert_allclose(q2, q, atol=1e-6)
    # quat_mul mirrors matrix mul
    p = rs.randn(4, 9)
    p /= np.linalg.norm(p, axis=0)
    mp = sun.quat_to_mat(jnp.asarray(p, jnp.float32), jnp.complex64)
    lhs = np.asarray(sun.quat_to_mat(sun.quat_mul(jnp.asarray(p, jnp.float32), jnp.asarray(q, jnp.float32)), jnp.complex64))
    rhs = np.asarray(sun.mul(mp, m))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)
    # conj = dagger
    np.testing.assert_allclose(
        np.asarray(sun.quat_to_mat(sun.quat_conj(jnp.asarray(q, jnp.float32)), jnp.complex64)),
        np.asarray(sun.dagger(m)),
        atol=1e-6,
    )


def test_reunitarize_su3(rs):
    u = random_links((2, 2, 2, 2), 3, seed=3)[0]  # [3,3,*dims]
    noisy = jnp.asarray(u + 1e-3 * (rs.randn(*u.shape) + 1j * rs.randn(*u.shape)))
    fixed = sun.reunitarize(noisy)
    assert float(sun.unitarity_defect(fixed)) < 1e-12
    np.testing.assert_allclose(np.asarray(sun.det(fixed)), 1.0, atol=1e-12)
    # projection is close to the original SU(3) matrix
    assert float(jnp.max(jnp.abs(fixed - jnp.asarray(u)))) < 5e-3


def test_reunitarize_su2(rs):
    u = random_links((2, 2, 2, 2), 2, seed=4)[0]
    noisy = jnp.asarray(
        (u + 1e-3 * (rs.randn(*u.shape) + 1j * rs.randn(*u.shape))).astype(np.complex64)
    )
    fixed = sun.reunitarize(noisy)
    assert float(sun.unitarity_defect(fixed)) < 1e-5
    np.testing.assert_allclose(np.asarray(sun.det(fixed)), 1.0, atol=1e-5)


def test_block_projection_preserves_retrace(rs):
    """Re tr(u_emb W) - Re tr(W) == 2*[(u q)_0 - q_0] for the (i,j) block."""
    w_np = rs.randn(3, 3, 8) + 1j * rs.randn(3, 3, 8)
    w = jnp.asarray(w_np)
    for (i, j) in sun.subgroups(3):
        q = sun.extract_block_quat(w, i, j)
        uq = rs.randn(4, 8)
        uq /= np.linalg.norm(uq, axis=0)
        uqj = jnp.asarray(uq)
        w2 = sun.subgroup_left_mul(uqj.astype(jnp.float64), i, j, w)
        lhs = np.asarray(sun.retrace(w2) - sun.retrace(w))
        rhs = 2.0 * np.asarray(sun.quat_mul(uqj, q)[0] - q[0])
        np.testing.assert_allclose(lhs, rhs, rtol=1e-9, atol=1e-9)


def test_subgroup_left_mul_matches_full_matmul(rs):
    w_np = rs.randn(3, 3, 8) + 1j * rs.randn(3, 3, 8)
    w = jnp.asarray(w_np)
    uq = rs.randn(4, 8)
    uq /= np.linalg.norm(uq, axis=0)
    for (i, j) in sun.subgroups(3):
        emb = np.zeros((3, 3, 8), dtype=np.complex128)
        for s in range(8):
            e = np.eye(3, dtype=np.complex128)
            q = uq[:, s]
            e[i, i] = q[0] + 1j * q[3]
            e[i, j] = q[2] + 1j * q[1]
            e[j, i] = -q[2] + 1j * q[1]
            e[j, j] = q[0] - 1j * q[3]
            emb[:, :, s] = e
        want = np.einsum("ijs,jks->iks", emb, w_np)
        got = np.asarray(sun.subgroup_left_mul(jnp.asarray(uq), i, j, w))
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
