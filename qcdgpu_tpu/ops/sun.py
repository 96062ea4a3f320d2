"""SU(N) matrix algebra on fields with matrix indices LEADING.

Field convention
----------------
A gauge-field element is stored as ``[N, N, *site_dims]`` (complex); an SU(2)
element in quaternion form is ``[4, *site_dims]`` (real).  Matrix indices lead
so site dimensions stay minor and contiguous: on TPU the VPU (8x128) then
vectorizes over sites while the small-N matrix algebra unrolls into ~N^3 fused
multiply-adds over large contiguous arrays.  (Putting the N x N dims last would
force XLA to tile 3x3 minors — hostile to the (8,128) tiling constraint.)

Quaternion convention: q = (q0, q1, q2, q3) represents the SU(2) matrix

    M(q) = q0*I + i*(q1*s1 + q2*s2 + q3*s3)
         = [[ q0 + i q3,  q2 + i q1],
            [-q2 + i q1,  q0 - i q3]]

with s_k the Pauli matrices, so det M = |q|^2 and M in SU(2) iff |q| = 1.

Capability parity: QCDGPU's SU(N) device math headers (kernel/su2cl.cl,
kernel/su3cl.cl, kernel/su3_matrix_memory.cl — reference mount empty this
session, see SURVEY.md §2 "SU(N) matrix math headers").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Generic N x N field algebra ([N, N, *sites] complex arrays)
# ---------------------------------------------------------------------------


def mul(a, b):
    """Matrix product over leading matrix dims, broadcasting over sites.

    Deliberately unrolled into N^3 elementwise multiply-adds instead of
    einsum/dot_general, for two TPU reasons:
      * a dot_general over tiny (3x3) contraction dims makes XLA emit
        temps with the matrix dims minor-most, which the (8,128) tile
        padding inflates ~113x — a 32^4 sweep then "needs" 32 GB HBM for
        an 864 MB working set (observed);
      * the default MXU matmul precision truncates f32 to bf16, inflating
        unitarity drift to ~1e-2.  Elementwise VPU ops are full f32.
    Site dims stay minor-most and contiguous; the VPU vectorizes over them.
    """
    n, m = a.shape[0], b.shape[1]
    kk = a.shape[1]
    rows = []
    for i in range(n):
        row = []
        for k in range(m):
            acc = a[i, 0] * b[0, k]
            for j in range(1, kk):
                acc = acc + a[i, j] * b[j, k]
            row.append(acc)
        rows.append(jnp.stack(row, axis=0))
    return jnp.stack(rows, axis=0)


def dagger(a):
    """Hermitian conjugate."""
    return jnp.conj(jnp.swapaxes(a, 0, 1))


def trace(a):
    """Complex trace over the leading matrix dims (explicit diagonal sum —
    keeps the op elementwise; see mul() for why einsum is avoided)."""
    acc = a[0, 0]
    for i in range(1, a.shape[0]):
        acc = acc + a[i, i]
    return acc


def retrace(a):
    """Re tr(a)."""
    return jnp.real(trace(a))


def identity_like(a):
    """Identity field with the shape/dtype of ``a`` ([N, N, *sites])."""
    n = a.shape[0]
    eye = jnp.eye(n, dtype=a.dtype).reshape((n, n) + (1,) * (a.ndim - 2))
    return jnp.broadcast_to(eye, a.shape)


def identity(n, site_dims, dtype=jnp.complex64):
    eye = jnp.eye(n, dtype=dtype).reshape((n, n) + (1,) * len(site_dims))
    return jnp.broadcast_to(eye, (n, n) + tuple(site_dims))


def det(a):
    """Determinant for N in {2, 3} ([N, N, *sites])."""
    n = a.shape[0]
    if n == 2:
        return a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    if n == 3:
        return (
            a[0, 0] * (a[1, 1] * a[2, 2] - a[1, 2] * a[2, 1])
            - a[0, 1] * (a[1, 0] * a[2, 2] - a[1, 2] * a[2, 0])
            + a[0, 2] * (a[1, 0] * a[2, 1] - a[1, 1] * a[2, 0])
        )
    raise NotImplementedError(f"det for N={n}")


def unitarity_defect(a):
    """max |U U^dag - I| over the field — cheap health check."""
    d = mul(a, dagger(a)) - identity_like(a)
    return jnp.max(jnp.abs(d))


# ---------------------------------------------------------------------------
# Reunitarization (project back onto SU(N) after roundoff drift)
# ---------------------------------------------------------------------------


def _normalize_row(r):
    """r: [N, *sites] complex -> unit norm along leading dim."""
    nrm = jnp.sqrt(jnp.sum(jnp.real(r * jnp.conj(r)), axis=0))
    return r / nrm


def reunitarize(a):
    """Project a near-SU(N) field back to SU(N).

    SU(3): Gram–Schmidt on the first two rows, third row = conj(r0 x r1)
    (guarantees det = +1 exactly — the same two-row trick QCDGPU's packed
    codec relies on).  SU(2): quaternion projection + renormalize.
    """
    n = a.shape[0]
    if n == 2:
        q = mat_to_quat(a)
        q = q / jnp.sqrt(jnp.sum(q * q, axis=0))
        return quat_to_mat(q, a.dtype)
    if n == 3:
        r0 = _normalize_row(a[0])
        r1 = a[1] - jnp.sum(jnp.conj(r0) * a[1], axis=0) * r0
        r1 = _normalize_row(r1)
        r2 = jnp.conj(cross3(r0, r1))
        return jnp.stack([r0, r1, r2], axis=0)
    raise NotImplementedError(f"reunitarize for N={n}")


def cross3(u, v):
    """Complex cross product of two [3, *sites] row fields."""
    return jnp.stack(
        [
            u[1] * v[2] - u[2] * v[1],
            u[2] * v[0] - u[0] * v[2],
            u[0] * v[1] - u[1] * v[0],
        ],
        axis=0,
    )


# ---------------------------------------------------------------------------
# SU(2) quaternion representation ([4, *sites] real arrays)
# ---------------------------------------------------------------------------


def quat_mul(p, q):
    """Quaternion product matching M(p) @ M(q) = M(quat_mul(p, q))."""
    r0 = p[0] * q[0] - p[1] * q[1] - p[2] * q[2] - p[3] * q[3]
    # vector part: p0*qv + q0*pv - pv x qv
    r1 = p[0] * q[1] + q[0] * p[1] - (p[2] * q[3] - p[3] * q[2])
    r2 = p[0] * q[2] + q[0] * p[2] - (p[3] * q[1] - p[1] * q[3])
    r3 = p[0] * q[3] + q[0] * p[3] - (p[1] * q[2] - p[2] * q[1])
    return jnp.stack([r0, r1, r2, r3], axis=0)


def quat_conj(q):
    """Conjugate (= inverse for unit quats; M(q)^dag = M(quat_conj(q)))."""
    return jnp.stack([q[0], -q[1], -q[2], -q[3]], axis=0)


def quat_norm(q):
    return jnp.sqrt(jnp.sum(q * q, axis=0))


def quat_to_mat(q, dtype=jnp.complex64):
    """[4, *sites] real -> [2, 2, *sites] complex."""
    i = jnp.array(1j, dtype=dtype)
    m00 = q[0] + i * q[3]
    m01 = q[2] + i * q[1]
    m10 = -q[2] + i * q[1]
    m11 = q[0] - i * q[3]
    return jnp.stack(
        [jnp.stack([m00, m01], axis=0), jnp.stack([m10, m11], axis=0)], axis=0
    )


def mat_to_quat(m):
    """Project a [2, 2, *sites] complex field onto quaternion form.

    Exact inverse of quat_to_mat on SU(2); for a general 2x2 matrix S this is
    the projection used by the Cabibbo–Marinari trick: Re tr(u S) =
    Re tr(u M(mat_to_quat(S))) for every u in SU(2), because the discarded
    component i*M(q') is trace-orthogonal to SU(2).
    """
    a0 = 0.5 * (jnp.real(m[0, 0]) + jnp.real(m[1, 1]))
    a1 = 0.5 * (jnp.imag(m[0, 1]) + jnp.imag(m[1, 0]))
    a2 = 0.5 * (jnp.real(m[0, 1]) - jnp.real(m[1, 0]))
    a3 = 0.5 * (jnp.imag(m[0, 0]) - jnp.imag(m[1, 1]))
    return jnp.stack([a0, a1, a2, a3], axis=0)


# ---------------------------------------------------------------------------
# SU(2) subgroups of SU(N) (Cabibbo–Marinari)
# ---------------------------------------------------------------------------


def subgroups(n):
    """The SU(2) subgroup index pairs swept by Cabibbo–Marinari."""
    if n == 2:
        return ((0, 1),)
    if n == 3:
        return ((0, 1), (0, 2), (1, 2))
    return tuple((i, j) for i in range(n) for j in range(i + 1, n))


def extract_block_quat(w, i, j):
    """Project the (i, j) 2x2 block of [N, N, *sites] field onto a quat.

    Used on W = U @ A: Re tr(u_emb @ W) = Re tr(u2 @ S) + const, with
    S = [[W_ii, W_ij], [W_ji, W_jj]].
    """
    a0 = 0.5 * (jnp.real(w[i, i]) + jnp.real(w[j, j]))
    a1 = 0.5 * (jnp.imag(w[i, j]) + jnp.imag(w[j, i]))
    a2 = 0.5 * (jnp.real(w[i, j]) - jnp.real(w[j, i]))
    a3 = 0.5 * (jnp.imag(w[i, i]) - jnp.imag(w[j, j]))
    return jnp.stack([a0, a1, a2, a3], axis=0)


def subgroup_left_mul(q, i, j, m):
    """m <- embed(M(q); rows/cols i, j) @ m for [N, N, *sites] field m.

    Only rows i and j change; costs 8 complex mults per site instead of a
    full N^3 matmul.
    """
    cdtype = m.dtype
    ii = jnp.array(1j, dtype=cdtype)
    u00 = q[0] + ii * q[3]
    u01 = q[2] + ii * q[1]
    u10 = -q[2] + ii * q[1]
    u11 = q[0] - ii * q[3]
    ri = u00 * m[i] + u01 * m[j]
    rj = u10 * m[i] + u11 * m[j]
    return m.at[i].set(ri).at[j].set(rj)
