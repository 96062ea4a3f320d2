"""In-kernel building blocks for the Pallas TPU engine.

The Pallas engine works on a *split-float slab* layout: each direction's
link field is a float32 array ``[N, N, 2, X, Y, Z*T]`` (matrix row, matrix
col, re/im, then site axes with Z and T flattened so the lane dimension is
Z*T — a multiple of 128 for production lattices, which is what the (8, 128)
VPU tiling wants).  Kernels grid over X; the Y/Z/T neighbor shifts all stay
inside one block as VMEM rolls, while X±1 neighbors arrive as extra inputs
whose BlockSpec index_map points at the wrapped neighboring block
(qcdgpu_tpu/ops/pallas/update.py).

Inside a kernel a complex number is a ``(re, im)`` pair of [Y, Z*T] arrays
and an SU(N) matrix is an N x N nested tuple of those pairs — fully
unrolled, so Mosaic keeps the whole staple/update arithmetic in vector
registers/VMEM with zero HBM round-trips.

Capability parity: the SU(N) device math of QCDGPU's kernel/su2cl.cl,
su3cl.cl (reference mount empty; SURVEY.md §2 "SU(N) matrix math headers").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu

_U32 = jnp.uint32

# ---------------------------------------------------------------------------
# complex scalars as (re, im) pairs of equal-shape f32 arrays
# ---------------------------------------------------------------------------


def cmul(a, b):
    return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])


def cmul_conj(a, b):
    """a * conj(b)."""
    return (a[0] * b[0] + a[1] * b[1], a[1] * b[0] - a[0] * b[1])


def cadd(a, b):
    return (a[0] + b[0], a[1] + b[1])


def conj(a):
    return (a[0], -a[1])


# ---------------------------------------------------------------------------
# matrices as N x N nested tuples of complex pairs
# ---------------------------------------------------------------------------


def mmul(a, b):
    """Matrix product of two nested-tuple matrices."""
    n, kk, m = len(a), len(b), len(b[0])
    out = []
    for i in range(n):
        row = []
        for k in range(m):
            acc = cmul(a[i][0], b[0][k])
            for j in range(1, kk):
                acc = cadd(acc, cmul(a[i][j], b[j][k]))
            row.append(acc)
        out.append(tuple(row))
    return tuple(out)


def mmul_bdag(a, b):
    """a @ b^dagger without materializing the dagger."""
    n, kk, m = len(a), len(a[0]), len(b)
    out = []
    for i in range(n):
        row = []
        for k in range(m):
            acc = cmul_conj(a[i][0], b[k][0])
            for j in range(1, kk):
                acc = cadd(acc, cmul_conj(a[i][j], b[k][j]))
            row.append(acc)
        out.append(tuple(row))
    return tuple(out)


def mdag(a):
    n = len(a)
    return tuple(tuple(conj(a[j][i]) for j in range(n)) for i in range(n))


def madd(a, b):
    n = len(a)
    return tuple(
        tuple(cadd(a[i][j], b[i][j]) for j in range(len(a[0]))) for i in range(n)
    )


def mmap(f, a):
    return tuple(tuple(f(c) for c in row) for row in a)


def mmap2(f, a, b):
    return tuple(
        tuple(f(ca, cb) for ca, cb in zip(ra, rb)) for ra, rb in zip(a, b)
    )


# ---------------------------------------------------------------------------
# in-kernel threefry (bit-identical to qcdgpu_tpu.ops.rng)
# ---------------------------------------------------------------------------

_ROT = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY_C = 0x1BD11BDA


def _rotl(x, r):
    return (x << _U32(r)) | (x >> _U32(32 - r))


def threefry2x32(k0, k1, x0, x1):
    """20-round threefry on u32 arrays — same bits as ops.rng.threefry2x32."""
    x0 = x0 + k0
    x1 = x1 + k1
    ks = (k0, k1, k0 ^ k1 ^ _U32(_PARITY_C))
    inject = 0
    for r in range(20):
        x0 = x0 + x1
        x1 = _rotl(x1, _ROT[r % 8])
        x1 = x1 ^ x0
        if (r + 1) % 4 == 0:
            inject += 1
            x0 = x0 + ks[inject % 3]
            x1 = x1 + ks[(inject + 1) % 3] + _U32(inject)
    return x0, x1


def bits_to_uniform(bits):
    """Same open-(0,1) 24-bit grid as ops.rng._bits_to_uniform.

    Mosaic has no u32->f32 cast; the 24-bit value fits int32 exactly, so the
    i32 hop is value-preserving.
    """
    h = (bits >> _U32(8)).astype(jnp.int32).astype(jnp.float32)
    return (h + jnp.float32(0.5)) * jnp.float32(1.0 / (1 << 24))


def slab_uniforms(k0, k1, sidx, n, slot0=0):
    """n uniforms per site on a [Y, ZT] slab; slot layout identical to
    ops.rng.site_uniforms (pair p -> slots slot0+p; b0 -> u[2p], b1 ->
    u[2p+1]), so a kernel built on this draws bit-identical randomness to
    the XLA engine."""
    out = []
    for p in range((n + 1) // 2):
        b0, b1 = threefry2x32(k0, k1, sidx, jnp.full_like(sidx, slot0 + p))
        out.append(bits_to_uniform(b0))
        out.append(bits_to_uniform(b1))
    return out[:n]


def hw_uniforms(n, shape):
    """n uniforms per site from the TPU hardware PRNG (rng_mode="hw").

    Caller must have seeded via pltpu.prng_seed.  Statistically equivalent
    stream (validated by the RNG parity suite's consumption tests), NOT
    bit-compatible with threefry — use for throughput, not for bit-exact
    reproducibility across engines/shardings.
    """
    out = []
    for _ in range(n):
        bits = pltpu.prng_random_bits(shape)
        out.append(bits_to_uniform(pltpu.bitcast(bits, _U32)))
    return out


# ===========================================================================
# Even/odd T-packed layout + two-row SU(3) codec (engine v2)
# ===========================================================================
#
# Packed state: one array per (direction, parity): [R, N, 2, X, Y, Z*T2],
# T2 = T/2.  Site (x,y,z,t) of parity p = (x+y+z+t) % 2 lives at slot
# t // 2; within a (x,y,z) row the valid t values have parity
# tau = (p - x - y - z) % 2.  R = 2 rows stored: the full matrix for SU(2),
# the first two rows for SU(3) with row 2 = conj(row0 x row1) reconstructed
# on load (the same memory-bandwidth codec as QCDGPU's packed SU(3) storage,
# kernel/su3_matrix_memory.cl — SURVEY.md §2 "SU(N) matrix math headers");
# det = +1 holds by construction.
#
# Shift rules (all parities flip per unit step):
#   X +-1 : slab-level (BlockSpec index_map), slot unchanged
#   Y +-1 : roll along Y, slot unchanged
#   Z +-1 : roll along the flattened lane axis by -+T2, slot unchanged
#   T +-1 : slot shifts by one ONLY on rows where tau_dest has the
#           "crossing" parity; in-Z-block wrap handled like the dense case.


def load_mat_packed_fn(fetch, n):
    """load_mat_packed with a component source function: fetch(r, j, c)
    returns the [rows, ZT2] array of stored row r, column j, re/im c.
    Lets the Y-tiled kernels assemble halo-padded components BEFORE the
    SU(3) third-row codec runs, so the cross-product reconstruction is
    done once on the padded rows instead of once per operand tile."""
    rows = [
        tuple((fetch(r, j, 0), fetch(r, j, 1)) for j in range(n))
        for r in range(2)
    ]
    return _codec_rows(rows, n)


def load_mat_packed(ref, n):
    """[R, N, 2, 1, Y, ZT2]-block ref -> full N x N matrix tuple."""
    rows = [
        tuple((ref[r, j, 0, 0], ref[r, j, 1, 0]) for j in range(n))
        for r in range(2)
    ]
    return _codec_rows(rows, n)


def _codec_rows(rows, n):
    """Two stored rows -> full N x N matrix (SU(3): row2 = conj(r0 x r1))."""
    if n == 2:
        return (rows[0], rows[1])
    r0, r1 = rows

    def cx(a, b):
        return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])

    r2 = tuple(
        conj((cx(r0[(k + 1) % 3], r1[(k + 2) % 3])[0]
              - cx(r0[(k + 2) % 3], r1[(k + 1) % 3])[0],
              cx(r0[(k + 1) % 3], r1[(k + 2) % 3])[1]
              - cx(r0[(k + 2) % 3], r1[(k + 1) % 3])[1]))
        for k in range(3)
    )
    return (r0, r1, r2)


def store_mat_packed(ref, m, n):
    """Store the first two rows (codec for SU(3), full matrix for SU(2))."""
    for r in range(2):
        for j in range(n):
            ref[r, j, 0, 0] = m[r][j][0]
            ref[r, j, 1, 0] = m[r][j][1]


def _tau_mask(p_dest, x, dims2):
    """bool [Y, ZT2]: tau_dest == 1 rows (slot-crossing rows for T shifts).

    tau_dest = (p_dest - x - y - z) % 2; constant along the T2 factor.
    """
    _, y_dim, z_dim, t2 = dims2
    zt2 = z_dim * t2
    y = jax.lax.broadcasted_iota(jnp.int32, (y_dim, zt2), 0)
    f = jax.lax.broadcasted_iota(jnp.int32, (y_dim, zt2), 1)
    z = f // t2
    return ((p_dest + x + y + z) % 2) == 1


def shift_comp_packed(v, lat_axis, d, p_dest, x, dims2):
    """f'(site) = f(site + d*axis_hat) on packed [Y, ZT2] components.

    v holds the source field (parity 1 - p_dest relative to the output
    alignment); p_dest is the static parity of the DESTINATION site set and
    x the scalar grid-slab index (both enter only the T-shift row masks).
    """
    _, y_dim, z_dim, t2 = dims2
    zt2 = z_dim * t2
    if lat_axis == 1:
        return pltpu.roll(v, (-d) % y_dim, axis=0)
    if lat_axis == 2:
        return pltpu.roll(v, ((-d) * t2) % zt2, axis=1)
    if lat_axis == 3:
        k_ids = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1) % t2
        cross = _tau_mask(p_dest if d == 1 else 1 - p_dest, x, dims2)
        if d == 1:
            # crossing rows (tau_dest == 1): slot k <- k+1, Z-block wrap
            moved = jnp.where(
                k_ids == t2 - 1,
                pltpu.roll(v, (t2 - 1) % zt2, axis=1),
                pltpu.roll(v, (zt2 - 1) % zt2, axis=1),
            )
        elif d == -1:
            # crossing rows (tau_dest == 0): slot k <- k-1, Z-block wrap
            moved = jnp.where(
                k_ids == 0,
                pltpu.roll(v, (1 - t2) % zt2, axis=1),
                pltpu.roll(v, 1, axis=1),
            )
        else:
            raise ValueError("|d| must be 1 for T shifts")
        return jnp.where(cross, moved, v)
    raise ValueError(f"in-block packed shift on lattice axis {lat_axis}")


def shift_mat_packed(m, lat_axis, d, p_dest, x, dims2):
    return mmap(
        lambda c: (
            shift_comp_packed(c[0], lat_axis, d, p_dest, x, dims2),
            shift_comp_packed(c[1], lat_axis, d, p_dest, x, dims2),
        ),
        m,
    )


def site_index_packed(parity, dims):
    """uint32 [X, Y, Z*T/2] of global DENSE site indices of the packed
    slots (whole lattice; the per-x-slab variant below is what the update
    kernels use).  Global index matches ops.lattice.site_index on the
    unpacked lattice, so threefry draws keyed off it are bit-identical
    between dense and packed layouts — this is what lets the packed-direct
    start constructors (ops.pallas.engine.packed_hot_start) reproduce the
    dense hot start exactly without materializing the canonical field."""
    x_dim, y_dim, z_dim, t_dim = dims
    t2 = t_dim // 2
    zt2 = z_dim * t2
    shape = (x_dim, y_dim, zt2)
    x = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    y = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    f = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    z = f // t2
    k = f % t2
    tau = (parity + x + y + z) % 2  # t = 2k + tau
    t = 2 * k + tau
    idx = ((x * y_dim + y) * z_dim + z) * t_dim + t
    return idx.astype(_U32)


def slab_site_index_packed(x, parity, dims, y0=0, local_y=0):
    """uint32 [Y_loc, ZT2] of global DENSE site indices of the packed slots.

    Global index matches ops.lattice.site_index on the unpacked lattice, so
    threefry streams are identical between dense and packed engines.

    y0/local_y: for Y-sharded kernels, rows span global y = y0 .. y0 +
    local_y - 1 (defaults: the full unsharded Y extent) — so sharded and
    unsharded chains draw identical per-site randomness.
    """
    _, y_dim, z_dim, t_dim = dims
    t2 = t_dim // 2
    zt2 = z_dim * t2
    rows = local_y if local_y else y_dim
    y = y0 + jax.lax.broadcasted_iota(jnp.int32, (rows, zt2), 0)
    f = jax.lax.broadcasted_iota(jnp.int32, (rows, zt2), 1)
    z = f // t2
    k = f % t2
    tau = (parity + x + y + z) % 2  # t = 2k + tau
    t = 2 * k + tau
    idx = ((x * y_dim + y) * z_dim + z) * t_dim + t
    return idx.astype(_U32)
