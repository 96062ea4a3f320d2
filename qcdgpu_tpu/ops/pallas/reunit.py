"""Pallas reunitarization kernel on packed two-row state.

Same math as ops.sun.reunitarize — SU(3): Gram–Schmidt on the two stored
rows (row 2 is implicit in the codec, always conj(row0 x row1), so only
the stored rows need projection); SU(2): quaternion renormalization —
fused per x-slab with no neighbor access.  Counterpart of QCDGPU's
reunitarize kernel (SURVEY.md §2 "Update kernels").
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import core


def _reunit_kernel(i_ref, o_ref, *, n):
    # load the two stored rows directly (no row-2 reconstruction needed)
    m = tuple(
        tuple((i_ref[r, j, 0, 0], i_ref[r, j, 1, 0]) for j in range(n))
        for r in range(2)
    )
    if n == 2:
        # quaternion projection + renormalize (ops.sun.mat_to_quat et al.)
        a0 = 0.5 * (m[0][0][0] + m[1][1][0])
        a1 = 0.5 * (m[0][1][1] + m[1][0][1])
        a2 = 0.5 * (m[0][1][0] - m[1][0][0])
        a3 = 0.5 * (m[0][0][1] - m[1][1][1])
        inv = 1.0 / jnp.sqrt(a0 * a0 + a1 * a1 + a2 * a2 + a3 * a3)
        a0, a1, a2, a3 = a0 * inv, a1 * inv, a2 * inv, a3 * inv
        out = (
            ((a0, a3), (a2, a1)),
            ((-a2, a1), (a0, -a3)),
        )
    elif n == 3:
        def norm_row(r):
            s = None
            for c in r:
                t = c[0] * c[0] + c[1] * c[1]
                s = t if s is None else s + t
            inv = 1.0 / jnp.sqrt(s)
            return tuple((c[0] * inv, c[1] * inv) for c in r)

        r0 = norm_row(m[0])
        # r1 <- m[1] - <r0, m[1]> r0   (inner product conj(r0).m[1])
        ip = None
        for c0, c1 in zip(r0, m[1]):
            t = core.cmul_conj(c1, c0)  # c1 * conj(c0)
            ip = t if ip is None else core.cadd(ip, t)
        r1 = tuple(
            (c1[0] - (ip[0] * c0[0] - ip[1] * c0[1]),
             c1[1] - (ip[0] * c0[1] + ip[1] * c0[0]))
            for c0, c1 in zip(r0, m[1])
        )
        r1 = norm_row(r1)
        out = (r0, r1)
    else:
        raise NotImplementedError(n)
    for r in range(2):
        for j in range(n):
            o_ref[r, j, 0, 0] = out[r][j][0]
            o_ref[r, j, 1, 0] = out[r][j][1]


@lru_cache(maxsize=None)
def _reunit_call(n, dims, interpret, y_block=0):
    X = dims[0]
    Y, ZT2 = dims[1], dims[2] * (dims[3] // 2)
    if y_block:
        # big-lattice VMEM path (update.auto_y_block): site-local kernel,
        # so Y tiling is a plain second grid axis — no halos
        block = (2, n, 2, 1, y_block, ZT2)
        spec = pl.BlockSpec(block, lambda i, j: (0, 0, 0, i, j, 0),
                            memory_space=pltpu.VMEM)
        grid = (X, Y // y_block)
    else:
        block = (2, n, 2, 1, Y, ZT2)
        spec = pl.BlockSpec(block, lambda i: (0, 0, 0, i, 0, 0),
                            memory_space=pltpu.VMEM)
        grid = (X,)
    return pl.pallas_call(
        partial(_reunit_kernel, n=n),
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((2, n, 2, X, Y, ZT2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=bool(interpret),
    )


def reunitarize_dir(s, dims, interpret=False, y_block=0):
    """Project one packed (direction, parity) field back onto SU(N)."""
    n = s.shape[1]
    return _reunit_call(n, tuple(dims), bool(interpret), int(y_block))(s)
