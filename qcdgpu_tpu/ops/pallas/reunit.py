"""Pallas reunitarization kernel (projection back onto SU(N)).

Same math as ops.sun.reunitarize — SU(3): Gram–Schmidt on the first two
rows + conj-cross-product third row (det = +1 exactly); SU(2): quaternion
renormalization — but fused per x-slab with no neighbor access, so it costs
one read + one write of the direction field.  Counterpart of QCDGPU's
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
    m = core.load_mat(i_ref, n)
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
        # r2 = conj(r0 x r1)
        def cross(a, b):
            return core.conj(
                (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])
            )

        def cxm(a, b):  # a*b on pairs
            return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])

        def csub(a, b):
            return (a[0] - b[0], a[1] - b[1])

        r2 = tuple(
            core.conj(csub(cxm(r0[(k + 1) % 3], r1[(k + 2) % 3]),
                           cxm(r0[(k + 2) % 3], r1[(k + 1) % 3])))
            for k in range(3)
        )
        out = (r0, r1, r2)
    else:
        raise NotImplementedError(n)
    core.store_mat(o_ref, out, n)


@lru_cache(maxsize=None)
def _reunit_call(n, dims, interpret):
    X = dims[0]
    Y, ZT = dims[1], dims[2] * dims[3]
    block = (n, n, 2, 1, Y, ZT)
    spec = pl.BlockSpec(block, lambda i: (0, 0, 0, i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_reunit_kernel, n=n),
        grid=(X,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, n, 2, X, Y, ZT), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=bool(interpret),
    )


def reunitarize_dir(s, dims, interpret=False):
    """Project one split-float direction field back onto SU(N)."""
    n = s.shape[0]
    return _reunit_call(n, tuple(dims), bool(interpret))(s)
