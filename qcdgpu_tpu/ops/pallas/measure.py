"""Pallas on-device observable reductions on packed state.

Plaquette / Wilson-action sums as fused kernels over the link field — the
TPU counterpart of QCDGPU's workgroup tree-reduction measurement kernels
(kernel/su*_measurements_cl.cl; SURVEY.md §2 "Measurement kernels").  One
kernel per base-site parity (the packed layout stores parities separately);
the caller adds the two.  The Polyakov loop keeps the XLA log-depth
pairwise product (ops.measure.polyakov_from_ut): it runs on the rare
measurement path and its T-axis product does not fit the slab stencil.

Output: per-plane Re tr P sums in SMEM, accumulated across the X grid.
Plane order: (0,1), (0,2), (0,3), (1,2), (1,3), (2,3).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import core
from .update import _LoadCtx, _PlanCtx

PLANES = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def _plaquettes(ctx):
    """Re tr P for each plane at the ctx's base-site parity: list of 6."""
    out = []
    for mu, nu in PLANES:
        a = core.mmul(ctx.U(mu), ctx.shifted(nu, mu, 1))
        b = core.mmul(ctx.U(nu), ctx.shifted(mu, nu, 1))
        # Re tr(a b^+) = sum_{i,k} Re(a_ik * conj(b_ik))
        tr = None
        n = len(a)
        for r in range(n):
            for c in range(n):
                t = a[r][c][0] * b[r][c][0] + a[r][c][1] * b[r][c][1]
                tr = t if tr is None else tr + t
        out.append(tr)
    return out


def _plq_slabs(parity, n):
    plan = _PlanCtx(parity, n)
    _plaquettes(plan)
    return tuple(plan.slabs)


def _plq_kernel(*refs, parity, n, dims, slabs):
    o_ref = refs[-1]
    x = pl.program_id(0)
    dims2 = (dims[0], dims[1], dims[2], dims[3] // 2)
    ctx = _LoadCtx(parity, n, slabs, refs[:-1], x, dims2)

    @pl.when(x == 0)
    def _():
        for p in range(6):
            o_ref[p, 0] = 0.0

    for p, tr in enumerate(_plaquettes(ctx)):
        o_ref[p, 0] += jnp.sum(tr)


@lru_cache(maxsize=None)
def _plq_call(n, dims, parity, interpret):
    X = dims[0]
    Y, ZT2 = dims[1], dims[2] * (dims[3] // 2)
    slabs = _plq_slabs(parity, n)
    block = (2, n, 2, 1, Y, ZT2)

    def mk_spec(dx):
        return pl.BlockSpec(
            block, lambda i, dx=dx: (0, 0, 0, (i + dx) % X, 0, 0),
            memory_space=pltpu.VMEM,
        )

    call = pl.pallas_call(
        partial(_plq_kernel, parity=parity, n=n, dims=dims, slabs=slabs),
        grid=(X,),
        in_specs=[mk_spec(dx) for (_, _, dx) in slabs],
        out_specs=pl.BlockSpec(
            (6, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((6, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=bool(interpret),
    )

    def apply(us):
        return call(*[us[2 * d + par] for (d, par, _) in slabs])

    return apply


def plane_sums(us, dims, interpret=False):
    """[6] f32: sum over ALL sites of Re tr P for each plane (PLANES order)."""
    n = us[0].shape[1]
    s0 = _plq_call(n, tuple(dims), 0, bool(interpret))(us)
    s1 = _plq_call(n, tuple(dims), 1, bool(interpret))(us)
    return (s0 + s1)[:, 0]
