"""Pallas on-device observable reductions on split-float state.

Plaquette / Wilson-action sums as one fused kernel over the link field —
the TPU counterpart of QCDGPU's workgroup tree-reduction measurement
kernels (kernel/su*_measurements_cl.cl; SURVEY.md §2 "Measurement
kernels").  The Polyakov loop keeps the XLA log-depth pairwise product
(ops.measure.polyakov_loop): it runs on the rare measurement path and its
T-axis product does not fit the slab stencil.

Output: per-plane Re tr P sums, accumulated across the X grid into one
(6, 128) lane-partial buffer (plane-major), reduced to scalars by the
caller.  Plane order: (0,1), (0,2), (0,3), (1,2), (1,3), (2,3).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import core

PLANES = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
_SLABS = [(0, 0), (1, 0), (2, 0), (3, 0), (1, 1), (2, 1), (3, 1)]


def _plq_kernel(*refs, n, dims):
    o_ref = refs[-1]
    mats = {}

    def U(d, dx=0, shifts=()):
        if (d, dx) not in mats:
            mats[(d, dx)] = core.load_mat(refs[_SLABS.index((d, dx))], n)
        m = mats[(d, dx)]
        for ax, dd in shifts:
            m = core.shift_mat(m, ax, dd, dims)
        return m

    def shifted(d, lat_axis, delta):
        if lat_axis == 0:
            return U(d, delta)
        return U(d, 0, ((lat_axis, delta),))

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for p in range(6):
            o_ref[p, 0] = 0.0

    for p, (mu, nu) in enumerate(PLANES):
        a = core.mmul(U(mu, 0), shifted(nu, mu, 1))
        b = core.mmul(U(nu, 0), shifted(mu, nu, 1))
        # Re tr(a b^+) = sum_{i,k} Re(a_ik * conj(b_ik))
        tr = None
        for r in range(n):
            for c in range(n):
                t = a[r][c][0] * b[r][c][0] + a[r][c][1] * b[r][c][1]
                tr = t if tr is None else tr + t
        o_ref[p, 0] += jnp.sum(tr)


@lru_cache(maxsize=None)
def _plq_call(n, dims, interpret):
    X = dims[0]
    Y, ZT = dims[1], dims[2] * dims[3]
    block = (n, n, 2, 1, Y, ZT)

    def mk_spec(dx):
        return pl.BlockSpec(
            block, lambda i, dx=dx: (0, 0, 0, (i + dx) % X, 0, 0),
            memory_space=pltpu.VMEM,
        )

    from functools import partial

    call = pl.pallas_call(
        partial(_plq_kernel, n=n, dims=dims),
        grid=(X,),
        in_specs=[mk_spec(dx) for (_, dx) in _SLABS],
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
        return call(*[us[d] for (d, _) in _SLABS])

    return apply


def plane_sums(us, dims, interpret=False):
    """[6] f32: sum over sites of Re tr P for each plane (PLANES order)."""
    n = us[0].shape[0]
    sums = _plq_call(n, tuple(dims), bool(interpret))(us)
    return sums[:, 0]
