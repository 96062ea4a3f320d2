"""PRNGCL device-stream generators (ops/prng_streams.py).

Bit-parity against the native C++ reference implementations
(native/prngcl/prngcl.cpp): every JAX per-site stream must reproduce the
native generator seeded with the same per-site seed.  Generators whose
arithmetic is exactly representable in float32 (24-bit grids, uint32
outputs scaled by powers of two) must match bit-for-bit; Park–Miller and
MRG32k3a divide by non-power-of-two moduli, so their float32 outputs carry
one extra rounding vs the native float64 — compared to 3e-7.  A 400-draw
window split across draw() calls also proves the carried state is exact:
any single-bit state error diverges the stream immediately.
"""

import numpy as np
import pytest

from qcdgpu_tpu.native import prngcl as native
from qcdgpu_tpu.ops import prng_streams as ps

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native prngcl library unavailable"
)

DIMS = (2, 2, 2, 2)  # 16 sites
N_DRAW = 200  # > 8 luxury batches of 24, and wraps every lag pointer
SEEDS = (0, 1, 987654321)

EXACT = (
    # all five luxury levels: their skips exercise different block/remainder
    # splits of _ranlux_skip (p-24 = 0, 24=1x24+0, 73=3x24+1, 199=8x24+7,
    # 365=15x24+5)
    "ranlux0", "ranlux1", "ranlux2", "ranlux3", "ranlux4",
    "ranmar", "xor128", "xor7", "constant",
)
ROUNDED = ("parkmiller", "mrg32k3a")


import functools

import jax


@functools.lru_cache(maxsize=None)
def _jit_draw(name, k):
    draw = ps.stream_draw_fn(name)
    return jax.jit(lambda st: draw(st, k))


def _stream_draws(name, seed, n):
    """n draws for every site, split over three draw() calls to exercise
    the carried state (jitted per chunk size — eager per-op dispatch of
    the unrolled draw loops is pathologically slow)."""
    state, _ = ps.make_stream(name, seed, DIMS)
    parts = []
    for k in (n // 4, n // 2, n - n // 4 - n // 2):
        u, state = _jit_draw(name, k)(state)
        parts.append(np.asarray(u))
    return np.concatenate(parts, axis=0).reshape(n, -1)


@pytest.mark.parametrize("name", EXACT)
@pytest.mark.parametrize("seed", SEEDS)
def test_stream_matches_native_exactly(name, seed):
    ours = _stream_draws(name, seed, N_DRAW)
    seeds = ps.site_seeds(seed, DIMS).ravel()
    for site in (0, 7, 15):
        ref = native.fill(name, int(seeds[site]), N_DRAW).astype(np.float32)
        np.testing.assert_array_equal(
            ours[:, site], ref, err_msg=f"{name} seed={seed} site={site}"
        )


@pytest.mark.parametrize("name", ROUNDED)
@pytest.mark.parametrize("seed", SEEDS)
def test_stream_matches_native_rounded(name, seed):
    ours = _stream_draws(name, seed, N_DRAW)
    seeds = ps.site_seeds(seed, DIMS).ravel()
    for site in (0, 7, 15):
        ref = native.fill(name, int(seeds[site]), N_DRAW)
        np.testing.assert_allclose(
            ours[:, site], ref, atol=3e-7, rtol=0,
            err_msg=f"{name} seed={seed} site={site}",
        )


@pytest.mark.parametrize("name", ps.STREAM_GENERATORS)
def test_stream_range_and_open01(name):
    # raw draws live on the CLOSED [0, 1]: f32 rounding of the modulus
    # division can emit exactly 1.0 (~2^-25 per draw; see make_stream),
    # and the 24-bit-grid generators can emit exactly 0.0 — which is why
    # every sampler consumes draws through open01()
    u = _stream_draws(name, 42, 64)
    assert np.all(u >= 0.0) and np.all(u <= 1.0)
    import jax.numpy as jnp

    v = np.asarray(ps.open01(jnp.asarray(u)))
    assert np.all(v > 0.0) and np.all(v < 1.0)
    one = np.float32(np.uint32(0xFFFFFFFF)) * np.float32(2**-32)
    assert one == 1.0  # the rounding case open01 must handle
    assert np.asarray(ps.open01(jnp.float32(one))) < 1.0


def test_sites_decorrelated():
    """Neighboring sites must not share a stream (distinct seeds)."""
    u = _stream_draws("xor128", 0, 64)
    assert not np.array_equal(u[:, 0], u[:, 1])
    seeds = ps.site_seeds(0, DIMS).ravel()
    assert len(np.unique(seeds)) == seeds.size


@pytest.mark.parametrize("name", [
    g for g in ps.PALLAS_STREAM_GENERATORS
    if g not in ps.REF_STREAM_GENERATORS
])
def test_kernel_draw_matches_dict(name):
    """The unrolled list-state draws (Pallas in-kernel form of the
    counter-free generators) must be bit-identical to the dict-based
    draws across carried state.  (The ref-based generators' in-kernel
    form is kernel_stream_draw_ref, bit-checked in
    tests/test_pallas_stream.py::test_ref_kernel_draw_bit_matches_dense.)"""
    import jax
    import jax.numpy as jnp

    state, draw = ps.make_stream(name, 123, DIMS)
    words = [jnp.asarray(w) for w in ps.state_to_words(name, state)]

    # 19 + 7 crosses every generator's word window (xor7's period-8
    # walking index 3x, mrg32k3a's 6-word history 4x) while keeping the
    # unrolled chain short: XLA CPU compile time is quadratic in the
    # chain length (~66 s at the previous 37 + 13)
    @jax.jit
    def dict_side(st):
        u1, st = draw(st, 19)
        u2, st = draw(st, 7)
        return jnp.concatenate([u1, u2]), st

    @jax.jit
    def list_side(ws):
        u1, ws = ps.kernel_stream_draw(name, ws, 19)
        u2, ws = ps.kernel_stream_draw(name, ws, 7)
        return jnp.stack(u1 + u2), ws

    u_d, st_d = dict_side(state)
    u_l, ws_l = list_side(words)
    np.testing.assert_array_equal(np.asarray(u_d), np.asarray(u_l))
    np.testing.assert_array_equal(
        np.asarray(ps.state_to_words(name, st_d)), np.asarray(jnp.stack(ws_l))
    )
    # layout round trip
    rt = ps.words_to_state(name, ps.state_to_words(name, state))
    for k in state:
        np.testing.assert_array_equal(np.asarray(state[k]), np.asarray(rt[k]))
