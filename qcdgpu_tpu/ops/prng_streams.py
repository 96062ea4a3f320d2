"""PRNGCL generator family as device-resident, per-site stateful streams.

QCDGPU's PRNGCL library keeps one generator state per GPU thread in device
buffers and advances it in-kernel each time the update needs uniforms
(random/prngcl_*.cl in the reference; SURVEY.md §2 "PRNGCL", §3.3).  This
module is the TPU-native mirror of that architecture: every lattice site
owns an independent generator state held in device arrays shaped
``[state_words, X, Y, Z, T]``, and ``draw`` advances all sites in lockstep
inside the jitted sweep — the stream structure of the reference design with
none of its host<->device staging.

The algorithms are the same public ones re-implemented by the native
statistical-baseline library (native/prngcl/prngcl.cpp): Luescher RANLUX
(luxury 0..4), Marsaglia RANMAR and XOR128, Panneton–L'Ecuyer XOR7,
L'Ecuyer MRG32k3a, Park–Miller minstd, and the CONSTANT debug generator.
Each JAX stream is bit-compatible with the native generator seeded with the
same per-site seed (tests/test_prng_streams.py), using only uint32/float32
arithmetic so the streams run unchanged on CPU and TPU (no 64-bit integer
or double-precision ops: MRG32k3a's 53-bit products are formed with 16-bit
limb multiplies, Park–Miller uses Schrage's decomposition).

Selected via ``SimConfig(rng_mode="prngcl:<name>")`` on the XLA engine.
Unlike the default counter-based threefry mode, the stream state is real
state: it is carried through the chunk runner alongside the links and
checkpointed with them (QCDGPU likewise dumps its PRNG state buffers —
SURVEY.md §3.5).  Per-site streams keep the sharding guarantee: a site's
draw depends only on its own state, so sharded and unsharded runs remain
bit-identical.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_U32 = jnp.uint32
_I32 = jnp.int32
_F32 = jnp.float32
_INV24 = np.float32(1.0 / (1 << 24))
_INV32 = np.float32(1.0 / 4294967296.0)

#: selectable generator names (rng_mode = "prngcl:<name>")
STREAM_GENERATORS = (
    "ranlux0", "ranlux1", "ranlux2", "ranlux3", "ranlux4",
    "ranmar", "xor128", "xor7", "mrg32k3a", "parkmiller", "constant",
)


def site_seeds(seed: int, dims) -> np.ndarray:
    """Per-site uint64 seeds (host-side): splitmix64 over the global site
    index, so every site gets a decorrelated seed derived from the run seed
    (QCDGPU seeds its per-thread RNG states from one host seed the same
    way).  Row-major over dims — matches ops.lattice.site_index."""
    n = int(np.prod(dims))
    z = np.uint64(seed & 0xFFFFFFFFFFFFFFFF) + (
        np.arange(1, n + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    )
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    return z.reshape(tuple(dims))


def _seed_lo_hi(s64):
    return (
        (s64 & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (s64 >> np.uint64(32)).astype(np.uint32),
    )


def _scan_draw(step, state, n):
    """Drive ``step(state) -> (value, state')`` n times under lax.scan.

    scan keeps the step body a single compiled region regardless of n —
    an unrolled python loop replicates the whole step graph n times and
    makes the sweep programs (8 update stages x n draws each) minutes-slow
    to compile."""
    def body(st, _):
        out, st2 = step(st)
        return st2, out

    state, outs = jax.lax.scan(body, state, None, length=n)
    return outs, state


# ---------------------------------------------------------------------------
# XOR128 (Marsaglia xorshift128)
# ---------------------------------------------------------------------------


def _xor128_init(seed, dims):
    lo, hi = _seed_lo_hi(site_seeds(seed, dims))
    x = np.uint32(123456789) ^ lo
    y = np.uint32(362436069) ^ hi
    z = np.full_like(x, 521288629, np.uint32)
    w = np.uint32(88675123) + lo * np.uint32(2654435761)
    x = np.where((x | y | z | w) == 0, np.uint32(1), x)
    return {"x": x, "y": y, "z": z, "w": w}


def _xor128_step(st):
    t = st["x"] ^ (st["x"] << _U32(11))
    w = st["w"] ^ (st["w"] >> _U32(19)) ^ t ^ (t >> _U32(8))
    return w.astype(_F32) * _INV32, {
        "x": st["y"], "y": st["z"], "z": st["w"], "w": w,
    }


def _xor128_draw(state, n):
    return _scan_draw(_xor128_step, state, n)


# ---------------------------------------------------------------------------
# XOR7 (Panneton–L'Ecuyer xorshift with 7 xorshifts, 256-bit state)
# ---------------------------------------------------------------------------


def _xor7_init(seed, dims):
    lo, hi = _seed_lo_hi(site_seeds(seed, dims))
    s = (lo ^ hi) | np.uint32(1)
    xs = []
    for _ in range(8):
        s = np.uint32(69069) * s + np.uint32(12345)
        xs.append(s.copy())
    # rolled-canonical layout: the walking index k always sits at slot 0
    # (each step rolls the array instead of moving the pointer), so all
    # lag accesses compile to static slices — a traced k turns every
    # access into a gather and makes XLA compilation of the unrolled
    # draw loop pathologically slow
    return {"x": np.stack(xs)}


def _xor7_step(st):
    x = st["x"]
    t = x[7]
    t = t ^ (t << _U32(13))
    y = t ^ (t << _U32(9))
    t = x[4]
    y = y ^ t ^ (t << _U32(7))
    t = x[3]
    y = y ^ t ^ (t >> _U32(3))
    t = x[1]
    y = y ^ t ^ (t >> _U32(10))
    t = x[0]
    t = t ^ (t >> _U32(7))
    y = y ^ t ^ (t << _U32(24))
    # write slot 0, then advance k: slot i of the new canonical view is
    # old slot (i+1) & 7
    return y.astype(_F32) * _INV32, {"x": jnp.roll(x.at[0].set(y), -1, axis=0)}


def _xor7_draw(state, n):
    return _scan_draw(_xor7_step, state, n)


# ---------------------------------------------------------------------------
# RANLUX (Luescher 24-bit subtract-with-borrow, luxury levels 0..4)
# ---------------------------------------------------------------------------

_RANLUX_P = (24, 48, 97, 223, 389)


def _ranlux_init(seed, dims, lux):
    lo, hi = _seed_lo_hi(site_seeds(seed, dims))
    s = lo ^ hi
    s = np.where(s == 0, np.uint32(314159265), s)
    xs = []
    for _ in range(24):
        s = np.uint32(69069) * s + np.uint32(1)
        xs.append(((s >> 8) & np.uint32(0xFFFFFF)).astype(np.int32))
    x = np.stack(xs)
    # rolled-canonical layout: the lag pointers i24/j24 stay 10 slots
    # apart and both walk downward, so the state is stored rotated with
    # i24 pinned to slot 23 (hence j24 to slot 9 — exactly the seeding
    # position) and each step rolls by one.  Static slices instead of
    # traced-index gathers: see _xor7_init.
    return {
        "x": x,
        "carry": (x[23] == 0).astype(np.int32),
        "nb": np.int32(0),  # draws since the last luxury skip
    }


def _ranlux_step(st):
    d = st["x"][9] - st["x"][23] - st["carry"]
    borrow = d < 0
    d = d + jnp.where(borrow, _I32(1 << 24), _I32(0))
    return d, {
        **st,
        # write slot 23 (= i24), then decrement both pointers: slot i of
        # the new canonical view is old slot (i - 1) % 24
        "x": jnp.roll(st["x"].at[23].set(d), 1, axis=0),
        "carry": borrow.astype(_I32),
    }


def _ranlux_steps_static(x, carry, m):
    """m <= 24 subtract-with-borrow steps from the canonical rotation with
    STATIC lag slots (step t: i24 at 23-t, j24 at (9-t) mod 24) and no
    per-step rolls.  Returns the raw (unrotated) arrays; a full 24-step
    block is a complete lag cycle, so the pointers land back at canonical
    and no roll is needed — a partial block leaves them m slots down."""
    for t in range(m):
        i = (23 - t) % 24
        j = (9 - t) % 24
        d = x[j] - x[i] - carry
        borrow = d < 0
        d = d + jnp.where(borrow, _I32(1 << 24), _I32(0))
        x = x.at[i].set(d)
        carry = borrow.astype(_I32)
    return x, carry


def _ranlux_skip(st, p):
    """Discard the p - 24 luxury values: whole 24-step blocks under one
    fori_loop (static slots, zero rolls) plus an unrolled remainder with
    one canonicalizing roll.  Versus p - 24 single-step iterations this
    cuts loop-iteration count ~24x — the luxury skip dominated the
    ranlux3 sweep cost (96 -> few ms/sweep at 8^4)."""
    nblk, rem = divmod(p - 24, 24)

    def block(_, s):
        x, carry = _ranlux_steps_static(s["x"], s["carry"], 24)
        return {**s, "x": x, "carry": carry}

    if nblk:
        st = jax.lax.fori_loop(0, nblk, block, st)
    if rem:
        x, carry = _ranlux_steps_static(st["x"], st["carry"], rem)
        # restore canonical: the pointers moved rem slots down
        st = {**st, "x": jnp.roll(x, rem, axis=0), "carry": carry}
    return {**st, "nb": jnp.asarray(0, _I32)}


def _ranlux_draw(state, n, p):
    def emit(st):
        if p > 24:
            st = jax.lax.cond(
                st["nb"] == 24, lambda s: _ranlux_skip(s, p), lambda s: s, st
            )
        else:  # lux 0: batch counter still wraps, nothing is discarded
            st = {**st, "nb": jnp.where(st["nb"] == 24, 0, st["nb"])}
        d, st = _ranlux_step(st)
        return d.astype(_F32) * _INV24, {**st, "nb": st["nb"] + 1}

    return _scan_draw(emit, state, n)


# ---------------------------------------------------------------------------
# RANMAR (Marsaglia–Zaman lagged Fibonacci + slow arithmetic carry)
# ---------------------------------------------------------------------------

_RM_CD = np.float32(7654321.0 / 16777216.0)
_RM_CM = np.float32(16777213.0 / 16777216.0)


def _ranmar_init(seed, dims):
    s64 = site_seeds(seed, dims).ravel()
    ij = (s64 % np.uint64(31329)).astype(np.int64)
    kl = ((s64 // np.uint64(31329)) % np.uint64(30082)).astype(np.int64)
    i = (ij // 177) % 177 + 2
    j = ij % 177 + 2
    k = (kl // 169) % 178 + 1
    ll = kl % 169
    u = np.zeros((97, s64.size))
    for ii in range(97):
        s = np.zeros(s64.size)
        t = 0.5
        for _ in range(24):
            m = (((i * j) % 179) * k) % 179
            i, j, k = j, k, m
            ll = (53 * ll + 1) % 169
            s = s + np.where((ll * m) % 64 >= 32, t, 0.0)
            t *= 0.5
        u[ii] = s
    shape = (97,) + tuple(dims)
    return {
        # every value is a multiple of 2^-24 in [0, 1): exact in float32,
        # and stays exact under the lagged-Fibonacci recurrence.
        # rolled-canonical layout (see _xor7_init): the lag pointers stay
        # 64 slots apart, i97 pinned to slot 96 (j97 to slot 32 — the
        # seeding position) with a roll per step.  The carry c is
        # site-independent, so it is one scalar, not a per-site array.
        "u": u.reshape(shape).astype(np.float32),
        "c": np.float32(362436.0 / 16777216.0),
    }


def _ranmar_step(st):
    u, c = st["u"], st["c"]
    uni = u[96] - u[32]
    uni = uni + jnp.where(uni < 0, _F32(1.0), _F32(0.0))
    u = jnp.roll(u.at[96].set(uni), 1, axis=0)
    c = c - _RM_CD
    c = c + jnp.where(c < 0, _RM_CM, _F32(0.0))
    out = uni - c
    out = out + jnp.where(out < 0, _F32(1.0), _F32(0.0))
    return out, {"u": u, "c": c}


def _ranmar_draw(state, n):
    return _scan_draw(_ranmar_step, state, n)


# ---------------------------------------------------------------------------
# MRG32k3a (L'Ecuyer combined multiple recursive generator) — 32-bit only:
# the 53-bit products a*s are formed with 16-bit limb multiplies and reduced
# mod m = 2^32 - c by folding 2^32 ≡ c, so the stream runs on TPU where
# neither int64 nor float64 arithmetic exists.
# ---------------------------------------------------------------------------

_MRG_M1, _MRG_C1 = np.uint32(4294967087), np.uint32(209)
_MRG_M2, _MRG_C2 = np.uint32(4294944443), np.uint32(22853)
_MRG_A12, _MRG_A13 = np.uint32(1403580), np.uint32(810728)
_MRG_A21, _MRG_A23 = np.uint32(527612), np.uint32(1370589)
_MRG_NORM = np.float32(2.328306549295728e-10)  # 1/(m1+1)


def _mul32(a, b):
    """Full 32x32 -> 64-bit product of uint32 arrays, as (hi, lo)."""
    al, ah = a & _U32(0xFFFF), a >> _U32(16)
    bl, bh = b & _U32(0xFFFF), b >> _U32(16)
    ll = al * bl
    mid = al * bh + (ll >> _U32(16))  # <= (2^16-1)^2 + 2^16 - 1: no wrap
    mid2 = mid + ah * bl
    carry = (mid2 < mid).astype(_U32)
    lo = (ll & _U32(0xFFFF)) | (mid2 << _U32(16))
    hi = ah * bh + (mid2 >> _U32(16)) + (carry << _U32(16))
    return hi, lo


def _mulmod(a, s, m, c):
    """(a * s) mod m for m = 2^32 - c, a < 2^21, c < 2^16."""
    hi, lo = _mul32(jnp.broadcast_to(_U32(a), s.shape), s)
    # v = hi*2^32 + lo ≡ hi*c + lo (mod m); hi < 2^21 so hi*c < 2^37
    h2, l2 = _mul32(hi, jnp.broadcast_to(_U32(c), hi.shape))
    t = l2 + lo
    wrap = (t < lo).astype(_U32)
    # v ≡ t + (h2 + wrap)*c ; (h2 + wrap)*c < 2^21 — one more wrap possible
    t2 = t + (h2 + wrap) * _U32(c)
    t2 = t2 + (t2 < t).astype(_U32) * _U32(c)
    return jnp.where(t2 >= _U32(m), t2 - _U32(m), t2)


def _submod(x, y, m):
    return jnp.where(x >= y, x - y, x + (_U32(m) - y))


def _mrg_init(seed, dims):
    s64 = site_seeds(seed, dims)
    words = []
    z = s64.copy()
    for i in range(6):
        z = z + np.uint64(0x9E3779B97F4A7C15)
        t = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        t = (t ^ (t >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        t = t ^ (t >> np.uint64(31))
        m = 4294967087 if i < 3 else 4294944443
        # native seeding: 1 + t % (uint64)(m - 2.0)
        words.append((np.uint64(1) + t % np.uint64(m - 2)).astype(np.uint32))
    return {
        "s1": np.stack(words[:3]),  # [3, *dims]: s10, s11, s12
        "s2": np.stack(words[3:]),
    }


def _mrg_step(st):
    s1, s2 = st["s1"], st["s2"]
    p1 = _submod(
        _mulmod(_MRG_A12, s1[1], _MRG_M1, _MRG_C1),
        _mulmod(_MRG_A13, s1[0], _MRG_M1, _MRG_C1),
        _MRG_M1,
    )
    s1 = jnp.stack([s1[1], s1[2], p1])
    p2 = _submod(
        _mulmod(_MRG_A21, s2[2], _MRG_M2, _MRG_C2),
        _mulmod(_MRG_A23, s2[0], _MRG_M2, _MRG_C2),
        _MRG_M2,
    )
    s2 = jnp.stack([s2[1], s2[2], p2])
    z = _submod(p1, p2, _MRG_M1)
    z = jnp.where(z == 0, _U32(_MRG_M1), z)
    return z.astype(_F32) * _MRG_NORM, {"s1": s1, "s2": s2}


def _mrg_draw(state, n):
    return _scan_draw(_mrg_step, state, n)


# ---------------------------------------------------------------------------
# Park–Miller minstd via Schrage's decomposition (all intermediates < 2^31)
# ---------------------------------------------------------------------------

_PM_M = np.int32(2147483647)
_PM_A = np.int32(16807)
_PM_Q = np.int32(127773)  # m // a
_PM_R = np.int32(2836)    # m % a
_PM_NORM = np.float32(1.0 / 2147483647.0)


def _parkmiller_init(seed, dims):
    s = (site_seeds(seed, dims) % np.uint64(2147483647)).astype(np.int32)
    return {"s": np.where(s == 0, np.int32(1), s)}


def _parkmiller_step(st):
    s = st["s"]
    hi = s // _PM_Q
    t = _PM_A * (s - hi * _PM_Q) - _PM_R * hi
    s = jnp.where(t > 0, t, t + _PM_M)
    return s.astype(_F32) * _PM_NORM, {"s": s}


def _parkmiller_draw(state, n):
    return _scan_draw(_parkmiller_step, state, n)


# ---------------------------------------------------------------------------
# CONSTANT (debug generator)
# ---------------------------------------------------------------------------


def _constant_init(seed, dims, value=0.5):
    del seed
    return {"v": np.full(tuple(dims), value, np.float32)}


def _constant_draw(state, n):
    return jnp.stack([state["v"]] * n), state


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def stream_draw_fn(name: str):
    """The draw function alone (no state init — cheap; state init for
    large lattices is the expensive host-side part)."""
    if name not in STREAM_GENERATORS:
        raise ValueError(f"unknown generator {name!r}; have {STREAM_GENERATORS}")
    if name.startswith("ranlux"):
        p = _RANLUX_P[int(name[-1])]
        return lambda st, n: _ranlux_draw(st, n, p)
    return {
        "ranmar": _ranmar_draw,
        "xor128": _xor128_draw,
        "xor7": _xor7_draw,
        "mrg32k3a": _mrg_draw,
        "parkmiller": _parkmiller_draw,
        "constant": _constant_draw,
    }[name]


def make_stream_state_host(name: str, seed: int, dims) -> dict:
    """The initial per-site stream state as HOST numpy arrays.

    Kept host-side so callers can freely reshape/stack (the ensemble
    stacks one state per chain) before a single device transfer — eager
    jnp ops on device arrays are UNIMPLEMENTED on some TPU runtimes
    (CLAUDE.md).  Array leaves carry per-site data; 0-d leaves (ranlux's
    luxury counter nb, ranmar's carry c) are site- AND seed-independent:
    they advance purely with the draw count, a fact the ensemble exploits
    by sharing them unbatched across chains.
    """
    if name not in STREAM_GENERATORS:
        raise ValueError(f"unknown generator {name!r}; have {STREAM_GENERATORS}")
    dims = tuple(dims)
    if name.startswith("ranlux"):
        return _ranlux_init(seed, dims, int(name[-1]))
    return {
        "ranmar": _ranmar_init,
        "xor128": _xor128_init,
        "xor7": _xor7_init,
        "mrg32k3a": _mrg_init,
        "parkmiller": _parkmiller_init,
        "constant": _constant_init,
    }[name](seed, dims)


def make_stream(name: str, seed: int, dims):
    """Build the per-site stream for ``name``: (state0, draw).

    state0: pytree of device arrays (leading state-word axes over [*dims]).
    draw(state, n) -> (uniforms [n, *dims] float32 in [0, 1], state').
    Both are jit-safe; draw must be called with static n.

    Note the CLOSED upper edge: generators whose native output divides a
    32-bit state by its modulus (xor128, xor7, parkmiller, mrg32k3a) can
    round to exactly 1.0 in float32 (probability ~2^-25 per draw) — the
    same rounding the native float64 value takes when narrowed to f32, so
    bit parity with native is exact.  Exact 0.0 occurs for the 24-bit-grid
    generators.  Samplers must clamp through open01().
    """
    host = make_stream_state_host(name, seed, dims)
    return {k: jnp.asarray(v) for k, v in host.items()}, stream_draw_fn(name)


# ---------------------------------------------------------------------------
# Pallas-engine support: word-array layout + kernel-friendly draws.
#
# The fused TPU engine keeps each parity's stream states as ONE stacked
# array [W, X, Y, Z*T/2] (W 32-bit words per site) so a stage kernel can
# block it over X like the links.  Two in-kernel draw styles:
#
#  * counter-free generators (xor128/xor7/mrg32k3a/parkmiller/constant):
#    value-carried lax.scan with STATIC word positions — kernel_stream_draw.
#
#  * lagged generators (ranlux0-4, ranmar — REF_STREAM_GENERATORS): the
#    lag window lives in the output ref in ABSOLUTE slots, addressed by a
#    walking pointer.  The pointer, ranlux's luxury-skip counter nb, and
#    ranmar's arithmetic carry c are site- AND seed-independent (they
#    advance purely with the draw count), so they ride the kernel's
#    scalar-prefetch channel as runtime scalars: per static draw position
#    t the lag slots are scalar arithmetic on (ptr0, t, skips(t)), the
#    luxury skip is a pl.when-guarded fori_loop, and the scalars advance
#    OUTSIDE the kernel in closed form (advance_kernel_scalars) —
#    kernel_stream_draw_ref.  This removes the data-dependent lax.cond
#    that kept QCDGPU's default RANLUX3 off the fused engine.
# ---------------------------------------------------------------------------

#: generators whose in-kernel state is ref-based (lag window + pointer)
REF_STREAM_GENERATORS = (
    "ranlux0", "ranlux1", "ranlux2", "ranlux3", "ranlux4", "ranmar",
)

PALLAS_STREAM_GENERATORS = (
    "xor128", "xor7", "mrg32k3a", "parkmiller", "constant",
) + REF_STREAM_GENERATORS


def state_to_words(name: str, state):
    """Stream-state dict -> stacked word array [W, *site_shape].

    Works on numpy or jnp leaves (uses the array module of the inputs'
    namespace via jnp, which accepts both).  For the ref-based generators
    the per-site words are the lag window in the rolled-canonical rotation
    (== absolute layout with the pointer at its canonical seeding slot);
    the 0-d scalars (nb / c) are NOT part of the word array — they ride
    separately (stream_kernel_scalars)."""
    if name == "xor128":
        return jnp.stack([state["x"], state["y"], state["z"], state["w"]])
    if name == "xor7":
        return state["x"]
    if name == "mrg32k3a":
        return jnp.concatenate([state["s1"], state["s2"]])
    if name == "parkmiller":
        return state["s"][None]
    if name == "constant":
        return state["v"][None]
    if name.startswith("ranlux"):
        return jnp.concatenate([state["x"], state["carry"][None]])
    if name == "ranmar":
        return state["u"]
    raise ValueError(f"{name!r} has no word layout (not Pallas-supported)")


def words_to_state(name: str, words):
    """Inverse of state_to_words (0-d scalar leaves handled separately for
    the ref-based generators)."""
    if name == "xor128":
        return {"x": words[0], "y": words[1], "z": words[2], "w": words[3]}
    if name == "xor7":
        return {"x": words}
    if name == "mrg32k3a":
        return {"s1": words[:3], "s2": words[3:]}
    if name == "parkmiller":
        return {"s": words[0]}
    if name == "constant":
        return {"v": words[0]}
    if name.startswith("ranlux"):
        return {"x": words[:24], "carry": words[24]}
    if name == "ranmar":
        return {"u": words}
    raise ValueError(f"{name!r} has no word layout (not Pallas-supported)")


def stream_word_dtype(name: str):
    if name.startswith("ranlux"):
        return jnp.int32
    return {"parkmiller": jnp.int32, "constant": jnp.float32,
            "ranmar": jnp.float32}.get(name, jnp.uint32)


def stream_word_count(name: str) -> int:
    if name.startswith("ranlux"):
        return 25  # 24 lag words + the per-site borrow carry
    return {"xor128": 4, "xor7": 8, "mrg32k3a": 6,
            "parkmiller": 1, "constant": 1, "ranmar": 97}[name]


def _xor7_step_at(words, k):
    """One xor7 step with the walking index at static offset k."""
    t = words[(k + 7) % 8]
    t = t ^ (t << _U32(13))
    y = t ^ (t << _U32(9))
    t = words[(k + 4) % 8]
    y = y ^ t ^ (t << _U32(7))
    t = words[(k + 3) % 8]
    y = y ^ t ^ (t >> _U32(3))
    t = words[(k + 1) % 8]
    y = y ^ t ^ (t >> _U32(10))
    t = words[k % 8]
    t = t ^ (t >> _U32(7))
    y = y ^ t ^ (t << _U32(24))
    words = list(words)
    words[k % 8] = y
    return y, words


def _f32_from_u32(w):
    """float32(w) for uint32 w, without a u32->f32 convert (Mosaic has no
    unsigned->float lowering: real-TPU kernels raised "Unsupported cast:
    uint32 -> float32").  Split w = hi*256 + lo with hi < 2^24: both halves
    convert exactly through the SIGNED int32 cast Mosaic does support,
    hi*256.0 is an exact power-of-two scale, and the single final add
    rounds once — so the result is bit-identical to the direct cast the
    dict-based XLA draws use."""
    hi = (w >> _U32(8)).astype(jnp.int32).astype(_F32)
    lo = (w & _U32(0xFF)).astype(jnp.int32).astype(_F32)
    return hi * _F32(256.0) + lo


def kernel_stream_draw(name: str, words, n: int):
    """n uniforms from a LIST of W same-shape word arrays; returns
    (uniforms list, new words list).

    Fully UNROLLED steps with STATIC word positions — no rolls, stacks
    over dynamic axes, or gathers, and no lax.scan: Mosaic only lowers
    scans that pattern-match a scalar-index fori_loop
    (jax pallas/utils.py pattern_match_scan_to_fori_loop), so the
    earlier tuple-of-arrays-carry scan form compiled under interpret
    mode but raised "not a fori_loop index" on real TPU.  n is a small
    static stage count (<= 4*kp_trials + 2 per subgroup), so unrolling
    is cheap for Mosaic.  Bit-identical to the dict-based draws
    (tests/test_prng_streams.py::test_kernel_draw_matches_dict)."""
    words = list(words)
    if name == "constant":
        return [words[0]] * n, words
    if name == "xor128":
        def body(c, _):
            x, y, z, w0 = c
            t = x ^ (x << _U32(11))
            w = w0 ^ (w0 >> _U32(19)) ^ t ^ (t >> _U32(8))
            return (y, z, w0, w), _f32_from_u32(w) * _INV32
    elif name == "mrg32k3a":
        def body(c, _):
            s10, s11, s12, s20, s21, s22 = c
            p1 = _submod(
                _mulmod(_MRG_A12, s11, _MRG_M1, _MRG_C1),
                _mulmod(_MRG_A13, s10, _MRG_M1, _MRG_C1),
                _MRG_M1,
            )
            p2 = _submod(
                _mulmod(_MRG_A21, s22, _MRG_M2, _MRG_C2),
                _mulmod(_MRG_A23, s20, _MRG_M2, _MRG_C2),
                _MRG_M2,
            )
            z = _submod(p1, p2, _MRG_M1)
            z = jnp.where(z == 0, _U32(_MRG_M1), z)
            return (s11, s12, p1, s21, s22, p2), _f32_from_u32(z) * _MRG_NORM
    elif name == "parkmiller":
        def body(c, _):
            (s,) = c
            hi = s // _PM_Q
            t = _PM_A * (s - hi * _PM_Q) - _PM_R * hi
            s = jnp.where(t > 0, t, t + _PM_M)
            return (s,), s.astype(_F32) * _PM_NORM
    elif name == "xor7":
        # the walking index has period 8: unroll all n steps at static
        # offsets, rotating the list back to canonical k = 0 afterwards
        outs = []
        for i in range(n):
            y, words = _xor7_step_at(words, i % 8)
            outs.append(_f32_from_u32(y) * _INV32)
        rem = n % 8
        if rem:
            words = words[rem:] + words[:rem]  # restore canonical k = 0
        return outs, words
    else:
        raise ValueError(f"{name!r} is not Pallas-supported; "
                         f"have {PALLAS_STREAM_GENERATORS}")
    carry = tuple(words)
    outs = []
    for _ in range(n):
        carry, y = body(carry, None)
        outs.append(y)
    return outs, list(carry)


# ---------------------------------------------------------------------------
# ref-based in-kernel draws (ranlux, ranmar)
# ---------------------------------------------------------------------------

# canonical pointer slots at seeding time (the rolled-canonical rotation):
# ranlux i24 -> slot 23 (j24 = i24 - 14 mod 24 = 9), ranmar i97 -> slot 96
# (j97 = i97 - 64 mod 97 = 32)
_RANLUX_PTR0 = 23
_RANMAR_PTR0 = 96
_RM_CD_I = 7654321     # RANMAR carry decrement, in 2^-24 grid units
_RM_CM_I = 16777213    # RANMAR carry modulus, in 2^-24 grid units


def _ranlux_skip_len(name: str) -> int:
    return _RANLUX_P[int(name[-1])] - 24


def stream_kernel_scalars(name: str, state) -> dict:
    """The 0-d scalar channel values for a ref-based generator, from a
    dense (rolled-canonical) stream-state dict.  All values are site- and
    seed-independent; "ptr" is the absolute walking-pointer slot, which is
    the canonical seeding slot for any rolled-canonical state."""
    if name.startswith("ranlux"):
        return {"nb": jnp.asarray(state["nb"], jnp.int32),
                "ptr": jnp.asarray(_RANLUX_PTR0, jnp.int32)}
    if name == "ranmar":
        return {"c": jnp.asarray(state["c"], jnp.float32),
                "ptr": jnp.asarray(_RANMAR_PTR0, jnp.int32)}
    return {}


def encode_kernel_scalars(name: str, scalars) -> list:
    """Scalar dict -> fixed-order uint32 list for the scalar-prefetch
    vector (order: [s0, ptr]).  ranmar's carry c is an exact multiple of
    2^-24 in [0, 1) (see _ranmar_init), so c * 2^24 round-trips exactly
    through uint32."""
    if name.startswith("ranlux"):
        s0 = jnp.asarray(scalars["nb"], jnp.uint32)
    elif name == "ranmar":
        s0 = jnp.round(scalars["c"] * np.float32(1 << 24)).astype(jnp.uint32)
    else:
        return []
    return [s0, jnp.asarray(scalars["ptr"], jnp.uint32)]


def advance_kernel_scalars(name: str, scalars, n: int) -> dict:
    """Closed-form scalar advance after n in-kernel draws (jnp scalar ops,
    evaluated OUTSIDE the kernel by the stage wrapper).

    ranlux: nb' = ((nb + n - 1) % 24) + 1 (the counter wraps through the
    luxury skip); skips fired = floor((nb + n - 1) / 24); each skip costs
    skip_len SWB steps and each draw one, all decrementing the pointer.
    ranmar: c' = c - n*CD (mod CM) on the exact 2^-24 integer grid;
    pointer decrements once per draw.
    """
    if name.startswith("ranlux"):
        nb = jnp.asarray(scalars["nb"], jnp.int32)
        skips = (nb + (n - 1)) // 24
        nb2 = ((nb + (n - 1)) % 24) + 1
        ptr2 = jnp.mod(scalars["ptr"] - n - _ranlux_skip_len(name) * skips,
                       24).astype(jnp.int32)
        return {"nb": nb2, "ptr": ptr2}
    if name == "ranmar":
        ci = jnp.round(scalars["c"] * np.float32(1 << 24)).astype(jnp.int32)
        # n is a static Python int at every call site: reduce n*CD mod CM
        # in Python integers — an int32 device multiply overflows (and
        # silently desyncs the carry from the native stream) at n >= 281
        dec = (n * _RM_CD_I) % _RM_CM_I
        ci2 = jnp.mod(ci - jnp.int32(dec), jnp.int32(_RM_CM_I))
        c2 = ci2.astype(jnp.float32) * np.float32(1.0 / (1 << 24))
        ptr2 = jnp.mod(scalars["ptr"] - n, 97).astype(jnp.int32)
        return {"c": c2, "ptr": ptr2}
    raise ValueError(f"{name!r} has no kernel scalars")


def kernel_stream_draw_ref(name: str, state_ref, out_ref, s0, ptr0, n: int):
    """n in-kernel uniforms for a ref-based generator (ranlux*/ranmar).

    state_ref/out_ref: [W, 1, Y, ZT2] VMEM blocks (input / output state);
    the lag window is mutated in out_ref in ABSOLUTE slots.  s0, ptr0: the
    uint32 scalar-prefetch values (encode_kernel_scalars order).  Returns
    the list of n [Y, ZT2] float32 uniforms; the caller advances the
    scalars outside the kernel (advance_kernel_scalars).
    """
    import jax.experimental.pallas as pl

    out_ref[...] = state_ref[...]  # carry the window across the stage
    outs = []
    if name.startswith("ranlux"):
        nb0 = s0.astype(jnp.int32)
        p0 = ptr0.astype(jnp.int32)
        skip_len = _ranlux_skip_len(name)
        big = _I32(1 << 24)

        def swb_at(ip):
            """One subtract-with-borrow step at raw pointer ip (traced)."""
            i = jnp.mod(ip, 24)
            j = jnp.mod(ip - 14, 24)
            d = out_ref[j, 0] - out_ref[i, 0] - out_ref[24, 0]
            borrow = d < 0
            d = d + jnp.where(borrow, big, _I32(0))
            out_ref[i, 0] = d
            out_ref[24, 0] = borrow.astype(_I32)
            return d

        for t in range(n):
            if skip_len:  # lux 0 discards nothing
                fired = nb0 + t  # skip number if a skip fires here
                pred = (jnp.mod(fired, 24) == 0) & (fired > 0)
                base = p0 - t - skip_len * (fired // 24 - 1)

                @pl.when(pred)
                def _(base=base):
                    jax.lax.fori_loop(
                        0, skip_len, lambda k, ip: (swb_at(ip), ip - 1)[1],
                        base,
                    )
            i_raw = p0 - t - skip_len * ((nb0 + t) // 24)
            d = swb_at(i_raw)
            outs.append(d.astype(_F32) * _INV24)
        return outs
    if name == "ranmar":
        ci0 = s0.astype(jnp.int32)
        p0 = ptr0.astype(jnp.int32)
        for t in range(n):
            i = jnp.mod(p0 - t, 97)
            j = jnp.mod(p0 - t - 64, 97)
            uni = out_ref[i, 0] - out_ref[j, 0]
            uni = uni + jnp.where(uni < _F32(0), _F32(1.0), _F32(0.0))
            out_ref[i, 0] = uni
            ci_t = jnp.mod(ci0 - jnp.int32((t + 1) * _RM_CD_I % _RM_CM_I),
                           jnp.int32(_RM_CM_I))
            c_t = ci_t.astype(_F32) * _INV24
            out = uni - c_t
            outs.append(out + jnp.where(out < _F32(0), _F32(1.0), _F32(0.0)))
        return outs
    raise ValueError(f"{name!r} is not a ref-based generator; "
                     f"have {REF_STREAM_GENERATORS}")


def open01(u):
    """Clamp draws into the open interval (0, 1) for the samplers.

    The raw streams live on [0, 1] — exact zeros from the 24-bit-grid
    generators, exact ones from float32 rounding of the modulus-division
    generators (see make_stream) — while the Kennedy–Pendleton sampler
    needs log(u) finite (fastmath's domain contract: positive normal
    float32 below 1).  2^-24 is the uniform grid spacing, so the clamp
    moves at most one grid point.
    """
    return jnp.clip(u, _INV24, np.float32(1.0 - 1.0 / (1 << 24)))


def stream_mode_name(rng_mode: str):
    """The generator name if rng_mode selects a PRNGCL stream, else None."""
    if rng_mode.startswith("prngcl:"):
        return rng_mode.split(":", 1)[1]
    return None
