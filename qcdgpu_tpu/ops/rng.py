"""Counter-based, site-keyed random numbers (threefry2x32-20).

Replaces QCDGPU's PRNGCL stack of *stateful* device RNG streams (RANLUX,
RANMAR, XOR128, XOR7, MRG32k3a, Park–Miller — random/prngcl_*.cl in the
reference; see SURVEY.md §2 "PRNGCL") with a *stateless* counter-based
design, which is the idiomatic TPU/JAX choice:

  bits(site, slot) = threefry2x32(stage_key, (global_site_index, slot))
  stage_key        = threefry2x32(base_key, (sweep_index, stage_id))

Consequences, all by construction:
  * exact checkpoint/resume: the RNG "state" is (seed, sweep_index) — two ints;
  * shard invariance: every device computes bits from *global* site indices,
    so sharded and unsharded runs are bit-identical;
  * layout invariance: dense and even/odd-packed layouts draw identical
    numbers per physical site.

Statistical parity with the reference generators is demonstrated by the RNG
parity suite (tests/test_rng_parity.py + qcdgpu_tpu/native/prngcl — C++
re-implementations of the reference generator *algorithms* used as
statistical baselines only).

threefry2x32 is the public Random123 algorithm (Salmon et al., SC'11), also
the default PRNG of JAX itself. Implemented here directly on uint32 fields so
it can run inside any jit/shard_map/pallas context on arrays of arbitrary
shape.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_ROT = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY = np.uint32(0x1BD11BDA)
_U32 = jnp.uint32


def _rotl(x, r):
    return (x << _U32(r)) | (x >> _U32(32 - r))


def threefry2x32(k0, k1, x0, x1):
    """20-round Threefry-2x32. All args uint32 arrays (broadcastable).

    Returns a pair of uint32 arrays of the broadcast shape.
    """
    k0 = jnp.asarray(k0, _U32)
    k1 = jnp.asarray(k1, _U32)
    x0 = jnp.asarray(x0, _U32) + k0
    x1 = jnp.asarray(x1, _U32) + k1
    ks = (k0, k1, k0 ^ k1 ^ _PARITY)
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


def make_base_key(seed: int):
    """Derive a (k0, k1) uint32 pair from a python int seed."""
    s = np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
    k0, k1 = threefry2x32(
        jnp.asarray(np.uint32(s & np.uint64(0xFFFFFFFF))),
        jnp.asarray(np.uint32(s >> np.uint64(32))),
        jnp.asarray(_U32(0x243F6A88)),  # pi digits — arbitrary domain constant
        jnp.asarray(_U32(0x85A308D3)),
    )
    return jnp.stack([k0, k1])


def stage_key(base_key, sweep_idx, stage_id):
    """Per-(sweep, stage) derived key; sweep_idx may be a traced scalar."""
    k0, k1 = threefry2x32(
        base_key[0], base_key[1], jnp.asarray(sweep_idx, _U32), _U32(stage_id)
    )
    return jnp.stack([k0, k1])


def _bits_to_uniform(bits, dtype=jnp.float32):
    """uint32 -> float in the OPEN interval (0, 1) (24-bit mantissa grid).

    Strictly inside (0,1) so log(u) and 1/u are always finite — required by
    the Kennedy–Pendleton sampler.
    """
    return ((bits >> _U32(8)).astype(dtype) + dtype(0.5)) * dtype(1.0 / (1 << 24))


def site_uniforms(key2, site_idx, n, slot0=0, dtype=jnp.float32):
    """n uniforms per site: shape [n, *site_idx.shape], values in (0, 1).

    site_idx: uint32 array of *global* site indices (any shape).  Each
    (site, slot) counter yields 64 bits = 2 uniforms; slots consumed are
    slot0 .. slot0 + ceil(n/2) - 1.  All slots go through ONE batched
    threefry evaluation — the threefry body appears once in the HLO
    regardless of n (compile-time matters: an unrolled-per-slot version
    made XLA:CPU compilation ~10x slower at identical bits).
    """
    npairs = (n + 1) // 2
    slots = (jnp.arange(npairs, dtype=_U32) + _U32(slot0)).reshape(
        (npairs,) + (1,) * site_idx.ndim
    )
    b0, b1 = threefry2x32(key2[0], key2[1], site_idx[None], slots)
    u = jnp.stack([_bits_to_uniform(b0, dtype), _bits_to_uniform(b1, dtype)], axis=1)
    u = u.reshape((2 * npairs,) + site_idx.shape)
    return u[:n]


def normals_from_uniforms(u):
    """[2k, ...] uniforms in (0, 1) -> [2k, ...] standard normals.

    Box–Muller with the pairing/ordering contract shared by every normal
    consumer (threefry site_normals and the PRNGCL stream hot start in
    sim.stream_hot_start) — keep them on this one transform so the two
    hot-start paths stay distributionally in lockstep."""
    r = jnp.sqrt(-2.0 * jnp.log(u[0::2]))
    th = (2.0 * np.pi) * u[1::2]
    return jnp.concatenate([r * jnp.cos(th), r * jnp.sin(th)], axis=0)


def site_normals(key2, site_idx, n, slot0=0, dtype=jnp.float32):
    """n standard normals per site via Box–Muller (for hot starts)."""
    m = 2 * ((n + 1) // 2)
    u = site_uniforms(key2, site_idx, m, slot0=slot0, dtype=dtype)
    return normals_from_uniforms(u)[:n]
