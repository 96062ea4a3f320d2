"""Domain decomposition over a jax.sharding.Mesh (the "BIG_LATTICE" path).

QCDGPU splits the lattice into slabs across OpenCL devices and moves halo
link layers through host memory between half-sweeps (SURVEY.md §2
"Multi-device decomposition", §5.8).  The TPU-native design needs none of
that machinery: the link field carries a NamedSharding over up to 4 mesh
axes mapped to the lattice site axes, and XLA's SPMD partitioner turns the
`jnp.roll` neighbor gathers inside the jit-ed sweep into collective-permutes
of one-site-deep boundary slices over ICI — halo exchange, fused into the
compute, derived automatically from the same single-chip program.

Because the RNG is keyed by *global* site index (ops/rng.py), the sharded
and unsharded Markov chains are bit-identical in the link field (per-link
updates contain no cross-site floating-point reductions).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SimConfig

# mesh axis names, one per lattice site axis (X, Y, Z, T)
AXES = ("x", "y", "z", "t")


def make_mesh(mesh_shape: Sequence[int], devices=None) -> Mesh:
    """Build a 4-axis device mesh of the given per-axis sizes.

    Size-1 axes are kept (unsharded); the product must not exceed the
    available device count.
    """
    mesh_shape = tuple(mesh_shape)
    if len(mesh_shape) != 4:
        raise ValueError("mesh_shape must be a 4-tuple over (X, Y, Z, T)")
    n = int(np.prod(mesh_shape))
    devices = jax.devices() if devices is None else list(devices)
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]).reshape(mesh_shape), AXES)


def link_spec() -> P:
    """PartitionSpec for a link field [mu, a, b, X, Y, Z, T]."""
    return P(None, None, None, *AXES)


def link_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, link_spec())


def shard_links(u, mesh: Mesh):
    """Place a link field onto the mesh with the lattice decomposition."""
    return jax.device_put(u, link_sharding(mesh))


def is_lattice_sharded(cfg: SimConfig) -> bool:
    """True when cfg.mesh decomposes the lattice over >1 device (the single
    predicate shared by mesh construction, engine selection, and the
    chain-sharding validation — keep them agreeing)."""
    return int(np.prod(cfg.mesh)) != 1


def mesh_for_config(cfg: SimConfig, devices=None) -> Optional[Mesh]:
    """Mesh from cfg.mesh, or None when the run is single-device."""
    if not is_lattice_sharded(cfg):
        return None
    return make_mesh(cfg.mesh, devices)


def make_chain_mesh(n: int, devices=None) -> Mesh:
    """1D mesh over the ensemble (replica) axis "c".

    The ensemble is QCDGPU's one-chain-per-process replica parallelism
    recast as a mesh axis (SURVEY.md §2 "Ensemble / replica parallelism"):
    chains are independent, so sharding the leading chain axis needs no
    collectives at all — each device advances its block of chains.
    """
    devices = jax.devices() if devices is None else list(devices)
    if n < 1 or n > len(devices):
        raise ValueError(f"chain mesh needs 1..{len(devices)} devices, got {n}")
    return Mesh(np.array(devices[:n]), ("c",))


def make_chain_lattice_mesh(n_chain_shards: int, mesh_shape, devices=None) -> Mesh:
    """Combined replica x domain-decomposition mesh ("c", "x", "y", "z", "t").

    The layout QCDGPU cannot express at all (one chain per process, slabs
    within it): C blocks of chains, each chain's lattice decomposed over
    the per-chain lattice sub-mesh — e.g. a 2-beta scan of 32^4 lattices
    on 8 chips as (c=2, x=2, y=2).  The chain axis is outermost so each
    chain's halo exchanges stay inside its own contiguous device block
    (ICI-local), and chains never communicate.
    """
    mesh_shape = tuple(mesh_shape)
    if len(mesh_shape) != 4:
        raise ValueError("mesh_shape must be a 4-tuple over (X, Y, Z, T)")
    devices = jax.devices() if devices is None else list(devices)
    n = n_chain_shards * int(np.prod(mesh_shape))
    if n_chain_shards < 1 or n > len(devices):
        raise ValueError(
            f"chain x lattice mesh needs {n} devices, have {len(devices)}"
        )
    return Mesh(
        np.array(devices[:n]).reshape((n_chain_shards,) + mesh_shape),
        ("c",) + AXES,
    )


def default_mesh_shape(
    n_devices: int, dims: Optional[Sequence[int]] = None
) -> Tuple[int, int, int, int]:
    """Factor n_devices over (X, Y, Z, T) — X/Y-major.

    This is THE mesh policy: bench.py, __graft_entry__.dryrun_multichip and
    validate.check_multichip all route through it so every multi-chip entry
    point lands on the same decomposition.  X/Y-major because the fused
    sharded Pallas engine (ops/pallas/sharded.py) accepts X/Y meshes only —
    a Z- or T-sharded mesh silently falls back to the ~200x-slower XLA
    engine (sim.resolve_engine), so the default must never produce one
    unless X and Y are saturated.

    Powers of two go to X then Y alternately (X first); each axis is capped
    at dims[i] // 2 when dims is given (the checkerboard limit: every shard
    needs an even local extent), else at 8.  Overflow spills to Z then T;
    any non-power-of-two remainder rides on T.
    """
    caps = [d // 2 for d in dims] if dims is not None else [8, 8, 8, 8]
    shape = [1, 1, 1, 1]
    rem = n_devices
    while rem % 2 == 0:
        # prefer the X/Y axis that is currently smaller (X on ties)
        if shape[0] <= shape[1] and shape[0] * 2 <= max(caps[0], 1):
            ax = 0
        elif shape[1] * 2 <= max(caps[1], 1):
            ax = 1
        elif shape[0] * 2 <= max(caps[0], 1):
            ax = 0
        elif shape[2] * 2 <= max(caps[2], 1):
            ax = 2
        elif shape[3] * 2 <= max(caps[3], 1):
            ax = 3
        else:
            break
        shape[ax] *= 2
        rem //= 2
    shape[3] *= rem
    return tuple(shape)
