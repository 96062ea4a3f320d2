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


def default_mesh_shape(n_devices: int) -> Tuple[int, int, int, int]:
    """Factor n_devices over (T, Z, Y, X) greedily — T first, then Z, Y, X.

    The time axis is usually the largest and the Polyakov product along T is
    measured rarely, so T-major decomposition keeps the halo surface small.
    Each axis takes powers of two up to 8 before spilling to the next, so
    large device counts get a multi-axis torus instead of one huge slab
    axis; any non-power-of-two remainder (and overflow past all caps)
    rides on T.
    """
    shape = [1, 1, 1, 1]
    rem = n_devices
    for ax in (3, 2, 1, 0):
        while rem % 2 == 0 and shape[ax] < 8:
            shape[ax] *= 2
            rem //= 2
    shape[3] *= rem
    return tuple(shape)
