"""qcdgpu_tpu — TPU-native lattice gauge theory Monte Carlo.

A from-scratch JAX/XLA/Pallas framework with the capabilities of QCDGPU
(yxsamliu/QCDGPU): pure SU(2)/SU(3) Wilson-action simulation via even-odd
heat-bath / Metropolis / overrelaxation sweeps, Cabibbo–Marinari subgroup
updates, on-device observables (plaquette, Wilson action, Polyakov loop),
counter-based RNG with exact resume, and multi-chip domain decomposition
over a jax.sharding.Mesh.  See SURVEY.md for the reference analysis.
"""

from .config import SimConfig
from .models.ensemble import BetaScan
from .models.gauge import SU2PureGauge, SU3PureGauge, baseline_config
from .sim import Simulation, cold_start, hot_start, make_chunk_runner, make_sweep_fn

__version__ = "0.1.0"

__all__ = [
    "SimConfig",
    "Simulation",
    "BetaScan",
    "SU2PureGauge",
    "SU3PureGauge",
    "baseline_config",
    "cold_start",
    "hot_start",
    "make_sweep_fn",
    "make_chunk_runner",
]
