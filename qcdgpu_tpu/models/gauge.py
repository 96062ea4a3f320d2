"""The model families: pure-gauge SU(2) and SU(3) Wilson-action theories.

QCDGPU's "models" are the two gauge groups selected by compile-time #define
(SURVEY.md §2 "Driver/CLI": group N, precision, algorithm).  Here each is a
thin preset over the shared Simulation engine, plus convenience constructors
for the BASELINE.md acceptance configs.
"""

from __future__ import annotations

from ..config import SimConfig
from ..sim import Simulation


class SU2PureGauge(Simulation):
    """Pure SU(2) gluodynamics, Wilson one-plaquette action."""

    def __init__(self, cfg: SimConfig = None, **kw):
        if cfg is None:
            cfg = SimConfig(group=2, dims=(8, 8, 8, 8), beta=2.4, **kw)
        else:
            if cfg.group != 2:
                raise ValueError("SU2PureGauge requires group=2")
        super().__init__(cfg)


class SU3PureGauge(Simulation):
    """Pure SU(3) gluodynamics, Wilson one-plaquette action."""

    def __init__(self, cfg: SimConfig = None, **kw):
        if cfg is None:
            cfg = SimConfig(group=3, dims=(16, 16, 16, 16), beta=6.0, **kw)
        else:
            if cfg.group != 3:
                raise ValueError("SU3PureGauge requires group=3")
        super().__init__(cfg)


# --- BASELINE.md acceptance configurations -------------------------------


def baseline_config(n: int) -> SimConfig:
    """The five acceptance configs from BASELINE.md / BASELINE.json."""
    if n == 1:  # SU(2) heat-bath, 8^4, beta=2.4
        return SimConfig(group=2, dims=(8, 8, 8, 8), beta=2.4,
                         algorithm="heatbath", sweeps_therm=200, sweeps=500)
    if n == 2:  # SU(3) HB+OR, 16^4, beta=6.0
        return SimConfig(group=3, dims=(16, 16, 16, 16), beta=6.0,
                         algorithm="heatbath", n_or=1,
                         sweeps_therm=300, sweeps=500)
    if n == 3:  # finite-T scan lattice 24^3 x 6 (beta set per scan point)
        return SimConfig(group=3, dims=(24, 24, 24, 6), beta=5.89,
                         algorithm="heatbath", n_or=2,
                         sweeps_therm=200, sweeps=400)
    if n == 5:  # multi-chip SU(3) 32^4 (BASELINE.md names v5e-8: 8 chips)
        from ..parallel.mesh import default_mesh_shape

        dims = (32, 32, 32, 32)
        # route through the shared X/Y-major mesh policy: a hand-written
        # Z/T mesh would silently demote an auto-engine run to the
        # ~200x-slower XLA path (sim.resolve_engine)
        return SimConfig(group=3, dims=dims, beta=6.0,
                         algorithm="heatbath", n_or=1,
                         mesh=default_mesh_shape(8, dims),
                         sweeps_therm=100, sweeps=200)
    raise ValueError(f"no baseline config #{n} (4 is the RNG parity suite)")
