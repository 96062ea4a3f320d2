"""Model-family presets (models/gauge.py): smoke + policy tests.

QCDGPU selects its two gauge-group "models" by compile-time #define
(SURVEY.md §2 "Driver/CLI"); here they are thin presets over Simulation
plus the BASELINE.md acceptance-config factory.
"""

import numpy as np
import pytest

from qcdgpu_tpu import (
    SimConfig,
    SU2PureGauge,
    SU3PureGauge,
    baseline_config,
)
from qcdgpu_tpu.parallel.mesh import default_mesh_shape


def test_su2_preset_runs():
    sim = SU2PureGauge(SimConfig(group=2, dims=(4, 4, 4, 4), beta=2.4,
                                 seed=3))
    sim.thermalize(1)
    plq = sim.measure()["plq"]
    assert 0.0 < plq <= 1.0


def test_preset_defaults_match_baseline():
    assert SU2PureGauge().cfg.beta == 2.4
    assert SU2PureGauge().cfg.dims == (8, 8, 8, 8)
    assert SU3PureGauge().cfg.beta == 6.0
    assert SU3PureGauge().cfg.dims == (16, 16, 16, 16)


def test_preset_group_mismatch_raises():
    with pytest.raises(ValueError):
        SU2PureGauge(SimConfig(group=3, dims=(4, 4, 4, 4), beta=6.0))
    with pytest.raises(ValueError):
        SU3PureGauge(SimConfig(group=2, dims=(4, 4, 4, 4), beta=2.4))


def test_baseline_configs():
    c1 = baseline_config(1)
    assert (c1.group, c1.dims, c1.beta) == (2, (8, 8, 8, 8), 2.4)
    c2 = baseline_config(2)
    assert (c2.group, c2.dims, c2.beta, c2.n_or) == (
        3, (16, 16, 16, 16), 6.0, 1)
    c3 = baseline_config(3)
    assert c3.dims == (24, 24, 24, 6)
    with pytest.raises(ValueError):
        baseline_config(4)  # the RNG parity suite, not a SimConfig


def test_baseline_config5_uses_shared_mesh_policy():
    """Config 5's mesh must come from default_mesh_shape: a Z/T mesh would
    silently demote an auto-engine run to the XLA fallback path."""
    c5 = baseline_config(5)
    assert c5.mesh == default_mesh_shape(8, c5.dims)
    assert int(np.prod(c5.mesh)) == 8
    # X/Y-major policy: Z and T stay unsharded until X/Y saturate
    assert c5.mesh[2] == 1 and c5.mesh[3] == 1
