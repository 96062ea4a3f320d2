"""SimConfig validation: invalid combinations fail at construction with a
clear message, not deep inside an engine trace (QCDGPU's compile-time
#define errors surfaced at kernel build; ours surface at config build)."""

import pytest

from qcdgpu_tpu import SimConfig


def test_n_or_range():
    SimConfig(n_or=7)  # 8 * (1 + 7) = 64 stages fits the key namespace
    with pytest.raises(ValueError, match="n_or"):
        SimConfig(n_or=8)
    with pytest.raises(ValueError, match="n_or"):
        SimConfig(n_or=-1)


def test_mesh_must_be_4_tuple():
    with pytest.raises(ValueError, match="mesh"):
        SimConfig(mesh=(2, 2))


def test_pallas_rejects_double_measurement():
    with pytest.raises(ValueError, match="meas_dtype"):
        SimConfig(engine="pallas", meas_dtype="double")


def test_auto_engine_routes_double_measurement_to_xla():
    from qcdgpu_tpu.sim import resolve_engine

    assert resolve_engine(SimConfig(meas_dtype="double")) == "xla"


def test_dims_divisible_by_mesh_checkerboard():
    with pytest.raises(ValueError, match="even per mesh shard"):
        SimConfig(dims=(4, 4, 4, 4), mesh=(4, 1, 1, 1))
