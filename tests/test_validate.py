"""Validation harness plumbing (the heavy physics configs run on hardware
via `python -m qcdgpu_tpu validate`; here we exercise the cheap check and
the report structure)."""

import json

from qcdgpu_tpu.validate import CHECKS, run_validation


def test_rng_check_and_report(tmp_path):
    out = tmp_path / "val.json"
    ok, results = run_validation(configs=(4,), quick=True, out_path=str(out))
    assert ok
    assert results[0]["pass"] is True
    assert results[0]["config"] == 4
    rec = json.loads(out.read_text())
    assert rec["quick"] is True
    assert rec["results"][0]["name"].startswith("RNG parity")


def test_checks_registry_complete():
    assert set(CHECKS) == {1, 2, 3, 4, 5, 6}


def test_engine_cross_check_skips_off_tpu():
    # conftest forces the CPU backend, so the hardware-only engine
    # cross-validation must report a skip, not a failure
    r = CHECKS[6](quick=True)
    assert r["pass"] is None and "TPU" in r["skipped"]
