"""Susceptibility estimator (deconfinement analysis, utils/stats.py)."""

import numpy as np

from qcdgpu_tpu.utils.stats import susceptibility


def test_susceptibility_iid_normal():
    rng = np.random.default_rng(11)
    sigma = 0.3
    x = rng.normal(0.7, sigma, size=4096)
    chi, err = susceptibility(x, volume=100.0)
    assert np.isfinite(err) and err > 0
    # V * sigma^2 = 9.0; the jackknife error of the variance of 4096 iid
    # draws is ~ V * sigma^2 * sqrt(2/n) ~ 0.2
    assert abs(chi - 100.0 * sigma**2) < 5 * err


def test_susceptibility_constant_series():
    chi, _ = susceptibility(np.full(64, 0.5), volume=10.0)
    assert chi == 0.0


def test_susceptibility_short_series():
    chi, err = susceptibility(np.ones(1))
    assert np.isnan(chi) and np.isnan(err)


def test_scan_rows_include_polyakov_susceptibility(tmp_path):
    from qcdgpu_tpu import cli

    out = tmp_path / "scan"
    cli.main(["scan", "--group", "2", "--dims", "4,4,4,4",
              "--betas", "2.2,2.4", "--therm", "4", "--sweeps", "8",
              "--engine", "xla", "--out", str(out)])
    import json

    rows = json.load(open(out / "scan.json"))["scan"]
    for r in rows:
        assert 0.0 <= r["poly_abs"] <= 1.0
        assert r["poly_sus"] >= 0.0
