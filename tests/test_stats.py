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


def test_creutz_ratio():
    from qcdgpu_tpu.utils.stats import creutz_ratio
    import numpy as np

    # known hardware values, SU(3) beta=6.0 (docs/validation); the lattice
    # is isotropic so W(2,1) = W(1,2) statistically, but the keys differ
    w = {"wloop_1x1": (0.59363, 0.0003), "wloop_1x2": (0.38384, 0.0005),
         "wloop_2x1": (0.38384, 0.0005), "wloop_2x2": (0.19060, 0.0006)}
    chi11, e11 = creutz_ratio(w, 1, 1)
    assert abs(chi11 + np.log(0.59363)) < 1e-12 and e11 > 0
    chi22, e22 = creutz_ratio(w, 2, 2)
    # chi(2,2) = -ln(W22*W11/W12^2): literature ~0.35 at beta=6.0
    ref = -np.log(0.19060 * 0.59363 / 0.38384**2)
    assert abs(chi22 - ref) < 1e-12
    assert 0.2 < chi22 < 0.5 and e22 < 0.02
    # bare means (no errors) still give a value
    chi, err = creutz_ratio({k: v[0] for k, v in w.items()}, 2, 2)
    assert abs(chi - ref) < 1e-12 and np.isnan(err)


def test_report_derived_creutz_section():
    from qcdgpu_tpu.utils.report import _creutz_ratios

    res = {
        "plq": {"mean": 0.6, "err": 1e-4},
        "wloop_1x1": {"mean": 0.59363, "err": 3e-4},
        "wloop_1x2": {"mean": 0.38384, "err": 5e-4},
        "wloop_2x1": {"mean": 0.38384, "err": 5e-4},
        "wloop_2x2": {"mean": 0.19060, "err": 6e-4},
        # 3x3 present but 2x3/3x2 missing -> chi_3x3 must NOT appear
        "wloop_3x3": {"mean": 0.04683, "err": 7e-5},
    }
    d = _creutz_ratios(res)
    assert set(d) == {"chi_1x1", "chi_1x2", "chi_2x1", "chi_2x2"}
    assert all("mean" in v and "err" in v for v in d.values())
    assert abs(d["chi_1x1"]["mean"] - 0.5216) < 1e-3
    assert _creutz_ratios({"plq": {"mean": 0.6}}) == {}
