"""Native C++ analysis library vs the numpy estimators (parity oracle),
plus the bitwise threefry cross-check against an independent native
implementation (ops/rng.py's stated validation, prngcl.cpp)."""

import numpy as np
import pytest

from qcdgpu_tpu.native import analysis as nat
from qcdgpu_tpu.native import prngcl
from qcdgpu_tpu.utils import stats

pytestmark = pytest.mark.skipif(
    not nat.available(), reason="native analysis library not built"
)


@pytest.fixture(scope="module")
def series():
    rng = np.random.default_rng(5)
    # AR(1) series: autocorrelated like a Markov-chain observable
    x = np.empty(2048)
    x[0] = 0.0
    eps = rng.normal(size=2048)
    for i in range(1, 2048):
        x[i] = 0.8 * x[i - 1] + eps[i]
    return 0.6 + 0.01 * x


def _numpy_plateau(x, min_bins=8):
    n = len(x)
    err_naive = float(np.sqrt(x.var(ddof=1) / n))
    best, bin_size, bs = err_naive, 1, 2
    while n // bs >= min_bins:
        e = stats.binned_error(x, bs)
        if np.isfinite(e) and e > best:
            best, bin_size = e, bs
        bs *= 2
    return best, bin_size


def test_series_moments_match(series):
    m, v, e = nat.series_moments(series)
    assert m == pytest.approx(series.mean(), rel=1e-12)
    assert v == pytest.approx(series.var(), rel=1e-12)
    assert e == pytest.approx(np.sqrt(series.var(ddof=1) / len(series)), rel=1e-12)


def test_binned_error_matches(series):
    for bs in (1, 2, 16, 100):
        e_np = stats.binned_error(series, bs)
        e_nat = nat.binned_error(series, bs)
        if np.isnan(e_np):
            assert np.isnan(e_nat)
        else:
            assert e_nat == pytest.approx(e_np, rel=1e-12)


def test_plateau_error_matches(series):
    e_np, bs_np = _numpy_plateau(series)
    e_nat, bs_nat = nat.plateau_error(series)
    assert e_nat == pytest.approx(e_np, rel=1e-12)
    assert bs_nat == bs_np
    # the plateau must beat the naive error on an AR(1) series
    assert e_nat > np.sqrt(series.var(ddof=1) / len(series))


def test_jackknife_matches(series):
    for bs in (1, 8):
        est_np, err_np = stats.jackknife(series, np.mean, bs)
        est_nat, err_nat = nat.jackknife_mean(series, bs)
        assert est_nat == pytest.approx(est_np, rel=1e-12)
        assert err_nat == pytest.approx(err_np, rel=1e-10)


def test_autocorr_normalization(series):
    rho = nat.autocorr(series, 20)
    assert rho[0] == pytest.approx(1.0, rel=1e-12)
    x = series - series.mean()
    rho1 = float(np.mean(x[:-1] * x[1:]) / series.var())
    assert rho[1] == pytest.approx(rho1, rel=1e-10)


def test_analyze_series_uses_native_consistently(series):
    # the dispatching front end must agree with the numpy oracle whichever
    # path it took
    st = stats.analyze_series(series)
    e_np, bs_np = _numpy_plateau(series)
    assert st.err == pytest.approx(e_np, rel=1e-12)
    assert st.mean == pytest.approx(series.mean(), rel=1e-12)


def test_native_guards():
    with pytest.raises(ValueError, match="bin_size"):
        nat.binned_error(np.ones(16), 0)
    with pytest.raises(ValueError, match="min_bins"):
        nat.plateau_error(np.ones(16), 0)
    with pytest.raises(ValueError, match="maxlag"):
        nat.autocorr(np.ones(16), -1)


@pytest.mark.skipif(not prngcl.available(), reason="native prngcl not built")
def test_threefry_bitwise_native_vs_jax():
    # the production RNG (ops/rng.threefry2x32, pure jnp) against the
    # independent C++ implementation: bit-for-bit over random keys/counters
    from qcdgpu_tpu.ops import rng as jrng

    r = np.random.default_rng(3)
    x0 = r.integers(0, 2**32, size=512, dtype=np.uint32)
    x1 = r.integers(0, 2**32, size=512, dtype=np.uint32)
    for k0, k1 in [(0, 0), (1, 0xDEADBEEF), (0x243F6A88, 0x85A308D3)]:
        y0_n, y1_n = prngcl.threefry2x32(k0, k1, x0, x1)
        y0_j, y1_j = jrng.threefry2x32(
            np.uint32(k0), np.uint32(k1), x0, x1
        )
        np.testing.assert_array_equal(y0_n, np.asarray(y0_j))
        np.testing.assert_array_equal(y1_n, np.asarray(y1_j))
    with pytest.raises(ValueError, match="differ in size"):
        prngcl.threefry2x32(0, 0, x0, x1[:16])
