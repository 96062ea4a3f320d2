"""RNG parity suite: threefry vs the reference PRNGCL generator family.

BASELINE config 4: "RNG parity suite: threefry vs RANLUX3/XOR128/MRG32k3a
moments + plaquette statistics".  The reference ships stateful device RNGs
(random/prngcl_*.cl — SURVEY.md §2 "PRNGCL"); our production generator is
counter-based threefry (qcdgpu_tpu/ops/rng.py).  Parity is *statistical*,
not bitwise (SURVEY.md §4, mechanism 2):

  1. raw-uniform moments of each generator agree with U(0,1) theory and
     with threefry within cross-sample error;
  2. two-sample KS tests: threefry vs each reference generator;
  3. the Kennedy–Pendleton sampler fed by threefry vs fed by reference
     generators produces the same w0 marginal (two-sample KS) — parity at
     the exact point where the simulation consumes randomness;
  4. (slow) full plaquette statistics: an independent numpy SU(2) chain
     driven by native RANLUX3 agrees with the JAX threefry chain within
     combined Monte Carlo errors.

The reference generators are the C++ re-implementations in
qcdgpu_tpu/native/prngcl (host-side, algorithmic parity only).
"""

import numpy as np
import pytest
from scipy import stats as sps

import jax.numpy as jnp

from qcdgpu_tpu.native import prngcl
from qcdgpu_tpu.ops import rng
from qcdgpu_tpu.ops.samplers import kp_trial_quat

pytestmark = pytest.mark.skipif(
    not prngcl.available(), reason="native prngcl library not built"
)

PARITY_GENERATORS = ("ranlux3", "xor128", "mrg32k3a")
N_DRAWS = 1 << 20


def _threefry_uniforms(n, seed=7):
    key = rng.make_base_key(seed)
    sidx = jnp.arange((n + 15) // 16, dtype=jnp.uint32)
    u = rng.site_uniforms(key, sidx, 16)
    return np.asarray(u, np.float64).ravel()[:n]


def _native_uniforms(gen, n, seed=7):
    u = np.asarray(prngcl.fill(gen, seed, n), np.float64)
    # some reference algorithms can emit exact 0.0; KP needs open (0,1) and
    # the comparison should match threefry's open-interval convention
    return np.clip(u, 1e-12, 1.0 - 1e-12)


def _moment_errors(n):
    # std errors of sample moments of U(0,1): var(x^k) = 1/(2k+1) - 1/(k+1)^2
    return {
        k: np.sqrt((1.0 / (2 * k + 1) - 1.0 / (k + 1) ** 2) / n)
        for k in (1, 2, 3, 4)
    }


@pytest.mark.parametrize("gen", PARITY_GENERATORS + ("threefry",))
def test_uniform_moments_vs_theory(gen):
    if gen == "threefry":
        u = _threefry_uniforms(N_DRAWS)
    else:
        u = _native_uniforms(gen, N_DRAWS)
    err = _moment_errors(len(u))
    for k in (1, 2, 3, 4):
        m = np.mean(u**k)
        assert abs(m - 1.0 / (k + 1)) < 6.0 * err[k], (gen, k, m)


@pytest.mark.parametrize("gen", PARITY_GENERATORS)
def test_moments_match_threefry(gen):
    a = _threefry_uniforms(N_DRAWS, seed=3)
    b = _native_uniforms(gen, N_DRAWS, seed=5)
    err = _moment_errors(N_DRAWS)
    for k in (1, 2, 3, 4):
        d = abs(np.mean(a**k) - np.mean(b**k))
        assert d < 6.0 * np.sqrt(2.0) * err[k], (gen, k, d)


@pytest.mark.parametrize("gen", PARITY_GENERATORS)
def test_ks_two_sample_vs_threefry(gen):
    n = 1 << 18
    a = _threefry_uniforms(n, seed=11)
    b = _native_uniforms(gen, n, seed=13)
    res = sps.ks_2samp(a, b)
    assert res.pvalue > 1e-3, (gen, res)


def _kp_w0_samples(uniforms, a_coef=2.9, k_trials=8):
    """Push a flat uniform stream through the KP sampler; return accepted w0.

    a_coef=2.9 ~ 2*beta*k/N at SU(2) beta=2.4 equilibrium staple norms.
    """
    per = 4 * k_trials + 2
    m = len(uniforms) // per
    u = np.asarray(uniforms[: m * per], np.float32).reshape(per, m, order="F")
    utr = jnp.asarray(u[: 4 * k_trials].reshape(k_trials, 4, m))
    udir = jnp.asarray(u[4 * k_trials :])
    a = jnp.full((m,), a_coef, jnp.float32)
    w, ok = kp_trial_quat(a, utr, udir)
    w0 = np.asarray(w[0])
    return w0[np.asarray(ok)]


@pytest.mark.parametrize("gen", PARITY_GENERATORS)
def test_kp_consumption_parity(gen):
    """The sampler's w0 marginal is generator-independent (two-sample KS)."""
    n = 1 << 19
    wa = _kp_w0_samples(_threefry_uniforms(n, seed=17))
    wb = _kp_w0_samples(_native_uniforms(gen, n, seed=19))
    assert len(wa) > 1000 and len(wb) > 1000
    res = sps.ks_2samp(wa, wb)
    assert res.pvalue > 1e-3, (gen, res)


# ---------------------------------------------------------------------------
# Full plaquette-statistics parity (slow): independent numpy SU(2) chain
# driven by native RANLUX3 vs the production JAX threefry chain.
# ---------------------------------------------------------------------------


class _Stream:
    """Buffered uniform stream over a native generator."""

    def __init__(self, gen, seed, chunk=1 << 16):
        self.gen, self.seed, self.chunk = gen, seed, chunk
        self.buf = np.empty(0)
        self.total = 0

    def draw(self, n):
        while len(self.buf) < n:
            self.total += self.chunk
            # regenerate from the start each refill (fill() is stateless in
            # (seed, n)); slice off the already-consumed prefix
            full = np.asarray(prngcl.fill(self.gen, self.seed, self.total))
            self.buf = np.clip(full[self.total - self.chunk - len(self.buf):],
                               1e-12, 1 - 1e-12)
        out, self.buf = self.buf[:n], self.buf[n:]
        return out


def _np_su2_heatbath_sweep(u, beta, stream, dims):
    """Sequential-site SU(2) KP heat-bath sweep (valid Gibbs scan order)."""
    import oracle

    for x in np.ndindex(*dims):
        for mu in range(4):
            a_st = oracle.staple_sum_site(u, x, mu)
            w = u[mu][(slice(None), slice(None)) + x] @ a_st
            # quaternion projection of W (same convention as ops/sun.py)
            q0 = 0.5 * (w[0, 0].real + w[1, 1].real)
            q1 = 0.5 * (w[0, 1].imag + w[1, 0].imag)
            q2 = 0.5 * (w[0, 1].real - w[1, 0].real)
            q3 = 0.5 * (w[0, 0].imag - w[1, 1].imag)
            k = np.sqrt(q0 * q0 + q1 * q1 + q2 * q2 + q3 * q3)
            if k < 1e-30:
                continue
            a_c = beta * k  # 2*beta*k/N, N=2
            # KP rejection loop (host code: true unbounded loop is fine)
            while True:
                r1, r2, r3, r4 = stream.draw(4)
                c = np.cos(2 * np.pi * r2)
                lam2 = -(np.log(r1) + c * c * np.log(r3)) / (2 * a_c)
                if r4 * r4 <= 1.0 - lam2:
                    break
            w0 = np.clip(1.0 - 2.0 * lam2, -1.0, 1.0)
            rho = np.sqrt(max(1.0 - w0 * w0, 0.0))
            d1, d2 = stream.draw(2)
            ct = 2.0 * d1 - 1.0
            st = np.sqrt(max(1.0 - ct * ct, 0.0))
            ph = 2 * np.pi * d2
            wq = np.array([w0, rho * st * np.cos(ph), rho * st * np.sin(ph), rho * ct])
            vq = np.array([q0, q1, q2, q3]) / k
            # unew = wq * conj(vq)
            p, q = wq, np.array([vq[0], -vq[1], -vq[2], -vq[3]])
            un = np.array([
                p[0] * q[0] - p[1] * q[1] - p[2] * q[2] - p[3] * q[3],
                p[0] * q[1] + q[0] * p[1] - (p[2] * q[3] - p[3] * q[2]),
                p[0] * q[2] + q[0] * p[2] - (p[3] * q[1] - p[1] * q[3]),
                p[0] * q[3] + q[0] * p[3] - (p[1] * q[2] - p[2] * q[1]),
            ])
            m = np.array([
                [un[0] + 1j * un[3], un[2] + 1j * un[1]],
                [-un[2] + 1j * un[1], un[0] - 1j * un[3]],
            ])
            u[mu][(slice(None), slice(None)) + x] = (
                m @ u[mu][(slice(None), slice(None)) + x]
            )
    return u


@pytest.mark.slow
def test_plaquette_statistics_parity_ranlux3_vs_threefry():
    """Mean plaquette of a RANLUX3-driven numpy chain matches the threefry
    JAX chain within combined Monte Carlo errors (SU(2) 4^4, beta=2.4)."""
    import oracle

    from qcdgpu_tpu import SimConfig, Simulation
    from qcdgpu_tpu.utils.stats import analyze_series

    dims = (4, 4, 4, 4)
    beta = 2.4
    therm, meas = 150, 300

    # --- reference-generator chain (numpy, sequential scan) --------------
    u = np.zeros((4, 2, 2) + dims, np.complex128)
    u[:, 0, 0], u[:, 1, 1] = 1.0, 1.0
    stream = _Stream("ranlux3", seed=23)
    series_ref = []
    for s in range(therm + meas):
        u = _np_su2_heatbath_sweep(u, beta, stream, dims)
        if s >= therm:
            series_ref.append(oracle.mean_plaquette(u)[0])
    ref = analyze_series(np.asarray(series_ref))

    # --- production threefry chain (JAX) ---------------------------------
    cfg = SimConfig(group=2, dims=dims, beta=beta, algorithm="heatbath",
                    seed=29, sweeps_therm=therm, sweeps=meas, meas_every=1)
    sim = Simulation(cfg)
    sim.thermalize()
    obs = sim.run()
    tf = analyze_series(obs[:, 0])

    err = np.sqrt(ref.err**2 + tf.err**2)
    assert abs(ref.mean - tf.mean) < 4.0 * max(err, 1e-4), (ref, tf)
