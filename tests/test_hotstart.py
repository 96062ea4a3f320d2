"""Haar-ness of the hot start (sim.hot_start).

The construction — Ginibre matrix -> equivariant Gram–Schmidt projection —
is exactly Haar by right-invariance (see the hot_start docstring for the
argument); these tests pin the claim with Monte Carlo checks of the Haar
character identities on SU(2) and SU(3):

    E[tr U] = 0                (fund. character integrates to 0)
    E[|tr U|^2] = 1            (one invariant in fund x fund-bar)
    E[(tr U)^2] = 0 for SU(3)  (3 x 3 = 6 + 3bar: no singlet)
                = 1 for SU(2)  (2 x 2 = 1 + 3: the epsilon singlet)
    E[|tr U|^4] = 2            (two invariants in (fund x fund-bar)^2)

A Gram–Schmidt start that was NOT Haar (e.g. per-element uniforms without
the Gaussian isotropy, or a missing phase convention) shifts these moments
at the percent level, well above the ~6 sigma gates here.
"""

import numpy as np
import pytest

from qcdgpu_tpu.config import SimConfig
from qcdgpu_tpu.ops import rng
from qcdgpu_tpu.sim import hot_start


def _traces(group, seed):
    cfg = SimConfig(group=group, dims=(8, 8, 8, 8), beta=6.0, seed=seed)
    u = np.asarray(hot_start(cfg, rng.make_base_key(seed)))
    n = cfg.group
    return np.einsum("mii...->m...", u.reshape(4, n, n, -1)).ravel()


@pytest.mark.parametrize("group", [2, 3])
def test_haar_character_moments(group):
    tr = _traces(group, seed=123)
    m = tr.size  # 16384 links

    def gate(stat, expect, name):
        err = max(float(np.std(np.abs(stat - np.mean(stat)))), 1e-12)
        sig = abs(float(np.mean(stat).real) - expect) / (err / np.sqrt(m))
        assert sig < 6.0, (name, np.mean(stat), expect, sig)

    gate(tr.real, 0.0, "Re E[tr]")
    gate(tr.imag, 0.0, "Im E[tr]")
    gate(np.abs(tr) ** 2, 1.0, "E[|tr|^2]")
    gate((tr ** 2).real, 1.0 if group == 2 else 0.0, "Re E[tr^2]")
    if group == 3:
        gate((tr ** 2).imag, 0.0, "Im E[tr^2]")
    gate(np.abs(tr) ** 4, 2.0, "E[|tr|^4]")


def test_hot_start_links_are_sun():
    from qcdgpu_tpu.ops import sun

    for group in (2, 3):
        cfg = SimConfig(group=group, dims=(4, 4, 4, 4), beta=6.0, seed=9)
        u = hot_start(cfg, rng.make_base_key(9))
        assert float(sun.unitarity_defect(u[0])) < 1e-5
        d = np.asarray(sun.det(u[0]))
        assert np.max(np.abs(d - 1.0)) < 1e-5
