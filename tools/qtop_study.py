"""Topological-charge study: Q_L vs APE smearing depth on a thermalized
SU(2) chain (the workflow get_qtop + qtop_smear exists for).

Produces docs/validation/qtop_su2.json: per smearing depth, the Q_L
series' moments, its distance-to-integer statistics, and the mean
plaquette of the smeared field.  Unsmeared clover Q_L is suppressed by
the multiplicative UV renormalization Z(beta) < 1; APE smearing removes
the suppression and drives per-configuration charges toward integers
(the smeared plaquette approaching 1 tracks the smoothing).  Run from
anywhere: python tools/qtop_study.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from qcdgpu_tpu import SimConfig, Simulation
from qcdgpu_tpu.utils.cache import enable_persistent_cache

SMEAR_LEVELS = [0, 2, 5, 10]
N_CFGS = 40          # decorrelated configurations
SWEEPS_BETWEEN = 10  # decorrelation gap
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "docs", "validation", "qtop_su2.json")


def main():
    enable_persistent_cache()
    import jax

    from qcdgpu_tpu.ops.measure import mean_plaquette, topological_charge
    from qcdgpu_tpu.ops.smear import ape_smear

    cfg = SimConfig(group=2, dims=(8, 8, 8, 8), beta=2.4,
                    algorithm="heatbath", seed=7,
                    sweeps_therm=200, sweeps=N_CFGS * SWEEPS_BETWEEN,
                    meas_every=SWEEPS_BETWEEN)
    sim = Simulation(cfg)
    sim.warmup()
    t0 = time.time()
    sim.thermalize()

    @jax.jit
    def qtop_at_levels(u):
        out = []
        prev = 0
        for lvl in SMEAR_LEVELS:
            u = ape_smear(u, 0.5, lvl - prev)
            prev = lvl
            out.append((topological_charge(u), mean_plaquette(u)[0]))
        return out

    series = {lvl: [] for lvl in SMEAR_LEVELS}
    plqs = {lvl: [] for lvl in SMEAR_LEVELS}
    for _ in range(N_CFGS):
        sim.thermalize(SWEEPS_BETWEEN)
        vals = qtop_at_levels(sim.u)
        for lvl, (q, p) in zip(SMEAR_LEVELS, vals):
            series[lvl].append(float(q))
            plqs[lvl].append(float(p))
    dt = time.time() - t0

    rows = []
    for lvl in SMEAR_LEVELS:
        q = np.asarray(series[lvl])
        dist = np.abs(q - np.round(q))
        rows.append({
            "smear": lvl,
            "q_mean": float(q.mean()),
            "q_sigma": float(q.std(ddof=1)),
            "q_max_abs": float(np.abs(q).max()),
            "frac_near_integer": float((dist < 0.25).mean()),
            "mean_dist_to_integer": float(dist.mean()),
            "plq_smeared": float(np.mean(plqs[lvl])),
            "series": [round(float(v), 4) for v in q],
        })
        print(json.dumps(rows[-1]), flush=True)
    with open(OUT, "w") as f:
        json.dump({
            "config": (f"SU(2) 8^4 beta=2.4, {N_CFGS} cfgs "
                       f"x {SWEEPS_BETWEEN} sweeps apart, alpha=0.5"),
            "hardware": "1x TPU v5-lite",
            "seconds": round(dt, 1),
            "rows": rows,
        }, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
