"""Wilson-loop / Creutz-ratio study: SU(3) 16^4 at beta=6.0 on the real
chip, rectangular loops up to 4x4 and the chi(R,R) string-tension
estimators.  Produces docs/validation/wilson_su3.json.

Run from anywhere:  python tools/wilson_study.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qcdgpu_tpu import SimConfig, Simulation
from qcdgpu_tpu.utils.cache import enable_persistent_cache
from qcdgpu_tpu.utils.stats import analyze_series, creutz_ratio

PAIRS = tuple(
    (r, t) for r in range(1, 5) for t in range(1, 5) if abs(r - t) <= 1
)
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "docs", "validation", "wilson_su3.json")


def main():
    enable_persistent_cache()
    cfg = SimConfig(group=3, dims=(16, 16, 16, 16), beta=6.0,
                    algorithm="heatbath", n_or=1, seed=17,
                    wilson_loops=PAIRS, sweeps_therm=300, sweeps=500,
                    meas_every=2)
    sim = Simulation(cfg)
    sim.warmup()
    t0 = time.time()
    sim.thermalize()
    obs = sim.run()
    sim.sync()
    dt = time.time() - t0
    names = list(sim.obs_names)
    loops = {}
    for (r, t) in PAIRS:
        k = f"wloop_{r}x{t}"
        st = analyze_series(obs[:, names.index(k)])
        loops[k] = (st.mean, st.err)
        print(f"{k}: {st.mean:.5f} +/- {st.err:.5f}", flush=True)
    chis = {}
    for r in (1, 2, 3, 4):
        chi, err = creutz_ratio(loops, r, r)
        chis[f"chi_{r}x{r}"] = (chi, err)
        print(f"chi({r},{r}) = {chi:.4f} +/- {err:.4f}", flush=True)
    with open(OUT, "w") as f:
        json.dump({
            "config": "SU(3) 16^4 beta=6.0, HB+1OR, 300 therm + 250 meas",
            "hardware": "1x TPU v5-lite",
            "seconds": round(dt, 1),
            "wilson_loops": {k: list(v) for k, v in loops.items()},
            "creutz_ratios": {k: list(v) for k, v in chis.items()},
        }, f, indent=1)
    print(f"wrote {OUT} ({dt:.1f}s)")


if __name__ == "__main__":
    main()
