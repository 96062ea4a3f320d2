"""RNG-influence study (QCDGPU's headline workflow): the same simulation
under each randomness provenance — production threefry, TPU hw PRNG, and
reference-family PRNGCL streams driving the chain.

Produces docs/validation/rng_influence_su2.json.  Run from anywhere:
    python tools/rng_study.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qcdgpu_tpu import SimConfig, Simulation
from qcdgpu_tpu.utils.cache import enable_persistent_cache
from qcdgpu_tpu.utils.stats import analyze_series

MODES = ["threefry", "hw", "prngcl:ranlux3", "prngcl:ranmar",
         "prngcl:xor128", "prngcl:mrg32k3a", "prngcl:parkmiller"]
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "docs", "validation", "rng_influence_su2.json")


def main():
    enable_persistent_cache()
    rows = []
    for mode in MODES:
        cfg = SimConfig(group=2, dims=(8, 8, 8, 8), beta=2.4,
                        algorithm="heatbath", seed=42, rng_mode=mode,
                        sweeps_therm=200, sweeps=400, meas_every=1)
        sim = Simulation(cfg)
        sim.warmup()
        t0 = time.time()
        sim.thermalize()
        obs = sim.run()
        sim.sync()
        dt = time.time() - t0
        st = analyze_series(obs[:, 0])
        row = {"rng_mode": mode, "plq": st.mean, "err": st.err,
               "tau_int": st.tau_int, "n_meas": int(obs.shape[0]),
               "seconds": round(dt, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open(OUT, "w") as f:
        json.dump({"config": "SU(2) 8^4 beta=2.4, 200 therm + 400 measured",
                   "hardware": "1x TPU v5-lite", "rows": rows}, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
