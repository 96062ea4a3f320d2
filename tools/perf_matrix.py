"""Hardware performance matrix: ms/sweep for every engine/feature mode.

QCDGPU reports per-kernel timings for each run configuration in its
results file (SURVEY.md §5.1); this is the framework-level analogue — one
artifact covering every execution mode a user can select, so a feature
never silently costs 200x (VERDICT round 1, weak #6).  Rows measure the
north-star SU(3) 32^4 sweep under each mode, plus a 64^4 "big lattice"
headroom row (QCDGPU's BIG_LATTICE existed to exceed one GPU's memory;
one TPU chip holds 64^4 SU(3) links in ~3.2 GB of HBM directly).

Produces docs/validation/perf_matrix.json.  Run (real TPU, one process):
    python tools/perf_matrix.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qcdgpu_tpu import SimConfig, Simulation
from qcdgpu_tpu.sim import resolve_engine
from qcdgpu_tpu.utils.cache import enable_persistent_cache

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "docs", "validation", "perf_matrix.json")

DIMS = (32, 32, 32, 32)

# (label, config overrides, timed sweeps)
ROWS = [
    ("heatbath threefry (bit-reproducible production)",
     dict(), 50),
    ("heatbath hw RNG (throughput production = bench config)",
     dict(rng_mode="hw"), 50),
    ("heatbath + 1 overrelaxation pass",
     dict(rng_mode="hw", n_or=1), 50),
    ("heatbath ranlux3 stream (QCDGPU default RNG)",
     dict(rng_mode="prngcl:ranlux3"), 20),
    ("heatbath ranmar stream",
     dict(rng_mode="prngcl:ranmar"), 20),
    ("heatbath xor128 stream",
     dict(rng_mode="prngcl:xor128"), 20),
    ("heatbath mrg32k3a stream",
     dict(rng_mode="prngcl:mrg32k3a"), 20),
    ("metropolis n_hit=3 + acceptance tracking",
     dict(algorithm="metropolis", rng_mode="hw", track_acceptance=True), 50),
    ("heatbath hw + KP-exhaustion tracking",
     dict(rng_mode="hw", track_kp_exhaust=True), 50),
    ("heatbath hw + double (Kahan) measurement sums",
     dict(rng_mode="hw", meas_dtype="double"), 50),
    ("heatbath hw 64^4 (big-lattice headroom, ~3.2 GB links)",
     dict(rng_mode="hw", dims=(64, 64, 64, 64)), 10),
]


def measure_row(label, overrides, sweeps):
    overrides = dict(overrides)
    dims = overrides.pop("dims", DIMS)
    cfg = SimConfig(group=3, dims=dims, beta=6.0, seed=0, start="cold",
                    reunit_every=10, **overrides)
    engine = resolve_engine(cfg)
    sim = Simulation(cfg)
    sim.warmup()
    t0 = time.perf_counter()
    sim.thermalize(sweeps)
    sim.sync()
    dt = time.perf_counter() - t0
    meas = sim.measure()
    vol = dims[0] * dims[1] * dims[2] * dims[3]
    row = {
        "label": label,
        "engine": engine,
        "dims": list(dims),
        "sweeps": sweeps,
        "ms_per_sweep": round(1e3 * dt / sweeps, 3),
        "link_updates_per_s": round(4 * vol * sweeps / dt),
        "plq": round(float(meas["plq"]), 6),
    }
    if cfg.track_acceptance or cfg.track_kp_exhaust:
        # engine-accumulated column (acc_rate / kp_exhaust_rate): rides
        # the measured series, not the one-off measurement vector
        obs = sim.run(4, measure_every=2)
        name = "acc_rate" if cfg.track_acceptance else "kp_exhaust_rate"
        row[name] = round(float(obs[:, -1].mean()), 6)
    return row


def main():
    enable_persistent_cache()
    import jax

    platform = jax.devices()[0].platform
    rows = []
    for label, overrides, sweeps in ROWS:
        try:
            row = measure_row(label, overrides, sweeps)
        except Exception as e:  # keep the matrix going; record the failure
            row = {"label": label, "error": repr(e)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open(OUT, "w") as f:
        json.dump({
            "config": "SU(3) beta=6.0 cold start, sweep timing after warmup",
            "hardware": f"1x TPU v5-lite (platform={platform})",
            "rows": rows,
        }, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
