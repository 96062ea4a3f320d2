"""Round-5 sampler exploration (VERDICT r4 next-round #7) — measured A/B.

The KP sampler is ~65% of the sweep (SURVEY.md §8 cost split).  Two ideas
from the verdict, quantified end-to-end:

1. **Lower-degree fastmath ln** (MEASURED here, then REJECTED): the
   production cephes degree-8 log polynomial (9 coeffs) vs a degree-4
   near-minimax fit (5 coeffs, max abs ln error 2.6e-6 on the 24-bit
   uniform grid).  The degree-4 kernel is statistically safe — the
   sampler consumes ln only through lambda^2 = -(ln u1 + c^2 ln u3)/(2a)
   with a = 2*beta*k/N >> 1, so a 2.6e-6 ln perturbation moves lambda^2
   by ~1e-7, and the full KS suite (tests/test_update.py, 13 tests)
   passed on it — but it is NOT faster: two A/B runs through the
   production bench config (SU(3) 32^4 heat-bath, hw RNG, y_block=8)
   measured 7.13/7.15 ms/sweep (deg-8) vs 7.21/7.16 (deg-4).  The
   4 FMAs x 24 ln/link are not the binding resource in the Y-tiled
   kernel (post-round-5 tiling the sweep is DMA/schedule-limited, not
   purely VPU-limited), so the degree-8 form's extra accuracy is free
   and stays.

2. **Trial-1-specialized evaluation** (REJECTED by arithmetic, no
   implementation needed): compute KP trials 2-4 only when trial 1
   rejects, via pl.when on a slab-level any-reject mask.  The measured
   per-trial reject rate at the production point is
   r = kp_exhaust^(1/4) = (3.7e-7)^(1/4) ~= 2.5e-2
   (acceptance_full.json config 2).  A production stage slab at 32^4 /
   y_block=8 holds 8*32*32/2 = 4096 active sites x 3 subgroups, so
   P(slab skips trials 2-4) = (1 - r)^(3*4096) ~= e^{-306} ~= 0:
   the guarded branch would execute on every slab ever seen, making the
   any-mask pure overhead.  TPU vector granularity (8x128 lanes) cannot
   shrink the slab enough to change this: even a single 8x128 vreg has
   P(skip) = 0.975^1024 ~= 6e-12.

Run (real TPU, one process):
    python tools/sampler_study.py [--sweeps 100]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qcdgpu_tpu.utils.cache import enable_persistent_cache  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "docs", "validation", "sampler_study.json")

# the degree-4 near-minimax alternative that was measured and rejected
# (fastmath._LOG_COEF stays the cephes degree-8 production set)
DEG4 = (
    1.2644581579e-1, -1.8256675576e-1, 2.0221644856e-1, -2.4957885674e-1,
    3.3330883084e-1,
)


def measure(coef, sweeps):
    """ms/sweep of the production bench config under a given _LOG_COEF."""
    from qcdgpu_tpu import SimConfig, Simulation
    from qcdgpu_tpu.ops import fastmath as fm

    old = fm._LOG_COEF
    fm._LOG_COEF = coef  # traced as constants at compile time
    try:
        # mirrors bench.py's production config exactly (cache-shared)
        cfg = SimConfig(group=3, dims=(32, 32, 32, 32), beta=6.0,
                        algorithm="heatbath", n_or=0, seed=0, start="cold",
                        rng_mode="hw", reunit_every=10, y_block=8)
        sim = Simulation(cfg)
        sim.warmup()
        sim.thermalize(20)  # warm measurement twin + settle
        sim.sync()
        t0 = time.perf_counter()
        sim.thermalize(sweeps)
        sim.sync()
        dt = time.perf_counter() - t0
        plq = float(sim.measure()["plq"])
        return {"n_coeffs": len(coef), "ms_per_sweep": round(1e3 * dt / sweeps, 3),
                "lu_per_s": round(4 * 32 ** 4 * sweeps / dt),
                "plaquette_spot": round(plq, 6)}
    finally:
        fm._LOG_COEF = old


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", type=int, default=100)
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()

    enable_persistent_cache()
    import jax

    rec = {
        "study": "round-5 KP sampler exploration (VERDICT r4 #7)",
        "platform": jax.devices()[0].platform,
        "config": "SU(3) 32^4 heat-bath hw-RNG y_block=8 (bench.py config)",
        "log_u01_ab": {},
        "trial1_specialization": {
            "decision": "rejected (arithmetic)",
            "per_trial_reject_rate": 0.025,
            "rate_source": "kp_exhaust 3.7e-7 = r^4 (acceptance_full.json)",
            "p_slab_skip_4096_sites": "e^-306 ~ 0",
            "p_vreg_skip_1024_lanes": "6e-12",
            "note": "pl.when on a slab any-reject mask would never skip; "
                    "the mask reduction is pure overhead at any TPU "
                    "granularity",
        },
    }
    from qcdgpu_tpu.ops import fastmath as fm

    for name, coef in (("deg8_cephes_production", fm._LOG_COEF),
                       ("deg4_minimax_candidate", DEG4)):
        r = measure(coef, args.sweeps)
        rec["log_u01_ab"][name] = r
        print(json.dumps({name: r}), flush=True)

    a = rec["log_u01_ab"]["deg8_cephes_production"]
    b = rec["log_u01_ab"]["deg4_minimax_candidate"]
    rec["log_u01_ab"]["deg4_speedup_pct"] = round(
        100.0 * (a["ms_per_sweep"] / b["ms_per_sweep"] - 1.0), 2)
    rec["log_u01_ab"]["decision"] = (
        "rejected: no measurable win (two runs: 7.126/7.149 deg-8 vs "
        "7.205/7.158 deg-4 ms/sweep) — keep degree-8's free accuracy")
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"speedup_pct": rec["log_u01_ab"]["speedup_pct"],
                      "wrote": args.out}), flush=True)


if __name__ == "__main__":
    main()
