"""Measure SU(3) big-lattice sweep throughput vs Y-tile size (one chip).

The 64^4 Y-tiled path pays a throughput tax vs the untiled 32^4 point
(VERDICT r4 weak #4: 4.48e8 vs 5.5e8 lu/s — operand-DMA volume and the
yb=8 VMEM cap).  The slim 8-row halo operands (_stage_call_ytiled) decouple
halo cost from yb, so LARGER tiles (16, 32) now fit the VMEM budget:
per-flagged-slab window = yb + 16 rows instead of 3*yb.  This tool measures
ms/sweep for each requested y_block and records the winner.

Run (real TPU, one process):
    python tools/ytile_scan.py [--dims 64,64,64,64] [--yblocks 8,16,32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qcdgpu_tpu import SimConfig, Simulation  # noqa: E402
from qcdgpu_tpu.utils.cache import enable_persistent_cache  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "docs", "validation", "ytile_scan_64c4.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="64,64,64,64")
    ap.add_argument("--yblocks", default="8,16,32")
    ap.add_argument("--sweeps", type=int, default=10)
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()
    dims = tuple(int(x) for x in args.dims.split(","))
    ybs = [int(x) for x in args.yblocks.split(",")]

    enable_persistent_cache()
    import jax

    vol = 1
    for d in dims:
        vol *= d
    rec = {"dims": list(dims), "group": 3, "rng_mode": "hw",
           "platform": jax.devices()[0].platform, "rows": []}
    for yb in ybs:
        cfg = SimConfig(group=3, dims=dims, beta=6.0, seed=0, start="cold",
                        rng_mode="hw", reunit_every=10, y_block=yb)
        t0 = time.perf_counter()
        try:
            sim = Simulation(cfg)
            sim.warmup()
        except Exception as e:  # noqa: BLE001 — record and move on
            rec["rows"].append({"y_block": yb, "error": repr(e)})
            print(json.dumps(rec["rows"][-1]), flush=True)
            continue
        warm_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        sim.thermalize(args.sweeps)
        sim.sync()
        dt = time.perf_counter() - t0
        row = {
            "y_block": yb,
            "warmup_s": round(warm_s, 1),
            "ms_per_sweep": round(1e3 * dt / args.sweeps, 2),
            "link_updates_per_s": round(4 * vol * args.sweeps / dt),
            "plq": round(float(sim.measure()["plq"]), 6),
        }
        rec["rows"].append(row)
        print(json.dumps(row), flush=True)
        del sim  # free the 3.2 GB packed state before the next config

    done = [r for r in rec["rows"] if "ms_per_sweep" in r]
    if done:
        best = min(done, key=lambda r: r["ms_per_sweep"])
        rec["best"] = {"y_block": best["y_block"],
                       "ms_per_sweep": best["ms_per_sweep"],
                       "link_updates_per_s": best["link_updates_per_s"]}
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"wrote": args.out, "best": rec.get("best")}),
          flush=True)


if __name__ == "__main__":
    main()
