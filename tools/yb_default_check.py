"""Quick A/B: y_block=8 vs untiled on fits-VMEM lattices (16^4, 32^4).

Decides whether auto_y_block should default to 8-row tiling where VMEM
never forces it (bench.py already adopted yb=8 at 32^4 from the round-5
measurement).  Run: python tools/yb_default_check.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qcdgpu_tpu import SimConfig, Simulation  # noqa: E402
from qcdgpu_tpu.utils.cache import enable_persistent_cache  # noqa: E402


def measure(dims, yb, sweeps=100):
    cfg = SimConfig(group=3, dims=dims, beta=6.0, algorithm="heatbath",
                    n_or=0, seed=0, start="cold", rng_mode="hw",
                    reunit_every=10, y_block=yb)
    sim = Simulation(cfg)
    sim.warmup()
    sim.thermalize(20)
    sim.sync()
    t0 = time.perf_counter()
    sim.thermalize(sweeps)
    sim.sync()
    dt = time.perf_counter() - t0
    vol = dims[0] * dims[1] * dims[2] * dims[3]
    return {"dims": list(dims), "y_block": yb,
            "ms_per_sweep": round(1e3 * dt / sweeps, 3),
            "lu_per_s": round(4 * vol * sweeps / dt)}


def main():
    enable_persistent_cache()
    for dims in ((16, 16, 16, 16), (32, 32, 32, 32)):
        for yb in (0, 8):
            print(json.dumps(measure(dims, yb)), flush=True)


if __name__ == "__main__":
    main()
