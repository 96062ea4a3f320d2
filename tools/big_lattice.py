"""Big-lattice hardware demonstration: SU(3) 64^4 on one TPU chip.

QCDGPU's BIG_LATTICE mode existed to run lattices exceeding one GPU's
memory (SURVEY.md §2 "Multi-device decomposition"); one v5-lite chip holds
the 64^4 SU(3) link state directly — but ONLY through the packed-direct
machinery (ops/pallas/engine.py packed_cold_start / measure_packed /
packed checkpoints): the canonical complex field plus conversion
temporaries is a ~16.5 GB program on a 15.75 GB chip.  This tool is the
executable receipt for that claim (VERDICT r2 missing #4):

  1. packed cold start, warmup, timed thermalization sweeps (lu/s),
  2. fused packed measurement (plaquette sanity at beta=6),
  3. packed checkpoint save -> load -> bit-equality of the engine state,
  4. resumed chain continues: 2 more sweeps on both sims agree bit-exactly
     (the TPU hardware PRNG is seeded per (key, stage, slab), so even
     rng_mode='hw' chains are deterministic in (seed, sweep_idx)),
  5. HBM usage from device memory stats where the runtime exposes them.

Produces docs/validation/big_lattice_64c4.json.  Run (real TPU, one
process):  python tools/big_lattice.py [--dims 64,64,64,64]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qcdgpu_tpu import SimConfig, Simulation
from qcdgpu_tpu.sim import resolve_engine
from qcdgpu_tpu.utils.cache import enable_persistent_cache

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "docs", "validation", "big_lattice_64c4.json")


def mem_stats():
    import jax

    try:
        s = jax.local_devices()[0].memory_stats() or {}
        return {k: int(v) for k, v in s.items()
                if k in ("bytes_in_use", "peak_bytes_in_use",
                         "bytes_limit", "largest_alloc_size")}
    except Exception as e:  # the tunneled runtime may not expose stats
        return {"unavailable": repr(e)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="64,64,64,64")
    ap.add_argument("--therm", type=int, default=20)
    ap.add_argument("--prod", type=int, default=20)
    args = ap.parse_args()
    dims = tuple(int(x) for x in args.dims.split(","))

    enable_persistent_cache()
    import jax

    cfg = SimConfig(group=3, dims=dims, beta=6.0, seed=0, start="cold",
                    rng_mode="hw", reunit_every=10)
    vol = cfg.volume
    rec = {
        "config": {"group": 3, "dims": list(dims), "beta": 6.0,
                   "rng_mode": "hw", "engine": resolve_engine(cfg)},
        "links_bytes": 8 * 2 * 3 * 2 * (vol // 2) * 4,  # packed 8-tuple f32
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps({"phase": "init", **rec}), flush=True)

    t0 = time.perf_counter()
    sim = Simulation(cfg)
    assert sim._us is not None, "packed-direct start expected on TPU"
    sim.warmup()
    rec["warmup_s"] = round(time.perf_counter() - t0, 1)
    rec["mem_after_warmup"] = mem_stats()
    print(json.dumps({"phase": "warmup", "s": rec["warmup_s"],
                      "mem": rec["mem_after_warmup"]}), flush=True)

    t0 = time.perf_counter()
    sim.thermalize(args.therm)
    sim.sync()
    dt = time.perf_counter() - t0
    rec["therm_sweeps"] = args.therm
    rec["ms_per_sweep"] = round(1e3 * dt / args.therm, 2)
    rec["link_updates_per_s"] = round(4 * vol * args.therm / dt)
    print(json.dumps({"phase": "therm", "ms_per_sweep": rec["ms_per_sweep"],
                      "lu_per_s": rec["link_updates_per_s"]}), flush=True)

    obs = sim.run(args.prod, measure_every=5)
    meas = sim.measure()
    rec["plq_series"] = [round(float(x), 6) for x in obs[:, 0]]
    rec["plq"] = round(float(meas["plq"]), 6)
    rec["mem_after_run"] = mem_stats()
    print(json.dumps({"phase": "run", "plq": rec["plq"],
                      "mem": rec["mem_after_run"]}), flush=True)
    # cold start at beta=6 must order toward ~0.594 from above
    assert 0.55 < rec["plq"] <= 1.0, rec["plq"]

    # --- packed checkpoint save -> load -> exact resume ------------------
    ckpt = "/tmp/big_lattice_ckpt"  # packed saves are DIRECTORIES now
    t0 = time.perf_counter()
    sim.save(ckpt)
    rec["ckpt_save_s"] = round(time.perf_counter() - t0, 1)
    rec["ckpt_bytes"] = (
        sum(os.path.getsize(os.path.join(ckpt, f)) for f in os.listdir(ckpt))
        if os.path.isdir(ckpt) else os.path.getsize(ckpt)
    )

    # state bit-equality is certified by continuing BOTH chains: any
    # link-state difference would decohere the chaotic chains immediately.
    # Chains run SEQUENTIALLY — two live 3.2 GB states plus a sweep
    # program's in+out buffers exceed one chip's HBM (measured
    # RESOURCE_EXHAUSTED with both sims resident).
    o_a = sim.run(4, measure_every=2)
    sweep0 = sim.sweep_idx
    del sim
    import gc

    gc.collect()

    t0 = time.perf_counter()
    sim2 = Simulation.load(ckpt)
    rec["ckpt_load_s"] = round(time.perf_counter() - t0, 1)
    assert sim2._us is not None, "packed adopt expected"
    assert sim2.sweep_idx == sweep0 - 4
    print(json.dumps({"phase": "ckpt", "save_s": rec["ckpt_save_s"],
                      "load_s": rec["ckpt_load_s"],
                      "bytes": rec["ckpt_bytes"]}), flush=True)
    o_b = sim2.run(4, measure_every=2)
    rec["resume_obs_a"] = [round(float(x), 7) for x in o_a[:, 0]]
    rec["resume_obs_b"] = [round(float(x), 7) for x in o_b[:, 0]]
    rec["resume_bit_equal"] = bool(np.array_equal(o_a, o_b))
    assert rec["resume_bit_equal"], (o_a, o_b)
    import shutil

    shutil.rmtree(ckpt) if os.path.isdir(ckpt) else os.unlink(ckpt)

    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {OUT}", flush=True)
    print(json.dumps({"phase": "done", "resume_bit_equal": True,
                      "lu_per_s": rec["link_updates_per_s"]}), flush=True)


if __name__ == "__main__":
    main()
