#!/usr/bin/env python
"""North-star benchmark: SU(3) 32^4 heat-bath sweep throughput (one chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "link-updates/s/chip", "vs_baseline": N}

Baseline note (BASELINE.md): the reference repo mount is empty and
BASELINE.json carries no published numbers, so vs_baseline is computed
against a DERIVED CEILING for the reference on its own era's flagship GPU
(AMD HD 7970, the best OpenCL card of QCDGPU's 2013 release):

  * one SU(3) heat-bath link update touches ~19 link matrices read +
    1 written ~= 1.45 KB of traffic at 72 B/matrix (QCDGPU's packed
    two-row codec);
  * HD 7970 global memory bandwidth = 264 GB/s;
  * memory-bound ceiling = 264e9 / 1.45e3 ~= 1.8e8 link-updates/s.

That ceiling (unreachable in practice — it assumes perfect reuse and zero
compute cost) is used as the baseline, i.e. vs_baseline = 1.0 means
matching the reference hardware's theoretical best.  Replace with the real
measured number the moment the reference/paper tables become available.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_LINK_UPDATES_PER_S = 1.8e8  # derived ceiling, see module docstring

DIMS = (32, 32, 32, 32)
BENCH_SWEEPS = 100


def _bench_mesh():
    """(mesh, n_chips): X/Y decomposition over the attached TPU chips.

    Multi-chip hosts run the fused X/Y-sharded Pallas engine
    (ops/pallas/sharded.py); single-chip (the common driver setup) and
    CPU hosts run unsharded.  Axis sizes are capped at DIMS[i]//2 (the
    checkerboard limit).
    """
    import jax

    try:
        devs = jax.devices()
    except Exception:
        return (1, 1, 1, 1), 1
    n = len(devs)
    if n < 2 or devs[0].platform not in ("tpu", "axon"):
        return (1, 1, 1, 1), 1
    mx = my = 1
    while n // (mx * my) >= 2:
        if mx <= my and mx < DIMS[0] // 2:
            mx *= 2
        elif my < DIMS[1] // 2:
            my *= 2
        else:
            break
    return (mx, my, 1, 1), mx * my


def _run(cfg):
    from qcdgpu_tpu import Simulation

    sim = Simulation(cfg)
    # compile + warm; sim.sync() is the tunnel-safe device barrier
    sim.thermalize(BENCH_SWEEPS)
    sim.sync()
    t0 = time.perf_counter()
    sim.thermalize(BENCH_SWEEPS)
    sim.sync()
    dt = time.perf_counter() - t0
    return dt, float(sim.measure()["plq"])


_RETRY_ENV = "QCDGPU_BENCH_RETRY"
_MAX_RETRIES = 3


def _transient_backend_error(e) -> bool:
    msg = repr(e)
    return any(s in msg for s in
               ("UNAVAILABLE", "Unable to initialize backend",
                "DEADLINE_EXCEEDED", "failed to connect"))


def _retry_after_outage(e):
    """The tunneled TPU backend occasionally drops; a failed init is
    cached for the process lifetime, so retry by re-exec (bounded)."""
    tries = int(os.environ.get(_RETRY_ENV, "0"))
    if tries >= _MAX_RETRIES:
        print(f"# backend unavailable after {tries} retries: {e!r}",
              file=sys.stderr)
        return
    print(f"# transient backend error ({e!r}); retry {tries + 1}/"
          f"{_MAX_RETRIES} in 60 s", file=sys.stderr)
    time.sleep(60)
    env = dict(os.environ, **{_RETRY_ENV: str(tries + 1)})
    os.execve(sys.executable,
              [sys.executable, os.path.abspath(__file__)], env)


def main():
    from qcdgpu_tpu import SimConfig
    from qcdgpu_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    mesh, n_chips = _bench_mesh()
    cfg = SimConfig(
        group=3,
        dims=DIMS,
        beta=6.0,
        algorithm="heatbath",
        n_or=0,
        reunit_every=10,
        seed=0,
        start="cold",
        mesh=mesh,
        # production throughput config: TPU hardware PRNG (statistically
        # validated against the reference generator family by the RNG
        # parity suite; rng_mode="threefry" is the bit-reproducible mode,
        # ~15% slower)
        rng_mode="hw",
    )
    try:
        dt, plq = _run(cfg)
    except Exception as e:
        if _transient_backend_error(e):
            _retry_after_outage(e)  # re-execs (bounded); only returns if spent
            raise
        if n_chips == 1:
            raise
        # never let an experimental multi-chip path cost the benchmark
        print(f"# multi-chip bench failed ({e!r}); single-chip fallback",
              file=sys.stderr)
        mesh, n_chips = (1, 1, 1, 1), 1
        dt, plq = _run(cfg.replace(mesh=mesh))

    n_links = 4 * cfg.volume
    value = n_links * BENCH_SWEEPS / dt / n_chips
    out = {
        "metric": "SU(3) 32^4 heat-bath link-updates/s/chip",
        "value": round(value),
        "unit": "link-updates/s/chip",
        "vs_baseline": round(value / BASELINE_LINK_UPDATES_PER_S, 4),
        "detail": {
            "sweeps": BENCH_SWEEPS,
            "seconds": round(dt, 4),
            "ms_per_sweep": round(1e3 * dt / BENCH_SWEEPS, 3),
            "plaquette": plq,
            "mesh": list(mesh),
            "n_chips": n_chips,
            "baseline_note": "reference-era GPU memory-bound ceiling 1.8e8 lu/s (see docstring)",
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
