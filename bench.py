#!/usr/bin/env python
"""North-star benchmark: SU(3) 32^4 heat-bath sweep throughput (one chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "link-updates/s/chip", "vs_baseline": N}

The contract is unconditional: a watchdog thread guarantees the line is
printed before any external time budget kills the process — with the best
measurement taken so far, or value=null plus an "error" field if nothing
finished.  Per-phase timestamps go to stderr so a timeout is diagnosable
from the tail alone.

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
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_LINK_UPDATES_PER_S = 1.8e8  # derived ceiling, see module docstring

DIMS = (32, 32, 32, 32)
QUICK_SWEEPS = 20    # first (provisional) measurement — printed if time runs out
FULL_SWEEPS = 100    # refined measurement

# one wall-clock budget shared across retries/re-execs: the deadline is an
# absolute epoch timestamp inherited through the environment
_DEADLINE_ENV = "QCDGPU_BENCH_DEADLINE"
_BUDGET_S = float(os.environ.get("QCDGPU_BENCH_BUDGET_S", "1500"))
_RETRY_ENV = "QCDGPU_BENCH_RETRY"
_MAX_RETRIES = 2

_printed = threading.Lock()  # acquired exactly once by whoever prints
_best = {"result": None, "error": None, "phase": "start",
         "phase_t0": time.monotonic()}

# a jax.devices() call through a wedged tunnel can HANG (not raise) —
# observed: 15+ min stuck in the device query with the process at ~0% CPU.
# The exception-based retry never fires there, so a dedicated stall monitor
# re-execs the process (fresh tunnel connection) when the pre-compile
# phases exceed this budget.  Compile phases are exempt: a cold XLA compile
# legitimately takes minutes, only the global watchdog bounds those.
_STALL_PHASES = ("start", "querying devices")
_PHASE_STALL_S = float(os.environ.get("QCDGPU_BENCH_STALL_S", "240"))


def _deadline() -> float:
    dl = os.environ.get(_DEADLINE_ENV)
    if dl is None:
        os.environ[_DEADLINE_ENV] = dl = str(time.time() + _BUDGET_S)
    return float(dl)


def _log(msg: str) -> None:
    _best["phase"] = msg
    _best["phase_t0"] = time.monotonic()
    print(f"# [{time.strftime('%H:%M:%S')} +{time.monotonic() - _T0:.0f}s] "
          f"{msg}", file=sys.stderr, flush=True)


_T0 = time.monotonic()


def _emit_and_exit(rc: int = 0) -> None:
    """Print THE json line (once, whoever gets here first) and hard-exit."""
    if not _printed.acquire(blocking=False):
        return
    out = _best["result"]
    if out is None:
        out = {
            "metric": "SU(3) 32^4 heat-bath link-updates/s/chip",
            "value": None,
            "unit": "link-updates/s/chip",
            "vs_baseline": None,
            "detail": {
                "error": _best["error"] or "timed out before first measurement",
                "last_phase": _best["phase"],
            },
        }
    print(json.dumps(out), flush=True)
    os._exit(rc)


def _watchdog(deadline: float) -> None:
    """Daemon thread: emit the best-known JSON line just before the budget
    expires.  A thread (not SIGALRM): the tunnel can hang inside a C call
    that never returns to the bytecode loop, where a signal handler would
    never run — os._exit from a thread always works."""
    while True:
        left = deadline - time.time()
        if left <= 15.0:
            _best.setdefault("error", None)
            if _best["error"] is None and _best["result"] is None:
                _best["error"] = (
                    f"wall-clock budget expired in phase: {_best['phase']}"
                )
            _emit_and_exit(0)
        if (_best["phase"] in _STALL_PHASES
                and time.monotonic() - _best["phase_t0"] > _PHASE_STALL_S):
            # hung tunnel: the main thread is stuck inside a C call that
            # never raises — re-exec for a fresh connection.  os.execve
            # from this thread replaces the whole process image, so the
            # stuck main thread dies with it.
            _stall_reexec(_best["phase"])
        # clamp below: _emit_and_exit returns (instead of exiting) when the
        # main thread holds the print lock, in which case left-14 can be
        # negative and a bare sleep(left-14) would ValueError the watchdog
        # away exactly when it is the last line of defense
        time.sleep(max(1.0, min(left - 14.0, 5.0)))


def _stall_reexec(phase: str) -> None:
    tries = int(os.environ.get(_RETRY_ENV, "0"))
    if tries >= _MAX_RETRIES or _deadline() - time.time() < 120:
        # out of retries: do NOT emit yet — the hung call may still return
        # (tunnel outages recover), and waiting costs nothing because the
        # global watchdog emits the identical error line at the deadline.
        if not _best.get("stall_final"):
            _best["stall_final"] = True
            _best["error"] = (
                f"stalled >{_PHASE_STALL_S:.0f}s in phase {phase!r} "
                f"after {tries} retries (tunnel hang)"
            )
            _log(f"{_best['error']}; waiting out the budget for a late "
                 f"recovery")
            # _log repointed the phase at the stall message; restore the
            # true phase so the emitted JSON's last_phase stays meaningful
            _best["phase"] = phase
        return
    _log(f"stalled >{_PHASE_STALL_S:.0f}s in phase {phase!r}; "
         f"re-exec retry {tries + 1}/{_MAX_RETRIES}")
    env = dict(os.environ, **{_RETRY_ENV: str(tries + 1)})
    os.execve(sys.executable,
              [sys.executable, os.path.abspath(__file__)], env)


def _bench_mesh():
    """(mesh, n_chips) via the shared X/Y-major policy (parallel/mesh.py).

    Multi-chip hosts run the fused X/Y-sharded Pallas engine
    (ops/pallas/sharded.py); single-chip (the common driver setup) and
    CPU hosts run unsharded.
    """
    import jax

    from qcdgpu_tpu.parallel.mesh import default_mesh_shape

    try:
        devs = jax.devices()
    except Exception:
        return (1, 1, 1, 1), 1
    n = len(devs)
    if n < 2 or devs[0].platform not in ("tpu", "axon"):
        return (1, 1, 1, 1), 1
    n = 1 << (n.bit_length() - 1)  # largest power of two that fits
    shape = default_mesh_shape(n, DIMS)
    return shape, n


def _record(dt: float, sweeps: int, plq: float, mesh, n_chips: int,
            provisional: bool) -> None:
    import numpy as np

    volume = int(np.prod(DIMS))
    value = 4 * volume * sweeps / dt / n_chips
    _best["result"] = {
        "metric": "SU(3) 32^4 heat-bath link-updates/s/chip",
        "value": round(value),
        "unit": "link-updates/s/chip",
        "vs_baseline": round(value / BASELINE_LINK_UPDATES_PER_S, 4),
        "detail": {
            "sweeps": sweeps,
            "seconds": round(dt, 4),
            "ms_per_sweep": round(1e3 * dt / sweeps, 3),
            "plaquette": plq,
            "mesh": list(mesh),
            "n_chips": n_chips,
            "provisional": provisional,
            "baseline_note": "reference-era GPU memory-bound ceiling "
                             "1.8e8 lu/s (see docstring)",
        },
    }
    _log(f"measured {1e3 * dt / sweeps:.2f} ms/sweep over {sweeps} sweeps "
         f"({value:.3e} lu/s/chip){' [provisional]' if provisional else ''}")


def _run(cfg, mesh, n_chips):
    from qcdgpu_tpu import Simulation

    _log("building Simulation (cold start)")
    sim = Simulation(cfg)
    # compile + warm; sim.sync() is the tunnel-safe device barrier
    _log("warmup: compile + first execution")
    sim.warmup()
    _log(f"quick measurement: {QUICK_SWEEPS} sweeps")
    t0 = time.perf_counter()
    sim.thermalize(QUICK_SWEEPS)
    sim.sync()
    dt = time.perf_counter() - t0
    plq = float(sim.measure()["plq"])
    _record(dt, QUICK_SWEEPS, plq, mesh, n_chips, provisional=True)
    if _deadline() - time.time() < 1.5 * dt * FULL_SWEEPS / QUICK_SWEEPS + 60:
        _log("skipping refinement: not enough budget left")
        return
    _log(f"full measurement: {FULL_SWEEPS} sweeps")
    t0 = time.perf_counter()
    sim.thermalize(FULL_SWEEPS)
    sim.sync()
    dt = time.perf_counter() - t0
    plq = float(sim.measure()["plq"])
    _record(dt, FULL_SWEEPS, plq, mesh, n_chips, provisional=False)


def _transient_backend_error(e) -> bool:
    msg = repr(e)
    return any(s in msg for s in
               ("UNAVAILABLE", "Unable to initialize backend",
                "DEADLINE_EXCEEDED", "failed to connect"))


def _retry_after_outage(e):
    """The tunneled TPU backend occasionally drops; a failed init is
    cached for the process lifetime, so retry by re-exec (bounded, and
    sharing the original deadline through the environment)."""
    tries = int(os.environ.get(_RETRY_ENV, "0"))
    if tries >= _MAX_RETRIES or _deadline() - time.time() < 120:
        _best["error"] = f"backend unavailable after {tries} retries: {e!r}"
        _log(_best["error"])
        _emit_and_exit(0)
    _log(f"transient backend error ({e!r}); retry {tries + 1}/"
         f"{_MAX_RETRIES} in 20 s")
    time.sleep(20)
    env = dict(os.environ, **{_RETRY_ENV: str(tries + 1)})
    os.execve(sys.executable,
              [sys.executable, os.path.abspath(__file__)], env)


def main():
    deadline = _deadline()
    threading.Thread(target=_watchdog, args=(deadline,), daemon=True).start()
    _log(f"budget: {deadline - time.time():.0f} s remaining"
         f" (retry {os.environ.get(_RETRY_ENV, '0')})")

    from qcdgpu_tpu import SimConfig
    from qcdgpu_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    _log("querying devices")
    mesh, n_chips = _bench_mesh()
    _log(f"mesh {mesh} over {n_chips} chip(s)")
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
        # ~30% slower)
        rng_mode="hw",
        # Y-tiled stages (8-row tiles, dy-direct halo loads): measured
        # FASTER than the untiled full-Y kernel even where VMEM does not
        # force tiling — 7.18 vs 7.67 ms/sweep at 32^4 (round 5); the
        # deeper (X, Y/8) grid overlaps operand DMA better and the
        # load-time Y-shift assembly replaces full-Y roll relayouts
        y_block=8,
    )
    try:
        _run(cfg, mesh, n_chips)
    except Exception as e:
        if _transient_backend_error(e):
            _retry_after_outage(e)  # re-execs (bounded); only returns if spent
            raise
        if n_chips == 1:
            _best["error"] = repr(e)
            _log(f"bench failed: {e!r}")
            _emit_and_exit(1)
        # never let an experimental multi-chip path cost the benchmark
        _log(f"multi-chip bench failed ({e!r}); single-chip fallback")
        mesh, n_chips = (1, 1, 1, 1), 1
        try:
            _run(cfg.replace(mesh=mesh), mesh, n_chips)
        except Exception as e2:
            _best["error"] = repr(e2)
            _log(f"single-chip fallback failed: {e2!r}")
            _emit_and_exit(1)
    _emit_and_exit(0)


if __name__ == "__main__":
    main()
