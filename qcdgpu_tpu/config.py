"""Frozen run configuration.

One immutable dataclass replaces QCDGPU's three config tiers (compile-time
#defines string-pasted into OpenCL source + init file + argv overrides;
SURVEY.md §5.6): every field is either a static argument of the jit-ed step
(XLA specializes on it, which is what the #define pasting achieved) or a
plain runtime scalar.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class SimConfig:
    # --- physics ---------------------------------------------------------
    group: int = 3  # N of SU(N); 2 or 3
    dims: Tuple[int, int, int, int] = (8, 8, 8, 8)  # (X, Y, Z, T)
    beta: float = 6.0

    # --- algorithm -------------------------------------------------------
    algorithm: str = "heatbath"  # "heatbath" | "metropolis"
    n_or: int = 0  # overrelaxation sweeps appended to each update sweep
    kp_trials: int = 4  # fixed KP trial count (see samplers.kp_trial_quat)
    n_hit: int = 3  # Metropolis hits per subgroup touch
    metro_delta: float = 0.35  # Metropolis proposal spread

    # --- run schedule ----------------------------------------------------
    start: str = "cold"  # "cold" | "hot" | "continue"
    sweeps_therm: int = 100  # ITER/NITER analogue: thermalization sweeps
    sweeps: int = 400  # production sweeps
    meas_every: int = 1  # measure every k-th production sweep
    reunit_every: int = 10  # reunitarize every k-th sweep (0 = never)
    # periodic checkpoint interval in production sweeps (QCDGPU dumps full
    # state every N sweeps so long runs are resumable); 0 = final save only
    ckpt_every: int = 0

    # --- extended measurements ------------------------------------------
    # Field-strength tensor components (QCDGPU's get_Fmunu/get_F0mu with
    # Fmunu_index1/2): volume-averaged tr(T_a P_munu) per plane for two
    # selected color generators.  0 = auto (Cartan: 3, 8 for SU(3); 3 for
    # SU(2)).  See ops/measure.py.
    get_fmunu: bool = False
    fmunu_index1: int = 0
    fmunu_index2: int = 0
    # Metropolis acceptance-rate tracking (QCDGPU reports acceptance in its
    # results file); adds an "acc_rate" observable column.  Runs on both
    # engines (the Pallas kernels accumulate accepted-hit counts in SMEM).
    track_acceptance: bool = False
    # Kennedy-Pendleton trial-exhaustion tracking (heatbath only): adds a
    # "kp_exhaust_rate" observable column — the measured identity-fallback
    # rate of the fixed-K masked KP sampler (the exactness argument in
    # ops/samplers.py quotes ~1e-6 at beta=6/K=4 analytically; this turns
    # it into data and quantifies the K=2 throughput trade).  Counted
    # in-kernel on the Pallas engines via the same SMEM machinery as
    # track_acceptance; mutually exclusive with it by algorithm.
    track_kp_exhaust: bool = False
    # Rectangular Wilson loops W(R, T) — R spatial, T temporal, averaged
    # over sites and the three (i, t) planes; one "wloop_RxT" column per
    # pair.  Extension beyond QCDGPU (which measures only the plaquette,
    # action, and Polyakov loop); see ops/measure.py wilson_loop_means.
    wilson_loops: Tuple[Tuple[int, int], ...] = ()
    # Clover (field-theoretic) topological charge Q_L — extension beyond
    # QCDGPU; adds one "q_top" observable column.  See
    # ops/measure.py topological_charge.
    get_qtop: bool = False
    # APE-smear a measurement-time copy of the links qtop_smear times
    # (mixing weight qtop_alpha) before evaluating Q_L — the standard
    # UV-fluctuation suppression that drives Q_L toward near-integer
    # values.  0 = measure on the unsmeared field.  See ops/smear.py.
    qtop_smear: int = 0
    qtop_alpha: float = 0.5

    # --- numerics --------------------------------------------------------
    seed: int = 0
    dtype: str = "complex64"  # "complex64" | "complex128"
    # "same": measure in the link dtype.  "double": evaluate observables in
    # complex128 (QCDGPU's PRECISION=mixed — single-precision updates with
    # double-precision measurement sums).  Requires jax x64 (CPU/XLA path).
    meas_dtype: str = "same"  # "same" | "double"

    # --- engine ----------------------------------------------------------
    # "auto": fused Pallas kernels on TPU, XLA elsewhere.  "xla" is the
    # jax.numpy reference engine (also the multi-device SPMD path);
    # "pallas" forces the fused kernels (TPU only).
    engine: str = "auto"  # "auto" | "xla" | "pallas"
    # "threefry": bit-identical counter RNG across engines/shardings.
    # "hw": TPU hardware PRNG seeded per (key, stage, slab) — faster,
    # statistically equivalent (RNG parity suite), not bit-compatible.
    # "prngcl:<gen>": a reference-family generator (ranlux0..4, ranmar,
    # xor128, xor7, mrg32k3a, parkmiller, constant) run as per-site
    # device-resident streams on the XLA engine — QCDGPU's selectable
    # PRNGCL generators (ops/prng_streams.py).
    rng_mode: str = "threefry"  # "threefry" | "hw" | "prngcl:<gen>"

    # --- parallel --------------------------------------------------------
    # mesh axis sizes over the lattice site axes (X, Y, Z, T); 1 = unsharded.
    mesh: Tuple[int, int, int, int] = (1, 1, 1, 1)
    # Pallas-engine Y tile size for big lattices (rows per stage-kernel
    # call).  0 = auto: untiled until the full-Y kernel windows would
    # exceed VMEM (SU(3) 64^4-class), then halved until they fit — see
    # ops/pallas/update.auto_y_block.  Values >= Y disable tiling.
    y_block: int = 0

    def __post_init__(self):
        if self.group not in (2, 3):
            raise ValueError("group must be 2 or 3")
        if len(self.dims) != 4:
            raise ValueError("dims must be a 4-tuple (X, Y, Z, T)")
        if len(self.mesh) != 4:
            raise ValueError("mesh must be a 4-tuple over (X, Y, Z, T)")
        if self.algorithm not in ("heatbath", "metropolis"):
            raise ValueError(f"unknown algorithm {self.algorithm!r}")
        if self.start not in ("cold", "hot", "continue"):
            raise ValueError(f"unknown start {self.start!r}")
        if self.engine not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown engine {self.engine!r}")
        from .ops.prng_streams import STREAM_GENERATORS, stream_mode_name

        gen = stream_mode_name(self.rng_mode)
        if gen is not None:
            if gen not in STREAM_GENERATORS:
                raise ValueError(
                    f"unknown PRNGCL generator {gen!r}; "
                    f"have {STREAM_GENERATORS}"
                )
            if self.engine == "pallas":
                from .ops.prng_streams import PALLAS_STREAM_GENERATORS

                if gen not in PALLAS_STREAM_GENERATORS:
                    raise ValueError(
                        f"generator {gen!r} has no in-kernel form — use "
                        "engine='xla'/'auto', or one of "
                        f"{PALLAS_STREAM_GENERATORS} on the Pallas engine"
                    )
        elif self.rng_mode not in ("threefry", "hw"):
            raise ValueError(f"unknown rng_mode {self.rng_mode!r}")
        if self.engine == "pallas" and (self.mesh[2] != 1 or self.mesh[3] != 1):
            # engine-wide constraint, not stream-specific: the fused
            # sharded kernels decompose along X/Y only (Z/T live on the
            # packed lane axis) — fail at construction, not runner build
            raise ValueError(
                "the sharded Pallas engine decomposes along X/Y only; "
                "Z/T meshes run on the XLA engine (engine='auto' picks it)"
            )
        if self.meas_dtype not in ("same", "double"):
            raise ValueError(f"unknown meas_dtype {self.meas_dtype!r}")
        if self.ckpt_every < 0:
            raise ValueError("ckpt_every must be >= 0")
        if self.y_block < 0:
            raise ValueError("y_block must be >= 0")
        if 0 < self.y_block < self.dims[1] and self.dims[1] % self.y_block:
            raise ValueError(
                f"y_block={self.y_block} must divide Y={self.dims[1]}"
            )
        if self.ckpt_every and self.meas_every and (
            self.ckpt_every % self.meas_every
        ):
            raise ValueError(
                "ckpt_every must be a multiple of meas_every so the "
                "measurement series is independent of checkpoint chunking"
            )
        nm1 = self.group * self.group - 1
        for a in (self.fmunu_index1, self.fmunu_index2):
            if not 0 <= a <= nm1:
                raise ValueError(
                    f"fmunu index {a} out of range 0..{nm1} for SU({self.group})"
                )
        for p in self.wilson_loops:
            if len(p) != 2:
                raise ValueError(f"wilson_loops entries are (R, T) pairs, got {p}")
            r, t = p
            if not (1 <= r < min(self.dims[:3])):
                raise ValueError(
                    f"wilson loop R={r} must be in 1..{min(self.dims[:3]) - 1} "
                    "(spatial extents; loops wrapping the torus are Polyakov-"
                    "type correlators, not Wilson loops)"
                )
            if not (1 <= t < self.dims[3]):
                raise ValueError(
                    f"wilson loop T={t} must be in 1..{self.dims[3] - 1}"
                )
        if self.qtop_smear < 0:
            raise ValueError("qtop_smear must be >= 0")
        if not 0.0 < self.qtop_alpha <= 1.0:
            raise ValueError("qtop_alpha must be in (0, 1]")
        if self.track_acceptance and self.algorithm != "metropolis":
            raise ValueError("track_acceptance requires algorithm='metropolis'")
        if self.track_kp_exhaust and self.algorithm != "heatbath":
            raise ValueError("track_kp_exhaust requires algorithm='heatbath'")
        if self.engine == "xla" and self.rng_mode == "hw":
            raise ValueError(
                "rng_mode='hw' (TPU hardware PRNG) is a Pallas-engine "
                "feature; the XLA engine always draws threefry streams"
            )
        if self.engine == "pallas" and self.dtype != "complex64":
            raise ValueError("the pallas engine is float32 (complex64) only")
        # meas_dtype="double" is valid on every engine: complex128 sums on
        # the XLA/CPU path, Kahan-compensated f32 reductions on the Pallas
        # engine (TPU has no f64) — see sim.resolve_engine
        if not 0 <= self.n_or <= 7:
            # 8 * (1 + n_or) update/OR stages per sweep must fit the
            # 64-stage RNG key namespace shared by both engines
            raise ValueError("n_or must be in 0..7")
        for d, m in zip(self.dims, self.mesh):
            if d % (2 * m) != 0:
                raise ValueError(
                    f"each dim must be even per mesh shard (dims={self.dims}, "
                    f"mesh={self.mesh}) so the checkerboard tiles cleanly"
                )

    # -- helpers ----------------------------------------------------------
    @property
    def volume(self) -> int:
        v = 1
        for d in self.dims:
            v *= d
        return v

    @property
    def n_links(self) -> int:
        return 4 * self.volume

    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "SimConfig":
        d = dict(d)
        d["dims"] = tuple(d["dims"])
        d["mesh"] = tuple(d.get("mesh", (1, 1, 1, 1)))
        d["wilson_loops"] = tuple(
            tuple(p) for p in d.get("wilson_loops", ())
        )
        return cls(**d)
