"""Fused Pallas stage kernels: staples + Cabibbo–Marinari update in VMEM.

One kernel application = one checkerboard stage (parity p, direction mu) on
the *even/odd T-packed, two-row-codec* state (core.py "engine v2" helpers):
for every parity-p site of one x-slab it gathers the 6 staples, forms
W = U A, runs the subgroup sampler (Kennedy–Pendleton heat-bath /
overrelaxation / multi-hit Metropolis — the same algorithms as
qcdgpu_tpu.ops.samplers, the XLA reference engine), and stores the first
two rows of the new link — all in VMEM, randomness generated in-kernel.
This is the TPU-native counterpart of QCDGPU's fused update kernels
(kernel/su2_update_cl.cl, su3_update_cl.cl — SURVEY.md §2 "Update
kernels"), and the packed layout removes the 2x masked-update waste of a
dense checkerboard (SURVEY.md §7 design stance: "Even/odd as a leading
split, not a mask").

Halo structure: grid over X.  Required (direction, parity, x-offset) slabs
are *derived* by running the staple recipe once against a recording
context (_PlanCtx) — the kernel then replays the identical recipe against
real refs (_LoadCtx), so plan and compute cannot diverge.

RNG: rng_mode="threefry" draws bit-identically to the XLA engine for every
physical site (core.slab_site_index_packed preserves global site indices).
rng_mode="hw" uses the TPU hardware PRNG — faster, statistically
equivalent, not bit-compatible.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import fastmath as fm
from . import core

NDIM = 4

# ---------------------------------------------------------------------------
# quaternions as 4-tuples of [Y, ZT2] f32 arrays (see ops.sun conventions)
# ---------------------------------------------------------------------------


def quat_from_block(w, i, j):
    a0 = 0.5 * (w[i][i][0] + w[j][j][0])
    a1 = 0.5 * (w[i][j][1] + w[j][i][1])
    a2 = 0.5 * (w[i][j][0] - w[j][i][0])
    a3 = 0.5 * (w[i][i][1] - w[j][j][1])
    return (a0, a1, a2, a3)


def quat_mul(p, q):
    return (
        p[0] * q[0] - p[1] * q[1] - p[2] * q[2] - p[3] * q[3],
        p[0] * q[1] + q[0] * p[1] - (p[2] * q[3] - p[3] * q[2]),
        p[0] * q[2] + q[0] * p[2] - (p[3] * q[1] - p[1] * q[3]),
        p[0] * q[3] + q[0] * p[3] - (p[1] * q[2] - p[2] * q[1]),
    )


def quat_conj(q):
    return (q[0], -q[1], -q[2], -q[3])


def subgroup_left_mul(q, i, j, m):
    """m <- embed(M(q); i, j) @ m on a nested-tuple matrix (8 cmul/site)."""
    u00 = (q[0], q[3])
    u01 = (q[2], q[1])
    u10 = (-q[2], q[1])
    u11 = (q[0], -q[3])
    rows = [list(r) for r in m]
    for k in range(len(m[0])):
        mi, mj = m[i][k], m[j][k]
        rows[i][k] = core.cadd(core.cmul(u00, mi), core.cmul(u01, mj))
        rows[j][k] = core.cadd(core.cmul(u10, mi), core.cmul(u11, mj))
    return tuple(tuple(r) for r in rows)


# ---------------------------------------------------------------------------
# subgroup samplers (tuple ports of ops.samplers — same math, same RNG order)
# ---------------------------------------------------------------------------



def _identity_quat(shape):
    return (jnp.ones(shape, jnp.float32),) + tuple(
        jnp.zeros(shape, jnp.float32) for _ in range(3)
    )


def heatbath_flip(q_w, two_beta_over_n, u, k_trials, with_acc=False):
    """KP heat-bath multiplier; u = list of 4*k_trials + 2 uniform slabs.

    Mirrors samplers.heatbath_flip / kp_trial_quat: fixed-K masked trials,
    first accepted wins, identity on exhaustion.  With with_acc also
    returns the slab's trial-exhaustion COUNT (int32, summed over sites) —
    the measured identity-fallback rate of the fixed-K sampler, riding the
    same SMEM accumulation as the Metropolis acceptance counts.
    """
    # rsqrt form (lockstep with samplers.heatbath_flip): one reciprocal-
    # sqrt + multiplies instead of sqrt + four divides
    n2 = q_w[0] ** 2 + q_w[1] ** 2 + q_w[2] ** 2 + q_w[3] ** 2
    rk = jax.lax.rsqrt(jnp.maximum(n2, 1e-38))
    k = n2 * rk
    v = tuple(c * rk for c in q_w)
    a = two_beta_over_n * k
    inv2a = 1.0 / (2.0 * jnp.maximum(a, 1e-10))
    lam2_sel = None
    ok = None
    for t in range(k_trials):
        r1, r2, r3, r4 = u[4 * t], u[4 * t + 1], u[4 * t + 2], u[4 * t + 3]
        c2 = fm.cos2_2pi(r2)  # only cos^2 enters KP — skip the quadrant sign
        lam2 = -inv2a * (fm.log_u01(r1) + c2 * fm.log_u01(r3))
        acc = (r4 * r4) <= (1.0 - lam2)
        if t == 0:
            lam2_sel, ok = lam2, acc
        else:
            take = acc & jnp.logical_not(ok)
            lam2_sel = jnp.where(take, lam2, lam2_sel)
            ok = ok | acc
    x0 = jnp.clip(1.0 - 2.0 * lam2_sel, -1.0, 1.0)
    rho = jnp.sqrt(jnp.maximum(1.0 - x0 * x0, 0.0))
    ct = 2.0 * u[4 * k_trials] - 1.0
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    sph, cph = fm.sincos_2pi(u[4 * k_trials + 1])
    w = (x0, rho * st * cph, rho * st * sph, rho * ct)
    unew = quat_mul(w, quat_conj(v))
    good = ok & (k > 1e-30)
    ident = _identity_quat(k.shape)
    out = tuple(jnp.where(good, unew[c], ident[c]) for c in range(4))
    if with_acc:
        return out, jnp.sum(jnp.logical_not(ok).astype(jnp.int32))
    return out


def overrelax_flip(q_w):
    n2 = q_w[0] ** 2 + q_w[1] ** 2 + q_w[2] ** 2 + q_w[3] ** 2
    qc = quat_conj(q_w)
    # (q_w^+/|q_w|)^2 = quat_mul(q_w^+, q_w^+) / n2 (lockstep with
    # samplers.overrelax_flip)
    inv = 1.0 / jnp.maximum(n2, 1e-38)
    u = tuple(c * inv for c in quat_mul(qc, qc))
    ident = _identity_quat(n2.shape)
    good = n2 > 1e-38
    return tuple(jnp.where(good, u[c], ident[c]) for c in range(4))


def metropolis_flip(q_w, two_beta_over_n, uu, n_hit, delta, with_acc=False):
    """With with_acc also returns the slab's accepted-hit COUNT (int32
    scalar, summed over sites x hits) — the in-kernel form of QCDGPU's
    acceptance-rate report (the stage kernel accumulates it across the X
    grid in SMEM; the sweep normalizes to a fraction)."""
    acc_u = _identity_quat(q_w[0].shape)
    q_cur = q_w
    ident = _identity_quat(q_w[0].shape)
    n_acc = jnp.int32(0)
    for h in range(n_hit):
        u = uu[4 * h : 4 * (h + 1)]
        w1 = delta * (2.0 * u[0] - 1.0)
        w2 = delta * (2.0 * u[1] - 1.0)
        w3 = delta * (2.0 * u[2] - 1.0)
        w0 = jnp.ones_like(w1)
        rn = jax.lax.rsqrt(w0 * w0 + w1 * w1 + w2 * w2 + w3 * w3)
        w = (w0 * rn, w1 * rn, w2 * rn, w3 * rn)
        new0 = quat_mul(w, q_cur)[0]
        dlp = two_beta_over_n * (new0 - q_cur[0])
        accept = fm.log_u01(u[3]) < dlp
        if with_acc:
            n_acc = n_acc + jnp.sum(accept.astype(jnp.int32))
        w_eff = tuple(jnp.where(accept, w[c], ident[c]) for c in range(4))
        acc_u = quat_mul(w_eff, acc_u)
        q_cur = quat_mul(w_eff, q_cur)
    if with_acc:
        return acc_u, n_acc
    return acc_u


# ---------------------------------------------------------------------------
# slab planning: run the recipe once against a recorder, once against refs
# ---------------------------------------------------------------------------


class _PlanCtx:
    """Records the (dir, parity, dx) slabs a recipe touches.

    Matrix values are plain-float dummies so the recipe's arithmetic runs
    without tracing anything.
    """

    def __init__(self, p, n):
        self.p = p
        self.n = n
        self.slabs = []
        self.yhalo = set()  # keys ever read with a Y shift

    def U(self, d, dx=0, shifts=()):
        par = (self.p + dx + len(shifts)) % 2
        key = (d, par, dx)
        if key not in self.slabs:
            self.slabs.append(key)
        if any(ax == 1 for ax, _ in shifts):
            self.yhalo.add(key)
        one = (1.0, 0.0)
        return tuple(tuple(one for _ in range(self.n)) for _ in range(self.n))

    def shifted(self, d, lat_axis, delta, extra=()):
        if lat_axis == 0:
            return self.U(d, dx=delta, shifts=tuple(extra))
        return self.U(d, dx=0, shifts=((lat_axis, delta),) + tuple(extra))


class _LoadCtx:
    """Resolves recipe reads against the kernel's slab refs.

    Y-halo mode (local_y > 0, the Y-sharded multi-chip path): slab refs
    carry local_y + 2 rows (row 0 / row local_y + 1 = neighbor halos from
    ppermute).  Y shifts then become static row-window slices instead of
    rolls, applied LAST — coordinate shifts commute, and each unit Y step
    flips both the row parity and the alignment parity, so the Z/T shift
    masks evaluated before the slice are bit-identical to the unsharded
    roll order (global row parity enters via the x parameter: rows r of a
    padded block sit at global y = y0 - 1 + r, and only the parity of
    x + y matters to the masks).
    """

    def __init__(self, p, n, slabs, refs, x, dims2, local_y=0, y0=0,
                 ytile_flags=None):
        self.p = p
        self.n = n
        self.slabs = slabs
        self.refs = refs
        self.x = x
        self.dims2 = dims2
        self.local_y = local_y
        # Y-tiled mode: per-slab "carries Y-halo rows" flags (see
        # stage_yhalo_flags); None = every slab is halo-padded (the
        # Y-sharded multi-chip path, where ppermute pads all slabs)
        self.ytile_flags = ytile_flags
        # parity-equivalent x for the shift masks: fold the global row
        # offset of padded-block row 0 (y0 - 1) into x
        self.xpar = x + (y0 - 1) if local_y else x
        self._cache = {}
        self._ycache = {}  # Y-tiled flagged slabs: per-(key, dy) variants

    def _load(self, d, par, dx):
        key = (d, par, dx)
        if key not in self._cache:
            ref = self.refs[self.slabs.index(key)]
            self._cache[key] = core.load_mat_packed(ref, self.n)
        return self._cache[key]

    def _load_ytile(self, key, dy):
        """Y-tiled flagged slab, Y shift applied AT LOAD: the slab arrives
        as (up-halo, main-tile, down-halo) operands of the SAME array and
        the dy=-1/0/+1 variants are assembled directly from the raw stored
        rows — dy=0 is a plain aligned ref load (the padded-then-slice
        form relayouted EVERY read of a flagged slab, including the 32
        dy=0 reads per sweep, through a misaligned (yb+2)-row window);
        dy=+-1 pays exactly the one row-shift a torus roll costs untiled.
        The SU(3) third-row codec runs once per (slab, dy) on the
        assembled rows — never on the neighbor tiles themselves."""
        ck = (key, dy)
        if ck not in self._ycache:
            up, mn, dn = self.refs[self.slabs.index(key)]
            if dy == 0:
                def fetch(r, j, c):
                    return mn[r, j, c, 0]
            elif dy == 1:
                def fetch(r, j, c):
                    return jnp.concatenate(
                        [mn[r, j, c, 0][1:], dn[r, j, c, 0][:1]], axis=0)
            else:
                def fetch(r, j, c):
                    return jnp.concatenate(
                        [up[r, j, c, 0][-1:], mn[r, j, c, 0][:-1]], axis=0)
            self._ycache[ck] = core.load_mat_packed_fn(fetch, self.n)
        return self._ycache[ck]

    def U(self, d, dx=0, shifts=()):
        par = (self.p + dx + len(shifts)) % 2
        a = par
        if not self.local_y:
            m = self._load(d, par, dx)
            for ax, dd in shifts:
                a = (a + 1) % 2
                m = core.shift_mat_packed(m, ax, dd, a, self.x + dx,
                                          self.dims2)
            return m
        dy = sum(dd for ax, dd in shifts if ax == 1)
        # the staple recipe never composes two Y steps in one read
        assert -1 <= dy <= 1, dy
        if self.ytile_flags is not None:
            # Y-tiled mode: flagged slabs resolve their Y shift at load
            # (dy-direct variants from the raw halo operands —
            # _load_ytile); unflagged slabs are plain tiles.  Rows then
            # sit at global y = y0 + r + dy, folded into the Z/T shift
            # masks' x parameter (only the parity of x + y matters) —
            # bit-identical to the padded-then-slice form, whose mask at
            # padded row r0+q used y = (y0 - 1) + (1 + dy) + q.
            key = (d, par, dx)
            if self.ytile_flags[self.slabs.index(key)]:
                m = self._load_ytile(key, dy)
            else:
                assert dy == 0, (d, par, dx, dy)  # no halo operands
                m = self._load(d, par, dx)
            xbase = self.xpar + 1 + dy
            d2 = (self.dims2[0], self.local_y, self.dims2[2], self.dims2[3])
            for ax, dd in shifts:
                if ax != 1:
                    a = (a + 1) % 2
                    m = core.shift_mat_packed(m, ax, dd, a, xbase + dx, d2)
            return m
        # Y-sharded multi-chip path: every slab is halo-PADDED to
        # local_y + 2 rows (ppermute fills the pads); Z/T shifts run on
        # the padded rows (y = y0 - 1 + r via xpar), the Y shift is the
        # final row-window slice
        m = self._load(d, par, dx)
        for ax, dd in shifts:
            if ax != 1:
                a = (a + 1) % 2
                m = core.shift_mat_packed(m, ax, dd, a, self.xpar + dx,
                                          self.dims2)
        r0 = 1 + dy
        return core.mmap(
            lambda c: (c[0][r0:r0 + self.local_y], c[1][r0:r0 + self.local_y]),
            m,
        )

    def shifted(self, d, lat_axis, delta, extra=()):
        if lat_axis == 0:
            return self.U(d, dx=delta, shifts=tuple(extra))
        return self.U(d, dx=0, shifts=((lat_axis, delta),) + tuple(extra))


def _staple_W(ctx, mu):
    """The staple sum A and W = U A via a ctx (same contractions as
    ops.staples.staple_sum; during planning matrix values are dummies)."""
    acc = None
    for nu in range(NDIM):
        if nu == mu:
            continue
        # forward: U_nu(x+mu) [U_nu(x) U_mu(x+nu)]^+
        inner = core.mmul(ctx.U(nu), ctx.shifted(mu, nu, 1))
        fwd = core.mmul_bdag(ctx.shifted(nu, mu, 1), inner)
        # backward: [U_mu(x-nu) U_nu(x+mu-nu)]^+ U_nu(x-nu)
        s2 = _shift2(ctx, nu, mu, 1, nu, -1)
        bwd = core.mmul(
            core.mdag(core.mmul(ctx.shifted(mu, nu, -1), s2)),
            ctx.shifted(nu, nu, -1),
        )
        term = core.madd(fwd, bwd)
        acc = term if acc is None else core.madd(acc, term)
    u_mu = ctx.U(mu)
    return u_mu, core.mmul(u_mu, acc)


def _shift2(ctx, d, ax_a, da, ax_b, db):
    """shift2(u_d, ax_a, da, ax_b, db) — two-axis shift."""
    if ax_a == 0:
        return ctx.U(d, dx=da, shifts=((ax_b, db),))
    if ax_b == 0:
        return ctx.U(d, dx=db, shifts=((ax_a, da),))
    return ctx.U(d, dx=0, shifts=((ax_a, da), (ax_b, db)))


def stage_slabs(mu, parity, n):
    """The (dir, parity, dx) slab list for stage (parity, mu)."""
    plan = _PlanCtx(parity, n)
    plan.U(mu)  # the update target comes first
    _staple_W(plan, mu)
    return tuple(plan.slabs)


def stage_yhalo_flags(mu, parity, n):
    """Per-slab bools (aligned with stage_slabs): does the staple recipe
    ever read this slab with a Y shift?  Only those slabs need Y-neighbor
    rows in the Y-tiled big-lattice kernels — 3-6 of the 12-14 slabs per
    stage — so the rest ride as single unpadded operands (measured at
    SU(3) 32^4 yb=8: all-slabs-haloed costs 13.5 ms/sweep vs 8.3
    untiled; see _stage_call_ytiled)."""
    plan = _PlanCtx(parity, n)
    plan.U(mu)
    _staple_W(plan, mu)
    return tuple(k in plan.yhalo for k in plan.slabs)


# ---------------------------------------------------------------------------
# subgroup schedule
# ---------------------------------------------------------------------------


def _subgroups(n):
    if n == 2:
        return ((0, 1),)
    return ((0, 1), (0, 2), (1, 2))


def _uniforms_per_subgroup(kind, k_trials, n_hit):
    if kind == "heatbath":
        return 4 * k_trials + 2
    if kind == "metropolis":
        return 4 * n_hit
    return 0


def stage_draw_count(kind, k_trials, n_hit, n):
    """Per-site uniforms one stage's kernel consumes: the per-subgroup
    count rounded up to a whole u32 pair (the stream path materializes
    draws in pairs), times the CM subgroups.  _stage_kernel's draw
    schedule mirrors this by construction — change them together."""
    per = _uniforms_per_subgroup(kind, k_trials, n_hit)
    return 2 * ((per + 1) // 2) * len(_subgroups(n))


def stage_scalar_advance(gen, scalars, kind, k_trials, n_hit, n):
    """Advance a ref-based generator's scalar channel past one stage's
    in-kernel consumption.  Pairs with prng_streams.encode_kernel_scalars
    before the kernel call; the single place (besides the kernel itself)
    that knows the per-stage draw count."""
    from ..prng_streams import advance_kernel_scalars

    return advance_kernel_scalars(
        gen, scalars, stage_draw_count(kind, k_trials, n_hit, n)
    )


def metropolis_acc_denom(cfg, dims):
    """Global Metropolis trial count per sweep, the acc_rate denominator:
    8 stages x vol/2 active sites x n_hit x CM subgroups (1 when the
    algorithm has no Metropolis stages, keeping the fraction defined).
    Shared by the unsharded (engine.py) and sharded (sharded.py) sweeps
    so their normalizations cannot drift apart."""
    met_stages = 8 if cfg.algorithm == "metropolis" else 0
    vol2 = dims[0] * dims[1] * dims[2] * dims[3] // 2
    n_sg = len(_subgroups(cfg.group))
    return jnp.float32(max(met_stages * vol2 * cfg.n_hit * n_sg, 1))


def tracked_stat_denom(cfg, dims):
    """Denominator for the engine-accumulated per-sweep statistic: the
    Metropolis trial count (cfg.track_acceptance) or the KP attempt count
    8 stages x vol/2 x CM subgroups (cfg.track_kp_exhaust — each subgroup
    touch is one fixed-K KP attempt that either lands or falls back to the
    identity).  Shared by both sharding variants."""
    if getattr(cfg, "track_kp_exhaust", False):
        hb_stages = 8 if cfg.algorithm == "heatbath" else 0
        vol2 = dims[0] * dims[1] * dims[2] * dims[3] // 2
        n_sg = len(_subgroups(cfg.group))
        return jnp.float32(max(hb_stages * vol2 * n_sg, 1))
    return metropolis_acc_denom(cfg, dims)


# ---------------------------------------------------------------------------
# the stage kernel
# ---------------------------------------------------------------------------


def _stage_kernel(key_ref, beta_ref, *refs, mu, parity, kind, n, dims,
                  k_trials, n_hit, metro_delta, rng_mode, slabs, local_y,
                  stream_gen=None, track_acc=False, ytile=0,
                  ytile_flags=None):
    if ytile:
        # Y-tiled mode: Y-halo slabs (stage_yhalo_flags) arrive as
        # consecutive (up, main, down) triples, the rest as single
        # operands — regroup before the generic output/acc-ref peeling
        # below
        grouped, pos = [], 0
        for flag in ytile_flags:
            if flag:
                grouped.append(tuple(refs[pos:pos + 3]))
                pos += 3
            else:
                grouped.append(refs[pos])
                pos += 1
        refs = tuple(grouped) + tuple(refs[pos:])
    # scalar-prefetch layout: [k0, k1, x_offset, y_offset] — the global
    # coordinates of this shard's first slab/row (0 when unsharded), so
    # parities and threefry site keys are global and sharded chains are
    # bit-identical.  beta arrives as a (1, 1) SMEM scalar so one compiled
    # kernel serves every coupling — the beta-scan/ensemble path passes a
    # traced beta.
    o_acc_ref = None
    if track_acc:
        # Metropolis acceptance tracking: the accepted-hit count rides as
        # a trailing (1, 1) int32 SMEM output, accumulated across the X
        # grid (same pattern as the measurement reductions)
        o_acc_ref = refs[-1]
        refs = refs[:-1]
    if stream_gen is not None:
        # PRNGCL stream mode: the active parity's per-site generator state
        # rides as an extra input block + output block
        state_ref, o_ref, o_state_ref = refs[-3], refs[-2], refs[-1]
        refs = refs[:-3] + (o_ref,)
    else:
        o_ref = refs[-1]
    x = pl.program_id(0) + key_ref[2].astype(jnp.int32)
    eff_ly = ytile or local_y
    y0 = (pl.program_id(1) * ytile if ytile
          else key_ref[3].astype(jnp.int32))
    # dims2's Y entry is the ROW COUNT of the loaded blocks (padded by the
    # two Y-halo rows in Y-sharded/tiled mode) — it shapes the shift masks
    y_rows = eff_ly + 2 if eff_ly else dims[1]
    dims2 = (dims[0], y_rows, dims[2], dims[3] // 2)
    ctx = _LoadCtx(parity, n, slabs, refs[:-1], x, dims2,
                   local_y=eff_ly, y0=y0,
                   ytile_flags=ytile_flags if ytile else None)
    beta = beta_ref[0, 0]

    u_mu, w = _staple_W(ctx, mu)

    # --- randomness -------------------------------------------------------
    sgs = _subgroups(n)
    per = _uniforms_per_subgroup(kind, k_trials, n_hit)
    per_slots = (per + 1) // 2
    shape = (eff_ly if eff_ly else dims[1], dims[2] * (dims[3] // 2))
    if per and stream_gen is not None:
        from ..prng_streams import (
            REF_STREAM_GENERATORS,
            kernel_stream_draw,
            kernel_stream_draw_ref,
            open01,
        )

        ndraw = 2 * per_slots * len(sgs)
        if stream_gen in REF_STREAM_GENERATORS:
            # lagged generators: lag window mutated in the output ref in
            # absolute slots; the walking pointer / luxury counter / carry
            # arrive as scalar-prefetch entries 4..5 and advance outside
            # the kernel (prng_streams.advance_kernel_scalars)
            u_all = kernel_stream_draw_ref(
                stream_gen, state_ref, o_state_ref,
                key_ref[4], key_ref[5], ndraw,
            )
        else:
            w_count = state_ref.shape[0]
            words = [state_ref[wi, 0] for wi in range(w_count)]
            u_all, words = kernel_stream_draw(stream_gen, words, ndraw)
            for wi in range(w_count):
                o_state_ref[wi, 0] = words[wi]
        u_all = [open01(u) for u in u_all]
    elif per and rng_mode == "hw":
        xu = x.astype(jnp.uint32) if hasattr(x, "astype") else jnp.uint32(x)
        # ytile mode: the per-tile global first row must enter the seed
        # (the scalar-channel y offset is constant across the grid, and a
        # shared seed would draw IDENTICAL uniforms for every tile)
        yu = (y0.astype(jnp.uint32) if ytile else key_ref[3])
        pltpu.prng_seed(
            key_ref[0] ^ (xu * jnp.uint32(0x9E3779B9))
            ^ (yu * jnp.uint32(0x85EBCA6B)),
            key_ref[1] + xu + yu,
        )
        u_all = core.hw_uniforms(2 * per_slots * len(sgs), shape)
    elif per:
        sidx = core.slab_site_index_packed(x, parity, dims, y0=y0,
                                           local_y=eff_ly)
        u_all = core.slab_uniforms(
            key_ref[0], key_ref[1], sidx, 2 * per_slots * len(sgs)
        )

    # --- Cabibbo–Marinari subgroup sweep ---------------------------------
    two_beta_over_n = beta * jnp.float32(2.0 / n)
    acc_total = jnp.int32(0)
    for s, (i, j) in enumerate(sgs):
        q_w = quat_from_block(w, i, j)
        if kind == "heatbath":
            u_s = u_all[2 * per_slots * s : 2 * per_slots * s + per]
            flip = heatbath_flip(q_w, two_beta_over_n, u_s, k_trials,
                                 with_acc=track_acc)
            if track_acc:
                flip, cnt = flip
                acc_total = acc_total + cnt
        elif kind == "overrelax":
            flip = overrelax_flip(q_w)
        elif kind == "metropolis":
            u_s = u_all[2 * per_slots * s : 2 * per_slots * s + per]
            flip = metropolis_flip(q_w, two_beta_over_n, u_s, n_hit,
                                   metro_delta, with_acc=track_acc)
            if track_acc:
                flip, cnt = flip
                acc_total = acc_total + cnt
        else:
            raise ValueError(kind)
        u_mu = subgroup_left_mul(flip, i, j, u_mu)
        w = subgroup_left_mul(flip, i, j, w)

    core.store_mat_packed(o_ref, u_mu, n)

    if track_acc:
        first = pl.program_id(0) == 0
        if ytile:
            first = jnp.logical_and(first, pl.program_id(1) == 0)

        @pl.when(first)
        def _():
            o_acc_ref[0, 0] = 0
        o_acc_ref[0, 0] += acc_total


@lru_cache(maxsize=None)
def _stage_call(n, dims, mu, parity, kind, k_trials, n_hit,
                metro_delta, rng_mode, interpret, local_x=0, local_y=0,
                stream=False, track_acc=False):
    """Build the jit-able pallas_call for one (mu, parity, kind) stage.

    local_x == 0: single-device kernel over the full X extent (X±1 halos
    via wraparound index maps).  local_x > 0: shard-local kernel over
    ``local_x`` slabs whose inputs are halo-PADDED to local_x + 2 along X
    (slot 0 = left halo slab, slot local_x + 1 = right halo slab) — the
    multi-chip path (ops/pallas/sharded.py) fills the pads via ppermute.
    local_y > 0 analogously: inputs carry local_y + 2 rows along Y
    (row 0 / row local_y + 1 = Y-neighbor halos) and Y shifts are row
    slices inside the kernel (see _LoadCtx); composable with local_x.
    """
    X = dims[0]
    Y, ZT2 = dims[1], dims[2] * (dims[3] // 2)
    slabs = stage_slabs(mu, parity, n)
    in_y = local_y + 2 if local_y else Y
    out_y = local_y if local_y else Y
    in_block = (2, n, 2, 1, in_y, ZT2)
    out_block = (2, n, 2, 1, out_y, ZT2)
    grid_x = local_x if local_x else X

    def mk_spec(dx):
        # NB: with num_scalar_prefetch=1 the scalar ref is appended to the
        # index_map arguments.
        if local_x:
            return pl.BlockSpec(
                in_block, lambda i, _kref, dx=dx: (0, 0, 0, i + dx + 1, 0, 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            in_block, lambda i, _kref, dx=dx: (0, 0, 0, (i + dx) % X, 0, 0),
            memory_space=pltpu.VMEM,
        )

    beta_spec = pl.BlockSpec(
        (1, 1), lambda i, _kref: (0, 0), memory_space=pltpu.SMEM
    )
    stream_gen = None
    in_specs = [beta_spec] + [mk_spec(dx) for (_, _, dx) in slabs]
    out_link_spec = pl.BlockSpec(
        out_block, lambda i, _kref: (0, 0, 0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((2, n, 2, grid_x, out_y, ZT2),
                                     jnp.float32)
    out_specs = out_link_spec
    if stream:
        # PRNGCL stream mode: the active parity's state words
        # [W, X(_local), Y(_local), ZT2] block over X with the links.  No
        # halos (RNG needs no neighbors), so the sharded variants use the
        # same unpadded spec over the shard-local extents.  Output tuple =
        # (links, advanced state).
        from ..prng_streams import (
            stream_mode_name,
            stream_word_count,
            stream_word_dtype,
        )

        stream_gen = stream_mode_name(rng_mode)
        w = stream_word_count(stream_gen)
        state_spec = pl.BlockSpec(
            (w, 1, out_y, ZT2), lambda i, _kref: (0, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs = in_specs + [state_spec]
        out_specs = (out_link_spec, state_spec)
        out_shape = (out_shape, jax.ShapeDtypeStruct(
            (w, grid_x, out_y, ZT2), stream_word_dtype(stream_gen)
        ))
    if track_acc:
        # accepted-hit count: trailing (1, 1) int32 SMEM output
        acc_spec = pl.BlockSpec(
            (1, 1), lambda i, _kref: (0, 0), memory_space=pltpu.SMEM
        )
        acc_shape = jax.ShapeDtypeStruct((1, 1), jnp.int32)
        if not isinstance(out_specs, tuple):
            out_specs, out_shape = (out_specs,), (out_shape,)
        out_specs = out_specs + (acc_spec,)
        out_shape = out_shape + (acc_shape,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_x,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    kern = partial(
        _stage_kernel, mu=mu, parity=parity, kind=kind, n=n, dims=dims,
        k_trials=k_trials, n_hit=n_hit, metro_delta=metro_delta,
        rng_mode=rng_mode, slabs=slabs, local_y=local_y,
        stream_gen=stream_gen, track_acc=track_acc,
    )
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # NB: Mosaic's scoped allocation scales with this cap (at
            # 64^4/yb=16: 101 MB wanted at a 100 MB cap, 117.6 MB at a
            # 112 MB cap — both measured), so raising it does not buy
            # bigger tiles; auto_y_block sizes tiles to fit this cap
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=bool(interpret),
    )

    def apply(key2, beta, us, x_offset=None, y_offset=None,
              stream_state=None, stream_scalars=None):
        beta_arr = jnp.asarray(beta, jnp.float32).reshape(1, 1)
        def off(v):
            return (jnp.zeros((1,), jnp.uint32) if v is None
                    else jnp.asarray(v, jnp.uint32).reshape(1))
        parts = [key2, off(x_offset), off(y_offset)]
        if stream_scalars:
            # ref-based stream generators: [s0, ptr] ride the prefetch
            parts += [jnp.asarray(s, jnp.uint32).reshape(1)
                      for s in stream_scalars]
        scal = jnp.concatenate(parts)
        args = [us[2 * d + par] for (d, par, _) in slabs]
        if stream:
            return call(scal, beta_arr, *args, stream_state)
        return call(scal, beta_arr, *args)

    return apply


def auto_y_block(dims, n, prefer=True):
    """Pick a Y tile size for the single-chip big-lattice path, 0 = no
    tiling needed.  One stage input window is [2, n, 2, 1, Y, Z*T/2] f32;
    the kernels hold ~16 such windows double-buffered plus a multi-MB
    working set, so windows must stay ~2 MB-class (the 32^4 point, which
    fits VMEM with room) — at SU(3) 64^4 the full-Y window is 12 MB and
    the stage program needs 263 MB of 128 MB VMEM (measured compile
    error).  Halving Y until the window fits keeps tiles row-aligned with
    the packed layout."""
    y, zt2 = dims[1], dims[2] * (dims[3] // 2)
    window = 2 * n * 2 * y * zt2 * 4
    if window <= 2 * 1024 * 1024:  # 32^4-class: fits VMEM
        # Large-but-fits band: 8-row tiles measured FASTER than the
        # untiled full-Y kernel at SU(3) 32^4 (7.24 vs 7.64 ms/sweep,
        # round-5 tools/yb_default_check.py — the deeper (X, Y/8) grid
        # overlaps operand DMA better), but SLOWER at 16^4 (0.765 vs
        # 0.749 — grid overhead dominates small lattices) and SLOWER for
        # lag-window stream generators (effective_y_block passes
        # prefer=False for those; measurements at its docstring).  Flip
        # to tiling only where it was measured to win: the SU(3)
        # 32^4-class window (768 KB); SU(2) 32^4 (512 KB) and everything
        # smaller stays untiled.
        return 8 if (prefer and window >= 600_000 and y > 8) else 0
    # tiled windows carry 2 extra halo rows; target well under the 32^4
    # working size — at 64^4, yb=16 windows (18 rows) compile to 101 MB
    # scoped VMEM against the 100 MB limit (measured), yb=8 fits
    limit = 1_250_000
    yb = y
    # floor at 8: Mosaic blocks need 8-row (sublane) granularity on the Y
    # axis, so smaller tiles cannot run on hardware anyway
    while yb % 2 == 0 and yb > 8 and 2 * n * 2 * (yb + 2) * zt2 * 4 > limit:
        yb //= 2
    return yb if yb < y else 0


def effective_y_block(cfg, dims, n):
    """cfg.y_block override (clamped off at >= Y) or the auto heuristic.

    Lag-window stream generators (ranlux0-4/ranmar) only tile out of
    VMEM necessity (prefer=False): in the large-but-fits band tiling
    measured strictly slower for them — the per-tile lag-window loads +
    walking-pointer scalar bookkeeping repeat per grid step (ranlux3
    23.7 vs 15.6, ranmar 12.5 vs 10.7 ms/sweep at SU(3) 32^4) — while
    counter-free word generators tile at parity or better (xor128 9.15
    vs 9.24, mrg32k3a 17.3 vs 20.1; perf_matrix.json round 5).
    cfg.y_block still overrides in both directions.
    """
    yb = int(getattr(cfg, "y_block", 0) or 0) if cfg is not None else 0
    if yb:
        return 0 if yb >= dims[1] else yb
    mode = str(getattr(cfg, "rng_mode", "") or "") if cfg is not None else ""
    prefer = True
    if mode.startswith("prngcl:"):
        from ..prng_streams import REF_STREAM_GENERATORS

        prefer = mode.split(":", 1)[1] not in REF_STREAM_GENERATORS
    return auto_y_block(dims, n, prefer=prefer)


def _ywrap_pad(a, lo, yb, y):
    """Rows [lo-1 .. lo+yb] of a packed field with torus wraparound along
    the Y axis (axis 4) — the single-device analogue of the sharded
    engine's ppermute Y-halo pad."""
    left = jax.lax.slice_in_dim(a, (lo - 1) % y, (lo - 1) % y + 1, axis=4)
    mid = jax.lax.slice_in_dim(a, lo, lo + yb, axis=4)
    right = jax.lax.slice_in_dim(a, (lo + yb) % y, (lo + yb) % y + 1, axis=4)
    return jnp.concatenate([left, mid, right], axis=4)


@lru_cache(maxsize=None)
def _stage_call_ytiled(n, dims, mu, parity, kind, k_trials, n_hit,
                       metro_delta, rng_mode, interpret, ytile,
                       stream=False, track_acc=False):
    """Y-tiled single-call variant of _stage_call: one pallas_call over a
    2D (X, Y/ytile) grid.  Each slab rides as THREE operands of the same
    array — the ytile-row main block plus two 1-ROW wraparound halo
    blocks (a 1-row BlockSpec makes the block index a plain row index,
    so (j*ytile - 1) % Y addresses the torus neighbor directly) — and
    the kernel assembles the Y-padded rows in-register.  Nothing is
    materialized in HBM: the first Y-tiling implementation padded each
    tile with XLA concats, which re-wrote ~1.25x the field per stage and
    measured 244 ms/sweep at SU(3) 64^4; this form reads only raw slabs
    (+2 re-read halo rows per tile)."""
    X = dims[0]
    Y, ZT2 = dims[1], dims[2] * (dims[3] // 2)
    slabs = stage_slabs(mu, parity, n)
    yflags = stage_yhalo_flags(mu, parity, n)
    yb = int(ytile)
    YB = Y // yb
    main_block = (2, n, 2, 1, yb, ZT2)

    def mk_main(dx):
        return pl.BlockSpec(
            main_block,
            lambda i, j, _kref, dx=dx: (0, 0, 0, (i + dx) % X, j, 0),
            memory_space=pltpu.VMEM,
        )

    def mk_specs(dx):
        # (up, main, down) operands of the same array (torus-wrapped); the
        # kernel consumes only the up block's LAST row and the down
        # block's FIRST row (_LoadCtx._load).  Only slabs the staple
        # recipe reads with a Y shift get the triple; the rest ride as one
        # main tile (stage_yhalo_flags — cuts operand DMAs ~2x).  Mosaic
        # requires 8-row block granularity, so when yb is a multiple of 8
        # the halo operands are 8-ROW WINDOWS positioned so their edge row
        # is the needed neighbor row — at yb=16 this cuts the per-flagged-
        # slab VMEM window from 48 to 32 rows and the halo DMA from yb to
        # 8 rows each (VERDICT r4 next #3: the 64^4 Y-tiling tax).  For
        # yb < 8 (small-lattice tests) the halos fall back to whole
        # neighbor tiles.
        if yb % 8 == 0:
            YB8 = Y // 8
            r = yb // 8
            halo_block = (2, n, 2, 1, 8, ZT2)
            up = pl.BlockSpec(
                halo_block,
                lambda i, j, _kref, dx=dx: (
                    0, 0, 0, (i + dx) % X, (j * r - 1) % YB8, 0),
                memory_space=pltpu.VMEM,
            )
            down = pl.BlockSpec(
                halo_block,
                lambda i, j, _kref, dx=dx: (
                    0, 0, 0, (i + dx) % X, ((j + 1) * r) % YB8, 0),
                memory_space=pltpu.VMEM,
            )
        else:
            up = pl.BlockSpec(
                main_block,
                lambda i, j, _kref, dx=dx: (
                    0, 0, 0, (i + dx) % X, (j - 1) % YB, 0),
                memory_space=pltpu.VMEM,
            )
            down = pl.BlockSpec(
                main_block,
                lambda i, j, _kref, dx=dx: (
                    0, 0, 0, (i + dx) % X, (j + 1) % YB, 0),
                memory_space=pltpu.VMEM,
            )
        return [up, mk_main(dx), down]

    beta_spec = pl.BlockSpec(
        (1, 1), lambda i, j, _kref: (0, 0), memory_space=pltpu.SMEM
    )
    in_specs = [beta_spec]
    for (_, _, dx), flag in zip(slabs, yflags):
        in_specs += mk_specs(dx) if flag else [mk_main(dx)]
    out_specs = pl.BlockSpec(
        main_block, lambda i, j, _kref: (0, 0, 0, i, j, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((2, n, 2, X, Y, ZT2), jnp.float32)
    stream_gen = None
    if stream:
        # PRNGCL stream mode x Y-tiling (VERDICT r4 missing #2): the
        # active parity's per-site state words [W, X, Y, ZT2] tile
        # TRIVIALLY alongside the links — RNG state needs no halos, so
        # each (i, j) grid cell reads/writes its own (w, 1, yb, ZT2)
        # window.  HBM feasibility at SU(3) 64^4: ranlux 25 u32
        # words/site/parity = 1.7 GB, vs 3.2 GB of links in ~16 GB —
        # fits (ranmar's 97 f32 words = 6.5 GB is the only tight family
        # member; an oversized request fails loudly at allocation).
        from ..prng_streams import (
            stream_mode_name,
            stream_word_count,
            stream_word_dtype,
        )

        stream_gen = stream_mode_name(rng_mode)
        w = stream_word_count(stream_gen)
        state_spec = pl.BlockSpec(
            (w, 1, yb, ZT2), lambda i, j, _kref: (0, i, j, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs = in_specs + [state_spec]
        out_specs = (out_specs, state_spec)
        out_shape = (out_shape, jax.ShapeDtypeStruct(
            (w, X, Y, ZT2), stream_word_dtype(stream_gen)
        ))
    if track_acc:
        acc_spec = pl.BlockSpec(
            (1, 1), lambda i, j, _kref: (0, 0), memory_space=pltpu.SMEM
        )
        if not isinstance(out_specs, tuple):
            out_specs, out_shape = (out_specs,), (out_shape,)
        out_specs = out_specs + (acc_spec,)
        out_shape = out_shape + (jax.ShapeDtypeStruct((1, 1), jnp.int32),)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(X, YB),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    kern = partial(
        _stage_kernel, mu=mu, parity=parity, kind=kind, n=n, dims=dims,
        k_trials=k_trials, n_hit=n_hit, metro_delta=metro_delta,
        rng_mode=rng_mode, slabs=slabs, local_y=0, stream_gen=stream_gen,
        track_acc=track_acc, ytile=yb, ytile_flags=yflags,
    )
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=bool(interpret),
    )

    def apply(key2, beta, us, stream_state=None, stream_scalars=None):
        beta_arr = jnp.asarray(beta, jnp.float32).reshape(1, 1)
        parts = [key2, jnp.zeros((2,), jnp.uint32)]
        if stream_scalars:
            # ref-based stream generators: [s0, ptr] ride the prefetch at
            # slots 4..5, exactly the untiled _stage_call layout
            parts += [jnp.asarray(s, jnp.uint32).reshape(1)
                      for s in stream_scalars]
        scal = jnp.concatenate(parts)
        args = []
        for (d, par, _), flag in zip(slabs, yflags):
            arr = us[2 * d + par]
            # up/main/down views of one buffer for Y-halo slabs
            args += [arr, arr, arr] if flag else [arr]
        if stream:
            return call(scal, beta_arr, *args, stream_state)
        return call(scal, beta_arr, *args)

    return apply


def stage_update_ytiled(us, mu, parity, kind, beta, key2, dims, y_block, *,
                        k_trials=4, n_hit=3, metro_delta=0.35,
                        rng_mode="threefry", interpret=False,
                        stream_state=None, stream_scalars=None,
                        track_acc=False):
    """One fused stage evaluated in Y tiles of ``y_block`` rows — the
    single-chip big-lattice path (see auto_y_block), as ONE pallas_call
    over a 2D grid with in-register halo assembly (_stage_call_ytiled).
    Correctness is structural: a stage is a pure function of the
    pre-stage field (the kernel never reads its own output), so
    evaluating disjoint row ranges across the grid is exactly the
    untiled stage.  threefry site keys are global (slab_site_index_packed
    with per-tile y0), so tiled and untiled chains draw identical
    randomness; PRNGCL stream states (stream_state/stream_scalars, same
    contract as stage_update) tile trivially alongside the links — per-
    site words need no halos, every draw is a pure function of its own
    site's words, so the tiled state advance is BIT-identical to untiled
    and the links agree to f32 rounding order (block-shape-dependent FMA
    contraction; tests/test_pallas_stream.py)."""
    n = us[0].shape[1]
    apply = _stage_call_ytiled(n, tuple(dims), mu, parity, kind,
                               int(k_trials), int(n_hit),
                               float(metro_delta), rng_mode,
                               bool(interpret), int(y_block),
                               stream=stream_state is not None,
                               track_acc=bool(track_acc))

    def unwrap(out):
        if not track_acc:
            return out
        *rest, acc = out
        return (*rest, acc[0, 0])

    if stream_scalars is None:
        return unwrap(apply(key2, beta, us, stream_state=stream_state))
    from ..prng_streams import encode_kernel_scalars, stream_mode_name

    gen = stream_mode_name(rng_mode)
    enc = encode_kernel_scalars(gen, stream_scalars)
    out = apply(
        key2, beta, us, stream_state=stream_state, stream_scalars=enc
    )
    new_links, new_state = out[0], out[1]
    adv = stage_scalar_advance(gen, stream_scalars, kind, k_trials, n_hit, n)
    if track_acc:
        return new_links, new_state, adv, out[2][0, 0]
    return new_links, new_state, adv


def stage_update(us, mu, parity, kind, beta, key2, dims, *, k_trials=4,
                 n_hit=3, metro_delta=0.35, rng_mode="threefry",
                 interpret=False, stream_state=None, stream_scalars=None,
                 track_acc=False):
    """One fused checkerboard stage on packed state.

    us: tuple of 8 arrays [2, N, 2, X, Y, Z*T/2] indexed us[2*mu + parity]
    (see ops.pallas.engine).  beta may be a traced scalar (one compiled
    kernel serves every coupling).  Returns the new us[2*mu + parity].

    stream_state (PRNGCL stream mode): the active parity's per-site state
    words [W, X, Y, Z*T/2]; the stage then returns (new_links, new_state).
    stream_scalars (ref-based generators only): dict of 0-d scalar leaves
    (prng_streams.stream_kernel_scalars order) — encoded onto the scalar
    prefetch channel here, advanced in closed form on return, so the
    caller gets (new_links, new_state, new_scalars).
    track_acc: the return tuple additionally ends with the stage's tracked
    event COUNT (0-d int32, summed in-kernel over active sites): accepted
    Metropolis hits (x hits x subgroups) for kind="metropolis" — QCDGPU's
    acceptance report — or KP trial exhaustions (x subgroups) for
    kind="heatbath" (cfg.track_kp_exhaust), both accumulated on-device.
    """
    n = us[0].shape[1]
    apply = _stage_call(
        n, tuple(dims), mu, parity, kind, int(k_trials),
        int(n_hit), float(metro_delta), rng_mode, bool(interpret),
        stream=stream_state is not None, track_acc=bool(track_acc),
    )

    def unwrap(out):
        """Flatten the pallas_call output tuple + unwrap the acc scalar."""
        if not track_acc:
            return out
        *rest, acc = out
        return (*rest, acc[0, 0])

    if stream_scalars is None:
        return unwrap(apply(key2, beta, us, stream_state=stream_state))
    from ..prng_streams import encode_kernel_scalars, stream_mode_name

    gen = stream_mode_name(rng_mode)
    enc = encode_kernel_scalars(gen, stream_scalars)
    out = apply(
        key2, beta, us, stream_state=stream_state, stream_scalars=enc
    )
    new_links, new_state = out[0], out[1]
    adv = stage_scalar_advance(gen, stream_scalars, kind, k_trials, n_hit, n)
    if track_acc:
        return new_links, new_state, adv, out[2][0, 0]
    return new_links, new_state, adv
