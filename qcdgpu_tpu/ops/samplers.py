"""Link-update samplers: heat-bath, overrelaxation, Metropolis.

Unified Cabibbo–Marinari form
-----------------------------
Every update left-multiplies the link by an SU(2)-subgroup element:

    U' = embed(u; i, j) @ U,   u in SU(2),

with the conditional weight P(u) ~ exp((beta/N) Re tr(u_emb W)),  W = U @ A
(A = staple sum).  Only the projected quaternion q(W; i, j) of the (i, j)
block matters: Re tr(u_emb W) = 2 * (u * q)_0 + const.  For SU(2) the single
subgroup (0, 1) is the whole group and the "subgroup" update IS an exact
heat-bath / overrelaxation / Metropolis of the link — so one codepath serves
both gauge groups (QCDGPU splits these into su2_update_cl.cl and
su3_update_cl.cl; SURVEY.md §2 "Update kernels").

Kennedy–Pendleton on SIMD
-------------------------
KP is an accept/reject loop; TPUs need fixed trip counts.  We run K trials
for every site in parallel, select the first accepted, and on total failure
return the identity (keep the old link).  This is *exactly* correct, not
approximate: the failure event depends only on (A, trial uniforms), never on
the current link, so the resulting kernel is the state-independent mixture
  (1 - eps(A)) * heatbath + eps(A) * identity,
and each component preserves the target distribution.  eps ~ (reject rate)^K
is ~1e-6 at the couplings of interest for K = 4 (SURVEY.md §7 "Hard parts" #1).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import fastmath as fm
from . import rng, sun


def kp_trial_quat(a, utr, udir, eps=1e-10):
    """Kennedy–Pendleton sample of w in SU(2) with P(w) ~ exp(a * w0) dw.

    a:    [*sites] > 0 coefficient (= 2*beta*k/N).
    utr:  [K, 4, *sites] uniforms in (0,1) — K trials x (r1, r2, r3, r_acc).
    udir: [2, *sites] uniforms for the uniform S^2 direction of the vector
          part.
    Returns (w [4, *sites], ok [*sites] bool).
    """
    inv2a = 1.0 / (2.0 * jnp.maximum(a, eps))
    r1, r2, r3, r4 = utr[:, 0], utr[:, 1], utr[:, 2], utr[:, 3]
    c2 = fm.cos2_2pi(r2)  # only cos^2 enters KP — skip the quadrant sign
    lam2 = -inv2a * (fm.log_u01(r1) + c2 * fm.log_u01(r3))  # [K, *sites]
    acc = (r4 * r4) <= (1.0 - lam2)
    # first accepted trial (argmax picks the first True)
    idx = jnp.argmax(acc, axis=0)
    ok = jnp.any(acc, axis=0)
    lam2_sel = jnp.take_along_axis(lam2, idx[None], axis=0)[0]
    x0 = 1.0 - 2.0 * lam2_sel
    x0 = jnp.clip(x0, -1.0, 1.0)
    rho = jnp.sqrt(jnp.maximum(1.0 - x0 * x0, 0.0))
    ct = 2.0 * udir[0] - 1.0
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    sph, cph = fm.sincos_2pi(udir[1])
    w = jnp.stack([x0, rho * st * cph, rho * st * sph, rho * ct], axis=0)
    return w, ok


def kp_uniforms_per_subgroup(k_trials: int) -> int:
    return 4 * k_trials + 2


def stage_uniform_count(n_colors, kind, k_trials=4, n_hit=3) -> int:
    """Uniforms one update stage consumes per site (the size of the
    ``uniforms`` argument of update_links).  Zero for overrelaxation."""
    from . import sun

    if kind == "heatbath":
        per = kp_uniforms_per_subgroup(k_trials)
    elif kind == "metropolis":
        per = METRO_UNIFORMS_PER_HIT * n_hit
    else:
        return 0
    return 2 * ((per + 1) // 2) * len(sun.subgroups(n_colors))


def heatbath_flip(q_w, two_beta_over_n, u, k_trials, with_fail=False):
    """Sample the left-multiplier u for one subgroup heat-bath touch.

    q_w: projected quaternion of the W block, [4, *sites].
    u: pre-drawn uniforms [4*k_trials + 2, *sites].
    Returns u [4, *sites] with u = identity where KP exhausted its trials.
    With with_fail also returns the mean trial-exhaustion fraction over
    sites — the identity-fallback rate of the fixed-K sampler (measured
    counterpart of the eps ~ 1e-6 exactness estimate above).
    """
    # rsqrt form: one reciprocal-sqrt + multiplies instead of sqrt + four
    # divides (TPU VPU divides are multi-pass; this is the sampler hot path)
    n2 = jnp.sum(q_w * q_w, axis=0)
    rk = jax.lax.rsqrt(jnp.maximum(n2, 1e-38))
    k = n2 * rk
    v = q_w * rk
    a = two_beta_over_n * k
    utr = u[: 4 * k_trials].reshape((k_trials, 4) + u.shape[1:])
    udir = u[4 * k_trials :]
    w, ok = kp_trial_quat(a, utr, udir)
    unew = sun.quat_mul(w, sun.quat_conj(v))
    ident = _identity_quat_like(unew)
    # degenerate staple (k ~ 0): heat-bath is uniform on the subgroup — w
    # itself is then a valid draw only in the a->0 limit; keep identity for
    # safety (measure-zero event in practice).
    good = ok & (k > 1e-30)
    out = jnp.where(good[None], unew, ident)
    if with_fail:
        return out, jnp.mean(jnp.logical_not(ok).astype(jnp.float32))
    return out


def overrelax_flip(q_w):
    """Microcanonical overrelaxation multiplier u = (v^+)^2, v = q_w/|q_w|.

    Re tr(u_emb W) is exactly preserved; the move maximally decorrelates the
    subgroup angle.  Zero RNG cost.
    """
    n2 = jnp.sum(q_w * q_w, axis=0)
    qc = sun.quat_conj(q_w)
    # (q_w^+/|q_w|)^2 = quat_mul(q_w^+, q_w^+) / |q_w|^2 — one reciprocal
    # instead of a sqrt + four divides (reciprocal-then-multiply, the same
    # rounding as the Pallas twin in ops/pallas/update.py)
    inv = 1.0 / jnp.maximum(n2, 1e-38)
    u = sun.quat_mul(qc, qc) * inv
    ident = _identity_quat_like(u)
    return jnp.where((n2 > 1e-38)[None], u, ident)


METRO_UNIFORMS_PER_HIT = 4


def metropolis_flip(q_w, two_beta_over_n, uu, n_hit, delta, with_acc=False):
    """NHIT Metropolis touches on one subgroup.

    Proposal: u = normalize(1, delta*(2r-1), delta*(2r-1), delta*(2r-1)) —
    symmetric under u -> u^+.  Accept with min(1, exp(dS)), where
    dS = (beta/N) * (Re tr(u_emb W) - Re tr(W)) = two_beta_over_n * ((u*q)_0 - q_0).
    uu: pre-drawn uniforms [4*n_hit, *sites].
    Returns the composed multiplier after n_hit hits; with with_acc also the
    mean accepted fraction over (sites x hits) — QCDGPU's acceptance-rate
    statistic.
    """
    acc_u = _identity_quat_like(q_w)
    q_cur = q_w
    acc_frac = 0.0
    for h in range(n_hit):
        u = uu[4 * h : 4 * (h + 1)]
        w1 = delta * (2.0 * u[0] - 1.0)
        w2 = delta * (2.0 * u[1] - 1.0)
        w3 = delta * (2.0 * u[2] - 1.0)
        w0 = jnp.ones_like(w1)
        rn = jax.lax.rsqrt(w0 * w0 + w1 * w1 + w2 * w2 + w3 * w3)
        w = jnp.stack([w0, w1, w2, w3], axis=0) * rn
        # dS_local in log-prob form
        new0 = sun.quat_mul(w, q_cur)[0]
        dlp = two_beta_over_n * (new0 - q_cur[0])
        accept = fm.log_u01(u[3]) < dlp
        if with_acc:
            acc_frac = acc_frac + jnp.mean(accept.astype(jnp.float32))
        w_eff = jnp.where(accept[None], w, _identity_quat_like(q_cur))
        acc_u = sun.quat_mul(w_eff, acc_u)
        q_cur = sun.quat_mul(w_eff, q_cur)
    if with_acc:
        return acc_u, acc_frac / n_hit
    return acc_u


def _identity_quat_like(q):
    ident = jnp.zeros_like(q)
    return ident.at[0].set(1.0)


# ---------------------------------------------------------------------------
# Full-link updates (sweep one (parity-masked) link field through subgroups)
# ---------------------------------------------------------------------------


def update_links(
    u_mu,
    staples,
    kind,
    beta,
    key2,
    site_idx,
    *,
    k_trials=4,
    n_hit=3,
    metro_delta=0.35,
    return_acc=False,
    uniforms=None,
):
    """Apply one update of ``kind`` to every link in u_mu given its staples.

    u_mu, staples: [N, N, *sites];  kind in {"heatbath", "overrelax",
    "metropolis"}.  Caller is responsible for parity masking.

    Randomness comes from the site-keyed threefry streams (key2, site_idx)
    by default; passing ``uniforms`` ([stage_uniform_count(...), *sites],
    in (0, 1)) instead consumes pre-drawn numbers — the PRNGCL stream mode
    (ops/prng_streams.py), where a stateful per-site generator supplies
    each stage exactly like QCDGPU's PRNG::produce buffer (SURVEY.md §3.3).

    With return_acc also returns the tracked per-stage statistic, averaged
    over (sites x subgroups): the mean Metropolis acceptance (x hits) for
    kind="metropolis", or the mean KP trial-exhaustion fraction for
    kind="heatbath" (cfg.track_kp_exhaust).  The mean runs over BOTH
    parities even though the caller discards one — the discarded half's
    events are identically distributed, so the estimator is unbiased.
    """
    n = u_mu.shape[0]
    two_beta_over_n = jnp.asarray(2.0 * beta / n, jnp.float32)
    w = sun.mul(u_mu, staples)
    sgs = sun.subgroups(n)
    # one batched RNG draw per stage covering every subgroup (graph size)
    if kind == "heatbath":
        per = kp_uniforms_per_subgroup(k_trials)
    elif kind == "metropolis":
        per = METRO_UNIFORMS_PER_HIT * n_hit
    else:
        per = 0
    # keep the per-subgroup slot layout stable regardless of `per` parity
    per_slots = (per + 1) // 2
    if per:
        if uniforms is not None:
            if uniforms.shape[0] != 2 * per_slots * len(sgs):
                raise ValueError(
                    f"uniforms must have {2 * per_slots * len(sgs)} rows "
                    f"(got {uniforms.shape[0]})"
                )
            u_all = uniforms
        else:
            u_all = rng.site_uniforms(key2, site_idx, 2 * per_slots * len(sgs))
    acc_total = 0.0
    for s, (i, j) in enumerate(sgs):
        q_w = sun.extract_block_quat(w, i, j)
        if kind == "heatbath":
            u_s = u_all[2 * per_slots * s : 2 * per_slots * s + per]
            flip = heatbath_flip(q_w, two_beta_over_n, u_s, k_trials,
                                 with_fail=return_acc)
            if return_acc:
                flip, acc = flip
                acc_total = acc_total + acc
        elif kind == "overrelax":
            flip = overrelax_flip(q_w)
        elif kind == "metropolis":
            u_s = u_all[2 * per_slots * s : 2 * per_slots * s + per]
            flip = metropolis_flip(
                q_w, two_beta_over_n, u_s, n_hit, metro_delta,
                with_acc=return_acc,
            )
            if return_acc:
                flip, acc = flip
                acc_total = acc_total + acc
        else:
            raise ValueError(f"unknown update kind: {kind}")
        flip = flip.astype(jnp.real(u_mu).dtype)
        u_mu = sun.subgroup_left_mul(flip, i, j, u_mu)
        w = sun.subgroup_left_mul(flip, i, j, w)
    if return_acc:
        return u_mu, acc_total / len(sgs)
    return u_mu
