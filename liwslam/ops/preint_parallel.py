"""Log-depth IMU preintegration via associative scans.

The reference propagates the 15-state integral sample-by-sample
(imu_preintegraption.h:170-208); the sequential ``lax.scan`` port pays
N x kernel latency per frame.  All three recurrences are associative:

- rotation:   R_j = R_0 * prod exp((w_i - bw) dt_i)        (matrix products)
- velocity:   beta_j = beta_0 + sum R_i a_i dt_i            (prefix sums)
- position:   alpha_j = alpha_0 + sum (beta_i dt_i + 0.5 R_i a_i dt_i^2)
- covariance/bias-Jacobian: (F, Q) pairs compose as
      (F1,Q1) o (F2,Q2) = (F2 F1, F2 Q1 F2' + Q2)

so the whole inter-frame interval evaluates in O(log N) depth of batched
3x3/15x15 matmuls — MXU-friendly instead of latency-bound.

Semantics: equivalent to ``imu_add_samples`` followed by
``imu_update_only_t`` (zero-order hold of each previous sample, final
hold to the frame stamp) up to floating-point reassociation, PROVIDED the
mask is a valid-prefix (all real samples before the padding — what the
driver's packer produces).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from liwslam.core import geometry as geo
from liwslam.frontend.preintegration import (
    ALPHA,
    BA,
    BETA,
    BW,
    GAMMA,
    N_STATE,
    TIME_DTYPE,
    US,
    ImuCarry,
)


def imu_interval_parallel(
    carry: ImuCarry, acc, gyro, t_us, mask, t_end_us, Q
) -> ImuCarry:
    """Integrate samples (valid-prefix mask) plus the final hold to
    ``t_end_us``; returns the carry exactly as the sequential pair
    imu_add_samples + imu_update_only_t would (same last_* fields)."""
    dtype = carry.X.dtype
    N = acc.shape[0]
    t_end = jnp.asarray(t_end_us, TIME_DTYPE)

    ba = carry.X[BA]
    bw = carry.X[BW]

    # --- step construction (N+1 steps) ---------------------------------
    # step j ends at event j (sample j, or t_end for padding/final) and
    # integrates with the value of event j-1 (event -1 = held carry sample)
    e_t = jnp.where(mask, t_us, t_end)  # (N,)
    ends = jnp.concatenate([e_t, t_end[None]])  # (N+1,)
    starts = jnp.concatenate([carry.last_t_us[None], e_t])  # (N+1,)
    dts = jnp.maximum((ends - starts).astype(dtype) * US, 0.0)  # (N+1,)
    # empty carry: the first sample only primes (no integration before it)
    dts = dts.at[0].set(jnp.where(carry.has_sample, dts[0], 0.0))
    vals_a = jnp.concatenate([carry.last_acc[None], acc], 0)  # (N+1,3)
    vals_w = jnp.concatenate([carry.last_gyro[None], gyro], 0)

    a_unb = vals_a - ba
    w_unb = vals_w - bw

    # --- rotations -------------------------------------------------------
    dR = geo.exp_so3(w_unb * dts[:, None])  # (N+1,3,3)
    R0 = geo.exp_so3(carry.X[GAMMA])
    seq = jnp.concatenate([R0[None], dR], 0)  # (N+2,3,3)
    # prefix[j] = seq_0 @ seq_1 @ ... @ seq_j  (rotations compose on the right)
    prefix = jax.lax.associative_scan(lambda a, b: a @ b, seq, axis=0)
    R_start = prefix[:-1]  # (N+1,3,3): rotation at the start of step j
    R_final = prefix[-1]

    # --- velocity / position prefix sums ---------------------------------
    Ra = jnp.einsum("nij,nj->ni", R_start, a_unb)  # (N+1,3)
    db = Ra * dts[:, None]
    beta_start = carry.X[BETA] + jnp.cumsum(db, 0) - db  # exclusive prefix
    da = beta_start * dts[:, None] + 0.5 * Ra * (dts**2)[:, None]
    beta_final = carry.X[BETA] + jnp.sum(db, 0)
    alpha_final = carry.X[ALPHA] + jnp.sum(da, 0)
    gamma_final = geo.log_SO3(R_final)

    X = carry.X.at[ALPHA].set(alpha_final)
    X = X.at[BETA].set(beta_final)
    X = X.at[GAMMA].set(gamma_final)

    # --- F/Q composition ---------------------------------------------------
    eye3 = jnp.eye(3, dtype=dtype)
    F = jnp.zeros((N + 1, N_STATE, N_STATE), dtype)
    F = F.at[:, ALPHA, BETA].set(eye3[None])
    F = F.at[:, BETA, GAMMA].set(-jnp.einsum("nij,njk->nik", R_start, geo.skew(a_unb)))
    F = F.at[:, BETA, BA].set(-R_start)
    F = F.at[:, GAMMA, GAMMA].set(-geo.skew(w_unb))
    F = F.at[:, GAMMA, BW].set(-eye3[None])
    F = jnp.eye(N_STATE, dtype=dtype)[None] + F * dts[:, None, None]

    G = jnp.zeros((N + 1, N_STATE, 12), dtype)
    G = G.at[:, BETA, 0:3].set(-R_start)
    G = G.at[:, GAMMA, 3:6].set(-eye3[None])
    G = G.at[:, BA, 6:9].set(eye3[None])
    G = G.at[:, BW, 9:12].set(eye3[None])
    Gdt = G * dts[:, None, None]
    Qd = jnp.einsum("nij,jk,nlk->nil", Gdt, Q.astype(dtype), Gdt)

    def compose(x, y):
        F1, Q1 = x
        F2, Q2 = y
        return (F2 @ F1, F2 @ Q1 @ jnp.swapaxes(F2, -1, -2) + Q2)

    F_tot, Q_tot = jax.tree_util.tree_map(
        lambda x: x[-1], jax.lax.associative_scan(compose, (F, Qd), axis=0)
    )

    J_new = F_tot @ carry.J
    P_new = F_tot @ carry.P @ F_tot.T + Q_tot

    n_valid = jnp.sum(mask.astype(jnp.int32))
    last_idx = jnp.maximum(n_valid - 1, 0)
    has_any = n_valid > 0
    Dt_new = carry.Dt + jnp.sum(dts)

    return carry._replace(
        X=X,
        J=J_new,
        P=P_new,
        Dt=Dt_new,
        last_t_us=t_end,
        last_acc=jnp.where(has_any, acc[last_idx], carry.last_acc),
        last_gyro=jnp.where(has_any, gyro[last_idx], carry.last_gyro),
        has_sample=jnp.logical_or(carry.has_sample, has_any),
    )
