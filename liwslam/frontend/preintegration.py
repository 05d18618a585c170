"""IMU and wheel-odometry preintegration as masked ``lax.scan``s.

Capability parity with the reference preintegrators:

- IMU: ``src/factor/imu_preintegraption.h:105-209`` — Euler propagation of
  the 15-state ``X = [alpha, beta, gamma, ba, bw]`` with bias Jacobian ``J``
  and covariance ``P`` via ``F``/``G`` matrices; ``update_only_t`` extends
  the integral to the frame timestamp with a zero-order hold of the last
  sample; the result carries a whitening square root of ``P^{-1}``.
- Wheel: ``src/factor/wheel_odom_preintegration.h:44-153`` — consecutive
  absolute odometry poses are converted to a body twist (pairs closer than
  50 ms are skipped), which integrates ``delta_Tij``; the covariance is the
  configured per-meter sigma scaled by squared displacement.

TPU-native design decisions:

- **No objects, no callbacks**: each preintegrator is a pure function over
  a fixed-capacity padded array of samples for one inter-frame interval,
  scanning a small carry.  The sample that was "held" at the previous frame
  boundary enters as part of the carry, exactly like the reference's
  ``last_info`` member surviving ``reset``.
- **Timestamps are int32 microseconds** relative to a rolling origin.
  float32 cannot represent absolute epochs (resolution 128 s at 1.5e9) and
  even relative seconds lose ~0.4 ms after an hour; integer microseconds
  make every ``dt`` exact, converted to float only after differencing.
  Callers advance the origin with :func:`imu_rebase`/:func:`wheel_rebase`.
- **Known reference deviation**: the reference propagates
  ``F[gamma,gamma] = -skew(gyro - ba)`` (``imu_preintegraption.h:192``),
  using the *accelerometer* bias in the gyro term — an apparent typo.  We
  use ``bw``.  This only affects the covariance/Jacobian weighting, not the
  integrated values.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from liwslam.core import geometry as geo

# 15-state block layout (factor_common.h magic_number_X)
ALPHA = slice(0, 3)  # position-like
BETA = slice(3, 6)  # velocity-like
GAMMA = slice(6, 9)  # so3
BA = slice(9, 12)
BW = slice(12, 15)
N_STATE = 15
US = 1e-6  # microseconds -> seconds
# Device timestamps are int32 microseconds relative to a rolling origin.
# int64 would silently truncate to int32 without jax_enable_x64, and
# float32 cannot hold absolute times; int32 + per-chunk rebasing keeps all
# dt arithmetic exact.  Hosts rebase carries with {imu,wheel}_rebase when
# they advance the origin (int32 us overflows at +-35 min otherwise).
TIME_DTYPE = jnp.int32


def imu_noise_Q(params) -> jnp.ndarray:
    """Diagonal 12x12 noise covariance (imu_preintegraption.h:24-43)."""
    import numpy as np

    q = np.zeros((12, 12))
    q[0:3, 0:3] = np.diag(np.square(params.imu_noise_acc_sigma))
    q[3:6, 3:6] = np.diag(np.square(params.imu_noise_gyro_sigma))
    q[6:9, 6:9] = np.diag(np.square(params.imu_bias_acc_sigma))
    q[9:12, 9:12] = np.diag(np.square(params.imu_bias_gyro_sigma))
    return jnp.asarray(q, jnp.float32)


class ImuCarry(NamedTuple):
    """Persistent preintegrator state (member state of imu_preintegraption)."""

    X: jnp.ndarray  # (15,)
    J: jnp.ndarray  # (15,15)
    P: jnp.ndarray  # (15,15)
    last_acc: jnp.ndarray  # (3,) zero-order-hold sample
    last_gyro: jnp.ndarray  # (3,)
    last_t_us: jnp.ndarray  # () int64
    Dt: jnp.ndarray  # () f32 accumulated interval
    has_sample: jnp.ndarray  # () bool — last_info valid


class ImuPreintResult(NamedTuple):
    """Mirror of imu_preint_result (imu_preintegraption.h:45-103)."""

    X: jnp.ndarray  # (15,)
    J: jnp.ndarray  # (15,15)
    sqrt_inverse_P: jnp.ndarray  # (15,15) whitener W: |W r|^2 == r' P^-1 r
    Dt: jnp.ndarray  # ()
    linearized_ba: jnp.ndarray  # (3,)
    linearized_bw: jnp.ndarray  # (3,)


def imu_reset(t_us, ba, bw, dtype=jnp.float32) -> ImuCarry:
    """reset_imu_measure (imu_preintegraption.h:113-124). ``has_sample`` is
    preserved by the caller; a fresh session starts with has_sample=False."""
    X = jnp.zeros(N_STATE, dtype).at[BA].set(ba).at[BW].set(bw)
    return ImuCarry(
        X=X,
        J=jnp.eye(N_STATE, dtype=dtype),
        P=jnp.eye(N_STATE, dtype=dtype) * 1e-5,
        last_acc=jnp.zeros(3, dtype),
        last_gyro=jnp.zeros(3, dtype),
        last_t_us=jnp.asarray(t_us, TIME_DTYPE),
        Dt=jnp.zeros((), dtype),
        has_sample=jnp.asarray(False),
    )


def _imu_update(carry: ImuCarry, dt, Q) -> ImuCarry:
    """One Euler propagation step (imu_preintegraption.h:170-208)."""
    X, J, P = carry.X, carry.J, carry.P
    dtype = X.dtype
    alpha, beta, gamma = X[ALPHA], X[BETA], X[GAMMA]
    ba, bw = X[BA], X[BW]
    Rz = geo.exp_so3(gamma)
    a_unb = carry.last_acc - ba
    w_unb = carry.last_gyro - bw

    alpha_n = alpha + beta * dt + 0.5 * (Rz @ a_unb) * dt * dt
    beta_n = beta + (Rz @ a_unb) * dt
    gamma_n = geo.log_SO3(Rz @ geo.exp_so3(w_unb * dt))
    X_n = X.at[ALPHA].set(alpha_n).at[BETA].set(beta_n).at[GAMMA].set(gamma_n)

    F = jnp.zeros((N_STATE, N_STATE), dtype)
    F = F.at[ALPHA, BETA].set(jnp.eye(3, dtype=dtype))
    F = F.at[BETA, GAMMA].set(-Rz @ geo.skew(a_unb))
    F = F.at[BETA, BA].set(-Rz)
    F = F.at[GAMMA, GAMMA].set(-geo.skew(w_unb))  # ref uses (gyro-ba): typo
    F = F.at[GAMMA, BW].set(-jnp.eye(3, dtype=dtype))
    F = jnp.eye(N_STATE, dtype=dtype) + F * dt

    G = jnp.zeros((N_STATE, 12), dtype)
    G = G.at[BETA, 0:3].set(-Rz)
    G = G.at[GAMMA, 3:6].set(-jnp.eye(3, dtype=dtype))
    G = G.at[BA, 6:9].set(jnp.eye(3, dtype=dtype))
    G = G.at[BW, 9:12].set(jnp.eye(3, dtype=dtype))

    J_n = F @ J
    Gdt = G * dt
    P_n = F @ P @ F.T + Gdt @ Q @ Gdt.T
    return carry._replace(X=X_n, J=J_n, P=P_n, Dt=carry.Dt + dt)


def imu_add_samples(carry: ImuCarry, acc, gyro, t_us, mask, Q) -> ImuCarry:
    """Feed a padded batch of IMU samples (add_imu_measure per sample).

    acc/gyro: (N,3); t_us: (N,) int64; mask: (N,) bool (valid samples).
    Samples must be time-ordered; masked-out tail entries are ignored.
    """

    def step(c: ImuCarry, inp):
        a, w, t, m = inp
        dt = (t - c.last_t_us).astype(c.X.dtype) * US
        # first-ever sample only primes last_info (add_imu_measure early out)
        do_int = jnp.logical_and(m, c.has_sample)
        c_upd = _imu_update(c, dt, Q)
        c_new = jax.tree_util.tree_map(
            lambda new, old: jnp.where(do_int, new, old), c_upd, c
        )
        # record the sample (both branches of add_imu_measure do this)
        c_new = c_new._replace(
            last_acc=jnp.where(m, a, c_new.last_acc),
            last_gyro=jnp.where(m, w, c_new.last_gyro),
            last_t_us=jnp.where(m, t, c_new.last_t_us),
            has_sample=jnp.logical_or(c_new.has_sample, m),
        )
        return c_new, None

    carry, _ = jax.lax.scan(step, carry, (acc, gyro, t_us, mask))
    return carry


def imu_update_only_t(carry: ImuCarry, t_us, Q) -> ImuCarry:
    """Extend the integral to the frame timestamp with the held sample
    (imu_preintegraption.h:139-146)."""
    dt = (jnp.asarray(t_us, TIME_DTYPE) - carry.last_t_us).astype(carry.X.dtype) * US
    c_upd = _imu_update(carry, dt, Q)._replace(last_t_us=jnp.asarray(t_us, TIME_DTYPE))
    return jax.tree_util.tree_map(
        lambda new, old: jnp.where(carry.has_sample, new, old), c_upd, carry
    )


def imu_rebase(carry: ImuCarry, shift_us) -> ImuCarry:
    """Shift the carry's time origin forward by ``shift_us`` (exact int op)."""
    return carry._replace(
        last_t_us=carry.last_t_us - jnp.asarray(shift_us, TIME_DTYPE)
    )


def wheel_rebase(c: "WheelCarry", shift_us) -> "WheelCarry":
    s = jnp.asarray(shift_us, TIME_DTYPE)
    return c._replace(
        last_pose_t_us=c.last_pose_t_us - s,
        last_update_t_us=c.last_update_t_us - s,
    )


def whitener_from_cov(P, jitter=0.0):
    """Lower-triangular W with W^T W == P^{-1} via triangular solve of
    chol(P) — numerically stabler than chol(P^{-1}) and equivalent for
    least-squares whitening (any square root of the information matrix
    yields the same normal equations)."""
    dtype = P.dtype
    n = P.shape[-1]
    Pj = P + jitter * jnp.eye(n, dtype=dtype)
    L = jnp.linalg.cholesky(Pj)
    return jax.scipy.linalg.solve_triangular(L, jnp.eye(n, dtype=dtype), lower=True)


def imu_result(carry: ImuCarry) -> ImuPreintResult:
    """get_preintegraption_result (imu_preintegraption.h:147-152)."""
    W = whitener_from_cov(carry.P)
    return ImuPreintResult(
        X=carry.X,
        J=carry.J,
        sqrt_inverse_P=W,
        Dt=carry.Dt,
        linearized_ba=carry.X[BA],
        linearized_bw=carry.X[BW],
    )


def imu_result_update_bias(res: ImuPreintResult, ba_new, bw_new) -> ImuPreintResult:
    """First-order bias repair (imu_preint_result::update_value_with_bias,
    imu_preintegraption.h:68-102)."""
    dba = ba_new - res.linearized_ba
    dbw = bw_new - res.linearized_bw
    J = res.J
    X = res.X
    alpha = X[ALPHA] + J[ALPHA, BA] @ dba + J[ALPHA, BW] @ dbw
    beta = X[BETA] + J[BETA, BA] @ dba + J[BETA, BW] @ dbw
    gamma = X[GAMMA] + J[GAMMA, BW] @ dbw
    X = X.at[ALPHA].set(alpha).at[BETA].set(beta).at[GAMMA].set(gamma)
    X = X.at[BA].set(ba_new).at[BW].set(bw_new)
    return res._replace(X=X, linearized_ba=ba_new, linearized_bw=bw_new)


# ---------------------------------------------------------------------------
# Wheel odometry


class WheelCarry(NamedTuple):
    """Persistent state of wheel_odom_preintegration."""

    delta_T: jnp.ndarray  # (4,4)
    v: jnp.ndarray  # (3,) body linear velocity estimate
    omega: jnp.ndarray  # (3,)
    last_pose: jnp.ndarray  # (4,4) last *accepted* absolute odom pose
    last_pose_t_us: jnp.ndarray  # () int64
    last_update_t_us: jnp.ndarray  # () int64
    Dt: jnp.ndarray  # ()
    has_sample: jnp.ndarray  # () bool


class WheelPreintResult(NamedTuple):
    delta_T: jnp.ndarray  # (4,4)
    sqrt_inverse_P: jnp.ndarray  # (3,3) diag whitener (len, dir, yaw)
    Dt: jnp.ndarray


def wheel_reset(carry_or_t_us, dtype=jnp.float32) -> WheelCarry:
    """reset_wheel_odom_measure: zero the integral, keep the last pose.

    Accepts either an existing carry (frame-boundary reset, preserving
    last_pose/v/omega) or a scalar start time (fresh session)."""
    if isinstance(carry_or_t_us, WheelCarry):
        c = carry_or_t_us
        return c._replace(
            delta_T=jnp.eye(4, dtype=dtype),
            Dt=jnp.zeros((), dtype),
            last_update_t_us=c.last_update_t_us,
        )
    t_us = jnp.asarray(carry_or_t_us, TIME_DTYPE)
    return WheelCarry(
        delta_T=jnp.eye(4, dtype=dtype),
        v=jnp.zeros(3, dtype),
        omega=jnp.zeros(3, dtype),
        last_pose=jnp.eye(4, dtype=dtype),
        last_pose_t_us=t_us,
        last_update_t_us=t_us,
        Dt=jnp.zeros((), dtype),
        has_sample=jnp.asarray(False),
    )


def _wheel_integrate(c: WheelCarry, dt) -> WheelCarry:
    """update_by_v with the dt sanity clamp (wheel_odom_preintegration.h:141-152)."""
    ok = jnp.logical_and(dt > 0.0, dt < 10.0)
    delta = geo.make_tf(c.v * dt, c.omega * dt)
    return c._replace(
        delta_T=jnp.where(ok, c.delta_T @ delta, c.delta_T),
        Dt=jnp.where(ok, c.Dt + dt, c.Dt),
    )


def _wheel_add_samples_scan(c: WheelCarry, poses, t_us, mask) -> WheelCarry:
    """Reference-shaped sequential form (oracle for the vectorized path)."""

    def step(c: WheelCarry, inp):
        pose, t, m = inp
        dtype = c.delta_T.dtype
        dt_pose = (t - c.last_pose_t_us).astype(dtype) * US
        first = jnp.logical_not(c.has_sample)

        # accepted sample: dt since last accepted pose >= 50 ms
        accept = jnp.logical_and(m, jnp.logical_and(c.has_sample, dt_pose >= 0.05))
        rel = geo.tf_compose(geo.tf_inv(c.last_pose), pose)
        dp, dth = geo.log_SE3(rel)
        safe_dt = jnp.maximum(dt_pose, 1e-6)
        v_new = dp / safe_dt
        w_new = dth / safe_dt
        update_dt = (t - c.last_update_t_us).astype(dtype) * US

        c_int = c._replace(v=v_new, omega=w_new)
        c_int = _wheel_integrate(c_int, update_dt)
        c_int = c_int._replace(
            last_pose=pose,
            last_pose_t_us=t,
            last_update_t_us=t,
        )
        c_acc = jax.tree_util.tree_map(
            lambda new, old: jnp.where(accept, new, old), c_int, c
        )
        # very first sample primes the pose and times (early-out branch)
        prime = jnp.logical_and(m, first)
        c_out = c_acc._replace(
            last_pose=jnp.where(prime, pose, c_acc.last_pose),
            last_pose_t_us=jnp.where(prime, t, c_acc.last_pose_t_us),
            last_update_t_us=jnp.where(prime, t, c_acc.last_update_t_us),
            has_sample=jnp.logical_or(c_acc.has_sample, m),
        )
        return c_out, None

    c, _ = jax.lax.scan(step, c, (poses, t_us, mask), unroll=True)
    return c


def wheel_add_samples(c: WheelCarry, poses, t_us, mask) -> WheelCarry:
    """Feed padded absolute odometry poses (add_wheel_odom_measure each,
    wheel_odom_preintegration.h:62-97).

    poses: (N,4,4); t_us: (N,) int64; mask: (N,) bool.

    TPU-native form: the only genuinely sequential part of the reference's
    per-sample loop is the 50 ms acceptance thinning (each accept decision
    depends on the previously accepted stamp), which is a handful of
    SCALAR ops — done in an unrolled scan.  All the SE3 work (relative
    pose, log, twist, delta integration) is then batched over samples in
    one fused pass, and the ordered product of per-sample deltas is a
    log-depth ``associative_scan`` of 4x4 matmuls.  Semantics are
    bit-matched to ``_wheel_add_samples_scan`` (parity-tested).
    """
    dtype = c.delta_T.dtype
    N = poses.shape[0]

    # ---- phase 1: scalar acceptance chain -------------------------------
    # carry: (last_pose_t, last_update_t, setter_idx, has_sample)
    # setter_idx = index of the sample that currently provides last_pose
    # (-1 = the incoming carry's last_pose)
    def sel(carry, inp):
        lp_t, lu_t, setter, has = carry
        k, t, m = inp
        dt_pose = (t - lp_t).astype(dtype) * US
        accept = m & has & (dt_pose >= 0.05)
        prime = m & jnp.logical_not(has)
        set_now = accept | prime
        out = (accept, setter, dt_pose, (t - lu_t).astype(dtype) * US)
        lp_t = jnp.where(set_now, t, lp_t)
        lu_t = jnp.where(set_now, t, lu_t)
        setter = jnp.where(set_now, k, setter)
        has = has | m
        return (lp_t, lu_t, setter, has), out

    (lp_t_f, lu_t_f, setter_f, has_f), (accept, prev_idx, dt_pose, update_dt) = (
        jax.lax.scan(
            sel,
            (c.last_pose_t_us, c.last_update_t_us, jnp.asarray(-1, jnp.int32), c.has_sample),
            (jnp.arange(N, dtype=jnp.int32), t_us, mask),
            unroll=True,
        )
    )

    # ---- phase 2: batched SE3 over samples ------------------------------
    prev_pose = jnp.where(
        (prev_idx >= 0)[:, None, None],
        poses[jnp.clip(prev_idx, 0, N - 1)],
        c.last_pose[None],
    )
    rel = jax.vmap(lambda a, b: geo.tf_compose(geo.tf_inv(a), b))(prev_pose, poses)
    dp, dth = jax.vmap(geo.log_SE3)(rel)
    safe_dt = jnp.maximum(dt_pose, 1e-6)[:, None]
    v = dp / safe_dt
    w = dth / safe_dt
    ok = accept & (update_dt > 0.0) & (update_dt < 10.0)
    delta = jax.vmap(geo.make_tf)(v * update_dt[:, None], w * update_dt[:, None])
    eye = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (N, 4, 4))
    delta = jnp.where(ok[:, None, None], delta, eye)
    total = jax.lax.associative_scan(jnp.matmul, delta)[-1]

    # ---- stitch the new carry -------------------------------------------
    last_acc = jnp.max(jnp.where(accept, jnp.arange(N, dtype=jnp.int32), -1))
    any_acc = last_acc >= 0
    la = jnp.clip(last_acc, 0, N - 1)
    setter_ok = setter_f >= 0
    sf = jnp.clip(setter_f, 0, N - 1)
    return WheelCarry(
        delta_T=c.delta_T @ total,
        v=jnp.where(any_acc, v[la], c.v),
        omega=jnp.where(any_acc, w[la], c.omega),
        last_pose=jnp.where(setter_ok, poses[sf], c.last_pose),
        last_pose_t_us=lp_t_f,
        last_update_t_us=lu_t_f,
        Dt=c.Dt + jnp.sum(jnp.where(ok, update_dt, 0.0)),
        has_sample=has_f,
    )


def wheel_update_only_t(c: WheelCarry, t_us) -> WheelCarry:
    t_us = jnp.asarray(t_us, TIME_DTYPE)
    dt = (t_us - c.last_update_t_us).astype(c.delta_T.dtype) * US
    c_upd = _wheel_integrate(c, dt)._replace(last_update_t_us=t_us)
    return jax.tree_util.tree_map(
        lambda new, old: jnp.where(c.has_sample, new, old), c_upd, c
    )


def wheel_result(c: WheelCarry, wheel_sigma) -> WheelPreintResult:
    """get_preintegraption_result (wheel_odom_preintegration.h:111-125):
    diag([len,len,yaw] scaled) covariance -> diagonal whitener."""
    dp, dq = geo.log_SE3(c.delta_T)
    dtype = c.delta_T.dtype
    len2 = jnp.maximum(jnp.sum(dp * dp), 0.005**2)
    yaw2 = jnp.maximum(jnp.sum(dq * dq), 0.005**2)
    k = jnp.asarray([len2, len2, yaw2], dtype)
    cov_diag = jnp.asarray(wheel_sigma, dtype) ** 2 * k
    sqrt_info = jnp.diag(1.0 / jnp.sqrt(cov_diag))
    return WheelPreintResult(delta_T=c.delta_T, sqrt_inverse_P=sqrt_info, Dt=c.Dt)
