"""Pallas TPU mega-kernel for the per-frame tracking solve.

The sliding-window LM solve dominates the per-frame device program (~3
adaptive iterations x ~0.24 ms, each a chain of hundreds of tiny fused
XLA kernels whose launch latency — not FLOPs — is the cost; see
CLAUDE.md "TPU performance rules").  This module collapses the entire
solve into ONE kernel launch: residual + forward-mode Jacobian (traced
with ``jax.jacfwd`` inside the kernel), normal equations, a hand-rolled
30x30 Cholesky, the LM accept/reject loop, and the Schur reduction that
feeds the marginalization prior.

The tracking problem has FIXED structure (reference ``solver.cpp:631-820``
with the laser-only two-frame window, pipeline.py module docstring):

- window = [previous, current]; previous pose frozen, its v/bias free,
- one IMU + one wheel preintegration factor between the two frames,
- laser line factors of the CURRENT frame against a FROZEN reference
  pose (i_idx < 0 always),
- ground factors on both frames, marginalization prior on frame 0.

Everything x-independent is precomputed on the XLA side and packed into
four small VMEM arrays: the reference line endpoints are pre-transformed
to world (the frozen-pose factor side), the wheel preintegration log and
row weights are baked in, so the in-kernel residual is ~350 ops.

Residual row layout (165 rows; mirrors solve.factors.stack_residuals
minus the always-zero frame-0 rows):
    0:15    imu           (imu_factor.h:75-87)
    15:18   wheel         (wheel_factor.h:39-70)
    18:146  laser (64x2)  (laser_factor.h:31-88)
    146:150 ground        (ground_factor.h:25-89)
    150:165 prior         (marginalization_factor.h)

Outputs bit-match gn.lm_solve(method="chol") + gn.schur_reduce up to fp
reordering (parity-tested in tests/test_track_solve.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from liwslam.core import geometry as geo

D = 30  # flat state dim (2 frames x 15)
R_IMU, R_WHEEL, R_GROUND, R_PRIOR = 15, 3, 4, 15
_EPS = 1e-8


# --------------------------------------------------------------------------
# kernel-safe small-geometry helpers (single instance, no gathers/argmax)


def _eye(n, dtype=jnp.float32):
    """Identity without an array constant (kernel-safe)."""
    return (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(dtype)


def _skew(w):
    z = jnp.zeros((), w.dtype)
    return jnp.array(
        [[z, -w[2], w[1]], [w[2], z, -w[0]], [-w[1], w[0], z]]
    )


def _exp_so3(w):
    theta2 = jnp.sum(w * w)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta * theta))
    K = _skew(w)
    return _eye(3, w.dtype) + a * K + b * (K @ K)


def _quat_from_mat(R):
    """Branchless Shepperd with where-selects (no argmax/take_along_axis)."""
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22

    def ssqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    s0 = ssqrt(1.0 + tr) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0])
    s1 = ssqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1])
    s2 = ssqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2])
    s3 = ssqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3])
    # argmax-first semantics over scores (tr, m00, m11, m22)
    b0 = (tr >= m00) & (tr >= m11) & (tr >= m22)
    b1 = jnp.logical_not(b0) & (m00 >= m11) & (m00 >= m22)
    b2 = jnp.logical_not(b0) & jnp.logical_not(b1) & (m11 >= m22)
    q = jnp.where(b0, q0, jnp.where(b1, q1, jnp.where(b2, q2, q3)))
    q = q / jnp.sqrt(jnp.maximum(jnp.sum(q * q), _EPS))
    return q * jnp.where(q[0] < 0, -1.0, 1.0)


def _asin(x):
    """arcsin on [0, 1] without the atan2/asin primitives (Mosaic TPU has
    no lowering for them).  Taylor through x^13 on [0, 0.5] plus the
    half-angle identity asin(x) = pi/2 - 2 asin(sqrt((1-x)/2)) above —
    max error ~3e-7, below the f32 round-off of downstream residuals."""
    big = x > 0.5
    xx = jnp.where(big, jnp.sqrt(jnp.maximum((1.0 - x) * 0.5, 0.0)), x)
    z = xx * xx
    p = 1.0 + z * (
        1.0 / 6.0
        + z * (
            3.0 / 40.0
            + z * (
                15.0 / 336.0
                + z * (105.0 / 3456.0 + z * (0.0223722 + z * 0.0173527))
            )
        )
    )
    r = xx * p
    return jnp.where(big, 0.5 * jnp.pi - 2.0 * r, r)


def _log_SO3(R):
    q = _quat_from_mat(R)
    qw, qv = q[0], q[1:]
    sin_half = jnp.sqrt(jnp.maximum(jnp.sum(qv * qv), _EPS * _EPS))
    # canonical hemisphere (qw >= 0) makes atan2(s, w) == asin(s) exactly
    angle = 2.0 * _asin(jnp.clip(sin_half, 0.0, 1.0))
    small = sin_half < _EPS
    scale = jnp.where(small, 2.0, angle / jnp.maximum(sin_half, _EPS))
    return scale * qv


def _safe_norm(v):
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v), _EPS * _EPS))


def _normalize_so3(w):
    theta = jnp.sqrt(jnp.maximum(jnp.sum(w * w), _EPS * _EPS))
    two_pi = 2.0 * jnp.pi
    wrapped = theta - two_pi * jnp.floor((theta + jnp.pi) / two_pi)
    scale = jnp.where(theta > jnp.pi, wrapped / theta, 1.0)
    return w * scale


# --------------------------------------------------------------------------
# in-kernel residual (fixed tracking structure)


def _make_residual(state, imu_in, prior_in, laser_in, M):
    """Build residual(x)->(165+2M-128,) closure over the packed data refs'
    VALUES (read once in the kernel body)."""
    dtype = jnp.float32
    Dt = state[2, 0]
    g = state[2, 1]
    ground_p_info = state[2, 3]
    ground_q_info = state[2, 4]
    ground_weight = state[2, 5]
    prior_valid = state[2, 6]
    op = state[3, 0:3]
    oq = state[3, 3:6]
    wheel_w = state[3, 6:9]
    Til = state[4:8, 0:4]
    Tiw = state[4:8, 8:12]
    imu_J = imu_in[0:15, 0:15]
    imu_sqrtP = imu_in[16:31, 0:15]
    imu_X = imu_in[15, 0:15]
    prior_J = prior_in[0:15, 0:15]
    prior_X = prior_in[15, 0:15]
    a1 = laser_in[:, 0:2]  # (M,2) world ref-line endpoints (z=0 plane)
    a2 = laser_in[:, 2:4]
    b1l = laser_in[:, 4:7]  # (M,3) new-line endpoints, laser frame
    b2l = laser_in[:, 7:10]
    lw = laser_in[:, 10]  # (M,) combined row weight (0 for invalid)

    # x-independent wheel quantities
    o_len = jnp.sqrt(op[0] ** 2 + op[1] ** 2 + _EPS)
    o_dir = jnp.stack([op[0], op[1], jnp.zeros((), dtype)])
    on = _safe_norm(o_dir)
    o_u = o_dir / on
    oqn = _safe_norm(oq)

    # one-hot z axis without an array literal (pallas kernels may not
    # capture non-scalar constants)
    ez = (
        jax.lax.broadcasted_iota(jnp.int32, (3, 1), 0)[:, 0] == 2
    ).astype(dtype)

    def residual(x):
        p0, q0, v0, bs0 = x[0:3], x[3:6], x[6:9], x[9:15]
        p1, q1, v1, bs1 = x[15:18], x[18:21], x[21:24], x[24:30]

        # ---- imu (imu_factor.h:75-87) -------------------------------
        dba = bs0[0:3] - imu_X[9:12]
        dbw = bs0[3:6] - imu_X[12:15]
        alpha = imu_X[0:3] + imu_J[0:3, 9:12] @ dba + imu_J[0:3, 12:15] @ dbw
        beta = imu_X[3:6] + imu_J[3:6, 9:12] @ dba + imu_J[3:6, 12:15] @ dbw
        gamma = imu_X[6:9] + imu_J[6:9, 12:15] @ dbw
        R_iw = _exp_so3(-q0)
        r_alpha = alpha - R_iw @ (p1 - p0 + 0.5 * g * ez * Dt * Dt - v0 * Dt)
        r_beta = beta - R_iw @ (v1 + g * ez * Dt - v0)
        r_gamma = _log_SO3(_exp_so3(-gamma) @ (R_iw @ _exp_so3(q1)))
        r_imu = imu_sqrtP @ jnp.concatenate(
            [r_alpha, r_beta, r_gamma, bs1[0:3] - bs0[0:3], bs1[3:6] - bs0[3:6]]
        )

        # ---- wheel (wheel_factor.h:39-70) ---------------------------
        R0 = _exp_so3(q0)
        R1 = _exp_so3(q1)
        Rw = Tiw[0:3, 0:3]
        pw = Tiw[0:3, 3]
        # tf_i = [R0 Rw | R0 pw + p0]; rel = tf_i^-1 tf_j
        Ri = R0 @ Rw
        Rj = R1 @ Rw
        ti = R0 @ pw + p0
        tj = R1 @ pw + p1
        rel_R = Ri.T @ Rj
        rel_p = Ri.T @ (tj - ti)
        q_rel = _log_SO3(rel_R)
        length = jnp.sqrt(rel_p[0] ** 2 + rel_p[1] ** 2 + _EPS)
        ndir = jnp.stack([rel_p[0], rel_p[1], jnp.zeros((), dtype)])
        nn = _safe_norm(ndir)
        both = (on > 1e-4) & (nn > 1e-4)
        n_u = ndir / nn
        cr = jnp.stack(
            [
                o_u[1] * n_u[2] - o_u[2] * n_u[1],
                o_u[2] * n_u[0] - o_u[0] * n_u[2],
                o_u[0] * n_u[1] - o_u[1] * n_u[0],
            ]
        )
        sinn = _safe_norm(cr)
        angle = jnp.where(both, _asin(jnp.clip(sinn, 0.0, 1.0 - 1e-6)), nn)
        degenerate = (length < 1e-4) | (o_len < 1e-4)
        r0w = jnp.where(degenerate, length, o_len - length)
        qn = _safe_norm(q_rel)
        deg_q = (qn < 1e-3) | (oqn < 1e-3)
        r2w = jnp.where(deg_q, qn, oqn - qn)
        r_wheel = jnp.stack([wheel_w[0] * r0w, wheel_w[1] * angle, wheel_w[2] * r2w])

        # ---- laser (laser_factor.h:31-88), batched over M rows ------
        T_R = R1 @ Til[0:3, 0:3]
        T_t = R1 @ Til[0:3, 3] + p1
        b1 = b1l @ T_R.T + T_t  # (M,3) world
        b2 = b2l @ T_R.T + T_t
        # z zeroed; 2D point-to-infinite-line distance to (a1,a2)
        dl = a2 - a1  # (M,2) constant
        dln = dl / jnp.sqrt(
            jnp.maximum(jnp.sum(dl * dl, -1, keepdims=True), _EPS * _EPS)
        )

        def pdist(b):
            v = b[:, 0:2] - a2
            t = jnp.sum(dln * v, -1, keepdims=True)
            perp = v - t * dln
            return jnp.sqrt(jnp.maximum(jnp.sum(perp * perp, -1), _EPS * _EPS))

        r_laser = jnp.stack([pdist(b1) * lw, pdist(b2) * lw], -1).reshape(-1)

        # ---- ground (ground_factor.h:25-89), frames 0 and 1 ---------
        def ground(p, R):
            To_R = R @ Rw
            z = (R @ pw + p)[2]
            zax = To_R[:, 2]
            sg = jnp.sqrt(jnp.maximum(zax[0] ** 2 + zax[1] ** 2, _EPS * _EPS))
            ang = _asin(jnp.clip(sg, 0.0, 1.0 - 1e-6))
            return jnp.stack([ground_p_info * z, ground_q_info * ang])

        r_ground = (
            jnp.concatenate([ground(p0, R0), ground(p1, R1)]) * ground_weight
        )

        # ---- prior on frame 0 ---------------------------------------
        r_prior = (prior_J @ (x[0:15] - prior_X)) * prior_valid

        return jnp.concatenate([r_imu, r_wheel, r_laser, r_ground, r_prior])

    return residual


# --------------------------------------------------------------------------
# in-kernel dense linear algebra (static shapes, unrolled over columns)


def _cholesky(A, n):
    """Lower Cholesky of (n,n) via n unrolled rank-1 updates (no linalg)."""
    dtype = A.dtype
    L = jnp.zeros_like(A)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    for k in range(n):
        pivot = jnp.sqrt(jnp.maximum(A[k, k], 1e-20))
        col = jnp.where(row_ids >= k, A[:, k] / pivot, jnp.zeros(n, dtype))
        L = L.at[:, k].set(col)
        A = A - col[:, None] * col[None, :]
    return L


def _solve_lower(L, b, n):
    """L y = b by forward substitution (unrolled); b (n,) or (n,m)."""
    y = jnp.zeros_like(b)
    for k in range(n):
        acc = jnp.tensordot(L[k, :k], y[:k], axes=(0, 0)) if k else 0.0
        y = y.at[k].set((b[k] - acc) / L[k, k])
    return y


def _solve_upper_t(L, b, n):
    """L^T x = b by back substitution (unrolled)."""
    x = jnp.zeros_like(b)
    for k in range(n - 1, -1, -1):
        acc = (
            jnp.tensordot(L[k + 1 :, k], x[k + 1 :], axes=(0, 0))
            if k < n - 1
            else 0.0
        )
        x = x.at[k].set((b[k] - acc) / L[k, k])
    return x


# --------------------------------------------------------------------------
# the kernel


def _kernel(
    state_ref,  # (8,128) f32: x0,free,scalars,wheel,extrinsics
    imu_ref,  # (32,128)
    prior_ref,  # (16,128)
    laser_ref,  # (M,128)
    out_ref,  # (8,128): row0 x_opt, row1 [cost, iters]
    schur_ref,  # (16,128): rows0:15 dH, row15 dg
    *,
    M: int,
    max_iters: int,
    lam_init: float,
    lam_up: float,
    lam_down: float,
    lam_min: float,
    lam_max: float,
    ftol: float,
    xtol: float,
):
    dtype = jnp.float32
    state = state_ref[:]
    imu_in = imu_ref[:]
    prior_in = prior_ref[:]
    laser_in = laser_ref[:]
    x0 = state[0, 0:D]
    free = state[1, 0:D]

    residual = _make_residual(state, imu_in, prior_in, laser_in, M)

    def linearize(x):
        # J stays UNMASKED: the Schur reduction marginalizes the frozen
        # frame-0 pose columns (gn.marginalize semantics); the damped
        # step applies the free mask when forming its normal equations
        r = residual(x)
        J = jax.jacfwd(residual)(x)
        return r, J

    def wrap(x):
        x = x.at[3:6].set(_normalize_so3(x[3:6]))
        return x.at[18:21].set(_normalize_so3(x[18:21]))

    def damped_step(H, gneg, lam):
        diag = jnp.diagonal(H)
        damped = diag + lam * jnp.maximum(diag, 1e-12)
        fm = free > 0
        outer = fm[:, None] & fm[None, :]
        A = jnp.where(outer, H, 0.0)
        ids = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)[:, 0]
        A = jnp.where(
            (ids[:, None] == ids[None, :]),
            jnp.where(fm, damped, 1.0)[:, None] * _eye(D, dtype),
            A,
        )
        b = jnp.where(fm, gneg, 0.0)
        s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(A), 1e-20))
        As = A * s[:, None] * s[None, :]
        L = _cholesky(As, D)
        y = _solve_lower(L, s * b, D)
        y = _solve_upper_t(L, y, D)
        dx = s * y * free
        ok = jnp.all(jnp.isfinite(dx))
        return jnp.where(ok, dx, jnp.zeros_like(dx))

    r0, J0 = linearize(x0)
    c0 = 0.5 * jnp.sum(r0 * r0)

    def body(_, carry):
        x, r, J, lam, c, done = carry
        Jm = J * free[None, :]
        H = jnp.dot(Jm.T, Jm, preferred_element_type=jnp.float32)
        gneg = -jnp.dot(Jm.T, r, preferred_element_type=jnp.float32)
        dx = damped_step(H, gneg, lam)
        x_t = wrap(x + dx)
        r_t, J_t = linearize(x_t)
        c_t = 0.5 * jnp.sum(r_t * r_t)
        accept = jnp.logical_and(c_t < c, jnp.logical_not(done))
        x_n = jnp.where(accept, x_t, x)
        r_n = jnp.where(accept, r_t, r)
        J_n = jnp.where(accept, J_t, J)
        c_n = jnp.where(accept, c_t, c)
        lam_n = jnp.where(
            done, lam, jnp.where(accept, lam * lam_down, lam * lam_up)
        )
        lam_n = jnp.clip(lam_n, lam_min, lam_max)
        rel_change = jnp.abs(c - c_t) / jnp.maximum(c, 1e-20)
        xtol_hit = jnp.max(jnp.abs(dx)) < xtol * (jnp.max(jnp.abs(x_n)) + xtol)
        stalled = jnp.logical_not(accept) & (lam_n >= lam_max)
        done_n = done | (rel_change < ftol) | xtol_hit | stalled
        return (x_n, r_n, J_n, lam_n, c_n, done_n)

    x, r, J, lam, c, _ = jax.lax.fori_loop(
        0,
        max_iters,
        body,
        (x0, r0, J0, jnp.asarray(lam_init, dtype), c0, jnp.asarray(False)),
    )

    # Schur reduction at the solution (gn.marginalize math, keep=15)
    H = jnp.dot(J.T, J, preferred_element_type=jnp.float32)
    gm_full = -jnp.dot(J.T, r, preferred_element_type=jnp.float32)
    Hmm = H[0:15, 0:15] + 1e-8 * _eye(15, dtype)
    rhs = jnp.concatenate([H[0:15, 15:30], gm_full[0:15, None]], axis=1)  # (15,16)
    # Jacobi equilibration before the f32 factorization (cond(Hmm) can
    # reach ~1e9; diagonal scaling keeps the Cholesky accurate)
    sm = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(Hmm), 1e-20))
    Lm = _cholesky(Hmm * sm[:, None] * sm[None, :], 15)
    sol = sm[:, None] * _solve_upper_t(
        Lm, _solve_lower(Lm, sm[:, None] * rhs, 15), 15
    )
    dH = H[15:30, 15:30] - H[15:30, 0:15] @ sol[:, 0:15]
    dg = gm_full[15:30] - H[15:30, 0:15] @ sol[:, 15]
    dH = 0.5 * (dH + dH.T)

    out = jnp.zeros((8, 128), dtype)
    out = out.at[0, 0:D].set(x)
    out = out.at[1, 0].set(c)
    out_ref[:] = out
    sc = jnp.zeros((16, 128), dtype)
    sc = sc.at[0:15, 0:15].set(dH)
    sc = sc.at[15, 0:15].set(dg)
    schur_ref[:] = sc


# --------------------------------------------------------------------------
# XLA-side packing + wrapper


def pack_inputs(x0, free, data, consts, dtype=jnp.float32):
    """Build the four kernel input arrays from pipeline FactorData.

    ``data`` is solve.factors.FactorData with the tracking layout
    (W=2, laser i_idx<0); x-independent factor quantities are evaluated
    here once (frozen ref pose line endpoints, wheel preint log, weights).
    """
    M = data.laser_l1p1.shape[0]

    state = jnp.zeros((8, 128), dtype)
    state = state.at[0, 0:D].set(x0)
    state = state.at[1, 0:D].set(free)
    op, oq = geo.log_SE3(data.wheel_dT[1])
    state = state.at[2, 0].set(data.imu_Dt[1])
    state = state.at[2, 1].set(consts.g)
    state = state.at[2, 3].set(consts.ground_p_info)
    state = state.at[2, 4].set(consts.ground_q_info)
    state = state.at[2, 5].set(data.ground_weight)
    state = state.at[2, 6].set(data.prior_valid.astype(dtype))
    state = state.at[3, 0:3].set(op)
    state = state.at[3, 3:6].set(oq)
    state = state.at[3, 6:9].set(jnp.diagonal(data.wheel_sqrt[1]))
    state = state.at[4:8, 0:4].set(consts.T_imu_to_laser)
    state = state.at[4:8, 8:12].set(consts.T_imu_to_wheel)

    imu_in = jnp.zeros((32, 128), dtype)
    imu_in = imu_in.at[0:15, 0:15].set(data.imu_J[1])
    imu_in = imu_in.at[16:31, 0:15].set(data.imu_sqrtP[1])
    imu_in = imu_in.at[15, 0:15].set(data.imu_X[1])

    prior_in = jnp.zeros((16, 128), dtype)
    prior_in = prior_in.at[0:15, 0:15].set(data.prior_J)
    prior_in = prior_in.at[15, 0:15].set(data.prior_X)

    # frozen ref-pose side of the laser factors -> world, z zeroed
    T_w_i = geo.make_tf(data.laser_ref_p[0], data.laser_ref_q[0]) @ consts.T_imu_to_laser
    a1 = geo.tf_apply(T_w_i, data.laser_l1p1)[:, 0:2]
    a2 = geo.tf_apply(T_w_i, data.laser_l1p2)[:, 0:2]
    len1 = jnp.linalg.norm(data.laser_l1p1 - data.laser_l1p2, axis=-1)
    len2 = jnp.linalg.norm(data.laser_l2p1 - data.laser_l2p2, axis=-1)
    wsum = jnp.sqrt(jnp.maximum(jnp.minimum(len1, len2) / 2.0 / 0.02, _EPS))
    lw = wsum * consts.laser_sqrt_info * data.laser_valid.astype(dtype)

    laser_in = jnp.zeros((M, 128), dtype)
    laser_in = laser_in.at[:, 0:2].set(a1)
    laser_in = laser_in.at[:, 2:4].set(a2)
    laser_in = laser_in.at[:, 4:7].set(data.laser_l2p1)
    laser_in = laser_in.at[:, 7:10].set(data.laser_l2p2)
    laser_in = laser_in.at[:, 10].set(lw)
    return state, imu_in, prior_in, laser_in


@functools.partial(
    jax.jit, static_argnames=("max_iters", "ftol", "xtol", "interpret")
)
def lm_solve_track(
    x0,
    free,
    data,
    consts,
    *,
    max_iters: int = 10,
    ftol: float = 3e-4,
    xtol: float = 1e-7,
    interpret: bool = False,
):
    """One-kernel tracking solve.  Returns (x_opt, cost, dH (15,15), dg (15,)).

    dH/dg are the Schur-reduced information/gradient at the solution
    (feed to gn.sqrt_prior for the marginalization prior).
    """
    state, imu_in, prior_in, laser_in = pack_inputs(x0, free, data, consts)
    M = laser_in.shape[0]
    kern = functools.partial(
        _kernel,
        M=M,
        max_iters=max_iters,
        lam_init=1e-4,
        lam_up=4.0,
        lam_down=0.33,
        lam_min=1e-10,
        lam_max=1e8,
        ftol=ftol,
        xtol=xtol,
    )
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out, schur = pl.pallas_call(
        kern,
        in_specs=[vm(), vm(), vm(), vm()],
        out_specs=[vm(), vm()],
        out_shape=[
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((16, 128), jnp.float32),
        ],
        interpret=interpret,
    )(state, imu_in, prior_in, laser_in)
    x_opt = out[0, 0:D]
    cost = out[1, 0]
    dH = schur[0:15, 0:15]
    dg = schur[15, 0:15]
    return x_opt, cost, dH, dg
