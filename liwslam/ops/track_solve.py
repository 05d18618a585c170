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



def _mv(A, v):
    """Matrix-vector product as broadcast-multiply + sum.  Mosaic lowers
    small dot_general matvecs to vector.multi_reduction with a fused
    (non-constant) accumulator, which its compiler rejects ("only
    constant accumulators supported"); mul+sum keeps the accumulator a
    constant zero."""
    return jnp.sum(A * v[None, :], axis=1)


# --------------------------------------------------------------------------
# scalar-tuple 3x3 algebra.
#
# Inside the kernel the residual is differentiated with jax.jacfwd, whose
# internal vmap gives every x-DEPENDENT intermediate an extra 30-wide
# tangent axis.  A (3,3) matrix intermediate then becomes a (3,30,3)
# batched-matmul operand, and Mosaic cannot lower the relayout reshapes
# that produces ("unsupported shape cast (3,30,3)->(3,90)").  Representing
# every small matrix as a NESTED TUPLE OF 0-d SCALARS keeps all vmapped
# intermediates rank <= 2 (scalars -> (30,) tangents, (M,) rows -> (M,30)),
# which Mosaic handles.  Vectors are plain python 3-tuples of scalars.


def _t_exp_so3(wx, wy, wz):
    """Rodrigues formula, entries as scalars; same guards as _exp_so3."""
    theta2 = wx * wx + wy * wy + wz * wz
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(
        small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta * theta)
    )
    one = jnp.ones_like(wx)
    # K and K@K entries written out
    return (
        (
            one + b * (-(wy * wy + wz * wz)),
            a * (-wz) + b * (wx * wy),
            a * wy + b * (wx * wz),
        ),
        (
            a * wz + b * (wx * wy),
            one + b * (-(wx * wx + wz * wz)),
            a * (-wx) + b * (wy * wz),
        ),
        (
            a * (-wy) + b * (wx * wz),
            a * wx + b * (wy * wz),
            one + b * (-(wx * wx + wy * wy)),
        ),
    )


def _t_mm(A, B):
    return tuple(
        tuple(
            sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3)
        )
        for i in range(3)
    )


def _t_mt(A):
    return tuple(tuple(A[j][i] for j in range(3)) for i in range(3))


def _t_mv(A, v):
    return tuple(sum(A[i][k] * v[k] for k in range(3)) for i in range(3))


def _t_log_SO3(R):
    """log SO(3) -> scalar triple; ports _quat_from_mat + _log_SO3."""
    m00, m01, m02 = R[0]
    m10, m11, m12 = R[1]
    m20, m21, m22 = R[2]
    tr = m00 + m11 + m22

    def ssqrt(v):
        return jnp.sqrt(jnp.maximum(v, _EPS))

    s0 = ssqrt(1.0 + tr) * 2.0
    c0 = (0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0)
    s1 = ssqrt(1.0 + m00 - m11 - m22) * 2.0
    c1 = ((m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1)
    s2 = ssqrt(1.0 + m11 - m00 - m22) * 2.0
    c2 = ((m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2)
    s3 = ssqrt(1.0 + m22 - m00 - m11) * 2.0
    c3 = ((m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3)
    b0 = (tr >= m00) & (tr >= m11) & (tr >= m22)
    b1 = jnp.logical_not(b0) & (m00 >= m11) & (m00 >= m22)
    b2 = jnp.logical_not(b0) & jnp.logical_not(b1) & (m11 >= m22)
    q = tuple(
        jnp.where(b0, c0[i], jnp.where(b1, c1[i], jnp.where(b2, c2[i], c3[i])))
        for i in range(4)
    )
    qq = q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3]
    inv = 1.0 / jnp.sqrt(jnp.maximum(qq, _EPS))
    sign = jnp.where(q[0] * inv < 0, -1.0, 1.0)
    qw = q[0] * inv * sign
    qv = (q[1] * inv * sign, q[2] * inv * sign, q[3] * inv * sign)
    sh2 = qv[0] * qv[0] + qv[1] * qv[1] + qv[2] * qv[2]
    sin_half = jnp.sqrt(jnp.maximum(sh2, _EPS * _EPS))
    angle = 2.0 * _asin(jnp.clip(sin_half, 0.0, 1.0))
    small = sin_half < _EPS
    scale = jnp.where(small, 2.0, angle / jnp.maximum(sin_half, _EPS))
    return (scale * qv[0], scale * qv[1], scale * qv[2])


def _t_norm(v):
    return jnp.sqrt(jnp.maximum(v[0] * v[0] + v[1] * v[1] + v[2] * v[2], _EPS * _EPS))


def _make_residual(state, imu_in, prior_in, laser_in, M):
    """Build residual(x) -> per-factor blocks, closed over the packed data
    refs' VALUES (read once in the kernel body).

    Blocks (mixed rank; scalars where the factor row is a scalar):
        r_imu (15,), wheel w0/w1/w2 (0-d), laser r_l1/r_l2 (M,),
        ground g0p/g0q/g1p/g1q (0-d), r_prior (15,).
    Residual ROW ORDER relative to the reference stack is irrelevant:
    the kernel only forms sum_b J_b^T J_b, J_b^T r_b and sum |r_b|^2.
    """
    # LAYOUT RULE (Mosaic): 1-D row extractions arr[r, a:b] are only
    # legal from rows r = 0 (mod 8) — a row vector gets a 1-row tile and
    # the sublane offset must be 0 (layout.h check `offset < tiling`
    # aborts otherwise).  2-D slices tile (8,128) and may start anywhere
    # with offset < 8.  Hence every 1-D-read row below sits at 0/8/16/32.
    scal = state[16, 0:8]
    Dt = scal[0]
    g = scal[1]
    ground_p_info = scal[3]
    ground_q_info = scal[4]
    ground_weight = scal[5]
    prior_valid = scal[6]
    wheel_row = state[8, 0:9]
    opx, opy = wheel_row[0], wheel_row[1]
    oq = (wheel_row[3], wheel_row[4], wheel_row[5])
    wheel_w = (wheel_row[6], wheel_row[7], wheel_row[8])
    TilM = state[4:8, 0:4]
    TiwM = state[4:8, 8:12]
    Til = tuple(tuple(TilM[i, j] for j in range(3)) for i in range(3))
    til_t = (TilM[0, 3], TilM[1, 3], TilM[2, 3])
    Rw = tuple(tuple(TiwM[i, j] for j in range(3)) for i in range(3))
    pw = (TiwM[0, 3], TiwM[1, 3], TiwM[2, 3])
    imu_J = imu_in[0:15, 0:15]
    imu_sqrtP = imu_in[16:31, 0:15]
    imu_X = imu_in[32, 0:15]
    prior_J = prior_in[0:15, 0:15]
    prior_X = prior_in[16, 0:15]
    a2x, a2y = laser_in[:, 2], laser_in[:, 3]  # (M,) ref endpoints, world
    dlx = a2x - laser_in[:, 0]
    dly = a2y - laser_in[:, 1]
    b1lx, b1ly, b1lz = laser_in[:, 4], laser_in[:, 5], laser_in[:, 6]
    b2lx, b2ly, b2lz = laser_in[:, 7], laser_in[:, 8], laser_in[:, 9]
    lw = laser_in[:, 10]  # (M,) combined row weight (0 for invalid)
    dn = jnp.sqrt(jnp.maximum(dlx * dlx + dly * dly, _EPS * _EPS))
    dlnx, dlny = dlx / dn, dly / dn

    # x-independent wheel quantities (sensor.h wheel preint log)
    o_len = jnp.sqrt(opx * opx + opy * opy + _EPS)
    on = jnp.sqrt(jnp.maximum(opx * opx + opy * opy, _EPS * _EPS))
    o_u = (opx / on, opy / on, jnp.zeros_like(opx))
    oqn = _t_norm(oq)

    def residual(x):
        p0 = (x[0], x[1], x[2])
        v0 = (x[6], x[7], x[8])
        bs0 = (x[9], x[10], x[11], x[12], x[13], x[14])
        p1 = (x[15], x[16], x[17])
        v1 = (x[21], x[22], x[23])
        bs1 = (x[24], x[25], x[26], x[27], x[28], x[29])

        # ---- imu (imu_factor.h:75-87) -------------------------------
        dba = (x[9] - imu_X[9], x[10] - imu_X[10], x[11] - imu_X[11])
        dbw = (x[12] - imu_X[12], x[13] - imu_X[13], x[14] - imu_X[14])
        def corr(i):
            return imu_X[i] + sum(
                imu_J[i, 9 + k] * dba[k] + imu_J[i, 12 + k] * dbw[k]
                for k in range(3)
            ) if i < 6 else imu_X[i] + sum(
                imu_J[i, 12 + k] * dbw[k] for k in range(3)
            )
        alpha = (corr(0), corr(1), corr(2))
        beta = (corr(3), corr(4), corr(5))
        gamma = (corr(6), corr(7), corr(8))
        R_iw = _t_exp_so3(-x[3], -x[4], -x[5])
        va = (
            p1[0] - p0[0] - v0[0] * Dt,
            p1[1] - p0[1] - v0[1] * Dt,
            p1[2] - p0[2] - v0[2] * Dt + 0.5 * g * Dt * Dt,
        )
        vb = (v1[0] - v0[0], v1[1] - v0[1], v1[2] - v0[2] + g * Dt)
        Ra = _t_mv(R_iw, va)
        Rb = _t_mv(R_iw, vb)
        r_gamma = _t_log_SO3(
            _t_mm(
                _t_exp_so3(-gamma[0], -gamma[1], -gamma[2]),
                _t_mm(R_iw, _t_exp_so3(x[18], x[19], x[20])),
            )
        )
        sca = (
            alpha[0] - Ra[0], alpha[1] - Ra[1], alpha[2] - Ra[2],
            beta[0] - Rb[0], beta[1] - Rb[1], beta[2] - Rb[2],
            r_gamma[0], r_gamma[1], r_gamma[2],
            bs1[0] - bs0[0], bs1[1] - bs0[1], bs1[2] - bs0[2],
            bs1[3] - bs0[3], bs1[4] - bs0[4], bs1[5] - bs0[5],
        )
        # sqrtP @ raw as a column-weighted sum of scalars: the stacked
        # (15,) raw vector never exists (no unaligned 1-D concatenation)
        r_imu = sum(imu_sqrtP[:, k] * sca[k] for k in range(15))

        # ---- wheel (wheel_factor.h:39-70) ---------------------------
        R0 = _t_exp_so3(x[3], x[4], x[5])
        R1 = _t_exp_so3(x[18], x[19], x[20])
        Ri = _t_mm(R0, Rw)
        Rj = _t_mm(R1, Rw)
        t0 = _t_mv(R0, pw)
        t1 = _t_mv(R1, pw)
        d = (
            t1[0] + p1[0] - t0[0] - p0[0],
            t1[1] + p1[1] - t0[1] - p0[1],
            t1[2] + p1[2] - t0[2] - p0[2],
        )
        RiT = _t_mt(Ri)
        rel_R = _t_mm(RiT, Rj)
        rel_p = _t_mv(RiT, d)
        q_rel = _t_log_SO3(rel_R)
        length = jnp.sqrt(rel_p[0] ** 2 + rel_p[1] ** 2 + _EPS)
        ndir = (rel_p[0], rel_p[1], jnp.zeros_like(rel_p[0]))
        nn = _t_norm(ndir)
        both = (on > 1e-4) & (nn > 1e-4)
        n_u = (ndir[0] / nn, ndir[1] / nn, ndir[2] / nn)
        cr = (
            o_u[1] * n_u[2] - o_u[2] * n_u[1],
            o_u[2] * n_u[0] - o_u[0] * n_u[2],
            o_u[0] * n_u[1] - o_u[1] * n_u[0],
        )
        sinn = _t_norm(cr)
        angle = jnp.where(both, _asin(jnp.clip(sinn, 0.0, 1.0 - 1e-6)), nn)
        degenerate = (length < 1e-4) | (o_len < 1e-4)
        r0w = jnp.where(degenerate, length, o_len - length)
        qn = _t_norm(q_rel)
        deg_q = (qn < 1e-3) | (oqn < 1e-3)
        r2w = jnp.where(deg_q, qn, oqn - qn)
        w0 = wheel_w[0] * r0w
        w1 = wheel_w[1] * angle
        w2 = wheel_w[2] * r2w

        # ---- laser (laser_factor.h:31-88), batched over M rows ------
        T_R = _t_mm(R1, Til)
        tt = _t_mv(R1, til_t)
        T_t = (tt[0] + p1[0], tt[1] + p1[1])

        def pdist(blx, bly, blz):
            bx = T_R[0][0] * blx + T_R[0][1] * bly + T_R[0][2] * blz + T_t[0]
            by = T_R[1][0] * blx + T_R[1][1] * bly + T_R[1][2] * blz + T_t[1]
            vx = bx - a2x
            vy = by - a2y
            t = dlnx * vx + dlny * vy
            px = vx - t * dlnx
            py = vy - t * dlny
            return jnp.sqrt(jnp.maximum(px * px + py * py, _EPS * _EPS))

        # two separate (M,) blocks (endpoint 1 / endpoint 2), not the
        # reference's interleaved (2M,) layout
        r_l1 = pdist(b1lx, b1ly, b1lz) * lw
        r_l2 = pdist(b2lx, b2ly, b2lz) * lw

        # ---- ground (ground_factor.h:25-89), frames 0 and 1 ---------
        def ground(p, R):
            Rp = _t_mv(R, pw)
            z = Rp[2] + p[2]
            To_R = _t_mm(R, Rw)
            sg = jnp.sqrt(
                jnp.maximum(
                    To_R[0][2] * To_R[0][2] + To_R[1][2] * To_R[1][2],
                    _EPS * _EPS,
                )
            )
            ang = _asin(jnp.clip(sg, 0.0, 1.0 - 1e-6))
            return (
                ground_p_info * z * ground_weight,
                ground_q_info * ang * ground_weight,
            )

        g0p, g0q = ground(p0, R0)
        g1p, g1q = ground(p1, R1)

        # ---- prior on frame 0 ---------------------------------------
        r_prior = sum(
            prior_J[:, k] * (x[k] - prior_X[k]) for k in range(15)
        ) * prior_valid

        # per-factor blocks; the kernel accumulates sum_b J_b^T J_b /
        # J_b^T r_b, so the stacked vector never exists on device
        return (r_imu, w0, w1, w2, r_l1, r_l2, g0p, g0q, g1p, g1q, r_prior)

    return residual


# --------------------------------------------------------------------------
# in-kernel dense linear algebra (static shapes, unrolled over columns)


def _masked_row_write(y, k, val, n):
    """y with row k replaced by val — mask select, NOT .at[] (Mosaic has no
    scatter; even static-index column/row updates lower to lax.scatter)."""
    if y.ndim == 1:
        ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        return jnp.where(ids == k, val, y)
    # 2-D iota compare, NOT bool[:, None]: Mosaic can't insert a minor
    # dim on i1 vectors ("only supported for 32-bit types")
    ids2 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    return jnp.where(ids2 == k, val[None, :], y)


def _diag(A):
    """Diagonal of a square matrix via mask+reduce (jnp.diagonal lowers to
    a gather Mosaic cannot handle)."""
    n = A.shape[0]
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.sum(jnp.where(ii == jj, A, 0.0), axis=1)


def _cholesky(A, n, skip=()):
    """Lower Cholesky of (n,n) via unrolled rank-1 updates (no linalg).

    ``skip``: STATICALLY-frozen dims whose rows/cols of A are identity
    (the damped step masks them so); their pivot steps are exact no-ops
    (L column = e_k, zero rank-1 update), so eliding them cuts the
    sequential-depth-dominated solve (30 -> 24 steps full mode, 18 in
    fast_mode — the per-LM-iteration cost is this unrolled chain)."""
    dtype = A.dtype
    skip = frozenset(skip)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    L = jnp.zeros_like(A)
    if skip:
        # identity columns for the skipped dims (no i1 transposes —
        # Mosaic has no lowering for them)
        ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        for k in sorted(skip):
            L = jnp.where((ii == k) & (col_ids == k), 1.0, L)
    for k in range(n):
        if k in skip:
            continue
        pivot = jnp.sqrt(jnp.maximum(A[k, k], 1e-20))
        col = jnp.where(row_ids >= k, A[:, k] / pivot, jnp.zeros(n, dtype))
        L = jnp.where(col_ids == k, col[:, None], L)
        A = A - col[:, None] * col[None, :]
    return L


def _row_of(A, k, n):
    """Row k of (n,m) A via mask+reduce.  Direct row extraction A[k] has
    an unaligned sublane offset (illegal for k % 8 != 0) and sliced-row
    reductions hit Mosaic's "Offset change" hole — always reduce the
    full-size array instead."""
    ii = jax.lax.broadcasted_iota(jnp.int32, A.shape, 0)
    return jnp.sum(jnp.where(ii == k, A, 0.0), axis=0)


def _sum1d(v):
    """Full sum of a 1-D f32 vector via a SUBLANE reduction.  Lane-axis
    reductions of short 1-D vectors trip Mosaic's fused non-constant
    accumulator ("Offset change" / "only constant accumulators"); f32
    minor-dim insertion + axis-0 reduction lowers cleanly."""
    return jnp.sum(v[:, None], axis=0)[0]


def _max1d(v):
    return jnp.max(v[:, None], axis=0)[0]


def _masked_dot(w, y):
    """sum_j w[j]*y[j,:] with FULL-SIZE operands (w zero outside the
    active range); y (n,) or (n,m)."""
    if y.ndim == 1:
        return _sum1d(w * y)
    return jnp.sum(w[:, None] * y, axis=0)


def _solve_lower(L, b, n, skip=()):
    """L y = b by forward substitution (unrolled); b (n,) or (n,m).
    All per-step operands stay full-size (masked), never sliced.
    ``skip`` dims have b[k] == 0 and L column e_k -> y[k] stays 0."""
    skip = frozenset(skip)
    ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    y = jnp.zeros_like(b)
    for k in range(n):
        if k in skip:
            continue
        w = jnp.where(ids < k, _row_of(L, k, n), 0.0)
        acc = _masked_dot(w, y)
        bk = b[k] if b.ndim == 1 else _row_of(b, k, n)
        y = _masked_row_write(y, k, (bk - acc) / L[k, k], n)
    return y


def _solve_upper_t(L, b, n, skip=()):
    """L^T x = b by back substitution (unrolled)."""
    skip = frozenset(skip)
    ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    x = jnp.zeros_like(b)
    for k in range(n - 1, -1, -1):
        if k in skip:
            continue
        w = jnp.where(ids > k, L[:, k], 0.0)
        acc = _masked_dot(w, x)
        bk = b[k] if b.ndim == 1 else _row_of(b, k, n)
        x = _masked_row_write(x, k, (bk - acc) / L[k, k], n)
    return x


# --------------------------------------------------------------------------
# the kernel


def _kernel(
    state_ref,  # (32,128) f32: row0 x0, rows4:8 extrinsics, row8 wheel,
    #             row16 scalars, row24 free (1-D-read rows at mult of 8)
    imu_ref,  # (40,128): rows0:15 J, rows16:31 sqrtP, row32 X
    prior_ref,  # (24,128): rows0:15 J, row16 X
    laser_ref,  # (M,128)
    out_ref,  # (16,128): row0 x_opt, row8 lane0 cost
    schur_ref,  # (24,128): rows0:15 dH, row16 dg
    *,
    M: int,
    max_iters: int,
    frozen_dims: tuple,
    lam_init: float,
    lam_up: float,
    lam_down: float,
    lam_min: float,
    lam_max: float,
    ftol: float,
    xtol: float,
    early_exit: bool,
):
    dtype = jnp.float32
    state = state_ref[:]
    imu_in = imu_ref[:]
    prior_in = prior_ref[:]
    laser_in = laser_ref[:]
    x0 = state[0, 0:D]
    free = state[24, 0:D]

    residual = _make_residual(state, imu_in, prior_in, laser_in, M)

    def linearize(x):
        # J stays UNMASKED: the Schur reduction marginalizes the frozen
        # frame-0 pose columns (gn.marginalize semantics); the damped
        # step applies the free mask when forming its normal equations.
        # r and J are TUPLES of per-factor blocks — the stacked residual
        # vector never exists (Mosaic cannot concatenate unaligned 1-D
        # vectors); H/g accumulate block-wise below.
        r = residual(x)
        J = jax.jacfwd(residual)(x)
        return r, J

    def cost_of(r):
        return 0.5 * sum(
            b * b if b.ndim == 0 else _sum1d(b * b) for b in r
        )

    def normal_eqs(r, J, mask_cols):
        # blocks are mixed rank: a 0-d residual's "Jacobian" is its (D,)
        # gradient; a (R,) block has a (R,D) Jacobian
        Hs, gs = [], []
        for rb, Jb in zip(r, J):
            if Jb.ndim == 1:
                Jm = Jb * free if mask_cols else Jb
                Hs.append(Jm[:, None] * Jm[None, :])
                gs.append(-(Jm * rb))
            else:
                Jm = Jb * free[None, :] if mask_cols else Jb
                Hs.append(
                    jnp.dot(Jm.T, Jm, preferred_element_type=jnp.float32)
                )
                gs.append(-jnp.sum(Jm * rb[:, None], axis=0))
        return sum(Hs), sum(gs)

    def _so3_wrap_scale(wx, wy, wz):
        theta = jnp.sqrt(
            jnp.maximum(wx * wx + wy * wy + wz * wz, _EPS * _EPS)
        )
        two_pi = 2.0 * jnp.pi
        wrapped = theta - two_pi * jnp.floor((theta + jnp.pi) / two_pi)
        return jnp.where(theta > jnp.pi, wrapped / theta, 1.0)

    def wrap(x):
        # so3 normalization is a scalar rescale of each rotation block, so
        # apply it as one masked elementwise multiply (no concatenation)
        s1 = _so3_wrap_scale(x[3], x[4], x[5])
        s2 = _so3_wrap_scale(x[18], x[19], x[20])
        ids = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)[:, 0]
        mult = jnp.where(
            (ids >= 3) & (ids < 6),
            s1,
            jnp.where((ids >= 18) & (ids < 21), s2, 1.0),
        )
        return x * mult

    def damped_step(H, gneg, lam):
        diag = _diag(H)
        damped = diag + lam * jnp.maximum(diag, 1e-12)
        fm = free > 0
        # f32 mask product, not bool[:, None] (no i1 minor-dim insertion)
        A = H * (free[:, None] * free[None, :])
        ids = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)[:, 0]
        A = jnp.where(
            (ids[:, None] == ids[None, :]),
            jnp.where(fm, damped, 1.0)[:, None] * _eye(D, dtype),
            A,
        )
        b = jnp.where(fm, gneg, 0.0)
        s = 1.0 / jnp.sqrt(jnp.maximum(_diag(A), 1e-20))
        As = A * s[:, None] * s[None, :]
        # statically-frozen dims are identity rows of As with zero rhs:
        # their factorization/substitution steps are exact no-ops
        L = _cholesky(As, D, skip=frozen_dims)
        y = _solve_lower(L, s * b, D, skip=frozen_dims)
        y = _solve_upper_t(L, y, D, skip=frozen_dims)
        dx = s * y * free
        bad = jnp.where(jnp.isfinite(dx), 0.0, 1.0)
        ok = _sum1d(bad) < 0.5
        return jnp.where(ok, dx, jnp.zeros_like(dx))

    r0, J0 = linearize(x0)
    c0 = cost_of(r0)

    def body(_, carry):
        x, r, J, lam, c, done = carry
        H, gneg = normal_eqs(r, J, mask_cols=True)
        dx = damped_step(H, gneg, lam)
        x_t = wrap(x + dx)
        r_t, J_t = linearize(x_t)
        c_t = cost_of(r_t)
        accept = jnp.logical_and(c_t < c, jnp.logical_not(done))
        sel = lambda a, b: jax.tree_util.tree_map(
            lambda u, v: jnp.where(accept, u, v), a, b
        )
        x_n = jnp.where(accept, x_t, x)
        r_n = sel(r_t, r)
        J_n = sel(J_t, J)
        c_n = jnp.where(accept, c_t, c)
        lam_n = jnp.where(
            done, lam, jnp.where(accept, lam * lam_down, lam * lam_up)
        )
        lam_n = jnp.clip(lam_n, lam_min, lam_max)
        rel_change = jnp.abs(c - c_t) / jnp.maximum(c, 1e-20)
        xtol_hit = _max1d(jnp.abs(dx)) < xtol * (_max1d(jnp.abs(x_n)) + xtol)
        stalled = jnp.logical_not(accept) & (lam_n >= lam_max)
        done_n = done | (rel_change < ftol) | xtol_hit | stalled
        return (x_n, r_n, J_n, lam_n, c_n, done_n)

    carry0 = (x0, r0, J0, jnp.asarray(lam_init, dtype), c0, jnp.asarray(False))
    if early_exit:
        # in-kernel while_loop: once converged (done), STOP instead of
        # running frozen no-op iterations — real frames converge in ~3
        # LM iterations (CLAUDE.md) while max_iters=8, so the fixed-trip
        # fori form wasted more than half the per-frame solve time.
        # The loop body freezes all state once done, so exiting at the
        # first done iteration yields the identical final carry.
        def cond_fn(ic):
            i, carry = ic
            return jnp.logical_and(i < max_iters, jnp.logical_not(carry[-1]))

        def body_w(ic):
            i, carry = ic
            return (i + 1, body(i, carry))

        _, (x, r, J, lam, c, _) = jax.lax.while_loop(
            cond_fn, body_w, (jnp.asarray(0, jnp.int32), carry0)
        )
    else:
        x, r, J, lam, c, _ = jax.lax.fori_loop(0, max_iters, body, carry0)

    # Schur reduction at the solution (gn.marginalize math, keep=15)
    H, gm_full = normal_eqs(r, J, mask_cols=False)  # gm_full = -J^T r
    Hmm = H[0:15, 0:15] + 1e-8 * _eye(15, dtype)
    # Jacobi equilibration before the f32 factorization (cond(Hmm) can
    # reach ~1e9; diagonal scaling keeps the Cholesky accurate)
    sm = 1.0 / jnp.sqrt(jnp.maximum(_diag(Hmm), 1e-20))
    Lm = _cholesky(Hmm * sm[:, None] * sm[None, :], 15)
    # two solves sharing the factorization (no (15,16) rhs concatenation)
    solX = sm[:, None] * _solve_upper_t(
        Lm, _solve_lower(Lm, sm[:, None] * H[0:15, 15:30], 15), 15
    )
    solg = sm * _solve_upper_t(
        Lm, _solve_lower(Lm, sm * gm_full[0:15], 15), 15
    )
    dH = H[15:30, 15:30] - H[15:30, 0:15] @ solX
    dg = gm_full[15:30] - _mv(H[15:30, 0:15], solg)
    dH = 0.5 * (dH + dH.T)

    # partial ref stores at aligned offsets (no concatenation padding);
    # the XLA wrapper only reads the lanes written here.  1-D row stores
    # obey the same row ≡ 0 (mod 8) rule as row reads.
    out_ref[0, 0:D] = x
    out_ref[8, 0:1] = c[None]
    schur_ref[0:15, 0:15] = dH
    schur_ref[16, 0:15] = dg


# --------------------------------------------------------------------------
# XLA-side packing + wrapper


def pack_inputs(x0, free, data, consts, dtype=jnp.float32):
    """Build the four kernel input arrays from pipeline FactorData.

    ``data`` is solve.factors.FactorData with the tracking layout
    (W=2, laser i_idx<0); x-independent factor quantities are evaluated
    here once (frozen ref pose line endpoints, wheel preint log, weights).
    """
    M = data.laser_l1p1.shape[0]

    # row placement must mirror _make_residual/_kernel reads: rows read
    # as 1-D vectors in-kernel sit at multiples of 8 (Mosaic layout rule)
    state = jnp.zeros((32, 128), dtype)
    state = state.at[0, 0:D].set(x0)
    state = state.at[24, 0:D].set(free)
    op, oq = geo.log_SE3(data.wheel_dT[1])
    state = state.at[16, 0].set(data.imu_Dt[1])
    state = state.at[16, 1].set(consts.g)
    state = state.at[16, 3].set(consts.ground_p_info)
    state = state.at[16, 4].set(consts.ground_q_info)
    state = state.at[16, 5].set(data.ground_weight)
    state = state.at[16, 6].set(data.prior_valid.astype(dtype))
    state = state.at[8, 0:3].set(op)
    state = state.at[8, 3:6].set(oq)
    state = state.at[8, 6:9].set(jnp.diagonal(data.wheel_sqrt[1]))
    state = state.at[4:8, 0:4].set(consts.T_imu_to_laser)
    state = state.at[4:8, 8:12].set(consts.T_imu_to_wheel)

    imu_in = jnp.zeros((40, 128), dtype)
    imu_in = imu_in.at[0:15, 0:15].set(data.imu_J[1])
    imu_in = imu_in.at[16:31, 0:15].set(data.imu_sqrtP[1])
    imu_in = imu_in.at[32, 0:15].set(data.imu_X[1])

    prior_in = jnp.zeros((24, 128), dtype)
    prior_in = prior_in.at[0:15, 0:15].set(data.prior_J)
    prior_in = prior_in.at[16, 0:15].set(data.prior_X)

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
    jax.jit,
    static_argnames=(
        "max_iters", "ftol", "xtol", "interpret", "early_exit", "frozen_dims"
    ),
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
    early_exit: bool = True,
    frozen_dims: tuple = (0, 1, 2, 3, 4, 5),
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
        frozen_dims=tuple(frozen_dims),
        lam_init=1e-4,
        lam_up=4.0,
        lam_down=0.33,
        lam_min=1e-10,
        lam_max=1e8,
        ftol=ftol,
        xtol=xtol,
        early_exit=early_exit,
    )
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out, schur = pl.pallas_call(
        kern,
        in_specs=[vm(), vm(), vm(), vm()],
        out_specs=[vm(), vm()],
        out_shape=[
            jax.ShapeDtypeStruct((16, 128), jnp.float32),
            jax.ShapeDtypeStruct((24, 128), jnp.float32),
        ],
        # the unrolled jacfwd + 30-step solves need ~16.4M scoped vmem,
        # just over the 16M default; the chip has 128M
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(state, imu_in, prior_in, laser_in)
    x_opt = out[0, 0:D]
    cost = out[8, 0]
    dH = schur[0:15, 0:15]
    dg = schur[16, 0:15]
    return x_opt, cost, dH, dg
