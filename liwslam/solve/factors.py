"""Batched factor residuals over a fixed-capacity sliding window.

Every Ceres auto-diff functor of the reference (``src/factor/*.h``) becomes
a vmapped residual function over struct-of-array states; ``jax.jacfwd`` of
the stacked residual replaces Ceres autodiff, one masked LM loop replaces
both ``ceres::Problem``s (``solver.cpp:631-820``, ``solver.cpp:50-169``).

Residual parity notes (file:line refer to the reference):

- imu_factor.h:75-87 — VINS-style preintegration residual with first-order
  bias repair, gravity ``g*(0,0,1)``, whitened by ``sqrt_inverse_P``.
- wheel_factor.h:39-70 — [arc-length, direction-angle, yaw-norm] residual,
  deliberately slip-invariant via the huge configured lateral sigma.
- laser_factor.h:31-88 — point-to-line distances of both endpoints of the
  new line to the matched reference line, z zeroed, length-weighted.
- ground_factor.h:25-89 — wheel-frame height and tilt penalties.
- marginalization_factor.h:50 — the prior is ``J_lin (X - X_lin)``; the
  constant residual term is commented out in the reference.  We reproduce
  that (flag ``PRIOR_WITH_RESIDUAL`` enables the honest version).
- edge_factor.h:79-126 — SE3-log relative-pose residual for the pose graph.
  (edge_noise at edge_factor.h:19 writes ``J(1,2)`` — an obvious typo for
  ``J(1,1)``; we build the intended diagonal.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from liwslam.core import geometry as geo
from liwslam.core import hostmath

_EPS = 1e-8

# state block layout within one frame's 15-vector: [p, q, v, bs]
SP = slice(0, 3)
SQ = slice(3, 6)
SV = slice(6, 9)
SBS = slice(9, 15)
FRAME_DIM = 15


class WindowState(NamedTuple):
    """Sliding window state (frame_info p/q/v/bs, trajectory_type.h:9-75)."""

    p: jnp.ndarray  # (W,3)
    q: jnp.ndarray  # (W,3)
    v: jnp.ndarray  # (W,3)
    bs: jnp.ndarray  # (W,6)

    def flat(self):
        return jnp.concatenate([self.p, self.q, self.v, self.bs], -1).reshape(-1)

    @staticmethod
    def from_flat(x, W):
        f = x.reshape(W, FRAME_DIM)
        return WindowState(p=f[:, SP], q=f[:, SQ], v=f[:, SV], bs=f[:, SBS])


class SolveConsts(NamedTuple):
    """Device-resident constants (extrinsics + sigmas) — arrays so changing
    them never recompiles."""

    T_imu_to_wheel: jnp.ndarray  # (4,4)
    T_imu_to_laser: jnp.ndarray  # (4,4)
    g: jnp.ndarray  # ()
    laser_sqrt_info: jnp.ndarray  # () = 1/line_to_line_sigma
    ground_p_info: jnp.ndarray  # () = 1/manifold_p_sigma
    ground_q_info: jnp.ndarray  # () = 1/manifold_q_sigma


@hostmath.setup_fn
def make_consts(params, dtype=jnp.float32) -> SolveConsts:
    return SolveConsts(
        T_imu_to_wheel=jnp.asarray(params.mat_T_imu_to_wheel(), dtype),
        T_imu_to_laser=jnp.asarray(params.mat_T_imu_to_laser(), dtype),
        g=jnp.asarray(params.g, dtype),
        laser_sqrt_info=jnp.asarray(1.0 / params.line_to_line_sigma, dtype),
        ground_p_info=jnp.asarray(1.0 / params.manifold_p_sigma, dtype),
        ground_q_info=jnp.asarray(1.0 / params.manifold_q_sigma, dtype),
    )


class FactorData(NamedTuple):
    """All measurements binding one window solve (masked, fixed shapes)."""

    # IMU preintegration between frame i-1 and i (row i; row 0 unused)
    imu_X: jnp.ndarray  # (W,15)
    imu_J: jnp.ndarray  # (W,15,15)
    imu_sqrtP: jnp.ndarray  # (W,15,15)
    imu_Dt: jnp.ndarray  # (W,)
    imu_valid: jnp.ndarray  # (W,) bool
    # wheel preintegration between frame i-1 and i
    wheel_dT: jnp.ndarray  # (W,4,4)
    wheel_sqrt: jnp.ndarray  # (W,3,3)
    wheel_valid: jnp.ndarray  # (W,)
    # laser line matches: new line (frame j) matched to ref line.  The ref
    # side is either a frozen pose (i_idx < 0, stored in ref_p/ref_q) or a
    # window frame (i_idx >= 0, init_solve style)
    laser_l1p1: jnp.ndarray  # (M,3) ref-line endpoints (ref laser frame)
    laser_l1p2: jnp.ndarray  # (M,3)
    laser_l2p1: jnp.ndarray  # (M,3) new-line endpoints (own laser frame)
    laser_l2p2: jnp.ndarray  # (M,3)
    laser_i_idx: jnp.ndarray  # (M,) int32
    laser_j_idx: jnp.ndarray  # (M,) int32
    laser_ref_p: jnp.ndarray  # (M,3) frozen ref pose (used when i_idx<0)
    laser_ref_q: jnp.ndarray  # (M,3)
    laser_valid: jnp.ndarray  # (M,)
    # ground factors: per-frame weight (the reference adds each frame's
    # factor n times -> weight sqrt(n), solver.cpp:727-743)
    ground_weight: jnp.ndarray  # ()
    frame_valid: jnp.ndarray  # (W,) bool — frames present in the window
    # marginalization prior attached to frame prior_idx
    prior_J: jnp.ndarray  # (15,15)
    prior_X: jnp.ndarray  # (15,)
    prior_res: jnp.ndarray  # (15,) constant term (unused in parity mode)
    prior_idx: jnp.ndarray  # () int32
    prior_valid: jnp.ndarray  # () bool


PRIOR_WITH_RESIDUAL = False  # parity: marginalization_factor.h:50


def imu_residual(st: WindowState, d: FactorData, c: SolveConsts):
    """(W,15) rows; row i = factor between frames i-1, i (imu_factor.h)."""
    W = st.p.shape[0]
    dtype = st.p.dtype

    def one(i):
        pi, qi, vi, bsi = st.p[i - 1], st.q[i - 1], st.v[i - 1], st.bs[i - 1]
        pj, qj, vj, bsj = st.p[i], st.q[i], st.v[i], st.bs[i]
        X, J, Dt = d.imu_X[i], d.imu_J[i], d.imu_Dt[i]
        bai, bwi = bsi[:3], bsi[3:]
        baj, bwj = bsj[:3], bsj[3:]
        # first-order bias repair around the preint linearization point
        dba = bai - X[9:12]
        dbw = bwi - X[12:15]
        alpha = X[0:3] + J[0:3, 9:12] @ dba + J[0:3, 12:15] @ dbw
        beta = X[3:6] + J[3:6, 9:12] @ dba + J[3:6, 12:15] @ dbw
        gamma = X[6:9] + J[6:9, 12:15] @ dbw
        ez = jnp.asarray([0.0, 0.0, 1.0], dtype)
        R_iw = geo.exp_so3(-qi)
        r_alpha = alpha - R_iw @ (pj - pi + 0.5 * c.g * ez * Dt * Dt - vi * Dt)
        r_beta = beta - R_iw @ (vj + c.g * ez * Dt - vi)
        r_gamma = geo.log_SO3(geo.exp_so3(-gamma) @ (R_iw @ geo.exp_so3(qj)))
        r = jnp.concatenate([r_alpha, r_beta, r_gamma, baj - bai, bwj - bwi])
        return d.imu_sqrtP[i] @ r

    rows = jax.vmap(one)(jnp.arange(1, W))
    rows = jnp.concatenate([jnp.zeros((1, 15), dtype), rows], 0)
    return rows * d.imu_valid[:, None].astype(dtype)


def wheel_residual(st: WindowState, d: FactorData, c: SolveConsts):
    """(W,3) rows (wheel_factor.h:39-70)."""
    W = st.p.shape[0]
    dtype = st.p.dtype
    Tiw = c.T_imu_to_wheel

    def one(i):
        tf_i = geo.make_tf(st.p[i - 1], st.q[i - 1]) @ Tiw
        tf_j = geo.make_tf(st.p[i], st.q[i]) @ Tiw
        p, q = geo.log_SE3(geo.tf_inv(tf_i) @ tf_j)
        op, oq = geo.log_SE3(d.wheel_dT[i])
        o_len = jnp.sqrt(op[0] ** 2 + op[1] ** 2 + _EPS)
        length = jnp.sqrt(p[0] ** 2 + p[1] ** 2 + _EPS)
        o_dir = jnp.stack([op[0], op[1], jnp.zeros((), dtype)])
        ndir = jnp.stack([p[0], p[1], jnp.zeros((), dtype)])
        on = geo.safe_norm(o_dir)
        nn = geo.safe_norm(ndir)
        both = (on > 1e-4) & (nn > 1e-4)
        o_u = o_dir / on
        n_u = ndir / nn
        sinn = geo.safe_norm(jnp.cross(o_u, n_u))
        angle = jnp.where(both, jnp.arcsin(jnp.clip(sinn, 0.0, 1.0 - 1e-6)), nn)
        degenerate = (length < 1e-4) | (o_len < 1e-4)
        r0 = jnp.where(degenerate, length, o_len - length)
        qn = geo.safe_norm(q)
        oqn = geo.safe_norm(oq)
        deg_q = (qn < 1e-3) | (oqn < 1e-3)
        r2 = jnp.where(deg_q, qn, oqn - qn)
        Wm = d.wheel_sqrt[i]
        return jnp.stack([Wm[0, 0] * r0, Wm[1, 1] * angle, Wm[2, 2] * r2])

    rows = jax.vmap(one)(jnp.arange(1, W))
    rows = jnp.concatenate([jnp.zeros((1, 3), dtype), rows], 0)
    return rows * d.wheel_valid[:, None].astype(dtype)


def laser_residual(st: WindowState, d: FactorData, c: SolveConsts):
    """(M,2) rows (laser_factor.h:31-88)."""
    dtype = st.p.dtype
    Til = c.T_imu_to_laser

    def one(m):
        i = d.laser_i_idx[m]
        use_frame = i >= 0
        ic = jnp.clip(i, 0, st.p.shape[0] - 1)
        pi = jnp.where(use_frame, st.p[ic], d.laser_ref_p[m])
        qi = jnp.where(use_frame, st.q[ic], d.laser_ref_q[m])
        j = d.laser_j_idx[m]
        T_w_i = geo.make_tf(pi, qi) @ Til
        T_w_j = geo.make_tf(st.p[j], st.q[j]) @ Til
        a1 = geo.tf_apply(T_w_i, d.laser_l1p1[m]).at[2].set(0.0)
        a2 = geo.tf_apply(T_w_i, d.laser_l1p2[m]).at[2].set(0.0)
        b1 = geo.tf_apply(T_w_j, d.laser_l2p1[m]).at[2].set(0.0)
        b2 = geo.tf_apply(T_w_j, d.laser_l2p2[m]).at[2].set(0.0)
        d1 = geo.dis_from_line(b1, a1, a2)
        d2 = geo.dis_from_line(b2, a1, a2)
        len1 = jnp.linalg.norm(d.laser_l1p1[m] - d.laser_l1p2[m])
        len2 = jnp.linalg.norm(d.laser_l2p1[m] - d.laser_l2p2[m])
        wsum = jnp.sqrt(jnp.maximum(jnp.minimum(len1, len2) / 2.0 / 0.02, _EPS))
        return wsum * c.laser_sqrt_info * jnp.stack([d1, d2])

    rows = jax.vmap(one)(jnp.arange(d.laser_l1p1.shape[0]))
    return rows * d.laser_valid[:, None].astype(dtype)


def ground_residual(st: WindowState, d: FactorData, c: SolveConsts):
    """(W,2) rows: [p, q] ground factors (ground_factor.h)."""
    dtype = st.p.dtype
    tf_w_o = geo.make_tf(st.p, st.q) @ c.T_imu_to_wheel  # (W,4,4)
    z = tf_w_o[:, 2, 3]
    r_p = c.ground_p_info * z
    z_axis = tf_w_o[:, :3, 2]
    ez = jnp.asarray([0.0, 0.0, 1.0], dtype)
    sinn = geo.safe_norm(jnp.cross(z_axis, ez[None, :]))
    angle = jnp.arcsin(jnp.clip(sinn, 0.0, 1.0 - 1e-6))
    r_q = c.ground_q_info * angle
    rows = jnp.stack([r_p, r_q], -1) * d.ground_weight
    return rows * d.frame_valid[:, None].astype(dtype)


def prior_residual(st: WindowState, d: FactorData, c: SolveConsts):
    """(15,) marginalization prior on frame prior_idx."""
    i = d.prior_idx
    X = jnp.concatenate([st.p[i], st.q[i], st.v[i], st.bs[i]])
    r = d.prior_J @ (X - d.prior_X)
    if PRIOR_WITH_RESIDUAL:
        r = r + d.prior_res
    return r * d.prior_valid.astype(st.p.dtype)


def stack_residuals(st: WindowState, d: FactorData, c: SolveConsts):
    """The full whitened residual vector of one window problem."""
    return jnp.concatenate(
        [
            imu_residual(st, d, c).reshape(-1),
            wheel_residual(st, d, c).reshape(-1),
            laser_residual(st, d, c).reshape(-1),
            ground_residual(st, d, c).reshape(-1),
            prior_residual(st, d, c),
        ]
    )


def camera_residual(p, q, world_point, cam_point_xy, T_imu_to_camera, sqrt_info):
    """camera_factor.h:36-67: normalized-plane reprojection error, weighted
    by fx/camera_sigma.  Dormant capability (enable_camera is false in all
    reference configs) — wired for parity."""
    T_w_c = geo.make_tf(p, q) @ T_imu_to_camera
    cam = geo.tf_apply(geo.tf_inv(T_w_c), world_point)
    z = jnp.where(jnp.abs(cam[2]) < 1e-9, 1e-9, cam[2])
    proj = cam[:2] / z
    return sqrt_info * (cam_point_xy - proj)


def camera_sqrt_info(params, dtype=jnp.float32):
    """camera_noise (camera_factor.h:18-27): sigma normalized by fx."""
    fx = params.mat_camera_K()[0, 0]
    import numpy as np

    s = np.asarray(params.camera_sigma) / fx
    return jnp.asarray(1.0 / s, dtype)


# --- pose-graph factors (backend) ------------------------------------------


def edge_residual(p_i, q_i, p_j, q_j, tf12, info6, weight):
    """edge_factor.h:88-117: log_SE3(tf_j^-1 tf_i tf12), diag-weighted."""
    tf_i = geo.make_tf(p_i, q_i)
    tf_j = geo.make_tf(p_j, q_j)
    err = geo.tf_inv(tf_j) @ tf_i @ tf12
    rp, rq = geo.log_SE3(err)
    return weight * info6 * jnp.concatenate([rp, rq])


def point_residual(p, q, pt1, pt2):
    """point_factor.h:16-35: 100*(p1 - T p2)."""
    return 100.0 * (pt1 - geo.tf_apply(geo.make_tf(p, q), pt2))


def prior_factor_residual(p_i, q_i, prior_p, prior_q, sqrt_H):
    """edge_factor.h:27-77 (prior_factor): direct state difference
    [prior_p - p; prior_q - q] weighted by a stored 6x6 sqrt-information
    block.  DEFINED-BUT-UNUSED in the reference — its only call site is
    commented out (keyframe_manager.cpp:756-772); provided so the factor
    library covers the reference's full API surface."""
    d = jnp.concatenate([prior_p - p_i, prior_q - q_i])
    return sqrt_H @ d


def loop_edge_residual(p_i, q_i, p_j, q_j, w_tf12, T_imu_to_wheel, info6,
                       weight=1.0):
    """edge_factor.h:128-179 (loop_edge_factor): planar relative-pose
    residual in the WHEEL frame — x, y and yaw components only, rows 3-5
    zero (the reference's res[3..5] = 0).  ``w_tf12`` is the measured
    relative transform already conjugated into the wheel frame, exactly
    like the reference ctor does with its tf12 argument.  DEFINED-BUT-
    UNUSED in the reference (the shipped pose graph uses edge_factor);
    provided for API-surface completeness.

    DELIBERATE DEVIATION: row 1 is weighted by ``info6[1]`` — the
    *intended* 1/loop_sigma_p[1].  The reference's edge_noise ctor has a
    typo (edge_factor.h:15-25 writes J(1,2) twice, leaving J(1,1)=1.0),
    so its literal row-1 weight is 1; we follow the intended-value policy
    documented on :func:`edge_info6` here as well."""
    Tiw = T_imu_to_wheel
    tf_ij = geo.tf_inv(geo.make_tf(p_i, q_i)) @ geo.make_tf(p_j, q_j)
    w_tf_ij = geo.tf_inv(Tiw) @ tf_ij @ Tiw
    p, q = geo.log_SE3(w_tf_ij)
    op, oq = geo.log_SE3(w_tf12)
    z = jnp.zeros((), p.dtype)
    return jnp.stack(
        [
            weight * info6[0] * (p[0] - op[0]),
            weight * info6[1] * (p[1] - op[1]),
            weight * info6[5] * (q[2] - oq[2]),
            z,
            z,
            z,
        ]
    )


def edge_info6(params, dtype=jnp.float32):
    """Intended diagonal of edge_noise (edge_factor.h:15-25; the reference
    leaves J(1,1)=1 due to the J(1,2) typo — we use the intended value)."""
    import numpy as np

    return jnp.asarray(
        np.concatenate(
            [1.0 / np.asarray(params.loop_sigma_p), 1.0 / np.asarray(params.loop_sigma_q)]
        ),
        dtype,
    )
