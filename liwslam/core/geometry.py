"""Batched Lie-group primitives (so3/SE3) in pure jax.numpy.

Capability parity with the reference ``lie::`` namespace
(``src/utilies/common.h:119-196``): ``exp_so3``, ``log_SO3``, ``log_SE3``,
``make_tf``, ``normalize_so3``, ``normalize_tf`` — plus ``convert::``
helpers (``cross_matrix``, ``disdiagonal2``).

Design notes (TPU-first):

- Everything broadcasts over leading batch dimensions and is safe under
  ``jit``/``vmap``/``jacfwd``.  The reference reaches the same genericity
  via Ceres ``Jet`` templates; here plain JAX tracing does the job.
- Small-angle singularities are handled with Taylor expansions selected by
  ``jnp.where`` on *safe* inputs (both branches evaluate finite values and
  finite derivatives), because a NaN in the untaken branch still poisons
  forward-mode gradients.
- ``log_SE3`` follows the reference convention: the translation part is the
  raw translation (NOT the V-matrix-corrected SE3 log) — the reference
  treats poses as (p, so3(R)) pairs throughout (common.h:166-171).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def safe_norm(v, axis=-1, eps=_EPS, keepdims=False):
    """sqrt(max(sum v^2, eps^2)) — finite value AND finite gradient at 0.

    jnp.linalg.norm has a NaN derivative at exactly zero, which poisons
    jacfwd through residuals even on masked rows (NaN * 0 == NaN).  The
    clamp zeroes the gradient inside the eps-ball instead."""
    s = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(s, eps * eps))


def skew(w):
    """Cross-product matrix: skew(w) @ v == cross(w, v) (convert::cross_matrix)."""
    w = jnp.asarray(w)
    z = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], z, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def diag_sq(sigma):
    """diag(sigma_i^2) (convert::disdiagonal2, common.h:40-47)."""
    sigma = jnp.asarray(sigma)
    n = sigma.shape[-1]
    return jnp.eye(n, dtype=sigma.dtype) * (sigma**2)[..., None, :]


def exp_so3(w):
    """Rodrigues: so3 vector (…,3) -> rotation matrix (…,3,3).

    Fully elementwise closed form (K^2 == w w^T - theta^2 I), so XLA can
    fuse it into neighboring ops instead of emitting a 3x3 dot kernel —
    single-pose calls pepper the per-frame program (round-5 HLO census:
    tiny-matrix dots were ~1/3 of the step's kernel count)."""
    w = jnp.asarray(w)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta * theta))
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    # R = (1 - b theta^2) I + a K + b w w^T
    dgn = 1.0 - b * theta2
    r00 = dgn + b * wx * wx
    r11 = dgn + b * wy * wy
    r22 = dgn + b * wz * wz
    r01 = -a * wz + b * wx * wy
    r10 = a * wz + b * wx * wy
    r02 = a * wy + b * wx * wz
    r20 = -a * wy + b * wx * wz
    r12 = -a * wx + b * wy * wz
    r21 = a * wx + b * wy * wz
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ],
        axis=-2,
    )


def quat_from_mat(R):
    """Rotation matrix (…,3,3) -> unit quaternion (…,4) [w,x,y,z], w >= 0.

    Branchless Shepperd extraction: compute all four candidate quaternions
    and select by the largest pivot — vmap/TPU friendly (no data-dependent
    control flow).
    """
    R = jnp.asarray(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # candidate 0: pivot w
    s0 = safe_sqrt(1.0 + tr) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], -1)
    # candidate 1: pivot x
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], -1)
    # candidate 2: pivot y
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], -1)
    # candidate 3: pivot z
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], -1)

    scores = jnp.stack([tr, m00, m11, m22], -1)
    best = jnp.argmax(scores, axis=-1)
    # where-select instead of take_along_axis: a 4-way select fuses; the
    # gather does not (and serializes on TPU)
    b_ = best[..., None]
    q = jnp.where(
        b_ == 0, q0, jnp.where(b_ == 1, q1, jnp.where(b_ == 2, q2, q3))
    )
    q = q / safe_norm(q, keepdims=True)
    # canonical hemisphere (w >= 0) so the angle lands in [0, pi]
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q


def log_SO3(R):
    """Rotation matrix (…,3,3) -> so3 vector (…,3), |angle| <= pi.

    Quaternion route, matching the reference's ceres
    AngleAxis<->Quaternion conversions (common.h:148-163).
    """
    q = quat_from_mat(R)
    qw, qv = q[..., 0], q[..., 1:]
    sin_half = safe_norm(qv)
    angle = 2.0 * jnp.arctan2(sin_half, qw)
    small = sin_half < _EPS
    scale = jnp.where(small, 2.0, angle / jnp.maximum(sin_half, _EPS))
    return scale[..., None] * qv


def normalize_so3(w):
    """Wrap an so3 vector so its angle lies in (-pi, pi] (lie::normalize_so3)."""
    w = jnp.asarray(w)
    theta = jnp.sqrt(jnp.maximum(jnp.sum(w * w, -1), _EPS * _EPS))
    two_pi = 2.0 * jnp.pi
    wrapped = theta - two_pi * jnp.floor((theta + jnp.pi) / two_pi)
    scale = jnp.where(theta > jnp.pi, wrapped / theta, 1.0)
    return w * scale[..., None]


def make_tf(p, w):
    """(p (…,3), so3 w (…,3)) -> homogeneous transform (…,4,4) (lie::make_tf)."""
    return make_tf_R(p, exp_so3(jnp.asarray(w)))


def make_tf_R(p, R):
    """(p (…,3), R (…,3,3)) -> (…,4,4).

    Concatenation-based assembly: ``.at[].set`` lowers to
    dynamic-update-slice kernels that break XLA fusion chains."""
    p = jnp.asarray(p)
    R = jnp.asarray(R)
    batch = jnp.broadcast_shapes(R.shape[:-2], p.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    p = jnp.broadcast_to(p, batch + (3,))
    top = jnp.concatenate([R, p[..., :, None]], axis=-1)  # (...,3,4)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def log_SE3(T):
    """(…,4,4) -> (p (…,3), so3 (…,3)).  Reference convention: p is the raw
    translation column, not the V-corrected SE3 log (common.h:166-171)."""
    T = jnp.asarray(T)
    return T[..., :3, 3], log_SO3(T[..., :3, :3])


def tf_inv(T):
    """Inverse of a rigid transform without a general 4x4 inverse."""
    T = jnp.asarray(T)
    R = T[..., :3, :3]
    p = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    # (R^T p)_i = sum_j R_ji p_j — elementwise+reduce fuses; a 3x1 dot
    # kernel does not
    Rtp = jnp.sum(R * p[..., :, None], axis=-2)
    return make_tf_R(-Rtp, Rt)


def tf_apply(T, pts):
    """Apply (…,4,4) to points (…,3) (broadcasting over leading dims)."""
    T = jnp.asarray(T)
    pts = jnp.asarray(pts)
    rot = jnp.sum(T[..., :3, :3] * pts[..., None, :], axis=-1)
    return rot + T[..., :3, 3]


def tf_compose(A, B):
    """Elementwise 4x4 compose (C_ij = sum_k A_ik B_kj) — fuses, unlike
    a tiny dot kernel; use for single/small-batch pose chains."""
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def normalize_tf(T):
    """Re-orthonormalize the rotation block via quaternion round trip
    (lie::normalize_tf)."""
    q = quat_from_mat(T[..., :3, :3])
    return make_tf_R(T[..., :3, 3], mat_from_quat(q))


def mat_from_quat(q):
    """Unit quaternion (…,4) [w,x,y,z] -> rotation matrix (…,3,3)."""
    q = jnp.asarray(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ],
        axis=-2,
    )


def dis_from_line(p, p1, p2):
    """Distance of point(s) ``p`` from the infinite line through ``p1``,``p2``
    (e_laser::dis_from_line, common.h:86-95).  Safe for degenerate lines."""
    p = jnp.asarray(p)
    d = p2 - p1
    d = d / safe_norm(d, keepdims=True)
    v = p - p2
    perp = v - jnp.sum(d * v, -1, keepdims=True) * d
    return safe_norm(perp)


def angle_wrap(a):
    """Wrap scalar angle(s) to (-pi, pi]."""
    return a - 2.0 * jnp.pi * jnp.floor((a + jnp.pi) / (2.0 * jnp.pi))


# --- numpy twins (host orchestration) --------------------------------------
# The backend keyframe manager runs at keyframe rate on the HOST; eager
# jnp ops there cost ms-scale dispatch each (and under axon even "CPU"
# eager ops compile remotely).  These f64 numpy twins implement the same
# lie:: math for host-side bookkeeping (round 3: add_keyframe went
# ~20 -> ~12 ms warm).

def make_tf_np(p, w):
    """numpy twin of make_tf (single pose)."""
    import numpy as np

    w = np.asarray(w, np.float64)
    p = np.asarray(p, np.float64)
    th2 = float(w @ w)
    K = np.array(
        [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]], np.float64
    )
    if th2 < 1e-16:
        a, b = 1.0 - th2 / 6.0, 0.5 - th2 / 24.0
    else:
        th = np.sqrt(th2)
        a, b = np.sin(th) / th, (1.0 - np.cos(th)) / th2
    T = np.eye(4)
    T[:3, :3] = np.eye(3) + a * K + b * (K @ K)
    T[:3, 3] = p
    return T


def log_SE3_np(T):
    """numpy twin of log_SE3 (single pose): (p, so3 w), |angle| <= pi."""
    import numpy as np

    T = np.asarray(T, np.float64)
    R = T[:3, :3]
    # quaternion route, matching quat_from_mat's Shepperd extraction
    tr = R[0, 0] + R[1, 1] + R[2, 2]
    cand = np.array([tr, R[0, 0], R[1, 1], R[2, 2]])
    k = int(np.argmax(cand))
    if k == 0:
        s = np.sqrt(max(1.0 + tr, 1e-16)) * 2.0
        q = np.array(
            [0.25 * s, (R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
             (R[1, 0] - R[0, 1]) / s]
        )
    elif k == 1:
        s = np.sqrt(max(1.0 + R[0, 0] - R[1, 1] - R[2, 2], 1e-16)) * 2.0
        q = np.array(
            [(R[2, 1] - R[1, 2]) / s, 0.25 * s, (R[0, 1] + R[1, 0]) / s,
             (R[0, 2] + R[2, 0]) / s]
        )
    elif k == 2:
        s = np.sqrt(max(1.0 + R[1, 1] - R[0, 0] - R[2, 2], 1e-16)) * 2.0
        q = np.array(
            [(R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s, 0.25 * s,
             (R[1, 2] + R[2, 1]) / s]
        )
    else:
        s = np.sqrt(max(1.0 + R[2, 2] - R[0, 0] - R[1, 1], 1e-16)) * 2.0
        q = np.array(
            [(R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s,
             (R[1, 2] + R[2, 1]) / s, 0.25 * s]
        )
    q = q / np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    qv = q[1:]
    sin_half = np.linalg.norm(qv)
    if sin_half < 1e-12:
        w = 2.0 * qv
    else:
        angle = 2.0 * np.arctan2(sin_half, q[0])
        w = (angle / sin_half) * qv
    return T[:3, 3].copy(), w
