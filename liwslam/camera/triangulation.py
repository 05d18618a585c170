"""Multi-view triangulation (reference ``e_cv::`` helpers, common.cpp:78-154).

- ``triangulate_two_view``: 2-view scale solve used by
  camera_match::update_scale (camera_manager.cpp:7-29),
- ``triangulate_svd``: N-view DLT on normalized camera rays with mean
  reprojection error (e_cv::triangulate_points_SVD) — the initializer for
  feature_info::estimate_initial_value (camera_manager.cpp:179-190).

All batched jnp; observations are normalized-plane points (x, y, 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from liwslam.core import geometry as geo


def triangulate_two_view(c1, c2, tf_1_2):
    """Depth s1 of ray c1 given normalized obs c1, c2 and T_cam1_cam2.

    Solves min over (s1, s2) of |s1 c1 - (R s2 c2 + t)| (e_cv::triangulate):
    normal equations of the 2x2 system."""
    R = tf_1_2[:3, :3]
    t = tf_1_2[:3, 3]
    r2 = R @ c2
    a11 = jnp.dot(c1, c1)
    a12 = -jnp.dot(c1, r2)
    a22 = jnp.dot(r2, r2)
    b1 = jnp.dot(c1, t)
    b2 = -jnp.dot(r2, t)
    det = a11 * a22 - a12 * a12
    s1 = (b1 * a22 - b2 * a12) / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    return s1


def epipolar_inliers(c1s, c2s, valid, tf_1_2, thresh=1e-4):
    """camera_match::update_scale's epipolar gate (camera_manager.cpp:7-29):
    with E = [t]x R from the *given* relative pose, keep pairs with
    |c1' E c2| below threshold.  Batched over (N,3) normalized points."""
    R = tf_1_2[:3, :3]
    t = tf_1_2[:3, 3]
    E = geo.skew(t) @ R
    err = jnp.einsum("ni,ij,nj->n", c1s, E, c2s)
    return valid & (jnp.abs(err) < thresh)


def update_scale(c1s, c2s, valid, tf_1_2, thresh=1e-4):
    """Batched camera_match::update_scale: epipolar-filter the matches and
    return per-point depths along ray 1 (camera_manager.cpp:7-29).

    Returns (scales (N,), inlier_mask (N,))."""
    ok = epipolar_inliers(c1s, c2s, valid, tf_1_2, thresh)
    scales = jax.vmap(lambda a, b: triangulate_two_view(a, b, tf_1_2))(c1s, c2s)
    return scales, ok


def triangulate_svd(cam_points, T_w_cs, valid):
    """DLT over up to N views.

    cam_points: (N,3) normalized obs; T_w_cs: (N,4,4) camera-to-world
    poses; valid: (N,).  Returns (world_point (3,), mean_reproj_error)."""
    T_c_ws = geo.tf_inv(T_w_cs)  # (N,4,4)
    P = T_c_ws[:, :3, :4]  # projection (world -> cam)
    x = cam_points[:, 0]
    y = cam_points[:, 1]
    m = valid.astype(cam_points.dtype)[:, None]
    rows1 = (x[:, None] * P[:, 2, :] - P[:, 0, :]) * m
    rows2 = (y[:, None] * P[:, 2, :] - P[:, 1, :]) * m
    A = jnp.concatenate([rows1, rows2], 0)  # (2N,4)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    X = Vt[-1]
    w = jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])
    wp = X[:3] / w

    cam = (T_c_ws[:, :3, :3] @ wp[None, :, None])[:, :, 0] + T_c_ws[:, :3, 3]
    z = jnp.where(jnp.abs(cam[:, 2]) < 1e-9, 1e-9, cam[:, 2])
    proj = cam / z[:, None]
    err = jnp.linalg.norm((proj - cam_points)[:, :2], axis=-1)
    n = jnp.maximum(jnp.sum(valid), 1)
    mean_err = jnp.sum(jnp.where(valid, err, 0.0)) / n
    return wp, mean_err
