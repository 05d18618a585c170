"""Dormant camera capability: tracker, triangulation, reprojection factor."""

import numpy as np
import jax
import jax.numpy as jnp

from liwslam import config
from liwslam.camera import tracker, triangulation
from liwslam.core import geometry as geo
from liwslam.solve import factors as fac


def blob_image(centers, H=96, W=128, sigma=2.0):
    y, x = np.mgrid[0:H, 0:W]
    img = np.zeros((H, W), np.float32)
    for cx, cy in centers:
        img += np.exp(-(((x - cx) ** 2 + (y - cy) ** 2) / (2 * sigma**2)))
    return img


def test_select_features_finds_blobs():
    centers = [(20, 20), (100, 30), (60, 70), (30, 80)]
    img = blob_image(centers)
    pts, ok = tracker.select_features(jnp.asarray(img), n_max=8, min_dis=10.0)
    pts = np.asarray(pts)[np.asarray(ok)]
    assert len(pts) >= len(centers)
    for c in centers:
        d = np.linalg.norm(pts - np.asarray(c), axis=1).min()
        assert d < 4.0, (c, d)


def test_lk_tracks_translation():
    centers = [(30, 30), (90, 40), (60, 70)]
    img0 = blob_image(centers)
    shift = np.asarray([3.6, -2.3])
    img1 = blob_image([tuple(np.asarray(c) + shift) for c in centers])
    pts = jnp.asarray(np.asarray(centers, np.float32))
    new_pts, ok = tracker.lk_track(
        jnp.asarray(img0), jnp.asarray(img1), pts, jnp.ones(len(centers), bool)
    )
    assert bool(np.asarray(ok).all())
    np.testing.assert_allclose(
        np.asarray(new_pts) - np.asarray(centers, np.float32),
        np.tile(shift, (len(centers), 1)),
        atol=0.25,
    )


def test_triangulate_two_view():
    wp = np.asarray([1.0, 0.5, 4.0])
    T1 = np.eye(4)
    T2 = np.eye(4)
    T2[:3, 3] = [0.3, 0.0, 0.0]
    c1 = wp / wp[2]
    p2 = np.linalg.inv(T2) @ np.append(wp, 1.0)
    c2 = p2[:3] / p2[2]
    tf_1_2 = jnp.asarray(np.linalg.inv(T1) @ T2, jnp.float32)
    s1 = triangulation.triangulate_two_view(
        jnp.asarray(c1, jnp.float32), jnp.asarray(c2, jnp.float32), tf_1_2
    )
    np.testing.assert_allclose(float(s1), 4.0, rtol=1e-4)


def test_triangulate_svd_multiview(rng):
    wp = np.asarray([0.8, -0.4, 3.0])
    N = 6
    Ts = []
    obs = []
    for k in range(N):
        T = np.eye(4)
        T[:3, 3] = [0.2 * k, 0.05 * k, 0.0]
        Ts.append(T)
        c = np.linalg.inv(T) @ np.append(wp, 1.0)
        obs.append(c[:3] / c[2])
    wp_est, err = triangulation.triangulate_svd(
        jnp.asarray(np.stack(obs), jnp.float32),
        jnp.asarray(np.stack(Ts), jnp.float32),
        jnp.ones(N, bool),
    )
    np.testing.assert_allclose(np.asarray(wp_est), wp, atol=1e-3)
    assert float(err) < 1e-4


def test_camera_residual_zero_and_gradient():
    prm = config.office()
    Tic = jnp.asarray(prm.mat_T_imu_to_camera(), jnp.float32)
    sqrt_info = fac.camera_sqrt_info(prm)
    p = jnp.asarray([0.5, -0.2, 0.0])
    q = jnp.asarray([0.0, 0.0, 0.3])
    wp_cam = jnp.asarray([0.2, 0.1, 2.5])  # in camera frame
    T_w_c = geo.make_tf(p, q) @ Tic
    wp = geo.tf_apply(T_w_c, wp_cam)
    obs = wp_cam[:2] / wp_cam[2]
    r = fac.camera_residual(p, q, wp, obs, Tic, sqrt_info)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-4)
    J = jax.jacfwd(lambda pp: fac.camera_residual(pp, q, wp, obs, Tic, sqrt_info))(p)
    assert np.isfinite(np.asarray(J)).all()
    assert np.abs(np.asarray(J)).max() > 1.0
