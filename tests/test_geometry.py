"""Unit tests for liwslam.core.geometry vs closed-form numpy references."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from liwslam.core import geometry as geo

TOL = dict(rtol=2e-5, atol=2e-5)


def rand_so3(rng, n, max_angle=np.pi * 0.95):
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(-max_angle, max_angle, size=(n, 1))
    return axis * angle


def test_exp_so3_matches_scipy(rng):
    w = rand_so3(rng, 64)
    R = np.asarray(geo.exp_so3(jnp.asarray(w, jnp.float32)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, **TOL)


def test_exp_so3_zero_and_tiny(rng):
    w = np.zeros((3, 3))
    w[1] = [1e-12, 0, 0]
    w[2] = [0, 1e-6, 1e-6]
    R = np.asarray(geo.exp_so3(jnp.asarray(w, jnp.float32)))
    np.testing.assert_allclose(R, Rotation.from_rotvec(w).as_matrix(), **TOL)


def test_log_SO3_roundtrip(rng):
    w = rand_so3(rng, 128)
    w_back = np.asarray(geo.log_SO3(geo.exp_so3(jnp.asarray(w, jnp.float32))))
    np.testing.assert_allclose(w_back, w, rtol=1e-4, atol=1e-4)


def test_log_SO3_near_pi(rng):
    # the hemisphere pick must stay stable near angle = pi
    axis = rng.normal(size=(16, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    w = axis * (np.pi - 1e-3)
    R = Rotation.from_rotvec(w).as_matrix()
    w_back = np.asarray(geo.log_SO3(jnp.asarray(R, jnp.float32)))
    # log may return the antipodal representation; compare rotations
    R_back = Rotation.from_rotvec(w_back).as_matrix()
    np.testing.assert_allclose(R_back, R, rtol=1e-3, atol=1e-3)


def test_normalize_so3_wraps():
    w = jnp.asarray([[0.0, 0.0, 3 * np.pi / 2]], jnp.float32)
    out = np.asarray(geo.normalize_so3(w))
    np.testing.assert_allclose(out, [[0.0, 0.0, -np.pi / 2]], **TOL)
    # already in range: untouched
    w2 = jnp.asarray([[0.1, -0.2, 0.3]], jnp.float32)
    np.testing.assert_allclose(np.asarray(geo.normalize_so3(w2)), np.asarray(w2), **TOL)


def test_make_tf_inv_apply(rng):
    p = rng.normal(size=(8, 3))
    w = rand_so3(rng, 8)
    T = geo.make_tf(jnp.asarray(p, jnp.float32), jnp.asarray(w, jnp.float32))
    Tinv = geo.tf_inv(T)
    eye = np.asarray(T @ Tinv)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)

    pts = rng.normal(size=(8, 3)).astype(np.float32)
    out = np.asarray(geo.tf_apply(T, jnp.asarray(pts)))
    ref = (Rotation.from_rotvec(w).as_matrix() @ pts[..., None])[..., 0] + p
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_log_SE3_reference_convention(rng):
    # translation must be the raw column, not the V-corrected SE3 log
    p = rng.normal(size=(4, 3))
    w = rand_so3(rng, 4)
    T = geo.make_tf(jnp.asarray(p, jnp.float32), jnp.asarray(w, jnp.float32))
    p_out, w_out = geo.log_SE3(T)
    np.testing.assert_allclose(np.asarray(p_out), p, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_out), w, rtol=1e-4, atol=1e-4)


def test_exp_so3_differentiable_at_zero():
    J = jax.jacfwd(lambda w: geo.exp_so3(w))(jnp.zeros(3, jnp.float32))
    # d/dw exp(w) at 0 is the skew generator set — finite and correct
    assert np.all(np.isfinite(np.asarray(J)))
    gen = np.asarray(J)  # (3,3,3): gen[...,k] = d exp / d w_k
    expected = np.zeros((3, 3, 3))
    basis = np.eye(3)
    for k in range(3):
        expected[:, :, k] = np.asarray(geo.skew(basis[k]))
    np.testing.assert_allclose(gen, expected, atol=1e-5)


def test_log_SO3_differentiable(rng):
    w0 = jnp.asarray([0.1, -0.2, 0.3], jnp.float32)
    J = jax.jacfwd(lambda w: geo.log_SO3(geo.exp_so3(w)))(w0)
    np.testing.assert_allclose(np.asarray(J), np.eye(3), atol=1e-3)


def test_dis_from_line():
    p = jnp.asarray([1.0, 1.0, 0.0])
    d = geo.dis_from_line(p, jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([2.0, 0.0, 0.0]))
    np.testing.assert_allclose(float(d), 1.0, **TOL)


def test_quat_roundtrip(rng):
    w = rand_so3(rng, 32)
    R = geo.exp_so3(jnp.asarray(w, jnp.float32))
    R2 = geo.mat_from_quat(geo.quat_from_mat(R))
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
