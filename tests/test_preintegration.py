"""Preintegration vs analytic constant-rate motion and invariants."""

import numpy as np
import jax.numpy as jnp

from liwslam import config
from liwslam.core import geometry as geo
from liwslam.frontend import preintegration as pre


def make_imu_inputs(acc, gyro, n, hz, t0_us=0):
    ts = (np.arange(n) * 1e6 / hz + t0_us).astype(np.int32)
    a = np.tile(np.asarray(acc, np.float32), (n, 1))
    w = np.tile(np.asarray(gyro, np.float32), (n, 1))
    return jnp.asarray(a), jnp.asarray(w), jnp.asarray(ts), jnp.ones(n, bool)


def integrate(acc, gyro, n=201, hz=200.0, ba=(0, 0, 0), bw=(0, 0, 0)):
    Q = pre.imu_noise_Q(config.base())
    c = pre.imu_reset(0, jnp.asarray(ba, jnp.float32), jnp.asarray(bw, jnp.float32))
    a, w, t, m = make_imu_inputs(acc, gyro, n, hz)
    c = pre.imu_add_samples(c, a, w, t, m, Q)
    return c, (n - 1) / hz


def test_imu_constant_acc_no_rotation():
    c, T = integrate([1.0, 2.0, 0.0], [0.0, 0.0, 0.0])
    X = np.asarray(c.X)
    np.testing.assert_allclose(X[pre.BETA], [T, 2 * T, 0.0], rtol=1e-4, atol=1e-5)
    # Euler integration of alpha has O(dt) bias; compare loosely to T^2/2
    np.testing.assert_allclose(
        X[pre.ALPHA], [T**2 / 2, T**2, 0.0], rtol=1e-2, atol=1e-3
    )
    np.testing.assert_allclose(X[pre.GAMMA], 0.0, atol=1e-6)
    np.testing.assert_allclose(float(c.Dt), T, rtol=1e-5)


def test_imu_constant_gyro():
    wz = 0.5
    c, T = integrate([0.0, 0.0, 0.0], [0.0, 0.0, wz])
    X = np.asarray(c.X)
    np.testing.assert_allclose(X[pre.GAMMA], [0, 0, wz * T], rtol=1e-4, atol=1e-5)


def test_imu_bias_subtraction():
    # measured = true + bias; integrating with that bias recovers true motion
    ba = np.array([0.1, -0.2, 0.05], np.float32)
    c, T = integrate(np.array([1.0, 0.0, 0.0]) + ba, [0, 0, 0], ba=tuple(ba))
    X = np.asarray(c.X)
    np.testing.assert_allclose(X[pre.BETA], [T, 0, 0], rtol=1e-4, atol=1e-4)


def test_imu_first_sample_primes_only():
    Q = pre.imu_noise_Q(config.base())
    c = pre.imu_reset(0, jnp.zeros(3), jnp.zeros(3))
    a, w, t, m = make_imu_inputs([9.8, 0, 0], [0, 0, 0], 1, 200.0, t0_us=5000)
    c = pre.imu_add_samples(c, a, w, t, m, Q)
    assert bool(c.has_sample)
    np.testing.assert_allclose(np.asarray(c.X)[:9], 0.0, atol=1e-7)
    assert float(c.Dt) == 0.0


def test_imu_update_only_t_zero_order_hold():
    c, T = integrate([1.0, 0.0, 0.0], [0, 0, 0], n=3, hz=100.0)
    Q = pre.imu_noise_Q(config.base())
    c2 = pre.imu_update_only_t(c, int((T + 0.01) * 1e6), Q)
    np.testing.assert_allclose(float(c2.Dt), T + 0.01, rtol=1e-4)
    # velocity keeps growing with the held sample
    assert np.asarray(c2.X)[pre.BETA][0] > np.asarray(c.X)[pre.BETA][0]


def test_whitener_property():
    c, _ = integrate([0.3, 0.1, 9.8], [0.02, 0.0, 0.3], n=81)
    res = pre.imu_result(c)
    W = np.asarray(res.sqrt_inverse_P, np.float64)
    P = np.asarray(c.P, np.float64)
    eye = W @ P @ W.T
    np.testing.assert_allclose(eye, np.eye(15), atol=2e-3)


def test_imu_bias_repair_first_order():
    # repair with new bias ~ re-integration with that bias (first order)
    true_acc = np.array([1.0, 0.5, 9.8], np.float32)
    true_gyro = np.array([0.0, 0.0, 0.4], np.float32)
    c0, _ = integrate(true_acc, true_gyro, n=41, hz=200.0)
    res0 = pre.imu_result(c0)
    dba = np.array([0.02, -0.01, 0.005], np.float32)
    dbw = np.array([0.001, 0.002, -0.001], np.float32)
    repaired = pre.imu_result_update_bias(res0, jnp.asarray(dba), jnp.asarray(dbw))
    c1, _ = integrate(true_acc, true_gyro, n=41, hz=200.0, ba=tuple(dba), bw=tuple(dbw))
    X_re = np.asarray(c1.X)
    X_fix = np.asarray(repaired.X)
    np.testing.assert_allclose(X_fix[:9], X_re[:9], atol=2e-4)


def test_imu_rebase_exact():
    c, T = integrate([1, 0, 0], [0, 0, 0], n=5, hz=100.0)
    c2 = pre.imu_rebase(c, int(T * 1e6))
    assert int(c2.last_t_us) == 0


# --- wheel ---------------------------------------------------------------


def make_wheel_track(v, wz, n, hz):
    """Ground-truth planar track with body-frame velocity v, yaw rate wz."""
    ts = (np.arange(n) * 1e6 / hz).astype(np.int32)
    poses = []
    T = np.eye(4)
    dt = 1.0 / hz
    for i in range(n):
        poses.append(T.copy())
        step = np.asarray(
            geo.make_tf(
                jnp.asarray(np.asarray(v) * dt, jnp.float32),
                jnp.asarray([0, 0, wz * dt], jnp.float32),
            )
        )
        T = T @ step
    return jnp.asarray(np.stack(poses), jnp.float32), jnp.asarray(ts), jnp.ones(n, bool)


def test_wheel_constant_twist():
    v, wz, hz, n = [0.5, 0.0, 0.0], 0.3, 10.0, 21
    poses, ts, m = make_wheel_track(v, wz, n, hz)
    c = pre.wheel_reset(0)
    c = pre.wheel_add_samples(c, poses, ts, m)
    # each accepted sample integrates its own interval: covers [t0, t_last]
    got = np.asarray(c.delta_T)
    want = np.asarray(poses[-1])
    np.testing.assert_allclose(got, want, atol=2e-3)
    # update_only_t extends past the last sample with the held twist
    dt_ext = 0.1
    c2 = pre.wheel_update_only_t(c, int(ts[-1]) + int(dt_ext * 1e6))
    step = np.asarray(
        geo.make_tf(
            jnp.asarray(np.asarray(v) * dt_ext, jnp.float32),
            jnp.asarray([0, 0, wz * dt_ext], jnp.float32),
        )
    )
    np.testing.assert_allclose(np.asarray(c2.delta_T), want @ step, atol=5e-3)


def test_wheel_skips_fast_pairs():
    # samples at 100 Hz (dt=10ms < 50ms) after the first: all skipped
    poses, ts, m = make_wheel_track([1.0, 0, 0], 0.0, 5, 100.0)
    c = pre.wheel_reset(0)
    c = pre.wheel_add_samples(c, poses, ts, m)
    np.testing.assert_allclose(np.asarray(c.delta_T), np.eye(4), atol=1e-6)
    assert float(c.Dt) == 0.0


def test_wheel_result_covariance_scaling():
    poses, ts, m = make_wheel_track([0.5, 0, 0], 0.0, 21, 10.0)
    c = pre.wheel_reset(0)
    c = pre.wheel_add_samples(c, poses, ts, m)
    res = pre.wheel_result(c, config.base().wheel_sigma)
    W = np.asarray(res.sqrt_inverse_P)
    # traveled ~0.95 m -> sigma_len ~ 0.1 * 0.95 -> info ~ 1/0.095
    assert 8.0 < W[0, 0] < 14.0
    assert W[1, 1] < 1e-3  # lateral slip: huge sigma
    # yaw: no rotation -> min-clamped 0.005 norm
    assert W[2, 2] > 0.01


def test_wheel_vectorized_matches_sequential_oracle():
    # the batched path must bit-match the reference-shaped scan on messy
    # inputs: padding masks, sub-50ms pairs, priming from a fresh carry,
    # and continuation from a mid-stream carry
    rng = np.random.default_rng(11)
    for trial in range(6):
        n = 12
        dts = rng.choice([0.01, 0.03, 0.06, 0.12], n)
        ts = jnp.asarray((np.cumsum(dts) * 1e6).astype(np.int64))
        T = np.eye(4)
        poses = []
        for k in range(n):
            step = np.asarray(
                geo.make_tf(
                    jnp.asarray(rng.normal(0, 0.05, 3) * [1, 1, 0], jnp.float32),
                    jnp.asarray([0, 0, rng.normal(0, 0.1)], jnp.float32),
                )
            )
            T = T @ step
            poses.append(T.copy())
        poses = jnp.asarray(np.stack(poses), jnp.float32)
        m = jnp.asarray(rng.random(n) > 0.25)
        carries = [pre.wheel_reset(0)]
        if trial >= 3:  # continue from a primed carry with history
            c0 = pre.wheel_add_samples(
                pre.wheel_reset(0), poses[:4], ts[:4], m[:4]
            )
            carries = [c0]
            poses, ts, m = poses[4:], ts[4:], m[4:]
        for c in carries:
            a = pre.wheel_add_samples(c, poses, ts, m)
            b = pre._wheel_add_samples_scan(c, poses, ts, m)
            for name in a._fields:
                np.testing.assert_allclose(
                    np.asarray(getattr(a, name), np.float64),
                    np.asarray(getattr(b, name), np.float64),
                    atol=1e-5,
                    err_msg=f"trial {trial} field {name}",
                )


def test_wheel_frame_reset_preserves_pose_track():
    poses, ts, m = make_wheel_track([0.5, 0, 0], 0.2, 21, 10.0)
    c = pre.wheel_reset(0)
    c = pre.wheel_add_samples(c, poses[:11], ts[:11], m[:11])
    c = pre.wheel_reset(c)  # frame boundary: integral zeroed, track kept
    np.testing.assert_allclose(np.asarray(c.delta_T), np.eye(4), atol=1e-7)
    c = pre.wheel_add_samples(c, poses[11:], ts[11:], m[11:])
    rel = np.asarray(geo.tf_inv(poses[10]) @ poses[20])
    np.testing.assert_allclose(np.asarray(c.delta_T), rel, atol=5e-3)
