"""Associative-scan preintegration vs the sequential oracle."""

import numpy as np
import jax.numpy as jnp

from liwslam import config
from liwslam.frontend import preintegration as pre
from liwslam.ops import preint_parallel as pp


def run_pair(acc, gyro, t_us, mask, t_end, ba=(0, 0, 0), bw=(0, 0, 0), primed=True):
    Q = pre.imu_noise_Q(config.base())
    c0 = pre.imu_reset(0, jnp.asarray(ba, jnp.float32), jnp.asarray(bw, jnp.float32))
    if primed:
        c0 = c0._replace(
            last_acc=jnp.asarray([0.1, 0.2, 9.8]),
            last_gyro=jnp.asarray([0.0, 0.01, 0.1]),
            has_sample=jnp.asarray(True),
        )
    seq = pre.imu_add_samples(
        c0, jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(t_us), jnp.asarray(mask), Q
    )
    seq = pre.imu_update_only_t(seq, t_end, Q)
    par = pp.imu_interval_parallel(
        c0, jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(t_us),
        jnp.asarray(mask), t_end, Q,
    )
    return seq, par


def make_samples(rng, n, hz=200.0):
    t = (np.arange(1, n + 1) * 1e6 / hz).astype(np.int32)
    acc = (rng.normal(0, 0.5, (n, 3)) + [0.2, 0.0, 9.8]).astype(np.float32)
    gyro = rng.normal(0, 0.2, (n, 3)).astype(np.float32)
    return acc, gyro, t


def assert_close(seq, par, tol=2e-4):
    np.testing.assert_allclose(np.asarray(par.X), np.asarray(seq.X), atol=tol, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(par.J), np.asarray(seq.J), atol=tol, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(par.P), np.asarray(seq.P), atol=1e-5, rtol=5e-2)
    np.testing.assert_allclose(float(par.Dt), float(seq.Dt), atol=1e-6)
    assert int(par.last_t_us) == int(seq.last_t_us)
    np.testing.assert_array_equal(np.asarray(par.last_acc), np.asarray(seq.last_acc))


def test_parallel_matches_sequential_full(rng):
    acc, gyro, t = make_samples(rng, 32)
    seq, par = run_pair(acc, gyro, t, np.ones(32, bool), int(t[-1]) + 3000)
    assert_close(seq, par)


def test_parallel_matches_sequential_masked(rng):
    acc, gyro, t = make_samples(rng, 32)
    mask = np.arange(32) < 19  # valid prefix
    seq, par = run_pair(acc, gyro, t, mask, int(t[18]) + 4000)
    assert_close(seq, par)


def test_parallel_with_bias(rng):
    acc, gyro, t = make_samples(rng, 16)
    seq, par = run_pair(
        acc, gyro, t, np.ones(16, bool), int(t[-1]) + 2000,
        ba=(0.05, -0.02, 0.01), bw=(0.002, 0.0, -0.001),
    )
    assert_close(seq, par)


def test_parallel_unprimed_carry(rng):
    acc, gyro, t = make_samples(rng, 8)
    seq, par = run_pair(acc, gyro, t, np.ones(8, bool), int(t[-1]) + 2000, primed=False)
    assert_close(seq, par)
    assert bool(par.has_sample)


def test_parallel_zero_samples():
    acc = np.zeros((4, 3), np.float32)
    gyro = np.zeros((4, 3), np.float32)
    t = np.zeros(4, np.int32)
    seq, par = run_pair(acc, gyro, t, np.zeros(4, bool), 50000)
    # both integrate only the held-sample interval to t_end
    np.testing.assert_allclose(np.asarray(par.X), np.asarray(seq.X), atol=1e-5)
    np.testing.assert_allclose(float(par.Dt), float(seq.Dt), atol=1e-6)
