"""I/O layer: native dispatcher vs oracle, TUM round trip, npz round trip."""

import numpy as np
import pytest

from liwslam.io import dispatch as dp
from liwslam.io import openloris, tum


def rand_streams(rng, rates=(200.0, 20.0, 10.0), dur=30.0, jitter=1e-4):
    streams = []
    for hz in rates:
        t = np.arange(0, dur, 1.0 / hz) + rng.normal(0, jitter, int(dur * hz))[: len(np.arange(0, dur, 1.0 / hz))]
        streams.append(np.sort(t))
    return streams


def test_native_builds():
    assert dp.native_lib() is not None, "native dispatcher failed to build"


def test_merge_native_matches_oracle(rng):
    streams = rand_streams(rng)
    s1, i1 = dp.merge(streams, watermark=40, drain=True)
    s2, i2 = dp.merge(streams, watermark=40, drain=True, force_numpy=True)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(i1, i2)
    # output globally time ordered
    times = np.asarray([streams[s][i] for s, i in zip(s1, i1)])
    assert (np.diff(times) > 0).all()


def test_merge_drops_nonmonotonic(rng):
    a = np.asarray([0.0, 1.0, 0.5, 2.0, 3.0] + list(np.arange(4.0, 50.0)))
    b = np.arange(0.05, 50.0, 0.5)
    s, i = dp.merge([a, b], watermark=2, drain=True)
    # the 0.5 entry of sensor 0 (index 2) violates per-sensor monotonicity
    assert not np.any((s == 0) & (i == 2))
    times = np.asarray([[a, b][ss][ii] for ss, ii in zip(s, i)])
    assert (np.diff(times) > 0).all()


def test_merge_watermark_holds_back():
    a = np.arange(0.0, 10.0)
    b = np.arange(0.5, 100.5)
    s, i = dp.merge([a, b], watermark=5, drain=False)
    # sensor a runs dry at 10 messages; without drain the dispatcher stops
    # once a's buffer goes below the watermark
    na = int((s == 0).sum())
    assert na <= len(a)
    assert len(s) < len(a) + len(b)


def test_tum_roundtrip(tmp_path, rng):
    from liwslam.core import geometry as geo
    import jax.numpy as jnp

    F = 10
    T = np.tile(np.eye(4), (F, 1, 1))
    w = rng.normal(size=(F, 3)) * 0.5
    T[:, :3, :3] = np.asarray(geo.exp_so3(jnp.asarray(w, jnp.float32)))
    T[:, :3, 3] = rng.normal(size=(F, 3))
    t_us = (np.arange(F) * 1e5).astype(np.int64)
    p = tmp_path / "traj.txt"
    tum.write_tum(str(p), t_us, T)
    t2, T2 = tum.read_tum(str(p))
    np.testing.assert_allclose(T2, T, atol=1e-5)
    np.testing.assert_allclose(t2, t_us * 1e-6, atol=1e-9)


def test_npz_roundtrip(tmp_path):
    from liwslam import config
    from liwslam.sim import world as sim

    prm = config.office()
    s = sim.simulate(
        sim.default_track("L"), sim.square_room(), prm,
        imu_hz=50, laser_hz=2, n_beams=90,
    )
    p = str(tmp_path / "seq.npz")
    openloris.save_npz(p, s)
    s2 = openloris.load_npz(p)
    np.testing.assert_array_equal(s.imu_t_us, s2.imu_t_us)
    np.testing.assert_allclose(s.laser_points, s2.laser_points)


def test_text_sequence_roundtrip(tmp_path):
    # simulator → OpenLORIS text layout → loader, with groundtruth
    from liwslam import config
    from liwslam.sim import world as sim

    prm = config.office()
    s = sim.simulate(
        sim.default_track("L"), sim.square_room(), prm,
        imu_hz=50, laser_hz=2, n_beams=90,
    )
    d = str(tmp_path / "seq")
    openloris.save_text_sequence(d, s)
    T_iw = prm.mat_T_imu_to_wheel()
    s2 = openloris.load_sequence(d, T_imu_to_wheel=T_iw)

    np.testing.assert_array_equal(s.imu_t_us, s2.imu_t_us)
    np.testing.assert_allclose(s.imu_acc, s2.imu_acc, atol=1e-5)
    np.testing.assert_allclose(s.imu_gyro, s2.imu_gyro, atol=1e-5)
    np.testing.assert_allclose(s.wheel_pose, s2.wheel_pose, atol=1e-5)
    # laser points survive (invalid beams become NaN → filtered)
    ok = s.laser_valid & (np.linalg.norm(s.laser_points[..., :2], axis=-1) > 0.1)
    np.testing.assert_array_equal(ok, s2.laser_valid)
    np.testing.assert_allclose(
        s.laser_points[ok], s2.laser_points[ok], atol=1e-4
    )
    if len(s.gt_t_us):
        np.testing.assert_array_equal(s.gt_t_us, s2.gt_t_us)
        np.testing.assert_allclose(s.gt_T_w_wheel, s2.gt_T_w_wheel, atol=1e-5)
        # derived IMU-frame gt = T_w_wheel @ inv(T_imu_to_wheel)
        want = s.gt_T_w_wheel @ np.linalg.inv(T_iw)
        np.testing.assert_allclose(s2.gt_T_w_imu, want, atol=1e-5)


def test_openloris_text_loader(tmp_path):
    # synthesize a tiny sequence in the text layout and load it
    d = tmp_path / "seq"
    d.mkdir()
    t0 = 1560000000.0
    imu = np.column_stack(
        [t0 + np.arange(20) * 0.01, np.tile([0.1, 0.2, 9.8], (20, 1)), np.tile([0, 0, 0.3], (20, 1))]
    )
    np.savetxt(d / "imu.txt", imu)
    odom = np.column_stack(
        [t0 + np.arange(5) * 0.05, np.arange(5)[:, None] * [0.1, 0, 0], np.tile([0, 0, 0, 1], (5, 1))]
    )
    np.savetxt(d / "odom.txt", odom)
    with open(d / "laser.txt", "w") as f:
        for k in range(3):
            r = " ".join(["2.0"] * 8)
            f.write(f"{t0 + 0.05 * k} {-np.pi} {2 * np.pi / 8} 8 {r}\n")
    s = openloris.load_sequence(str(d))
    assert len(s.imu_t_us) == 20
    assert s.wheel_pose.shape == (5, 4, 4)
    assert s.laser_points.shape == (3, 8, 3)
    assert s.imu_t_us[0] == 0  # rebased
    np.testing.assert_allclose(
        np.linalg.norm(s.laser_points[0, 0, :2]), 2.0, atol=1e-5
    )
