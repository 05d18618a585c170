"""Scan-to-submap matching and double-buffered reference accumulation."""

import numpy as np
import jax
import jax.numpy as jnp

from liwslam import config
from liwslam.core import geometry as geo
from liwslam.frontend import matching as mm
from liwslam.sim import world as sim

from test_scan import extract, room_scan

PRM = config.office()
TIL = jnp.asarray(PRM.mat_T_imu_to_laser(), jnp.float32)


def scan_at(pose_xy, yaw):
    """Extract features of a room scan taken at a planar LASER pose.

    For test simplicity the 'IMU' pose here is the laser pose itself
    (identity extrinsic would make them equal); we pass Til=I4."""
    pts, ok = room_scan(pose_xy=pose_xy, yaw=yaw)
    # rotate points into the sensor frame: room_scan already returns points
    # in a frame aligned with yaw=yaw? No: beams_local are sensor angles but
    # ranges were cast with world angles; the returned points are in the
    # sensor frame. See room_scan.
    return extract(pts, ok)


def test_match_identity():
    feats = scan_at((0.0, 0.0), 0.0)
    p = jnp.zeros(3)
    q = jnp.zeros(3)
    sub = mm.submap_from_scan(feats, p, q, 256)
    match = mm.match_lines(
        sub, feats, p, q, jnp.eye(4), resolution=PRM.laser_resolution
    )
    lv = np.asarray(feats.line_valid)
    matched = np.asarray(match.valid)
    assert matched.sum() == lv.sum()
    np.testing.assert_allclose(
        np.asarray(match.ref_p1)[matched], np.asarray(match.new_p1)[matched], atol=1e-5
    )


def test_match_across_motion():
    # scan 1 at origin, scan 2 translated; predicted poses exact
    f1 = scan_at((0.0, 0.0), 0.0)
    f2 = scan_at((0.5, 0.2), 0.1)
    p1 = jnp.zeros(3)
    q1 = jnp.zeros(3)
    p2 = jnp.asarray([0.5, 0.2, 0.0], jnp.float32)
    q2 = jnp.asarray([0.0, 0.0, 0.1], jnp.float32)
    sub = mm.submap_from_scan(f1, p1, q1, 256)
    match = mm.match_lines(sub, f2, p2, q2, jnp.eye(4), resolution=PRM.laser_resolution)
    mv = np.asarray(match.valid)
    assert mv.sum() >= 3, mv.sum()
    # matched pairs must coincide geometrically under the true transform
    T12 = np.asarray(geo.tf_inv(geo.make_tf(p1, q1)) @ geo.make_tf(p2, q2))
    q1w = (T12[:3, :3] @ np.asarray(match.new_p1).T).T + T12[:3, 3]
    d = np.asarray(
        geo.dis_from_line(
            jnp.asarray(q1w), jnp.asarray(match.ref_p1), jnp.asarray(match.ref_p2)
        )
    )
    assert d[mv].max() < 0.05, d[mv]


def test_match_with_wrong_prediction_fails_gracefully():
    f1 = scan_at((0.0, 0.0), 0.0)
    f2 = scan_at((0.5, 0.2), 0.1)
    sub = mm.submap_from_scan(f1, jnp.zeros(3), jnp.zeros(3), 256)
    # predicted pose 3 m off: candidate gate should reject almost all
    match = mm.match_lines(
        sub,
        f2,
        jnp.asarray([3.0, -2.0, 0.0]),
        jnp.asarray([0.0, 0.0, 1.5]),
        jnp.eye(4),
        resolution=PRM.laser_resolution,
    )
    # mid-point gate: far fewer (often zero) matches, and no NaNs
    assert int(match.n) <= int(f2.n_lines)
    assert np.isfinite(np.asarray(match.ref_p1)).all()


def test_add_scan_seed_and_promote_nacc2():
    feats = scan_at((0.0, 0.0), 0.0)
    pair = mm.empty_pair(256)
    kw = dict(
        ref_n_accumulation=2,
        motion_filter_p=PRM.ref_motion_filter_p,
        motion_filter_q=PRM.ref_motion_filter_q,
    )
    step = lambda pr, p: mm.add_scan(
        pr, feats, jnp.asarray(p, jnp.float32), jnp.zeros(3), jnp.eye(4), **kw
    )
    pair = step(pair, [0.0, 0.0, 0.0])
    assert bool(pair.ref.active) and int(pair.count) == 1
    n1 = int(pair.ref.n)
    pair = step(pair, [0.5, 0.0, 0.0])
    # n_acc=2 promote with never-spawned buffer: ref goes inactive
    # (reference behavior: ref_submap_ptr = nullptr spawning)
    assert not bool(pair.ref.active)
    assert bool(pair.spawning.active) and int(pair.spawning.n) == n1
    pair = step(pair, [1.0, 0.0, 0.0])  # reseed
    assert bool(pair.ref.active) and int(pair.count) == 1
    pair = step(pair, [1.5, 0.0, 0.0])  # promote: ref <- spawning(2 scans)
    assert bool(pair.ref.active)
    assert int(pair.ref.n) == 2 * n1


def test_add_scan_motion_filter():
    feats = scan_at((0.0, 0.0), 0.0)
    pair = mm.empty_pair(256)
    kw = dict(ref_n_accumulation=100, motion_filter_p=0.01, motion_filter_q=0.01)
    pair = mm.add_scan(pair, feats, jnp.zeros(3), jnp.zeros(3), jnp.eye(4), **kw)
    n1 = int(pair.ref.n)
    # 1 mm of motion: filtered, nothing accumulates
    pair2 = mm.add_scan(
        pair, feats, jnp.asarray([0.001, 0, 0], jnp.float32), jnp.zeros(3), jnp.eye(4), **kw
    )
    assert int(pair2.ref.n) == n1
    assert int(pair2.count) == 1


def test_add_scan_nacc100_spawning_phase():
    feats = scan_at((0.0, 0.0), 0.0)
    pair = mm.empty_pair(4096)
    kw = dict(ref_n_accumulation=6, motion_filter_p=0.001, motion_filter_q=0.001)
    x = 0.0
    for i in range(8):
        x += 0.5
        pair = mm.add_scan(
            pair, feats, jnp.asarray([x, 0, 0], jnp.float32), jnp.zeros(3), jnp.eye(4), **kw
        )
    # after 8 scans with n_acc=6: spawn at count 3, promote at 6 (count->3),
    # counts 4,5 for scans 7,8
    assert int(pair.count) == 5
    assert bool(pair.ref.active) and bool(pair.spawning.active)


def test_capacity_overflow_drops():
    feats = scan_at((0.0, 0.0), 0.0)
    nl = int(feats.n_lines)
    sub = mm.submap_from_scan(feats, jnp.zeros(3), jnp.zeros(3), nl + 2)
    sub = mm.append_lines(sub, feats.p1, feats.p2, feats.line_valid)
    assert int(sub.n) == nl + 2
    assert bool(np.asarray(sub.valid)[: nl + 2].all())
