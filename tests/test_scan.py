"""Line/corner extraction on synthetic scans."""

import numpy as np
import jax
import jax.numpy as jnp

from liwslam import config
from liwslam.frontend import scan as scan_mod
from liwslam.sim import world as sim


def extract(points, valid, prm=None, **kw):
    prm = prm or config.office()
    args = dict(
        continuous_threshold=prm.line_continuous_threshold,
        min_len=prm.line_min_len,
        max_dis=prm.line_max_dis,
        tolerance_angle_rad=prm.line_max_tolerance_angle_rad,
        resolution=prm.laser_resolution,
        max_lines=prm.max_lines,
        max_corners=prm.max_corners,
    )
    args.update(kw)
    f = jax.jit(
        lambda p, v: scan_mod.extract_features(p, v, **args)
    )
    return f(jnp.asarray(points, jnp.float32), jnp.asarray(valid))


def room_scan(pose_xy=(0.0, 0.0), yaw=0.0, n_beams=720, obstacles=False, size=8.0):
    segs = sim.square_room(size=size, obstacles=obstacles)
    beams = np.linspace(-np.pi, np.pi, n_beams, endpoint=False) + yaw
    dirs = np.stack([np.cos(beams), np.sin(beams)], -1)
    rng = sim.raycast(np.asarray(pose_xy, np.float64), dirs, segs, max_range=30.0)
    ok = np.isfinite(rng)
    beams_local = np.linspace(-np.pi, np.pi, n_beams, endpoint=False)
    pts = np.stack(
        [
            np.where(ok, rng, 0) * np.cos(beams_local),
            np.where(ok, rng, 0) * np.sin(beams_local),
            np.zeros(n_beams),
        ],
        -1,
    )
    return pts, ok


def test_square_room_four_walls():
    pts, ok = room_scan()
    feats = extract(pts, ok)
    n = int(feats.n_lines)
    # 4 walls; each may split at the scan wrap or occlusions: 4..8 lines
    assert 4 <= n <= 8, n
    # every detected line must lie on a wall (|x|=4 or |y|=4)
    p1 = np.asarray(feats.p1)[np.asarray(feats.line_valid)]
    p2 = np.asarray(feats.p2)[np.asarray(feats.line_valid)]
    mid = (p1 + p2) / 2
    on_wall = (np.abs(np.abs(mid[:, 0]) - 4.0) < 0.05) | (
        np.abs(np.abs(mid[:, 1]) - 4.0) < 0.05
    )
    assert on_wall.all(), mid

    # 4 room corners at (+-4, +-4)
    c = np.asarray(feats.corners)[np.asarray(feats.corner_valid)]
    assert len(c) >= 3  # the wrap-around corner may be lost to the seam
    want = np.array([[4, 4], [4, -4], [-4, 4], [-4, -4]], float)
    d = np.linalg.norm(c[:, None, :2] - want[None], axis=-1).min(axis=1)
    assert (d < 0.08).all(), c


def test_line_endpoints_span_walls():
    pts, ok = room_scan(pose_xy=(1.0, 0.5), yaw=0.3)
    feats = extract(pts, ok)
    lv = np.asarray(feats.line_valid)
    p1 = np.asarray(feats.p1)[lv]
    p2 = np.asarray(feats.p2)[lv]
    lens = np.linalg.norm(p1 - p2, axis=-1)
    # off-center in an 8m room: the longest wall view is several meters
    assert lens.max() > 3.0
    assert (lens >= config.office().line_min_len - 1e-5).all()


def test_noisy_scan_still_fits(rng):
    pts, ok = room_scan()
    pts = pts + rng.normal(0, 0.005, pts.shape) * ok[:, None]
    feats = extract(pts, ok)
    assert int(feats.n_lines) >= 4


def test_gap_splits_segments():
    # two parallel walls with a gap: scanning a wall with a hole
    n = 400
    x = np.linspace(-2, 2, n)
    pts = np.stack([x, np.ones(n), np.zeros(n)], -1)
    ok = np.ones(n, bool)
    ok[180:220] = False  # 40-beam hole
    feats = extract(pts, ok)
    lv = np.asarray(feats.line_valid)
    assert lv.sum() == 2
    p1 = np.asarray(feats.p1)[lv]
    p2 = np.asarray(feats.p2)[lv]
    np.testing.assert_allclose(
        np.sort(np.concatenate([p1[:, 1], p2[:, 1]])), 1.0, atol=1e-3
    )


def test_invalid_scan_yields_nothing():
    pts = np.zeros((128, 3))
    feats = extract(pts, np.zeros(128, bool))
    assert int(feats.n_lines) == 0
    assert int(feats.n_corners) == 0


def test_l_shape_corner():
    # an L of two 2m walls meeting at the origin
    n = 200
    a = np.stack([np.linspace(-2, 0, n), np.zeros(n), np.zeros(n)], -1)
    b = np.stack([np.zeros(n), np.linspace(0.02, 2, n), np.zeros(n)], -1)
    pts = np.concatenate([a, b])
    ok = np.ones(len(pts), bool)
    feats = extract(pts, ok)
    assert int(feats.n_lines) == 2
    c = np.asarray(feats.corners)[np.asarray(feats.corner_valid)]
    assert len(c) == 1
    np.testing.assert_allclose(c[0][:2], [0, 0], atol=0.05)


def test_obstacles_add_corners():
    pts, ok = room_scan(obstacles=True)
    feats = extract(pts, ok)
    assert int(feats.n_lines) >= 6
    # from the room center several obstacle corners are occluded/edge-on;
    # three (two room + one obstacle) are cleanly visible
    assert int(feats.n_corners) >= 3


def test_deskew_straightens_motion():
    # a scan taken while rotating: deskew with the true twist restores it
    n = 360
    beams = np.linspace(-np.pi, np.pi, n, endpoint=False)
    segs = sim.square_room(obstacles=False)
    wz = 1.0  # rad/s
    dur = 0.025
    times = np.arange(n) / n * dur
    pts = np.zeros((n, 3))
    for j in range(n):
        yaw = wz * times[j]
        d = np.array([np.cos(beams[j] + yaw), np.sin(beams[j] + yaw)])
        r = sim.raycast(np.zeros(2), d[None], segs)[0]
        # measured in the *rotated* frame: the sensor reports (r, beam)
        pts[j] = [r * np.cos(beams[j]), r * np.sin(beams[j]), 0.0]
    fixed = np.asarray(
        scan_mod.deskew(
            jnp.asarray(pts, jnp.float32),
            jnp.asarray(times, jnp.float32),
            jnp.zeros(3),
            jnp.asarray([0, 0, wz], jnp.float32),
        )
    )
    # after deskew all points lie on the walls (|x| or |y| == 4)
    err = np.minimum(np.abs(np.abs(fixed[:, 0]) - 4), np.abs(np.abs(fixed[:, 1]) - 4))
    assert err.max() < 0.02, err.max()


def test_fast_prefix_parity():
    # the one-shot N^2 fastscan forms must select the same lines/corners
    # as the log-depth scans on a realistic noisy scan.  Integer selection
    # (breakpoints, validity) is exact; line endpoints differ only by f32
    # summation order in the moment prefix sums (sub-mm)
    rng = np.random.default_rng(7)
    pts, ok = room_scan(obstacles=True)
    pts = pts + rng.normal(0, 0.005, pts.shape) * ok[:, None]
    slow = extract(pts, ok, fast_prefix="off")
    fast = extract(pts, ok, fast_prefix="on")
    np.testing.assert_array_equal(
        np.asarray(slow.line_valid), np.asarray(fast.line_valid)
    )
    np.testing.assert_array_equal(
        np.asarray(slow.corner_valid), np.asarray(fast.corner_valid)
    )
    for name in ("p1", "p2", "corners"):
        np.testing.assert_allclose(
            np.asarray(getattr(slow, name)),
            np.asarray(getattr(fast, name)),
            atol=2e-3,
            err_msg=name,
        )


def test_compact_cap_larger_than_candidates():
    # max_corners above the corner-pair grid size must pad, not error
    # (ADVICE r2: top_k k<=N requirement)
    valid = jnp.asarray([True, False, True])
    out = scan_mod._compact(valid, 8, jnp.arange(3.0))
    ov, vals = out
    assert ov.shape == (8,) and vals.shape == (8,)
    np.testing.assert_array_equal(np.asarray(ov), [1, 1, 0, 0, 0, 0, 0, 0])
    np.testing.assert_allclose(np.asarray(vals)[:2], [0.0, 2.0])
