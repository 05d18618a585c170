"""Full-camera-rate LK tracking (round-3 removal of the round-2
deviation): the reference runs camera_manger_.add_frame on EVERY camera
message (trajectory.cpp:279-310), so LK baselines are one camera period
even though observations are only recorded at accepted frames."""

import numpy as np
import jax.numpy as jnp
import pytest

from liwslam import config
from liwslam.camera import tracker as trk
from liwslam.eval import metrics
from liwslam.frontend.driver import Frontend
from liwslam.sim import world as sim


def _texture(h=120, w=160, seed=0):
    rng = np.random.default_rng(seed)
    t = rng.uniform(0, 1, (h, w))
    # bright square blobs -> strong, well-distributed corners
    for _ in range(60):
        y = rng.integers(4, h - 10)
        x = rng.integers(4, w - 10)
        s = rng.integers(3, 7)
        t[y : y + s, x : x + s] = rng.uniform(0.0, 1.0)
    for _ in range(1):
        t = 0.25 * (np.roll(t, 1, 0) + np.roll(t, -1, 0) + np.roll(t, 1, 1) + np.roll(t, -1, 1))
    t = (t - t.min()) / max(float(np.ptp(t)), 1e-6)
    return t.astype(np.float32)


def _rotated_view(tex, angle):
    h, w = tex.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    cx, cy = w / 2, h / 2
    ca, sa = np.cos(angle), np.sin(angle)
    u = ca * (xx - cx) - sa * (yy - cy) + cx
    v = sa * (xx - cx) + ca * (yy - cy) + cy
    u0 = np.clip(np.floor(u).astype(int), 0, w - 2)
    v0 = np.clip(np.floor(v).astype(int), 0, h - 2)
    fu, fv = u - u0, v - v0
    out = (
        tex[v0, u0] * (1 - fu) * (1 - fv)
        + tex[v0, u0 + 1] * fu * (1 - fv)
        + tex[v0 + 1, u0] * (1 - fu) * fv
        + tex[v0 + 1, u0 + 1] * fu * fv
    )
    return out.astype(np.float32)


def _track(img0, img1, pts, valid):
    p, ok = trk.lk_track(
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(pts),
        jnp.asarray(valid), radius=7, iters=10, levels=3, max_err=0.15,
    )
    return np.asarray(p), np.asarray(ok)


def test_small_steps_survive_where_one_jump_dies():
    """The mechanism full-rate tracking buys: rotation split into camera-
    period steps keeps tracks alive; the same total rotation in one
    laser-period jump kills most of them."""
    tex = _texture()
    step = 0.2  # rad per camera period (an aggressive spin)
    views = [_rotated_view(tex, a) for a in (0.0, step, 2 * step, 3 * step)]
    pts0, ok0 = trk.select_features(
        jnp.asarray(views[0]), 64, 8.0, cell_px=8
    )
    pts0, ok0 = np.asarray(pts0), np.asarray(ok0)
    # keep features away from the border (rotation moves them)
    r = np.linalg.norm(pts0 - np.asarray([80.0, 60.0]), axis=1)
    ok0 = ok0 & (r < 50)
    n0 = ok0.sum()
    assert n0 >= 8

    # chained small steps (what full-rate gives)
    p, ok = pts0.copy(), ok0.copy()
    for a, b in zip(views[:-1], views[1:]):
        p, ok = _track(a, b, p, ok)
    chained = ok.sum() / n0

    # one big jump (the round-2 behavior at 30 Hz camera / 10 Hz laser)
    _, ok_big = _track(views[0], views[-1], pts0, ok0)
    onejump = ok_big.sum() / n0

    assert chained >= 0.85, (chained, onejump)
    # margin 0.2: the survival gap is a statistical quantity over ~15
    # selected corners; fp-ordering changes in select_features (r4 band-
    # matmul box filter) legitimately shift which corners are picked
    assert chained > onejump + 0.2, (chained, onejump)

    # survivors land where the rotation says they should
    ca, sa = np.cos(3 * step), np.sin(3 * step)
    c = np.asarray([80.0, 60.0])
    d = pts0 - c
    expect = np.stack(
        [ca * d[:, 0] + sa * d[:, 1], -sa * d[:, 0] + ca * d[:, 1]], -1
    ) + c
    err = np.linalg.norm(p - expect, axis=1)[ok]
    assert np.median(err) < 2.5, np.median(err)


W_PX, H_PX = 160, 120


def fast_rot_params():
    return config.office().replace(
        enable_camera=True,
        camera_K=sim.synthetic_camera_K(W_PX, H_PX),
        T_imu_to_camera=(
            0.0, 0.0, 1.0, 0.05,
            -1.0, 0.0, 0.0, 0.0,
            0.0, -1.0, 0.0, 0.0,
            0.0, 0.0, 0.0, 1.0,
        ),
        # 6 px: calibrated on the bench track (tools/diag_camera_ate.py
        # sweep, round 5) — 1.5 px was overconfident for the actual
        # observation error (LK noise + frozen-ring linearization bias)
        # and DEGRADED ATE 4x; at 6 px the camera is ATE-neutral
        camera_sigma=(6.0, 6.0),
        max_camera_reproject_error=4.0,
        max_camera_feature_dis=30.0,
        max_feature_num=40,
        feature_min_dis=10.0,
        cam_feature_capacity=48,
        cam_obs_window=8,
        cam_min_obs=4,
        cam_min_parallax=0.01,
        max_points=512,
        max_lines=48,
        max_corners=16,
        ref_capacity=512,
        max_imu_per_frame=32,
        max_wheel_per_frame=8,
        solver_max_iterations=6,
        init_solver_max_iterations=20,
    )


def test_e2e_fast_rotation_30hz_camera():
    """30 Hz camera / 10 Hz laser with a fast-yaw track: the packer sizes
    the extra-image slots from the stream, the per-frame program tracks
    through them, and tracks survive the rotation."""
    prm = fast_rot_params()
    # fast rotation legs (0.9 rad/s) between straights
    track = sim.TwistTrack(
        [(2.0, 0.0, 0.0, 0.0), (2.0, 0.3, 0.0, 0.0), (1.8, 0.1, 0.0, 0.9),
         (2.0, 0.3, 0.0, 0.0), (1.8, 0.1, 0.0, 0.9), (2.0, 0.3, 0.0, 0.0)]
    )
    streams = sim.simulate(
        track,
        sim.square_room(obstacles=True),
        prm,
        imu_hz=100,
        wheel_hz=20,
        laser_hz=10,
        n_beams=360,
        camera_hz=30.0,
        camera_wh=(W_PX, H_PX),
        noise=False,
        seed=0,
    )
    fe = Frontend(prm)
    frames, lt = fe.pack_frames(streams)
    # the stream really carries ~2 extra messages per laser interval
    ne = frames[0].cam_extra_imgs.shape[0]
    assert ne >= 2, ne
    n_masked = sum(int(np.asarray(f.cam_extra_mask).sum()) for f in frames)
    assert n_masked >= len(frames), n_masked

    res = fe.run(streams, chunk_size=8)
    assert len(res.cam_t_us) > 10
    # tracks survive the fast-rotation legs at camera-period baselines
    # (the sim camera renders sparse wall landmarks — single-digit track
    # counts are the attainable ceiling, cf. test_camera_e2e; the gate is
    # survival: the chain never collapses, and stays healthy on median)
    assert np.median(res.cam_n_tracked) >= 5, np.median(res.cam_n_tracked)
    assert np.min(res.cam_n_tracked) >= 2, np.min(res.cam_n_tracked)
    # trajectory stays sane
    pairs = metrics.associate_by_time(res.t_us, streams.gt_t_us)
    gt = streams.gt_T_w_imu[pairs[:, 1]]
    ate = metrics.ate_rmse(res.T_w_imu()[pairs[:, 0]], gt, align=False)
    assert ate < 0.1, ate
