"""Synthetic line-world simulator: ground-truth trajectories -> sensor streams.

The reference has no tests and validates against OpenLORIS rosbags
(readme.md:33-39).  This module replaces dataset playback for CI and
benchmarking: a 2D world of wall segments, a piecewise-twist wheel
trajectory, and exact sensor models that produce the same stream format the
OpenLORIS loader emits:

- wheel odometry: absolute planar poses of the wheel frame,
- IMU: specific force + body rates in the IMU frame (gravity included),
  derived by exact central differencing of the analytic pose track,
- laser: 2D raycasts against the wall segments from the laser extrinsic
  pose, optional per-ray motion skew and range noise.

Everything here is host-side float64 numpy (this is data generation, not
the compute path).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np

G_W = np.array([0.0, 0.0, -9.8])  # world gravity (world = initial wheel frame)


def make_tf_np(p, yaw):
    T = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    T[:2, :2] = [[c, -s], [s, c]]
    T[:3, 3] = [p[0], p[1], 0.0]
    return T


@dataclass
class TwistTrack:
    """Piecewise-constant body twist (v_x, v_y, omega_z) wheel trajectory."""

    segments: list  # list of (duration_s, vx, vy, wz)

    def total_time(self):
        return sum(s[0] for s in self.segments)

    def pose(self, t: float) -> np.ndarray:
        """Exact wheel pose at time t (closed-form twist integration)."""
        T = np.eye(4)
        rem = t
        for dur, vx, vy, wz in self.segments:
            dt = min(rem, dur)
            if dt > 0:
                T = T @ _exp_twist2d(vx, vy, wz, dt)
            rem -= dt
            if rem <= 0:
                break
        return T

    def poses(self, ts: np.ndarray) -> np.ndarray:
        return np.stack([self.pose(float(t)) for t in ts])


def _exp_twist2d(vx, vy, wz, dt):
    """SE(2) exponential embedded in SE(3)."""
    th = wz * dt
    if abs(wz) < 1e-9:
        p = np.array([vx * dt, vy * dt])
    else:
        # V matrix for SE(2)
        s, c = np.sin(th), np.cos(th)
        # translation = V(theta) @ (v*dt); the th/wz factor folds in the dt
        V = np.array([[s / th, -(1 - c) / th], [(1 - c) / th, s / th]]) * th / wz
        p = V @ np.array([vx, vy])
    return make_tf_np(p, th)


def square_room(size=8.0, obstacles=True) -> np.ndarray:
    """Wall segments (S,4) [x1,y1,x2,y2] of a square room w/ L-obstacles
    (gives the corner detector work)."""
    s = size / 2
    segs = [
        (-s, -s, s, -s),
        (s, -s, s, s),
        (s, s, -s, s),
        (-s, s, -s, -s),
    ]
    if obstacles:
        segs += [
            (-s + 1.5, -s + 2.0, -s + 3.0, -s + 2.0),
            (-s + 3.0, -s + 2.0, -s + 3.0, -s + 3.2),
            (s - 2.0, -1.0, s - 2.0, 1.0),
            (s - 2.0, 1.0, s - 3.2, 1.0),
            (-1.0, s - 2.5, 1.2, s - 2.5),
        ]
    return np.asarray(segs, np.float64)


def corridor_world(length=30.0, width=3.0) -> np.ndarray:
    """A long corridor with alcoves — the loop-closure stress case."""
    w = width / 2
    segs = [
        (0, -w, length, -w),
        (0, w, length, w),
        (0, -w, 0, w),
        (length, -w, length, w),
    ]
    for x in np.arange(4.0, length - 2, 5.0):
        segs += [(x, w, x, w + 0.6), (x, w + 0.6, x + 0.8, w + 0.6), (x + 0.8, w + 0.6, x + 0.8, w)]
    return np.asarray(segs, np.float64)


def raycast(origin_xy, dirs_xy, segments, max_range=30.0, min_range=0.1):
    """Batch 2D raycast.  origin_xy (2,) or (B,2); dirs_xy (B,2) unit;
    segments (S,4).  Returns ranges (B,), inf where no hit."""
    o = np.broadcast_to(np.asarray(origin_xy, np.float64), dirs_xy.shape)
    d = dirs_xy
    a = segments[:, 0:2]
    b = segments[:, 2:4]
    e = b - a  # (S,2)
    # solve o + t d = a + s e : [d, -e][t, s]' = a - o
    dx = d[:, None, 0]
    dy = d[:, None, 1]
    ex = e[None, :, 0]
    ey = e[None, :, 1]
    det = dx * (-ey) - dy * (-ex)  # (B,S)
    rx = a[None, :, 0] - o[:, None, 0]
    ry = a[None, :, 1] - o[:, None, 1]
    safe = np.where(np.abs(det) < 1e-12, 1.0, det)
    t = (rx * (-ey) - ry * (-ex)) / safe
    s = (dx * ry - dy * rx) / safe
    hit = (np.abs(det) > 1e-12) & (t > min_range) & (s >= 0.0) & (s <= 1.0)
    t = np.where(hit, t, np.inf)
    rng = t.min(axis=1)
    return np.where(rng <= max_range, rng, np.inf)


@dataclass
class SimStreams:
    """Packed sensor streams; all times are int64 microseconds from t=0."""

    imu_t_us: np.ndarray  # (Ni,)
    imu_acc: np.ndarray  # (Ni,3) f32
    imu_gyro: np.ndarray  # (Ni,3) f32
    wheel_t_us: np.ndarray  # (Nw,)
    wheel_pose: np.ndarray  # (Nw,4,4) f32
    laser_t_us: np.ndarray  # (Nl,)
    laser_points: np.ndarray  # (Nl,B,3) f32  (laser frame)
    laser_times_rel: np.ndarray  # (Nl,B) f32 per-ray offset from stamp
    laser_valid: np.ndarray  # (Nl,B) bool
    gt_t_us: np.ndarray  # (Nl,)
    gt_T_w_imu: np.ndarray  # (Nl,4,4) f64
    gt_T_w_wheel: np.ndarray  # (Nl,4,4) f64


def simulate(
    track: TwistTrack,
    segments: np.ndarray,
    params,
    *,
    imu_hz=200.0,
    wheel_hz=20.0,
    laser_hz=10.0,
    n_beams=720,
    fov=2 * np.pi,
    max_range=25.0,
    scan_duration=0.025,
    skew=False,
    noise=False,
    seed=0,
) -> SimStreams:
    rng = np.random.default_rng(seed)
    T_iw = params.mat_T_imu_to_wheel()  # wheel->imu
    T_il = params.mat_T_imu_to_laser()  # laser->imu
    T_wi_inv = np.linalg.inv(T_iw)
    total = track.total_time()

    def T_w_imu(t):
        return track.pose(t) @ T_wi_inv  # world_from_wheel @ wheel_from_imu

    # --- IMU: central differences of the exact pose track ---------------
    imu_ts = np.arange(0.0, total, 1.0 / imu_hz)
    h = 1e-4
    acc = np.zeros((len(imu_ts), 3))
    gyro = np.zeros((len(imu_ts), 3))
    for i, t in enumerate(imu_ts):
        Tm = T_w_imu(max(t - h, 0.0))
        T0 = T_w_imu(t)
        Tp = T_w_imu(t + h)
        p_m, p_0, p_p = Tm[:3, 3], T0[:3, 3], Tp[:3, 3]
        a_w = (p_p - 2 * p_0 + p_m) / (h * h) if t >= h else np.zeros(3)
        R0 = T0[:3, :3]
        acc[i] = R0.T @ (a_w - G_W)
        dR = Tm[:3, :3].T @ Tp[:3, :3]
        w_body = _log_so3_np(dR) / (2 * h) if t >= h else _log_so3_np(T0[:3, :3].T @ Tp[:3, :3]) / h
        gyro[i] = w_body
    if noise:
        acc += rng.normal(0, 0.02, acc.shape)
        gyro += rng.normal(0, 0.002, gyro.shape)

    # --- wheel odometry ---------------------------------------------------
    wheel_ts = np.arange(0.0, total, 1.0 / wheel_hz)
    wheel_poses = track.poses(wheel_ts)
    if noise:
        for i in range(len(wheel_poses)):
            wheel_poses[i] = wheel_poses[i] @ make_tf_np(
                rng.normal(0, 0.0005, 2), rng.normal(0, 0.0005)
            )

    # --- laser -------------------------------------------------------------
    laser_ts = np.arange(0.1, total, 1.0 / laser_hz)
    beams = np.linspace(-fov / 2, fov / 2, n_beams, endpoint=False)
    ray_rel = (np.arange(n_beams) / n_beams) * scan_duration
    pts = np.zeros((len(laser_ts), n_beams, 3), np.float32)
    valid = np.zeros((len(laser_ts), n_beams), bool)
    for i, t in enumerate(laser_ts):
        if skew:
            origins = np.zeros((n_beams, 2))
            dirs = np.zeros((n_beams, 2))
            rngs = np.zeros(n_beams)
            # per-ray pose (exact): raycast each ray from its own pose
            for j in range(n_beams):
                Twl = T_w_imu(t + ray_rel[j]) @ T_il
                d_l = np.array([np.cos(beams[j]), np.sin(beams[j]), 0.0])
                d_w = Twl[:3, :3] @ d_l
                n2 = np.linalg.norm(d_w[:2])
                r2 = raycast(Twl[:2, 3], (d_w[:2] / n2)[None], segments, max_range)[0]
                rngs[j] = r2 / n2 if np.isfinite(r2) else np.inf
            Twl0 = T_w_imu(t) @ T_il
        else:
            Twl0 = T_w_imu(t) @ T_il
            d_l = np.stack([np.cos(beams), np.sin(beams), np.zeros(n_beams)], -1)
            d_w = (Twl0[:3, :3] @ d_l.T).T
            n2 = np.linalg.norm(d_w[:, :2], axis=-1)
            r2 = raycast(Twl0[:2, 3], d_w[:, :2] / n2[:, None], segments, max_range)
            rngs = r2 / n2
        if noise:
            rngs = rngs + rng.normal(0, 0.005, rngs.shape)
        ok = np.isfinite(rngs) & (rngs > 0.1)
        # points expressed in the laser frame at each ray's own time (what
        # a real scan message contains); deskew is the pipeline's job
        d_l = np.stack([np.cos(beams), np.sin(beams), np.zeros(n_beams)], -1)
        pts[i] = (np.where(ok, rngs, 0.0)[:, None] * d_l).astype(np.float32)
        valid[i] = ok

    gt = np.stack([T_w_imu(t) for t in laser_ts])
    gtw = track.poses(laser_ts)

    us = lambda x: np.round(np.asarray(x) * 1e6).astype(np.int64)
    return SimStreams(
        imu_t_us=us(imu_ts),
        imu_acc=acc.astype(np.float32),
        imu_gyro=gyro.astype(np.float32),
        wheel_t_us=us(wheel_ts),
        wheel_pose=wheel_poses.astype(np.float32),
        laser_t_us=us(laser_ts),
        laser_points=pts,
        laser_times_rel=np.tile(ray_rel.astype(np.float32), (len(laser_ts), 1)),
        laser_valid=valid,
        gt_t_us=us(laser_ts),
        gt_T_w_imu=gt,
        gt_T_w_wheel=gtw,
    )


def _log_so3_np(R):
    tr = np.clip((np.trace(R) - 1) / 2, -1.0, 1.0)
    th = np.arccos(tr)
    if th < 1e-9:
        return np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]) / 2
    v = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return th / (2 * np.sin(th)) * v


def default_track(kind="loop") -> TwistTrack:
    """Canonical test tracks.  'loop' returns to the start (loop closure);
    'L' is a simple two-leg run; 'static_start' begins with a pause."""
    if kind == "loop":
        return TwistTrack(
            [
                (2.0, 0.0, 0.0, 0.0),  # static start (init gate)
                (6.0, 0.4, 0.0, 0.0),
                (3.5, 0.3, 0.0, np.pi / 2 / 3.5),
                (6.0, 0.4, 0.0, 0.0),
                (3.5, 0.3, 0.0, np.pi / 2 / 3.5),
                (6.0, 0.4, 0.0, 0.0),
                (3.5, 0.3, 0.0, np.pi / 2 / 3.5),
                (6.0, 0.4, 0.0, 0.0),
                (3.5, 0.3, 0.0, np.pi / 2 / 3.5),
            ]
        )
    if kind == "L":
        return TwistTrack(
            [
                (2.0, 0.0, 0.0, 0.0),
                (5.0, 0.3, 0.0, 0.0),
                (2.0, 0.2, 0.0, np.pi / 2 / 2.0),
                (5.0, 0.3, 0.0, 0.0),
            ]
        )
    raise ValueError(kind)
