"""Dynamic-scene robustness (the cafe/market capability, BASELINE config 3).

The reference survives moving objects via the match mean-distance filter
(laser_manager.cpp:315-345): matches whose point-to-line distance exceeds
1.2x the mean are dropped before the solve.  These tests (a) pin that
filter's behavior directly and (b) gate end-to-end ATE on a sequence with
moving obstacles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from liwslam import config
from liwslam.eval import metrics
from liwslam.frontend import matching as mm
from liwslam.frontend import scan as scan_mod
from liwslam.frontend.driver import Frontend
from liwslam.sim import world as sim


def small_params():
    return config.office().replace(
        max_points=512,
        max_lines=48,
        max_corners=16,
        ref_capacity=512,
        max_imu_per_frame=32,
        max_wheel_per_frame=8,
        solver_max_iterations=8,
        init_solver_max_iterations=25,
    )


def test_mean_distance_filter_drops_moved_lines():
    """A line displaced sideways (a dynamic object moved between the
    reference submap and the scan) must be rejected while the static wall
    matches survive (laser_manager.cpp:315-345 semantics)."""
    L = 8
    dtype = jnp.float32
    # reference lines: horizontal wall pieces y = k
    p1 = np.zeros((L, 3), np.float32)
    p2 = np.zeros((L, 3), np.float32)
    for k in range(L):
        p1[k] = (0.0, float(k), 0.0)
        p2[k] = (1.0, float(k), 0.0)
    ref = mm.RefSubmap(
        p1=jnp.asarray(p1),
        p2=jnp.asarray(p2),
        valid=jnp.ones(L, bool),
        n=jnp.asarray(L, jnp.int32),
        pose_p=jnp.zeros(3, dtype),
        pose_q=jnp.zeros(3, dtype),
        active=jnp.asarray(True),
    )
    # scan lines: identical, except line 3 shifted 0.3 m sideways (dynamic)
    s1 = p1.copy()
    s2 = p2.copy()
    s1[3, 1] += 0.3
    s2[3, 1] += 0.3
    feats = scan_mod.ScanFeatures(
        p1=jnp.asarray(s1),
        p2=jnp.asarray(s2),
        line_valid=jnp.ones(L, bool),
        corners=jnp.zeros((4, 3), dtype),
        corner_valid=jnp.zeros(4, bool),
    )
    Til = jnp.eye(4, dtype=dtype)
    match = mm.match_lines(
        ref, feats, jnp.zeros(3, dtype), jnp.zeros(3, dtype), Til,
        resolution=jnp.asarray(0.2, dtype),
    )
    v = np.asarray(match.valid)
    assert not v[3], "displaced (dynamic) line should be filtered"
    assert v.sum() >= L - 2, v
    # with the filter disabled (huge k) the displaced line survives
    match_off = mm.match_lines(
        ref, feats, jnp.zeros(3, dtype), jnp.zeros(3, dtype), Til,
        resolution=jnp.asarray(0.2, dtype), mean_dist_k=1e6,
    )
    assert np.asarray(match_off.valid)[3]


@pytest.fixture(scope="module")
def dynamic_run():
    prm = small_params()
    movers = [
        sim.MovingBox(center=(2.0, 1.0), size=(0.5, 0.5), velocity=(0.5, 0.0), period=3.0),
        sim.MovingBox(center=(-1.5, 2.5), size=(0.4, 0.6), velocity=(0.0, 0.4), period=2.5),
        sim.MovingBox(center=(0.5, -2.0), size=(0.6, 0.4), velocity=(0.35, 0.35), period=4.0),
    ]
    streams = sim.simulate(
        sim.default_track("L"),
        sim.square_room(obstacles=True),
        prm,
        imu_hz=100,
        wheel_hz=20,
        laser_hz=5,
        n_beams=360,
        noise=True,
        movers=movers,
        seed=0,
    )
    fe = Frontend(prm)
    res = fe.run(streams, chunk_size=16)
    return prm, streams, res


def test_dynamic_scene_ate_bounded(dynamic_run):
    prm, streams, res = dynamic_run
    assert len(res.p) >= 40
    est = res.T_w_imu()
    pairs = metrics.associate_by_time(res.t_us, streams.gt_t_us)
    gt = streams.gt_T_w_imu[pairs[:, 1]]
    ate = metrics.ate_rmse(est[pairs[:, 0]], gt, align=False)
    # three moving boxes sweeping the room: tracking must stay tight
    assert ate < 0.12, f"dynamic-scene ATE {ate}"


def test_dynamic_scene_still_matches_walls(dynamic_run):
    prm, streams, res = dynamic_run
    # the static environment keeps dominating the matches
    assert np.median(res.n_match[res.n_match > 0]) >= 4
