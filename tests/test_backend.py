"""Loop detection + pose-graph back end on synthetic data."""

import numpy as np
import jax
import jax.numpy as jnp

from liwslam import config
from liwslam.backend import loop as loop_mod
from liwslam.backend import manager as km
from liwslam.backend import posegraph as pg
from liwslam.core import geometry as geo


def prm_small():
    return config.office().replace(
        map_corner_capacity=32,
        submap_count=3,
        loop_detect_min_interval=10,
        laser_loop_min_match_threshold=5,
        loop_max_dis=999.0,
        d_res=0.05,
        a_res=0.05,
    )


def make_constellation(rng, n=12, scale=4.0):
    pts = rng.uniform(-scale, scale, size=(n, 2))
    return np.concatenate([pts, np.zeros((n, 1))], axis=1)


def se2(x, y, th):
    T = np.eye(4)
    c, s = np.cos(th), np.sin(th)
    T[:2, :2] = [[c, -s], [s, c]]
    T[0, 3], T[1, 3] = x, y
    return T


def test_descriptor_match_under_se2(rng):
    prm = prm_small()
    world = make_constellation(rng, 14)
    T = se2(1.5, -2.0, 0.8)
    moved = (T[:3, :3] @ world.T).T + T[:3, 3]

    kw = dict(d_res=prm.d_res, capacity=prm.map_corner_capacity, n_dist_bins=prm.n_dist_bins)
    m1 = loop_mod.build_map_feature([moved], np.eye(4), 0, seed=1, **kw)
    m2 = loop_mod.build_map_feature([world], np.eye(4), 1, seed=2, **kw)

    counts, bins = loop_mod.score_pairs(
        m1,
        m2,
        jnp.arange(5, dtype=jnp.int32),
        a_res=prm.a_res,
        n_angle_bins=prm.n_angle_bins,
        min_match_threshold=prm.laser_loop_min_match_threshold,
    )
    counts = np.asarray(counts)
    assert counts.max() >= 10, counts.max()
    pi, pj = np.unravel_index(np.argmax(counts), counts.shape)
    p1, p2 = loop_mod.extract_correspondences(
        m1, m2, int(pi), int(pj), int(np.asarray(bins)[pi, pj]),
        a_res=prm.a_res, n_angle_bins=prm.n_angle_bins,
    )
    assert len(p1) >= 10
    T_est = loop_mod.kabsch_2d(p1, p2)
    np.testing.assert_allclose(T_est, T, atol=0.02)


def test_descriptor_rejects_unrelated(rng):
    prm = prm_small()
    a = make_constellation(rng, 12)
    b = make_constellation(np.random.default_rng(99), 12)
    kw = dict(d_res=prm.d_res, capacity=prm.map_corner_capacity, n_dist_bins=prm.n_dist_bins)
    m1 = loop_mod.build_map_feature([a], np.eye(4), 0, seed=1, **kw)
    m2 = loop_mod.build_map_feature([b], np.eye(4), 1, seed=2, **kw)
    counts, _ = loop_mod.score_pairs(
        m1, m2, jnp.arange(5, dtype=jnp.int32),
        a_res=prm.a_res, n_angle_bins=prm.n_angle_bins,
        min_match_threshold=prm.laser_loop_min_match_threshold,
    )
    # random constellations share few consistent pairs
    assert np.asarray(counts).max() <= 6


def _drifting_square(n_per_side=6, drift=0.02):
    """IMU-frame keyframe poses around a square; odometry edges carry yaw
    drift.  Poses follow the pipeline convention: planar WHEEL poses
    conjugated by the extrinsic (pose_imu = T_wheel @ T_imu_to_wheel^-1),
    so the ground factors see a level wheel frame."""
    T_wi_inv = np.linalg.inv(prm_small().mat_T_imu_to_wheel())
    true_tfs = []
    odo_tfs = []
    T_true = np.eye(4)
    T_odo = np.eye(4)
    for leg in range(4):
        for i in range(n_per_side):
            true_tfs.append(T_true @ T_wi_inv)
            odo_tfs.append(T_odo @ T_wi_inv)
            step_true = se2(1.0, 0, np.pi / 2 if i == n_per_side - 1 else 0)
            step_odo = se2(1.0, 0, (np.pi / 2 if i == n_per_side - 1 else 0) + drift)
            T_true = T_true @ step_true
            T_odo = T_odo @ step_odo
    return np.stack(true_tfs), np.stack(odo_tfs)


def test_posegraph_dense_closes_loop():
    true_T, odo_T = _drifting_square()
    K = len(true_T)
    Kc, Ec = 32, 64
    g = pg.empty_graph(Kc, Ec)
    p = np.zeros((Kc, 3), np.float32)
    q = np.zeros((Kc, 3), np.float32)
    for i in range(K):
        pp, qq = geo.log_SE3(jnp.asarray(odo_T[i], jnp.float32))
        p[i], q[i] = np.asarray(pp), np.asarray(qq)
    ei = np.zeros(Ec, np.int32)
    ej = np.zeros(Ec, np.int32)
    etf = np.tile(np.eye(4, dtype=np.float32), (Ec, 1, 1))
    ew = np.zeros(Ec, np.float32)
    for k in range(K - 1):
        ei[k], ej[k] = k, k + 1
        etf[k] = np.linalg.inv(odo_T[k]) @ odo_T[k + 1]
        ew[k] = 1.0
    # loop edge: last -> first with the TRUE relative pose
    ei[K - 1], ej[K - 1] = K - 1, 0
    etf[K - 1] = np.linalg.inv(true_T[K - 1]) @ true_T[0]
    ew[K - 1] = 10.0
    g = g._replace(
        p=jnp.asarray(p), q=jnp.asarray(q),
        node_valid=jnp.arange(Kc) < K,
        e_i=jnp.asarray(ei), e_j=jnp.asarray(ej), e_tf=jnp.asarray(etf),
        e_weight=jnp.asarray(ew), e_valid=jnp.arange(Ec) < K,
        n_nodes=jnp.asarray(K, jnp.int32), n_edges=jnp.asarray(K, jnp.int32),
    )
    consts = pg.make_pg_consts(prm_small())

    err_before = np.linalg.norm(np.asarray(g.p)[:K, :2] - true_T[:K, :2, 3], axis=1)
    g_out, cost = jax.jit(lambda g: pg.solve_dense(g, consts, max_iters=40))(g)
    err_after = np.linalg.norm(np.asarray(g_out.p)[:K, :2] - true_T[:K, :2, 3], axis=1)
    assert err_after.max() < 0.5 * err_before.max(), (err_before.max(), err_after.max())
    # first keyframe stays fixed
    np.testing.assert_allclose(np.asarray(g_out.p)[0], p[0], atol=1e-6)

    # PCG path agrees with the dense path
    g_pcg, cost2 = jax.jit(lambda g: pg.solve_pcg(g, consts, gn_iters=25, cg_iters=80))(g)
    err_pcg = np.linalg.norm(np.asarray(g_pcg.p)[:K, :2] - true_T[:K, :2, 3], axis=1)
    assert err_pcg.max() < 0.5 * err_before.max(), err_pcg.max()


def test_manager_detects_loop_and_corrects(rng):
    prm = prm_small().replace(pose_graph_solve_interval_s=0.0)
    world_corners = make_constellation(rng, 16, scale=5.0)
    true_T, odo_T = _drifting_square(n_per_side=6, drift=0.015)
    K = len(true_T)
    mgr = km.KeyframeManager(prm)
    for k in range(K):
        # the front end records corners in its drifted world frame
        T_drift = odo_T[k] @ np.linalg.inv(true_T[k])
        vis = world_corners[
            np.linalg.norm(world_corners[:, :2] - true_T[k, :2, 3], axis=1) < 6.0
        ]
        corners = (T_drift[:3, :3] @ vis.T).T + T_drift[:3, 3]
        pp, qq = geo.log_SE3(jnp.asarray(odo_T[k], jnp.float32))
        mgr.add_keyframe(
            t_us=int(k * 2e6),
            p=np.asarray(pp),
            q=np.asarray(qq),
            corners=corners,
            scan_lines=(np.zeros((0, 3)), np.zeros((0, 3))),
        )
    # revisit: feed a few more keyframes near the start
    extra = 3
    for k in range(extra):
        T_true = true_T[k]
        T_odo = odo_T[-1] @ (np.linalg.inv(true_T[-1]) @ true_T[k])
        T_drift = T_odo @ np.linalg.inv(T_true)
        vis = world_corners[
            np.linalg.norm(world_corners[:, :2] - T_true[:2, 3], axis=1) < 6.0
        ]
        corners = (T_drift[:3, :3] @ vis.T).T + T_drift[:3, 3]
        pp, qq = geo.log_SE3(jnp.asarray(T_odo, jnp.float32))
        mgr.add_keyframe(
            t_us=int((K + k) * 2e6),
            p=np.asarray(pp),
            q=np.asarray(qq),
            corners=corners,
            scan_lines=(np.zeros((0, 3)), np.zeros((0, 3))),
        )
    assert len(mgr.loops_found) >= 1, "no loop detected"
    # after the solve, modify_delta_tf should be non-identity
    assert not np.allclose(mgr.modify_delta_tf(), np.eye(4), atol=1e-6)
    ts, Ts = mgr.trajectory()
    # corrected endpoint near the true revisit position
    end_err = np.linalg.norm(Ts[K - 1, :2, 3] - true_T[K - 1, :2, 3])
    odo_err = np.linalg.norm(odo_T[K - 1, :2, 3] - true_T[K - 1, :2, 3])
    assert end_err < odo_err, (end_err, odo_err)
