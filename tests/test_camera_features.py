"""Feature-window bookkeeping: tracking ids -> triangulation -> refinement."""

import numpy as np
import jax.numpy as jnp

from liwslam import config
from liwslam.camera import features as feat
from liwslam.camera import triangulation as tri
from liwslam.core import geometry as geo
from liwslam.solve import factors as fac


F, W = 16, 6
T_IC = np.eye(4)  # identity imu->camera extrinsic for clarity


def _make_scene(n_pts=8, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [
            rng.uniform(-2, 2, n_pts),
            rng.uniform(-1.5, 1.5, n_pts),
            rng.uniform(4.0, 8.0, n_pts),
        ],
        -1,
    )
    # camera slides right along x, looking down +z
    poses = []
    for k in range(W):
        T = np.eye(4)
        T[0, 3] = 0.4 * k
        poses.append(T)
    return pts, np.stack(poses)


def _observe(pts, T_w_c):
    cam = (np.linalg.inv(T_w_c)[:3, :3] @ pts.T).T + np.linalg.inv(T_w_c)[:3, 3]
    return cam[:, :2] / cam[:, 2:3]


def _run_window(pts, poses, drop_from=None):
    fw = feat.empty_window(F, W)
    n = len(pts)
    for k in range(W):
        fw = feat.shift(fw)
        obs = _observe(pts, poses[k])
        if k == 0:
            ids = np.full(n, -2, np.int64)  # all fresh
        else:
            ids = np.arange(n)  # tracked under their allocated ids
        valid = np.ones(n, bool)
        if drop_from is not None and k >= drop_from:
            valid[0] = False  # landmark 0 lost
        fw = feat.push_frame(
            fw,
            jnp.asarray(ids, jnp.int32),
            jnp.asarray(obs, jnp.float32),
            jnp.asarray(valid),
        )
    return fw


def test_push_and_allocate_ids():
    pts, poses = _make_scene()
    fw = _run_window(pts, poses)
    ids = np.asarray(fw.ids)
    assert (ids[: len(pts)] == np.arange(len(pts))).all()
    assert int(np.asarray(fw.next_id)) == len(pts)
    assert np.asarray(fw.obs_mask)[: len(pts)].all()


def test_triangulate_ready_recovers_points():
    pts, poses = _make_scene()
    fw = _run_window(pts, poses)
    wp, wq = [], []
    for T in poses:
        p, q = geo.log_SE3(jnp.asarray(T, jnp.float32))
        wp.append(p)
        wq.append(q)
    fw = feat.triangulate_ready(
        fw, jnp.stack(wp), jnp.stack(wq), jnp.asarray(T_IC, jnp.float32)
    )
    ready = np.asarray(fw.ready)
    assert ready[: len(pts)].all()
    np.testing.assert_allclose(
        np.asarray(fw.world)[: len(pts)], pts, atol=2e-2
    )
    err = feat.reproj_error(
        fw, jnp.stack(wp), jnp.stack(wq), jnp.asarray(T_IC, jnp.float32)
    )
    assert float(np.asarray(err)[: len(pts)].max()) < 1e-3


def test_pop_oldest_frees_lost_tracks():
    pts, poses = _make_scene()
    fw = _run_window(pts, poses, drop_from=1)  # landmark 0 seen only once
    for _ in range(W):
        fw = feat.pop_oldest(fw)
    assert int(np.asarray(fw.ids)[0]) == -1  # slot freed
    assert not np.asarray(fw.obs_mask).any()


def test_filter_outliers_drops_bad_world_points():
    pts, poses = _make_scene()
    fw = _run_window(pts, poses)
    wp, wq = [], []
    for T in poses:
        p, q = geo.log_SE3(jnp.asarray(T, jnp.float32))
        wp.append(p)
        wq.append(q)
    wp, wq = jnp.stack(wp), jnp.stack(wq)
    fw = feat.triangulate_ready(fw, wp, wq, jnp.asarray(T_IC, jnp.float32))
    fw = fw._replace(world=fw.world.at[2].add(jnp.asarray([0.5, 0.5, 0.0])))
    fw2 = feat.filter_outliers(
        fw, wp, wq, jnp.asarray(T_IC, jnp.float32), max_err=0.01
    )
    assert not bool(np.asarray(fw2.ready)[2])
    assert bool(np.asarray(fw2.ready)[3])


def test_refine_window_pulls_noisy_points_back():
    pts, poses = _make_scene()
    fw = _run_window(pts, poses)
    wp, wq = [], []
    for T in poses:
        p, q = geo.log_SE3(jnp.asarray(T, jnp.float32))
        wp.append(p)
        wq.append(q)
    win = fac.WindowState(
        p=jnp.stack(wp),
        q=jnp.stack(wq),
        v=jnp.zeros((W, 3)),
        bs=jnp.zeros((W, 6)),
    )
    fw = feat.triangulate_ready(fw, win.p, win.q, jnp.asarray(T_IC, jnp.float32))
    rng = np.random.default_rng(1)
    noisy = fw.world + jnp.asarray(
        rng.normal(0, 0.05, fw.world.shape), jnp.float32
    ) * fw.ready[:, None]
    fw_noisy = fw._replace(world=noisy)
    fw_ref, _, cost = feat.refine_window(
        fw_noisy,
        win,
        jnp.asarray(T_IC, jnp.float32),
        jnp.asarray([100.0, 100.0], jnp.float32),
        free_frame_mask=jnp.zeros((W, 15)),  # poses known: landmark-only BA
    )
    before = np.abs(np.asarray(noisy)[: len(pts)] - pts).max()
    after = np.abs(np.asarray(fw_ref.world)[: len(pts)] - pts).max()
    assert after < before * 0.2, (before, after)


def test_update_scale_epipolar_gate():
    pts, poses = _make_scene()
    c1 = _observe(pts, poses[0])
    c2 = _observe(pts, poses[1])
    h1 = np.concatenate([c1, np.ones((len(pts), 1))], -1)
    h2 = np.concatenate([c2, np.ones((len(pts), 1))], -1)
    tf_1_2 = jnp.asarray(np.linalg.inv(poses[0]) @ poses[1], jnp.float32)
    # corrupt one match: breaks the epipolar constraint
    h2_bad = h2.copy()
    h2_bad[4, :2] += 0.3
    scales, ok = tri.update_scale(
        jnp.asarray(h1, jnp.float32),
        jnp.asarray(h2_bad, jnp.float32),
        jnp.ones(len(pts), bool),
        tf_1_2,
    )
    ok = np.asarray(ok)
    assert not ok[4]
    assert ok[[0, 1, 2, 3, 5, 6, 7]].all()
    # inlier depths match the true camera-1 depth
    depth_true = _observe(pts, poses[0])  # just for shape; compute properly
    cam1 = (np.linalg.inv(poses[0])[:3, :3] @ pts.T).T + np.linalg.inv(poses[0])[:3, 3]
    good = ok & (np.arange(len(pts)) != 4)
    np.testing.assert_allclose(
        np.asarray(scales)[good], cam1[good, 2], rtol=1e-3
    )
