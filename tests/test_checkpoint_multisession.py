"""Checkpoint/resume exactness + multi-session cross-session loop closure."""

import numpy as np
import jax
import jax.numpy as jnp

from liwslam import config
from liwslam.backend import manager as km
from liwslam.core import geometry as geo
from liwslam.utils import checkpoint as ckpt

from test_backend import make_constellation, prm_small, se2
from test_parallel import _build_square_graph  # noqa: F401  (mesh import side effects none)


def test_track_state_snapshot_resume(tmp_path):
    import __graft_entry__ as ge

    fn, (state, inp) = ge.entry()
    jfn = jax.jit(fn)
    s1, o1 = jfn(state, inp)
    s2, o2 = jfn(s1, inp)

    p = str(tmp_path / "track.npz")
    ckpt.save_pytree(p, s1)
    s1r = ckpt.load_pytree(p, s1)
    s2r, o2r = jfn(s1r, inp)
    # resumed continuation is bitwise identical
    for a, b in zip(jax.tree_util.tree_leaves(s2), jax.tree_util.tree_leaves(s2r)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(o2.p), np.asarray(o2r.p))


def _feed_square(mgr, true_T, odo_T, world_corners, t0_us=0, session=0, subset=None):
    rng_idx = range(len(true_T)) if subset is None else subset
    for n, k in enumerate(rng_idx):
        T_drift = odo_T[k] @ np.linalg.inv(true_T[k])
        vis = world_corners[
            np.linalg.norm(world_corners[:, :2] - true_T[k, :2, 3], axis=1) < 6.0
        ]
        corners = (T_drift[:3, :3] @ vis.T).T + T_drift[:3, 3]
        pp, qq = geo.log_SE3(jnp.asarray(odo_T[k], jnp.float32))
        mgr.add_keyframe(
            t_us=t0_us + int(n * 2e6),
            p=np.asarray(pp),
            q=np.asarray(qq),
            corners=corners,
            scan_lines=(np.zeros((0, 3)), np.zeros((0, 3))),
            session=session,
        )


def test_manager_snapshot_resume(tmp_path, rng):
    from test_backend import _drifting_square

    prm = prm_small().replace(pose_graph_solve_interval_s=0.0)
    world = make_constellation(rng, 16, scale=5.0)
    true_T, odo_T = _drifting_square(n_per_side=6, drift=0.015)
    K = len(true_T)

    mgr = km.KeyframeManager(prm)
    _feed_square(mgr, true_T[: K // 2], odo_T[: K // 2], world)
    pref = str(tmp_path / "mgr")
    ckpt.save_manager(pref, mgr)
    mgr2 = ckpt.load_manager(pref, prm)
    assert len(mgr2.keyframes) == len(mgr.keyframes)
    assert len(mgr2.seq_edges) == len(mgr.seq_edges)

    # continue both; they must behave identically
    _feed_square(mgr, true_T[K // 2 :], odo_T[K // 2 :], world, t0_us=10**9)
    _feed_square(mgr2, true_T[K // 2 :], odo_T[K // 2 :], world, t0_us=10**9)
    assert len(mgr.loops_found) == len(mgr2.loops_found)
    ts1, T1 = mgr.trajectory()
    ts2, T2 = mgr2.trajectory()
    np.testing.assert_allclose(T1, T2, atol=1e-5)


def test_cross_session_loop_alignment(rng):
    """Two robots map the same square; session 1 must align to session 0
    through a cross-session loop closure."""
    from test_backend import _drifting_square

    prm = prm_small().replace(
        pose_graph_solve_interval_s=0.0,
        loop_detect_min_interval=1000,  # same-session loops off: isolate x-session
    )
    world = make_constellation(rng, 16, scale=5.0)
    true_T, odo_T = _drifting_square(n_per_side=6, drift=0.0)

    mgr = km.KeyframeManager(prm)
    # session 0: clean map of the square
    _feed_square(mgr, true_T, odo_T, world, session=0)
    assert len(mgr.loops_found) == 0  # interval gate blocks same-session

    # session 1: same square, but its odometry frame is offset (each robot
    # starts its own world frame); feed a few keyframes from the start area
    T_off = se2(0.7, -0.4, 0.15)
    odo1 = np.einsum("ij,kjl->kil", T_off, true_T)
    n1 = 8
    _feed_square(
        mgr, true_T[:n1], odo1[:n1], world, t0_us=10**10, session=1, subset=range(n1)
    )
    x_loops = [l for l in mgr.loops_found]
    assert len(x_loops) >= 1, "no cross-session loop"
    ts, Ts = mgr.trajectory()
    # session-1 keyframes must land on session-0's (true) poses
    s1_idx = [i for i, kf in enumerate(mgr.keyframes) if kf.session == 1]
    err = [
        np.linalg.norm(Ts[i, :2, 3] - true_T[k, :2, 3])
        for k, i in enumerate(s1_idx)
    ]
    off_err = np.linalg.norm(odo1[0, :2, 3] - true_T[0, :2, 3])
    assert max(err) < 0.5 * off_err, (max(err), off_err)
