"""Debug rendering + async writer (the reference's visualization thread)."""

import os

import numpy as np

from liwslam.eval import debug_viz as dv
from liwslam.utils.asyncwriter import AsyncWriter


def test_render_frame_matches(tmp_path):
    path = str(tmp_path / "frame.png")
    pts = np.random.default_rng(0).uniform(-3, 3, (200, 2))
    p1 = np.asarray([[-3.0, -3.0], [3.0, -3.0]])
    p2 = np.asarray([[3.0, -3.0], [3.0, 3.0]])
    img = dv.render_frame_matches(
        path, pts, p1, p2, np.asarray([[3.0, -3.0]]),
        p1 + 0.05, p2 + 0.05, p1[:1], p2[:1], p1[:1] + 0.05, p2[:1] + 0.05,
    )
    assert os.path.exists(path) or os.path.exists(path.replace(".png", ".ppm"))
    # the overlay actually drew something over the background
    assert (img != 20).any()
    assert img.shape[2] == 3


def test_render_merged_and_trajectory(tmp_path):
    scans = []
    for k in range(3):
        th = 0.2 * k
        R = np.asarray([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        p1 = (R @ np.asarray([[0.0, 1.0], [1.0, 1.0]]).T).T
        p2 = (R @ np.asarray([[1.0, 1.0], [1.0, 0.0]]).T).T
        scans.append((p1, p2))
    img = dv.render_merged_scans(str(tmp_path / "merged.png"), scans)
    assert (img != 20).any()
    traj = np.stack([np.linspace(0, 2, 20), np.sin(np.linspace(0, 2, 20))], -1)
    img2 = dv.render_trajectories(
        str(tmp_path / "traj.png"),
        [(traj, dv.C_TRAJ_A), (traj + 0.1, dv.C_TRAJ_B)],
        loop_pairs=[(traj[0], traj[-1])],
    )
    assert (img2 != 20).any()


def test_render_camera_tracks(tmp_path):
    img = np.random.default_rng(0).uniform(0, 1, (60, 80)).astype(np.float32)
    px = np.asarray([[10.0, 10.0], [70.0, 50.0], [200.0, 5.0]])  # last OOB
    live = np.asarray([True, True, True])
    out = dv.render_camera_tracks(str(tmp_path / "cam.png"), img, px, live)
    assert out.shape == (60, 80, 3)
    assert (out[8:13, 8:13] == (255, 80, 80)).all(axis=-1).any()


def test_async_writer_runs_and_collects_errors(tmp_path):
    w = AsyncWriter()
    hits = []
    w.submit(hits.append, 1)
    w.submit(lambda: (_ for _ in ()).throw(RuntimeError("boom")))
    w.submit(hits.append, 2)
    errs = w.close()
    assert hits == [1, 2]
    assert len(errs) == 1 and "boom" in errs[0]
