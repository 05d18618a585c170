"""Occupancy raycast, ATE/RPE metrics, and record-table unit tests."""

import numpy as np

from liwslam.eval import metrics, occupancy
from liwslam.utils.record import Record


def test_occupancy_box_room():
    # sensor at origin inside a 4x4 box: walls occupied, interior free
    ang = np.linspace(-np.pi, np.pi, 720, endpoint=False)
    # ray-cast to the square |x|=2 or |y|=2
    t = np.minimum(
        2.0 / np.maximum(np.abs(np.cos(ang)), 1e-9),
        2.0 / np.maximum(np.abs(np.sin(ang)), 1e-9),
    )
    hits = np.stack([t * np.cos(ang), t * np.sin(ang)], -1)
    grid, (ox, oy) = occupancy.build_occupancy(
        [hits], np.zeros((1, 2)), resolution=0.1
    )

    def cell(x, y):
        return grid[int((y - oy) / 0.1), int((x - ox) / 0.1)]

    assert cell(0.0, 0.0) == 0  # interior free
    assert cell(1.0, 0.5) == 0
    assert cell(2.0, 0.0) == 100  # wall occupied
    assert cell(0.0, -2.0) == 100
    assert cell(2.9, 2.9) == -1  # outside: unknown


def test_occupancy_pgm_roundtrip(tmp_path):
    grid = np.asarray([[-1, 0], [100, 0]], np.int8)
    p = tmp_path / "map.pgm"
    occupancy.write_pgm(str(p), grid)
    data = p.read_bytes()
    assert data.startswith(b"P5\n2 2\n255\n")
    img = np.frombuffer(data.split(b"255\n", 1)[1], np.uint8).reshape(2, 2)[::-1]
    np.testing.assert_array_equal(img, [[127, 255], [0, 255]])


def _traj(n=50, seed=0):
    rng = np.random.default_rng(seed)
    T = np.tile(np.eye(4), (n, 1, 1))
    t = np.linspace(0, 2 * np.pi, n)
    T[:, 0, 3] = np.cos(t)
    T[:, 1, 3] = np.sin(t)
    yaw = t + rng.normal(0, 0.0, n)
    T[:, 0, 0] = np.cos(yaw)
    T[:, 0, 1] = -np.sin(yaw)
    T[:, 1, 0] = np.sin(yaw)
    T[:, 1, 1] = np.cos(yaw)
    return T


def test_ate_zero_on_identical_and_alignment_invariance():
    T = _traj()
    assert metrics.ate_rmse(T, T) < 1e-9
    # a rigid world-frame offset is absorbed by alignment
    off = np.eye(4)
    off[:2, 3] = [3.0, -2.0]
    c, s = np.cos(0.7), np.sin(0.7)
    off[0, 0], off[0, 1], off[1, 0], off[1, 1] = c, -s, s, c
    moved = np.einsum("ij,kjl->kil", off, T)
    assert metrics.ate_rmse(moved, T, align=True) < 1e-6
    assert metrics.ate_rmse(moved, T, align=False) > 1.0


def test_associate_by_time_nearest():
    a = np.asarray([0, 100, 200, 1000], np.int64)
    b = np.asarray([5, 95, 210, 5000], np.int64)
    pairs = metrics.associate_by_time(a, b, max_diff_us=50)
    # 1000 vs 5000 is beyond the gate
    got = {(int(i), int(j)) for i, j in pairs}
    assert got == {(0, 0), (1, 1), (2, 2)}


def test_rpe_catches_drift():
    T = _traj()
    drift = T.copy()
    # per-step growing translation error
    drift[:, 0, 3] += np.linspace(0, 0.5, len(T))
    t_err0, _ = metrics.rpe(T, T)
    t_err1, _ = metrics.rpe(drift, T)
    assert t_err0 < 1e-9
    np.testing.assert_allclose(t_err1, 0.5 / (len(T) - 1), rtol=0.05)


def test_record_markdown_stats(tmp_path):
    rec = Record("unit")
    for v in (1.0, 2.0, 3.0):
        rec.add_record("x", v)
    with rec.scope("stage"):
        pass
    md = rec.to_markdown()
    assert "| x | 3 | 3.0000 | 1.0000 | 2.0000 |" in md
    assert "stage (ms)" in md
    path = rec.dump(str(tmp_path))
    assert open(path).read() == md
