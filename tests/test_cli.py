"""CLI smoke: python -m liwslam.run end-to-end on a tiny synthetic run.

Drives the same surface a user gets (arg parsing, --param overrides,
front end + back end, TUM/report/map artifacts) — the library paths are
covered elsewhere; this pins the wiring (run.py, the reference ROS-node
equivalent: lvio_2d_node.cpp)."""

import json
import os

from liwslam import run as cli


def test_cli_synthetic_L(tmp_path):
    report = cli.main(
        [
            "--preset", "office",
            "--synthetic", "L",
            "--out", str(tmp_path),
            "--chunk", "16",
            "--laser-hz", "4",
            "--beams", "540",
            "--param", "max_points=576",
            "--param", "max_lines=48",
            "--param", "max_corners=16",
            "--param", "ref_capacity=512",
            "--param", "max_imu_per_frame=64",
            "--param", "solver_max_iterations=6",
            "--param", "init_solver_max_iterations=20",
            "--param", "loop_max_dis=2.5",
        ]
    )
    # "L" track: loop machinery is covered by test_loop_e2e; the CLI
    # wiring test only needs frames + keyframes + artifacts (r4 suite
    # trim: smallloop cost 131 s of the 42-min budget)
    assert report["frames"] > 20
    assert report["keyframes"] >= 3
    # noise-free synthetic odometry should be centimeter-accurate
    assert report["ate_frontend_m"] < 0.1
    assert "ate_backend_m" in report
    # artifacts: TUM trajectories (reference file naming), map, timings
    assert os.path.exists(tmp_path / "fornt_end.txt")
    assert os.path.exists(tmp_path / "back_end.txt")
    lines = (tmp_path / "fornt_end.txt").read_text().strip().splitlines()
    front = [l for l in lines if not l.startswith("#")]
    assert len(front) == report["frames"]
    assert len(front[0].split()) == 8  # t x y z qx qy qz qw
    # report is json-serializable (the CLI prints it)
    json.dumps(report)
