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


def test_fetch_openloris_local_archive(tmp_path):
    """tools/fetch_openloris.py local-archive mode: a {seq}.bag.tar in
    --dest is unpacked, the bag + groundtruth located (readme.md:33-39's
    playback on-ramp, minus the registration-gated download)."""
    import subprocess
    import sys
    import tarfile

    import numpy as np

    from liwslam import config
    from liwslam.io import openloris
    from liwslam.sim import world as sim

    prm = config.office().replace(max_points=128)
    streams = sim.simulate(
        sim.TwistTrack([(2.0, 0.2, 0.0, 0.1)]),
        sim.square_room(size=8.0),
        prm,
        imu_hz=50,
        wheel_hz=10,
        laser_hz=5,
        n_beams=90,
        seed=7,
    )
    seq_dir = tmp_path / "office1-1"
    seq_dir.mkdir()
    bag = seq_dir / "office1-1.bag"
    openloris.save_bag(str(bag), streams)
    gt = seq_dir / "groundtruth.txt"
    with open(gt, "w") as f:
        for t, T in zip(streams.gt_t_us, streams.gt_T_w_imu):
            f.write(f"{t / 1e6} {T[0, 3]} {T[1, 3]} {T[2, 3]} 0 0 0 1\n")
    dest = tmp_path / "dl"
    dest.mkdir()
    with tarfile.open(dest / "office1-1.bag.tar", "w") as tf:
        tf.add(seq_dir, arcname="office1-1")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools/fetch_openloris.py"),
         "office1-1", "--dest", str(dest)],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "bag:" in proc.stdout and "gt:" in proc.stdout

    # idempotent second invocation finds the unpacked bag directly
    proc2 = subprocess.run(
        [sys.executable, os.path.join(repo, "tools/fetch_openloris.py"),
         "office1-1", "--dest", str(dest)],
        capture_output=True, text=True, timeout=60,
    )
    assert proc2.returncode == 0 and "bag:" in proc2.stdout
