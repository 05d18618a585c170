"""Multi-process `jax.distributed` equivalence (SURVEY §4 distributed plan).

Spawns tools/dist_runner.py, which launches 2 worker processes (2 CPU
devices each, collectives over Gloo through the distributed runtime) and
asserts the edge-sharded pose-graph solve crossing PROCESS boundaries
reaches the same optimum quality as the single-process solver."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_posegraph_equivalence():
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "dist_runner.py"),
            "--num-processes",
            "2",
            "--devices-per-proc",
            "2",
            "--nodes",
            "64",
            "--edges",
            "128",
            "--port",
            "12431",
        ],
        capture_output=True,
        text=True,
        timeout=540,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    verdict = json.loads(out.stdout.strip().splitlines()[-1])
    assert verdict["ok"], verdict
    assert verdict["cost_multi"] < 0.5 * verdict["cost_initial"]


@pytest.mark.slow
def test_two_process_full_pipeline():
    """VERDICT r4 task 4: the ENTIRE pipeline across 2 processes — each
    process runs its own robot's front end on local devices, keyframes
    cross the process boundary via process_allgather, process 0's
    keyframe manager closes the cross-session loop, and the pose graph is
    solved EDGE-SHARDED by both processes together; trajectory parity
    with the single-process solver is asserted inside the runner."""
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "dist_runner.py"),
            "--pipeline",
            "--num-processes",
            "2",
            "--devices-per-proc",
            "2",
            "--port",
            "12437",
        ],
        capture_output=True,
        text=True,
        timeout=1500,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-3000:]
    verdict = json.loads(out.stdout.strip().splitlines()[-1])
    assert verdict["ok"], verdict
    assert verdict["cross_session_loops"] >= 1
    assert verdict["max_dp"] < 0.05
