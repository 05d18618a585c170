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
