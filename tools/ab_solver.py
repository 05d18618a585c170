"""Same-process A/B of the tracking LM step solver: chol vs pallas.

Cross-session TPU tunnel timing drifts up to 1.5x (CLAUDE.md), so the
only valid comparison compiles both variants in ONE process and
interleaves timed passes.  Usage: python tools/ab_solver.py [chunk_frames]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from liwslam import config
from liwslam.frontend import pipeline as pl
from liwslam.frontend.driver import Frontend
from liwslam.sim import world as sim


def main():
    CH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    prm = config.office().replace(
        max_points=1152,
        max_lines=64,
        max_corners=16,
        ref_capacity=1024,
        max_imu_per_frame=32,
        max_wheel_per_frame=8,
        solver_max_iterations=8,
        init_solver_max_iterations=25,
    )
    streams = sim.simulate(
        sim.default_track("loop"),
        sim.square_room(size=12.0, obstacles=True, rich=True),
        prm,
        imu_hz=200,
        wheel_hz=20,
        laser_hz=10,
        n_beams=1080,
        noise=True,
        seed=1,
    )
    fe = Frontend(prm)
    frames, lt = fe.pack_frames(streams)
    track, k0, _, _, _ = fe.initialize(frames, lt)
    batch = jax.tree_util.tree_map(
        lambda *xs: jnp.asarray(np.stack(xs)), *frames[k0 : k0 + CH]
    )
    consts, dcfg = fe.consts, fe.dcfg

    fns = {}
    for method in ("chol", "pallas"):
        scfg = fe.scfg._replace(solver_method=method)
        fn = jax.jit(lambda st, b, s=scfg: pl.run_chunk(st, b, consts, dcfg, s))
        t0 = time.time()
        st, outs = fn(track, batch)
        jax.block_until_ready(outs.p)
        print(f"{method}: compile {time.time() - t0:.0f}s", file=sys.stderr)
        fns[method] = (fn, np.asarray(outs.p))

    # interleaved timed passes, best-of to damp tunnel drift
    REP = 5
    best = {m: float("inf") for m in fns}
    for _ in range(REP):
        for m, (fn, _) in fns.items():
            t0 = time.time()
            st, outs = fn(track, batch)
            jax.block_until_ready(outs.p)
            best[m] = min(best[m], time.time() - t0)
    for m, dt in best.items():
        print(f"{m:8s} {dt / CH * 1e3:7.3f} ms/frame  ({CH / dt:6.1f} fps)")
    dp = np.abs(fns["chol"][1] - fns["pallas"][1]).max()
    print(f"max |p_chol - p_pallas| over chunk: {dp:.2e} m")


if __name__ == "__main__":
    main()
