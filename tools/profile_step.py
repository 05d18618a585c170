"""Ablation profile of the tracking step on the current jax backend.

Times run_chunk variants to attribute per-frame cost:
  full / no-marg / lm0 (solver off) / extraction+match only.
Usage: python tools/profile_step.py [chunk_frames]
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
from liwslam.solve import factors as fac


def main():
    CH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
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

    consts = fe.consts
    dcfg = fe.dcfg

    variants = {
        "full": fe.scfg,
        "fast(no-marg,bias-frozen)": fe.scfg._replace(fast_mode=True),
        "lm2": fe.scfg._replace(solver_max_iterations=2),
        "lm1": fe.scfg._replace(solver_max_iterations=1),
    }
    for name, scfg in variants.items():
        fn = jax.jit(lambda st, b, s=scfg: pl.run_chunk(st, b, consts, dcfg, s))
        t0 = time.time()
        st, outs = fn(track, batch)
        jax.block_until_ready(outs.p)
        compile_s = time.time() - t0
        # steady state: 3 repeats
        t0 = time.time()
        for _ in range(3):
            st2, outs = fn(track, batch)
        jax.block_until_ready(outs.p)
        dt = (time.time() - t0) / 3
        print(
            f"{name:28s} {dt / CH * 1e3:7.2f} ms/frame  ({CH / dt:6.1f} fps)  compile {compile_s:.0f}s"
        )


if __name__ == "__main__":
    main()
