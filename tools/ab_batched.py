"""Where does the batched B=1 tax go? (VERDICT r3 weak #2)

Same-process comparison of the single-stream chunk program vs the
vmapped batched program at B=1 on identical inputs, plus compiled-HLO
instruction census for both, plus the B=1 batched program with donated
carries.  Usage: python tools/ab_batched.py [CH] [passes]
"""

import re
import sys
import time
from collections import Counter

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from liwslam import config
from liwslam.frontend import pipeline as pl
from liwslam.frontend.driver import Frontend
from liwslam.parallel import multiseq
from liwslam.sim import world as sim


def hlo_census(compiled):
    txt = compiled.as_text()
    ops = Counter()
    for m in re.finditer(r"^\s*(?:ROOT )?[%\w.\-]+ = [\w\[\]{},/ ]* (\w+)\(", txt, re.M):
        ops[m.group(1)] += 1
    return ops, len(txt.splitlines())


def main():
    CH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5

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
    F = len(frames)
    n_bench = ((F - k0) // CH) * CH
    batches = [
        jax.tree_util.tree_map(
            lambda *xs: jnp.asarray(np.stack(xs)), *frames[k0 + i : k0 + i + CH]
        )
        for i in range(0, n_bench, CH)
    ]
    consts, dcfg, scfg = fe.consts, fe.dcfg, fe.scfg

    arms = {}

    # --- single-stream ---------------------------------------------------
    single = jax.jit(lambda st, b: pl.run_chunk(st, b, consts, dcfg, scfg))
    arms["single"] = (single, track, batches, lambda o: o.p)

    # --- batched B=1 (round-3 form: no donation) -------------------------
    batched = jax.jit(
        lambda sts, bs: jax.vmap(
            lambda st, b: pl.run_chunk(st, b, consts, dcfg, scfg)
        )(sts, bs)
    )
    b_track = multiseq.replicate_track_states(track, 1)
    b_batches = [
        jax.tree_util.tree_map(lambda x: x[None], b) for b in batches
    ]
    arms["batched B=1"] = (batched, b_track, b_batches, lambda o: o.p)

    # --- batched B=1 with donated carry ----------------------------------
    batched_don = jax.jit(
        lambda sts, bs: jax.vmap(
            lambda st, b: pl.run_chunk(st, b, consts, dcfg, scfg)
        )(sts, bs),
        donate_argnums=(0,),
    )
    arms["batched B=1 donate"] = (batched_don, b_track, b_batches, lambda o: o.p)

    for name, (fn, st0, bts, leaf) in arms.items():
        fresh = lambda: jax.tree_util.tree_map(jnp.copy, st0)
        t0 = time.time()
        st, outs = fn(fresh(), bts[0])
        jax.block_until_ready(leaf(outs))
        comp = time.time() - t0
        best = float("inf")
        for _ in range(passes):
            t0 = time.time()
            st = fresh()
            for b in bts:
                st, outs = fn(st, b)
            jax.block_until_ready(leaf(outs))
            best = min(best, time.time() - t0)
        fps = n_bench / best
        ops, lines = hlo_census(fn.lower(fresh(), bts[0]).compile())
        top = ", ".join(f"{k}:{v}" for k, v in ops.most_common(8))
        print(
            f"{name}: fps={fps:.1f} compile={comp:.1f}s hlo_lines={lines} [{top}]",
            flush=True,
        )


if __name__ == "__main__":
    main()
