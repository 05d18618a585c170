"""Batched multi-sequence throughput on one chip (BASELINE config 3).

Single-stream SLAM is latency-bound (~1900 tiny kernels/frame, MXU idle);
vmap over B independent sequences makes every kernel process B problems,
amortizing launch latency.  This measures the aggregate frames/s curve
over B in one process.

Usage: python tools/bench_multiseq.py [B1,B2,...] [chunk_frames]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from liwslam import config
from liwslam.frontend.driver import Frontend
from liwslam.parallel import multiseq
from liwslam.sim import world as sim


def make_sequence(prm, seed, track="loop"):
    streams = sim.simulate(
        sim.default_track(track),
        sim.square_room(size=12.0, obstacles=True, rich=True),
        prm,
        imu_hz=200,
        wheel_hz=20,
        laser_hz=10,
        n_beams=1080,
        noise=True,
        seed=seed,
    )
    fe = Frontend(prm)
    frames, lt = fe.pack_frames(streams)
    track_st, k0, _, _, _ = fe.initialize(frames, lt)
    return fe, frames, k0, track_st


def main():
    Bs = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,2,4,8").split(",")]
    CH = int(sys.argv[2]) if len(sys.argv) > 2 else 32
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
    # extra KEY=VALUE overrides (e.g. solver_method=chol — the vmapped
    # one-kernel pallas solve serializes per sequence, see BASELINE.md
    # multiseq-ceiling note)
    for kv in sys.argv[3:]:
        k, v = kv.split("=", 1)
        cur = getattr(prm, k)
        if isinstance(cur, bool):
            v = v.lower() in ("1", "true", "yes")
        elif isinstance(cur, int):
            v = int(v)
        elif isinstance(cur, float):
            v = float(v)
        prm = prm.replace(**{k: v})
    Bmax = max(Bs)
    seqs = [make_sequence(prm, seed=1 + i) for i in range(Bmax)]
    fe = seqs[0][0]
    fn = multiseq.batched_chunk_fn(fe.consts, fe.dcfg, fe.scfg)

    def stack_batch(B):
        states = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[s[3] for s in seqs[:B]]
        )
        batches = []
        for off in range(0, 2 * CH, CH):  # two chunks to flow state
            per_seq = [
                jax.tree_util.tree_map(
                    lambda *xs: jnp.asarray(np.stack(xs)),
                    *frames[k0 + off : k0 + off + CH],
                )
                for (_, frames, k0, _) in seqs[:B]
            ]
            batches.append(
                jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_seq)
            )
        return states, batches

    print(f"devices: {jax.devices()}", file=sys.stderr)
    results = {}
    for B in Bs:
        states, batches = stack_batch(B)
        # the batched program donates its state carry: keep a pristine
        # copy and feed fresh clones per pass
        fresh = lambda: jax.tree_util.tree_map(jnp.copy, states)
        t0 = time.time()
        st, outs = fn(fresh(), batches[0])
        jax.block_until_ready(outs.p)
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            st = fresh()  # state clone outside the timed region
            t0 = time.time()
            for b in batches:
                st, outs = fn(st, b)
            jax.block_until_ready(outs.p)
            best = min(best, time.time() - t0)
        fps = B * CH * len(batches) / best
        results[B] = fps
        print(
            f"B={B:3d}  {fps:8.1f} frames/s aggregate  "
            f"({fps / B:6.1f} per-seq, {best / (CH * len(batches)) * 1e3:.2f} ms/step, "
            f"compile {compile_s:.0f}s)"
        )
    b1 = results.get(1)
    if b1:
        for B, fps in results.items():
            print(f"  B={B}: {fps / b1:.2f}x single-stream", file=sys.stderr)


if __name__ == "__main__":
    main()
