"""Same-process TPU A/B of any Params override on the bench workload.

All compared settings run in ONE process (the only valid timing
comparison over the tunneled TPU; CLAUDE.md), each via its own Frontend
(separate trace -> the static config participates in compilation).

Usage:
    python tools/ab_params.py KEY=VAL[,KEY=VAL...] KEY=VAL[,...] [--passes N]
e.g.
    python tools/ab_params.py solver_early_exit=False solver_early_exit=True
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def parse_overrides(s, prm):
    out = {}
    if s == "base":
        return out
    for kv in s.split(","):
        k, v = kv.split("=", 1)
        cur = getattr(prm, k)
        if isinstance(cur, bool):
            v = v.lower() in ("1", "true", "yes")
        elif isinstance(cur, int):
            v = int(v)
        elif isinstance(cur, float):
            v = float(v)
        out[k] = v
    return out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 5
    for a in sys.argv[1:]:
        if a.startswith("--passes"):
            passes = int(a.split("=")[1])
    import jax
    import jax.numpy as jnp

    from liwslam import config
    from liwslam.frontend.driver import Frontend
    from liwslam.sim import world as sim

    t0 = time.time()
    x = jax.jit(lambda a: a @ a)(jnp.ones((256, 256), jnp.float32))
    jax.block_until_ready(x)
    print(f"tunnel probe: {time.time() - t0:.1f}s", flush=True)

    base = config.office().replace(
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
        base,
        imu_hz=200,
        wheel_hz=20,
        laser_hz=10,
        n_beams=1080,
        noise=True,
        seed=1,
    )

    best = {}
    for spec in args:
        prm = base.replace(**parse_overrides(spec, base))
        fe = Frontend(prm)
        frames, lt = fe.pack_frames(streams)
        track, k0, _, _, _ = fe.initialize(frames, lt)
        chunk_fn = fe._chunk_fn()
        CH = 64
        F = len(frames)
        n_bench = ((F - k0) // CH) * CH

        def pack(lo, hi):
            return jax.tree_util.tree_map(
                lambda *xs: jnp.asarray(np.stack(xs)), *frames[lo:hi]
            )

        batches = [pack(k0 + i, k0 + i + CH) for i in range(0, n_bench, CH)]
        t0 = time.time()
        trk, outs = chunk_fn(track, batches[0])
        jax.block_until_ready(outs.p)
        compile_s = time.time() - t0
        dts = []
        for _ in range(passes):
            t0 = time.time()
            trk = track
            last = None
            for b in batches:
                trk, outs = chunk_fn(trk, b)
                last = outs
            jax.block_until_ready(last.p)
            dts.append(time.time() - t0)
        fps = [n_bench / d for d in dts]
        best[spec] = (max(fps), float(np.median(fps)))
        p_last = np.asarray(last.p[-1])
        print(
            f"{spec}: compile={compile_s:.1f}s "
            f"fps={['%.0f' % f for f in fps]} best={max(fps):.1f} "
            f"median={np.median(fps):.1f} p_last={np.round(p_last, 3)}",
            flush=True,
        )

    print("\nA/B summary (best | median fps):", flush=True)
    for spec, (b, m) in best.items():
        print(f"  {spec:50s} {b:8.1f} | {m:8.1f}", flush=True)


if __name__ == "__main__":
    main()
