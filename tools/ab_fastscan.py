"""Same-process TPU A/B of the fast-prefix extraction forms.

fast_prefix is part of StaticCfg (jit cache key), so two Frontends with
different settings compile DIFFERENT programs and can be timed in one
process — the only timing comparison that is valid over the tunneled TPU
(cross-process variance is up to 1.5x; CLAUDE.md).

Usage: python tools/ab_fastscan.py [passes]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import jax
    import jax.numpy as jnp

    from liwslam import config
    from liwslam.frontend.driver import Frontend
    from liwslam.sim import world as sim

    # tunnel health probe: a tiny jit matmul must return promptly
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

    results = {}
    ates = {}
    for setting in ("off", "on"):
        prm = base.replace(fast_prefix=setting)
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
        results[setting] = fps
        # sanity: final-frame pose must be finite and plausible
        p_last = np.asarray(last.p[-1])
        ates[setting] = p_last
        print(
            f"fast_prefix={setting}: compile={compile_s:.1f}s "
            f"fps={['%.0f' % f for f in fps]} best={max(fps):.1f} "
            f"median={np.median(fps):.1f} p_last={np.round(p_last, 3)}",
            flush=True,
        )

    best_off = max(results["off"])
    best_on = max(results["on"])
    print(
        f"\nA/B: off best={best_off:.1f} fps, on best={best_on:.1f} fps, "
        f"speedup={best_on / best_off:.3f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
