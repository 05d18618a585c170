"""Per-stage timing of the tracking step's components on TPU.

Each stage runs as lax.scan over CH dummy iterations (mirroring the real
chunk structure) so per-call dispatch overhead is amortized and what's
measured is the stage's in-program cost.
Usage: python tools/profile_parts.py [chunk_iters]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from liwslam import config
from liwslam.frontend import matching as mm
from liwslam.frontend import pipeline as pl
from liwslam.frontend import scan as scan_mod
from liwslam.frontend import preintegration as pre
from liwslam.frontend.driver import Frontend
from liwslam.ops.preint_parallel import imu_interval_parallel
from liwslam.sim import world as sim
from liwslam.solve import factors as fac
from liwslam.solve import gn


def timed(name, fn, *args, n=3):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:34s} {dt * 1e3:8.3f} ms/chunk")
    return dt


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
    # constructors return host numpy (hostmath); stage lambdas CLOSE OVER
    # pieces of track, and closure numpy lacks .at[] — coerce once
    track = jax.tree_util.tree_map(jnp.asarray, track)
    batch = jax.tree_util.tree_map(
        lambda *xs: jnp.asarray(np.stack(xs)), *frames[k0 : k0 + CH]
    )
    consts, dcfg, scfg = fe.consts, fe.dcfg, fe.scfg
    dtype = jnp.float32

    inp0 = jax.tree_util.tree_map(lambda x: x[0], batch)

    # reference stage inputs captured from one real step
    st = track
    pts = inp0.points

    def scan_stage(fn):
        # carry a dummy scalar; iterate the stage CH times over the batch
        def body(c, inp):
            out = fn(inp)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + jnp.sum(leaf.astype(jnp.float32)) * 0, out

        def run(b):
            return jax.lax.scan(body, jnp.zeros((), jnp.float32), b)

        return run

    print(f"chunk = {CH} frames; times are per chunk (divide by {CH} per frame)")

    # full step for reference
    timed(
        "full tracking_step",
        lambda b: pl.run_chunk(track, b, consts, dcfg, scfg),
        batch,
    )

    # 1. de-skew
    timed(
        "deskew",
        scan_stage(
            lambda inp: scan_mod.deskew(
                inp.points, inp.ray_t, jnp.ones(3, dtype), jnp.ones(3, dtype) * 0.1
            )
        ),
        batch,
    )

    # 2. preintegration
    timed(
        "imu preint (parallel)",
        scan_stage(
            lambda inp: imu_interval_parallel(
                track.imu,
                inp.imu_acc,
                inp.imu_gyro,
                inp.imu_t_us,
                inp.imu_mask,
                inp.dt_us,
                dcfg.imu_Q,
            ).X
        ),
        batch,
    )
    timed(
        "wheel preint",
        scan_stage(
            lambda inp: pre.wheel_result(
                pre.wheel_update_only_t(
                    pre.wheel_add_samples(
                        track.wheel, inp.wheel_pose, inp.wheel_t_us, inp.wheel_mask
                    ),
                    inp.dt_us,
                ),
                dcfg.wheel_sigma,
            ).delta_T
        ),
        batch,
    )

    # 4. extraction
    feats0 = scan_mod.extract_features(
        pts,
        inp0.point_valid,
        continuous_threshold=dcfg.line_continuous_threshold,
        min_len=dcfg.line_min_len,
        max_dis=dcfg.line_max_dis,
        tolerance_angle_rad=dcfg.tolerance_angle_rad,
        resolution=dcfg.resolution,
        max_lines=scfg.max_lines,
        max_corners=scfg.max_corners,
    )
    timed(
        "extract_features",
        scan_stage(
            lambda inp: scan_mod.extract_features(
                inp.points,
                inp.point_valid,
                continuous_threshold=dcfg.line_continuous_threshold,
                min_len=dcfg.line_min_len,
                max_dis=dcfg.line_max_dis,
                tolerance_angle_rad=dcfg.tolerance_angle_rad,
                resolution=dcfg.resolution,
                max_lines=scfg.max_lines,
                max_corners=scfg.max_corners,
            ).p1
        ),
        batch,
    )

    # 5. matching
    timed(
        "match_lines",
        scan_stage(
            lambda inp: mm.match_lines(
                track.pair.ref,
                feats0,
                jnp.zeros(3, dtype),
                jnp.zeros(3, dtype),
                consts.T_imu_to_laser,
                resolution=dcfg.resolution,
            ).valid
        ),
        batch,
    )

    # 6. LM solve (3 iters ~ typical converged count) + marginalize
    match0 = mm.match_lines(
        track.pair.ref,
        feats0,
        jnp.zeros(3, dtype),
        jnp.zeros(3, dtype),
        consts.T_imu_to_laser,
        resolution=dcfg.resolution,
    )
    imu_res0 = pre.imu_result(track.imu)
    wheel_res0 = pre.wheel_result(track.wheel, dcfg.wheel_sigma)
    data0 = pl._build_factor_data(track, imu_res0, wheel_res0, match0, scfg, dtype)
    res_fn = lambda x: fac.stack_residuals(
        fac.WindowState.from_flat(x, pl.W_TRACK), data0, consts
    )
    free = jnp.zeros(pl.W_TRACK * 15, dtype).at[15:].set(1.0).at[6:9].set(1.0).at[9:15].set(1.0)
    x0 = pl.init_track_state(
        jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(6), scfg
    ).win.flat()

    for iters in (1, 3, 8):
        timed(
            f"lm_solve chol x{iters}",
            scan_stage(
                lambda inp, it=iters: gn.lm_solve(
                    res_fn,
                    x0,
                    free,
                    gn.LMConfig(max_iters=it, ftol=0.0, method="chol"),
                    wrap_fn=lambda x: pl._wrap_q(x, pl.W_TRACK, dtype),
                )[0]
            ),
            batch,
        )
    timed(
        "marginalize",
        scan_stage(lambda inp: gn.marginalize(res_fn, x0, keep=15)[0]),
        batch,
    )
    timed(
        "single linearize (res+J)",
        scan_stage(lambda inp: gn._linearize(res_fn, x0)[1]),
        batch,
    )

    # 9. submap accumulation
    timed(
        "add_scan",
        scan_stage(
            lambda inp: mm.add_scan(
                track.pair,
                feats0,
                jnp.zeros(3, dtype),
                jnp.zeros(3, dtype),
                consts.T_imu_to_laser,
                ref_n_accumulation=scfg.ref_n_accumulation,
                motion_filter_p=dcfg.ref_motion_filter_p,
                motion_filter_q=dcfg.ref_motion_filter_q,
            ).count
        ),
        batch,
    )


if __name__ == "__main__":
    main()
