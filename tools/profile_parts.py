"""Per-stage timing of the tracking step's components on TPU.

Each stage runs as lax.scan over CH iterations with PER-ITERATION
perturbed inputs — a tiny float epsilon per copy — so XLA can neither
hoist the loop-invariant computation out of the scan nor CSE iterations.
(The round-2 version closed stage inputs over as constants; XLA hoisted
those stages and their numbers read as the empty-scan floor.)
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
    print(f"{name:34s} {dt * 1e3:8.3f} ms/chunk", flush=True)
    return dt


def batch(x, CH):
    """CH stacked copies with a tiny per-copy float perturbation (defeats
    hoisting/CSE; see module docstring)."""

    def one(a):
        a = np.asarray(a)
        if np.issubdtype(a.dtype, np.floating):
            return np.stack([a + np.float32(i * 1e-9) for i in range(CH)])
        return np.stack([a] * CH)

    return jax.tree_util.tree_map(one, jax.tree_util.tree_map(np.asarray, x))


def scan_stage(fn, CH):
    def run(xs):
        def body(c, x):
            out = fn(x)
            leaf = jax.tree_util.tree_leaves(out)[0]
            # * 1e-30, not 0: an exact zero lets XLA dead-code the stage
            return c + jnp.sum(leaf.astype(jnp.float32)) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
        return c

    return run


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
    track = jax.tree_util.tree_map(jnp.asarray, track)
    real_batch = jax.tree_util.tree_map(
        lambda *xs: jnp.asarray(np.stack(xs)), *frames[k0 : k0 + CH]
    )
    consts, dcfg, scfg = fe.consts, fe.dcfg, fe.scfg
    dtype = jnp.float32

    inp0 = jax.tree_util.tree_map(lambda x: x[0], real_batch)

    print(f"chunk = {CH} frames; times are per chunk (divide by {CH} per frame)")

    # full step over the REAL packed chunk (production shape)
    timed(
        "full tracking_step",
        lambda b: pl.run_chunk(track, b, consts, dcfg, scfg),
        real_batch,
    )
    # empty-scan floor with the same carry
    def floor_body(st, inp):
        return st, inp.dt_us
    timed(
        "scan floor (carry only)",
        lambda b: jax.lax.scan(floor_body, track, b),
        real_batch,
    )

    # 1. de-skew
    timed(
        "deskew",
        scan_stage(
            lambda a: scan_mod.deskew(a[0], a[1], a[2], a[3]), CH
        ),
        batch((inp0.points, inp0.ray_t, jnp.ones(3, dtype), 0.1 * jnp.ones(3, dtype)), CH),
    )

    # 2. preintegration
    timed(
        "imu preint (parallel)",
        scan_stage(
            lambda a: imu_interval_parallel(
                a[0], a[1].imu_acc, a[1].imu_gyro, a[1].imu_t_us,
                a[1].imu_mask, a[1].dt_us, dcfg.imu_Q,
            ).X,
            CH,
        ),
        batch((track.imu, inp0), CH),
    )
    timed(
        "wheel preint",
        scan_stage(
            lambda a: pre.wheel_result(
                pre.wheel_update_only_t(
                    pre.wheel_add_samples(
                        a[0], a[1].wheel_pose, a[1].wheel_t_us, a[1].wheel_mask
                    ),
                    a[1].dt_us,
                ),
                dcfg.wheel_sigma,
            ).delta_T,
            CH,
        ),
        batch((track.wheel, inp0), CH),
    )

    # 4. extraction
    def extract(pts, ok):
        return scan_mod.extract_features(
            pts,
            ok,
            continuous_threshold=dcfg.line_continuous_threshold,
            min_len=dcfg.line_min_len,
            max_dis=dcfg.line_max_dis,
            tolerance_angle_rad=dcfg.tolerance_angle_rad,
            resolution=dcfg.resolution,
            max_lines=scfg.max_lines,
            max_corners=scfg.max_corners,
            fast_prefix=scfg.fast_prefix,
        )

    feats0 = extract(inp0.points, inp0.point_valid)
    timed(
        "extract_features",
        scan_stage(lambda a: extract(a[0], a[1]).p1, CH),
        batch((inp0.points, inp0.point_valid), CH),
    )

    # 5. matching
    timed(
        "match_lines",
        scan_stage(
            lambda a: mm.match_lines(
                a[0], a[1], a[2], a[3], consts.T_imu_to_laser,
                resolution=dcfg.resolution,
            ).valid,
            CH,
        ),
        batch((track.pair.ref, feats0, jnp.zeros(3, dtype), jnp.zeros(3, dtype)), CH),
    )

    # 6. the solve — both the pallas kernel (production on TPU) and the
    # XLA chol path, plus marginalization
    match0 = mm.match_lines(
        track.pair.ref, feats0, jnp.zeros(3, dtype), jnp.zeros(3, dtype),
        consts.T_imu_to_laser, resolution=dcfg.resolution,
    )
    imu_res0 = pre.imu_result(track.imu)
    wheel_res0 = pre.wheel_result(track.wheel, dcfg.wheel_sigma)
    data0 = pl._build_factor_data(track, imu_res0, wheel_res0, match0, scfg, dtype)
    free = jnp.zeros(pl.W_TRACK * 15, dtype).at[15:].set(1.0).at[6:9].set(1.0).at[9:15].set(1.0)
    x0 = pl.init_track_state(
        jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(6), scfg
    ).win.flat()
    x0 = jnp.asarray(x0)

    from liwslam.ops import track_solve

    for ee in (True, False):
        timed(
            f"pallas lm_solve_track ee={ee}",
            scan_stage(
                lambda a, ee=ee: track_solve.lm_solve_track(
                    a[0], free, a[1], consts,
                    max_iters=scfg.solver_max_iterations,
                    interpret=jax.default_backend() != "tpu",
                    early_exit=ee,
                )[0],
                CH,
            ),
            batch((x0, data0), CH),
        )

    def res_fn_of(data):
        return lambda x: fac.stack_residuals(
            fac.WindowState.from_flat(x, pl.W_TRACK), data, consts
        )

    for iters in (1, 3, 8):
        timed(
            f"lm_solve chol x{iters}",
            scan_stage(
                lambda a, it=iters: gn.lm_solve(
                    res_fn_of(a[1]),
                    a[0],
                    free,
                    gn.LMConfig(max_iters=it, ftol=0.0, method="chol"),
                    wrap_fn=lambda x: pl._wrap_q(x, pl.W_TRACK, dtype),
                )[0],
                CH,
            ),
            batch((x0, data0), CH),
        )
    timed(
        "marginalize",
        scan_stage(
            lambda a: gn.marginalize(res_fn_of(a[1]), a[0], keep=15)[0], CH
        ),
        batch((x0, data0), CH),
    )
    timed(
        "single linearize (res+J)",
        scan_stage(lambda a: gn._linearize(res_fn_of(a[1]), a[0])[1], CH),
        batch((x0, data0), CH),
    )

    # 9. submap accumulation
    timed(
        "add_scan",
        scan_stage(
            lambda a: mm.add_scan(
                a[0], a[1], a[2], a[3], consts.T_imu_to_laser,
                ref_n_accumulation=scfg.ref_n_accumulation,
                motion_filter_p=dcfg.ref_motion_filter_p,
                motion_filter_q=dcfg.ref_motion_filter_q,
            ).count,
            CH,
        ),
        batch((track.pair, feats0, jnp.zeros(3, dtype), jnp.zeros(3, dtype)), CH),
    )


if __name__ == "__main__":
    main()
