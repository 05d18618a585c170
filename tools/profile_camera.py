"""Per-stage timing of the camera sub-step on TPU.

Stages mirror camera_sub_step (frontend/camera_pipeline.py); each runs as
lax.scan over CH iterations so per-dispatch overhead is amortized, like
tools/profile_parts.py.  Usage: python tools/profile_camera.py [CH]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from liwslam import config
from liwslam.camera import features as ft
from liwslam.camera import tracker as trk
from liwslam.frontend import camera_pipeline as cpl
from liwslam.frontend import pipeline as pl
from liwslam.frontend.driver import Frontend
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
    """Stack CH copies with a tiny per-copy float perturbation so XLA can
    neither hoist the loop-invariant computation out of the scan nor CSE
    the iterations (the hoisting bug made every stage read ~= floor)."""
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
            # * 1e-30, not * 0: an exact zero lets XLA dead-code the stage
            return c + jnp.sum(leaf.astype(jnp.float32)) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
        return c

    return run


def main():
    CH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    W_PX, H_PX = 160, 120
    if len(sys.argv) > 2:
        W_PX, H_PX = (int(v) for v in sys.argv[2].split("x"))
    print(f"camera {W_PX}x{H_PX}", flush=True)
    prm = config.office().replace(
        enable_camera=True,
        camera_K=sim.synthetic_camera_K(W_PX, H_PX),
        T_imu_to_camera=(
            0.0, 0.0, 1.0, 0.05,
            -1.0, 0.0, 0.0, 0.0,
            0.0, -1.0, 0.0, 0.0,
            0.0, 0.0, 0.0, 1.0,
        ),
        # 6 px: calibrated on the bench track (tools/diag_camera_ate.py
        # sweep, round 5) — 1.5 px was overconfident for the actual
        # observation error (LK noise + frozen-ring linearization bias)
        # and DEGRADED ATE 4x; at 6 px the camera is ATE-neutral
        camera_sigma=(6.0, 6.0),
        max_camera_reproject_error=4.0,
        max_camera_feature_dis=30.0,
        max_feature_num=40,
        feature_min_dis=10.0,
        cam_feature_capacity=48,
        cam_obs_window=8,
        cam_min_obs=4,
        cam_min_parallax=0.01,
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
        camera_hz=30.0,
        camera_wh=(W_PX, H_PX),
        noise=True,
        seed=1,
    )
    fe = Frontend(prm)
    frames, lt = fe.pack_frames(streams)
    track, k0, _, _, cam_state = fe.initialize(frames, lt)
    track = jax.tree_util.tree_map(jnp.asarray, track)
    cam_state = jax.tree_util.tree_map(jnp.asarray, cam_state)
    consts, dcfg, scfg = fe.consts, fe.dcfg, fe.scfg
    ccfg, cdyn = fe.ccfg, fe.cdyn
    dtype = jnp.float32

    inp0 = jax.tree_util.tree_map(jnp.asarray, frames[k0])
    img = inp0.cam_img

    print(f"chunk = {CH} iterations; per-frame = value / {CH}", flush=True)

    # whole camera-annotated step (camera + laser) and laser-only step
    def full(args):
        st, cm = args
        return cpl.tracking_step_cam(st, cm, inp0, consts, dcfg, scfg, ccfg, cdyn)[0]

    timed("full step (camera+laser)", scan_stage(full, CH), batch((track, cam_state), CH))

    def laser_only(st):
        return pl.tracking_step(st, inp0.base, consts, dcfg, scfg)[0]

    timed("laser-only step", scan_stage(laser_only, CH), batch(track, CH))

    # --- observe() components -------------------------------------------
    timed(
        "lk_track",
        scan_stage(
            lambda a: trk.lk_track(
                a[0], a[1], a[2], a[3],
                radius=ccfg.lk_radius, iters=ccfg.lk_iters,
                levels=ccfg.lk_levels, max_err=cdyn.lk_max_err,
            )[0],
            CH,
        ),
        batch((cam_state.prev_img, img, cam_state.px, cam_state.live), CH),
    )
    timed(
        "select_features",
        scan_stage(
            lambda a: trk.select_features(
                a[0], ccfg.max_new_per_frame, cdyn.feature_min_dis,
                existing_xy=a[1], existing_valid=a[2],
                budget=jnp.asarray(16, jnp.int32),
            )[0],
            CH,
        ),
        batch((img, cam_state.px, cam_state.live), CH),
    )
    timed(
        "observe (lk+select+place)",
        scan_stage(lambda a: cpl.observe(a, img, ccfg, cdyn).px, CH),
        batch(cam_state, CH),
    )
    timed(
        "record",
        scan_stage(
            lambda a: cpl.record(a, jnp.zeros(3, dtype), jnp.zeros(3, dtype), cdyn).fw.obs,
            CH,
        ),
        batch(cam_state, CH),
    )
    timed(
        "triangulate_ready",
        scan_stage(
            lambda a: ft.triangulate_ready(
                a.fw, a.ring_p, a.ring_q, cdyn.T_imu_to_camera,
                min_obs=ccfg.min_obs, min_parallax=cdyn.min_parallax,
            ).world,
            CH,
        ),
        batch(cam_state, CH),
    )

    # --- the joint pose+landmark solve ----------------------------------
    from liwslam.frontend.preintegration import imu_result, wheel_result
    imu_res = imu_result(track.imu)
    wheel_res = wheel_result(track.wheel, dcfg.wheel_sigma)
    data = cpl._cam_factor_data(track, imu_res, wheel_res, scfg, dtype)
    fw = cam_state.fw
    F = fw.ids.shape[0]
    n_obs = jnp.sum(fw.obs_mask.astype(jnp.int32), axis=1)

    def res_fn(x):
        st2 = fac.WindowState.from_flat(x[:30], 2)
        world = x[30:].reshape(F, 3)
        base = fac.stack_residuals(st2, data, consts)
        rows = cpl.camera_rows(
            fw, world, cam_state.ring_p, cam_state.ring_q, cam_state.ring_valid,
            st2.p[1], st2.q[1], cdyn,
        )
        return jnp.concatenate([base, rows.reshape(-1)])

    free = jnp.zeros(30 + 3 * F, dtype).at[15:30].set(1.0).at[6:9].set(1.0).at[9:15].set(1.0)
    free = free.at[30:].set(jnp.repeat((fw.ready & (n_obs >= 2)).astype(dtype), 3))
    x0 = jnp.concatenate(
        [jnp.tile(jnp.zeros(15, dtype), 2), fw.world.reshape(-1)]
    )

    def wrap(x):
        return x.at[:30].set(pl._wrap_q(x[:30], 2, dtype))

    for iters in (1, 4, 8):
        timed(
            f"joint lm_solve chol x{iters}",
            scan_stage(
                lambda a, it=iters: gn.lm_solve(
                    res_fn, a, free,
                    gn.LMConfig(max_iters=it, ftol=0.0, method="chol"),
                    wrap_fn=wrap,
                )[0],
                CH,
            ),
            batch(x0, CH),
        )
    timed(
        "joint single linearize",
        scan_stage(lambda a: gn._linearize(res_fn, a)[1], CH),
        batch(x0, CH),
    )
    timed(
        "marginalize prev frame (30-dim)",
        scan_stage(
            lambda a: gn.marginalize(
                lambda x: fac.stack_residuals(
                    fac.WindowState.from_flat(x, 2), data, consts
                ),
                a[:30],
                keep=15,
            )[0],
            CH,
        ),
        batch(x0, CH),
    )
    timed(
        "filter_outliers",
        scan_stage(
            lambda a: cpl.filter_outliers(
                a, jnp.zeros(3, dtype), jnp.zeros(3, dtype), cdyn
            ).live,
            CH,
        ),
        batch(cam_state, CH),
    )


if __name__ == "__main__":
    main()
