"""Same-process TPU A/B of camera-path Params overrides on the camera
bench workload (bench.py --camera arm).

Usage:
    python tools/ab_camera.py cam_solver=schur cam_solver=pallas [--passes N]
                              [--wh WxH]

Each spec gets its own Frontend/trace; all specs run in one process (the
only valid timing comparison over the tunneled TPU; CLAUDE.md)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from tools.ab_params import parse_overrides  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 4
    wh = (160, 120)
    for a in sys.argv[1:]:
        if a.startswith("--passes"):
            passes = int(a.split("=")[1])
        if a.startswith("--wh"):
            wh = tuple(int(v) for v in a.split("=")[1].split("x"))
    import jax
    import jax.numpy as jnp

    from liwslam import config
    from liwslam.frontend.driver import Frontend
    from liwslam.sim import world as sim
    import bench

    t0 = time.time()
    x = jax.jit(lambda a: a @ a)(jnp.ones((256, 256), jnp.float32))
    jax.block_until_ready(x)
    print(f"tunnel probe: {time.time() - t0:.1f}s", flush=True)

    W_PX, H_PX = wh
    print(f"camera {W_PX}x{H_PX}", flush=True)
    base = config.office().replace(
        max_points=1152,
        max_lines=64,
        max_corners=16,
        ref_capacity=1024,
        max_imu_per_frame=32,
        max_wheel_per_frame=8,
        solver_max_iterations=8,
        init_solver_max_iterations=25,
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
    )
    streams = sim.simulate(
        sim.default_track("loop"),
        sim.square_room(size=12.0, obstacles=True, rich=True),
        base,
        imu_hz=200,
        wheel_hz=20,
        laser_hz=10,
        n_beams=1080,
        camera_hz=30.0,
        camera_wh=(W_PX, H_PX),
        noise=True,
        seed=1,
    )

    best = {}
    for spec in args:
        prm = base.replace(**parse_overrides(spec, base))
        fps_best = 0.0
        all_fps = []
        fps, compile_s, outs, k0, n_bench, lt = bench.bench_arm(
            prm, streams, camera=True, passes=passes
        )
        p_last = np.asarray(outs[-1][0].p[-1])
        best[spec] = fps
        print(
            f"{spec}: compile={compile_s:.1f}s best fps={fps:.1f} "
            f"p_last={np.round(p_last, 4)}",
            flush=True,
        )

    print("\nA/B summary (best fps):", flush=True)
    for spec, f in best.items():
        print(f"  {spec}: {f:.1f}")


if __name__ == "__main__":
    main()
