"""Diagnose the camera-enabled ATE regression (VERDICT r4 weak #1).

Bench-track ATE is 0.022 m camera-enabled vs 0.004 m laser-only; this
script reproduces the gap on CPU at reduced scan size and A/Bs arms that
discriminate the candidate causes:

  laser     — laser-only baseline
  cam       — camera enabled, bench weights (camera_sigma=1.5 px)
  cam-weak  — camera enabled, reprojection rows ~zero-weighted
              (camera_sigma=1e6).  If this arm matches `laser`, the
              degradation comes through the reprojection rows
              (weights / triangulation quality); if it does NOT, the
              camera sub-step machinery itself (preint splits, extra
              solves, ring bookkeeping) perturbs the trajectory.

Usage: python tools/diag_camera_ate.py [extra_overrides k=v ...]
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def run_arm(prm, streams, label):
    import jax

    from liwslam.core import geometry as geo
    from liwslam.eval import metrics
    from liwslam.frontend.driver import Frontend

    fe = Frontend(prm)
    res = fe.run(streams, chunk_size=16)
    import jax.numpy as jnp

    est = np.asarray(geo.make_tf(jnp.asarray(res.p), jnp.asarray(res.q)))
    pairs = metrics.associate_by_time(res.t_us, streams.gt_t_us)
    gt = streams.gt_T_w_imu[pairs[:, 1]]
    ate = metrics.ate_rmse(est[pairs[:, 0]], gt, align=True)
    print(f"{label:10s} frames={len(res.p)} ATE={ate * 1000:.2f} mm", flush=True)
    return ate


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from liwslam import config
    from liwslam.sim import world as sim

    W_PX, H_PX = 160, 120
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
    cam_over = dict(
        enable_camera=True,
        camera_K=sim.synthetic_camera_K(W_PX, H_PX),
        T_imu_to_camera=(
            0.0, 0.0, 1.0, 0.05,
            -1.0, 0.0, 0.0, 0.0,
            0.0, -1.0, 0.0, 0.0,
            0.0, 0.0, 0.0, 1.0,
        ),
        camera_sigma=(1.5, 1.5),
        max_camera_reproject_error=4.0,
        max_camera_feature_dis=30.0,
        max_feature_num=40,
        feature_min_dis=10.0,
        cam_feature_capacity=48,
        cam_obs_window=8,
        cam_min_obs=4,
        cam_min_parallax=0.01,
    )
    over = {}
    for kv in sys.argv[1:]:
        if "=" not in kv:
            continue  # flags like --sweep
        k, v = kv.split("=", 1)
        over[k] = eval(v)

    prm_cam = base.replace(**cam_over, **over)
    streams = sim.simulate(
        sim.default_track("loop"),
        sim.square_room(size=12.0, obstacles=True, rich=True),
        prm_cam,
        imu_hz=200,
        wheel_hz=20,
        laser_hz=10,
        n_beams=1080,
        camera_hz=30.0,
        camera_wh=(W_PX, H_PX),
        noise=True,
        seed=1,
    )

    if "--sweep" in sys.argv:
        # discriminate weighting vs triangulation-gate causes
        arms = [
            ("sig3", dict(camera_sigma=(3.0, 3.0))),
            ("sig6", dict(camera_sigma=(6.0, 6.0))),
            ("sig10", dict(camera_sigma=(10.0, 10.0))),
            ("sig20", dict(camera_sigma=(20.0, 20.0))),  # reference default
            ("par.03", dict(cam_min_parallax=0.03)),
            ("obs6", dict(cam_min_obs=6)),
        ]
        for label, ov in arms:
            run_arm(prm_cam.replace(**ov), streams, label)
        return

    run_arm(base.replace(**over), streams, "laser")
    run_arm(prm_cam, streams, "cam")
    run_arm(
        prm_cam.replace(camera_sigma=(1e6, 1e6)), streams, "cam-weak"
    )


if __name__ == "__main__":
    main()
