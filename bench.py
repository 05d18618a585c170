"""Benchmark: front-end tracking frames/s on one chip (synthetic office run).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

Baseline note: the reference publishes no numeric throughput (BASELINE.md);
its shipped real-time gate is FPS=40 (config/params.yaml:42) on a desktop
CPU, and the BASELINE.json target is >=10x reference CPU frames/s on one
chip.  We use 40 frames/s as the reference-CPU proxy, so vs_baseline =
measured_fps / 40 and the >=10x target corresponds to vs_baseline >= 10.

The measured program is the full per-frame front end (de-skew, IMU+wheel
preintegration, line/corner extraction, submap matching, sliding-window
LM solve, marginalization, keyframe logic, submap accumulation) running
as lax.scan chunks on device; ATE vs simulator ground truth is checked as
a sanity gate (reported on stderr).

``--camera``: benchmarks the camera-ENABLED front end (the reference's
enable_camera path, live here) on the same track with a 30 Hz synthetic
camera — every laser interval carries an accepted camera frame, so each
frame runs the LK chain + joint pose/landmark solve + the laser step.
Both arms (laser-only, camera) run in ONE process so the per-frame delta
is a valid same-process comparison; the JSON line reports the camera fps.
"""

import json
import sys
import time

import numpy as np


def bench_arm(prm, streams, camera, passes=3, CH=64):
    """Compile + time the chunked front end; returns (fps, compile_s, outs)."""
    import jax
    import jax.numpy as jnp

    from liwslam.frontend.driver import Frontend

    fe = Frontend(prm)
    frames, lt = fe.pack_frames(streams)
    init = fe.initialize(frames, lt)
    track, k0, _, _, cam_state = init

    def pack(lo, hi):
        return jax.tree_util.tree_map(
            lambda *xs: jnp.asarray(np.stack(xs)), *frames[lo:hi]
        )

    F = len(frames)
    n_bench = ((F - k0) // CH) * CH
    assert n_bench >= CH, "sequence too short"
    batches = [pack(k0 + i, k0 + i + CH) for i in range(0, n_bench, CH)]

    if camera:
        chunk_fn = fe._cam_chunk_fn()
        run = lambda carry, b: chunk_fn(carry[0], carry[1], b)
        carry0 = (track, cam_state)
        leaf = lambda out: out[0].p
    else:
        chunk_fn = fe._chunk_fn()
        run = lambda carry, b: chunk_fn(carry, b)
        carry0 = track
        leaf = lambda out: out.p

    t0 = time.time()
    carry, outs = run(carry0, batches[0])
    jax.block_until_ready(leaf(outs))
    compile_s = time.time() - t0

    dt = float("inf")
    all_out = None
    for _ in range(passes):
        t0 = time.time()
        carry = carry0
        outs_list = []
        for b in batches:
            carry, outs = run(carry, b)
            outs_list.append(outs)
        jax.block_until_ready(leaf(outs))
        dt = min(dt, time.time() - t0)
        all_out = outs_list
    return n_bench / dt, compile_s, all_out, k0, n_bench, lt


def main():
    camera = "--camera" in sys.argv
    import jax
    import jax.numpy as jnp

    from liwslam import config
    from liwslam.core import geometry as geo
    from liwslam.eval import metrics
    from liwslam.sim import world as sim

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
    print(f"devices: {jax.devices()}", file=sys.stderr)

    W_PX, H_PX = 160, 120
    cam_over = dict(
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

    sim_kw = dict(
        imu_hz=200,
        wheel_hz=20,
        laser_hz=10,
        n_beams=1080,
        noise=True,
        seed=1,
    )
    if camera:
        sim_kw.update(camera_hz=30.0, camera_wh=(W_PX, H_PX))
        prm_cam = prm.replace(**cam_over)
        streams = sim.simulate(
            sim.default_track("loop"),
            sim.square_room(size=12.0, obstacles=True, rich=True),
            prm_cam,
            **sim_kw,
        )
        # laser-only arm on the same streams (same process -> valid delta)
        fps_l, comp_l, _, _, _, _ = bench_arm(prm, streams, camera=False)
        fps_c, comp_c, outs, k0, n_bench, lt = bench_arm(
            prm_cam, streams, camera=True
        )
        outs_main = [o[0] for o in outs]
        ms_l, ms_c = 1e3 / fps_l, 1e3 / fps_c
        print(
            f"laser-only fps={fps_l:.1f} ({ms_l:.3f} ms/frame, compile {comp_l:.1f}s); "
            f"camera fps={fps_c:.1f} ({ms_c:.3f} ms/frame, compile {comp_c:.1f}s); "
            f"camera delta {ms_c - ms_l:+.3f} ms/frame",
            file=sys.stderr,
        )
        fps = fps_c
        metric = (
            "frontend tracking throughput, camera-enabled "
            "(synthetic office, 1080-beam scans + 30 Hz camera, full solve)"
        )
    else:
        streams = sim.simulate(
            sim.default_track("loop"),
            sim.square_room(size=12.0, obstacles=True, rich=True),
            prm,
            **sim_kw,
        )
        fps, compile_s, outs_main, k0, n_bench, lt = bench_arm(
            prm, streams, camera=False
        )
        metric = (
            "frontend tracking throughput "
            "(synthetic office, 1080-beam scans, full solve)"
        )

    # sanity: trajectory quality on the benched frames
    ps = np.concatenate([np.asarray(o.p) for o in outs_main])
    qs = np.concatenate([np.asarray(o.q) for o in outs_main])
    est = np.asarray(geo.make_tf(jnp.asarray(ps), jnp.asarray(qs)))
    t_est = lt[k0 : k0 + n_bench]
    pairs = metrics.associate_by_time(t_est, streams.gt_t_us)
    gt = streams.gt_T_w_imu[pairs[:, 1]]
    ate = metrics.ate_rmse(est[pairs[:, 0]], gt, align=True)
    print(f"frames={n_bench} fps={fps:.1f} ATE={ate:.3f}m", file=sys.stderr)

    baseline_fps = 40.0  # reference real-time gate (see module docstring)
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
