"""Steady-state backend per-keyframe budget (VERDICT r3 weak #3 / ask #4).

Feeds a simulated office run's keyframes through KeyframeManager and
reports the WARM per-keyframe wall time split into device-program time
(jitted build/score/solve calls, synchronized) and host orchestration,
plus jit-bucket census over the run and solve cadence cost.

Run on the real TPU (default) or CPU (--cpu, the test config).
Usage: python tools/bench_backend_budget.py [--cpu] [--frames N]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    cpu = "--cpu" in sys.argv
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import liwslam  # noqa: F401  (precision + cache config)
    from liwslam import config
    from liwslam.backend.manager import KeyframeManager
    from liwslam.frontend.driver import Frontend
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
    res = fe.run(streams, chunk_size=32)
    kfs = [
        dict(
            t_us=int(res.t_us[i]),
            p=res.p[i],
            q=res.q[i],
            corners=res.kf_corners[n],
            scan_lines=res.kf_scans[n],
        )
        for n, i in enumerate(res.kf_indices)
    ]
    print(f"{len(kfs)} keyframes from the frontend run", flush=True)

    # pass 1 (cold): populates jit buckets.  pass 2 on a FRESH manager
    # reuses the process-level jax compilation cache -> warm steady state.
    for label in ("cold", "warm"):
        mgr = KeyframeManager(prm)
        t0 = time.perf_counter()
        for kf in kfs:
            mgr.add_keyframe(**kf)
        wall = time.perf_counter() - t0
        arr = np.asarray(mgr.perf["kf_s"])  # (N,2): total_s, device_s
        tot = arr[:, 0] * 1e3
        dev = arr[:, 1] * 1e3
        host = tot - dev
        # steady state: drop the first submap_count keyframes (growing
        # descriptor history) and any keyframe containing a cadenced
        # pose-graph solve (reported separately — the reference solves at
        # >= 10 s intervals, keyframe_manager.cpp:839-848)
        solve_ms = [s * 1e3 for s in mgr.perf["solve_s"]]
        n0 = prm.submap_count
        keep = np.ones(len(tot), bool)
        keep[:n0] = False
        for k_s in mgr.perf.get("solve_kf", []):
            if k_s < len(keep):
                keep[k_s] = False
        print(
            f"[{label}] total {wall:.2f}s for {len(kfs)} kfs | per-kf "
            f"(steady, n={int(keep.sum())}): total {np.mean(tot[keep]):.1f} ms "
            f"(p50 {np.median(tot[keep]):.1f}, p95 {np.percentile(tot[keep], 95):.1f}) "
            f"= host {np.mean(host[keep]):.1f} + device {np.mean(dev[keep]):.1f} | "
            f"solves: {len(solve_ms)} x {np.mean(solve_ms) if solve_ms else 0:.0f} ms | "
            f"jit buckets: {len(mgr._compiled)}",
            flush=True,
        )
        if label == "warm":
            buckets = sorted(set(k[:2] for k in mgr._compiled))
            print(f"  bucket kinds: {sorted(set(k[0] for k in mgr._compiled))}")
            kf_interval_ms = float(np.mean(np.diff([k["t_us"] for k in kfs]))) / 1e3
            sustain = np.mean(tot[n0:]) < kf_interval_ms
            print(
                f"  data keyframe interval: {kf_interval_ms:.0f} ms -> "
                f"{'SUSTAINS' if sustain else 'FALLS BEHIND'} real-time rate"
            )


if __name__ == "__main__":
    main()
