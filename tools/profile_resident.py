"""Per-stage cost with DEVICE-RESIDENT inputs, amortized over a long scan.

tools/profile_parts.py feeds fresh host inputs per call, so its numbers
are dominated by per-call transfer/relayout over the tunneled TPU
(documented caveat).  This tool instead runs each stage as
``lax.scan`` over CH iterations where (a) all big inputs live on device
before timing, (b) a scalar derived from the stage output folds back
into the carry (serializing iterations and defeating hoisting/CSE), and
(c) per-iteration perturbations come from the scanned epsilon.  The
empty-carry scan is the floor; stage cost = (stage - floor) / CH.

Usage: python tools/profile_resident.py [CH]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import liwslam  # noqa: F401  (precision default)
from liwslam import config
from liwslam.frontend import matching as mm
from liwslam.frontend import pipeline as pl
from liwslam.frontend import preintegration as pre
from liwslam.frontend import scan as scan_mod
from liwslam.frontend.driver import Frontend
from liwslam.sim import world as sim
from liwslam.solve import factors as fac


def timeit(fn, args, leaf, passes=7):
    out = fn(*args)
    jax.block_until_ready(leaf(out))
    best = 1e9
    for _ in range(passes):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(leaf(out))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    CH = int(sys.argv[1]) if len(sys.argv) > 1 else 256
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
    track, k0, *_ = fe.initialize(frames, lt)
    inp = jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x)), frames[k0 + 5]
    )
    track = jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x)), track
    )
    consts, dcfg = fe.consts, fe.dcfg
    scfg = fe.scfg
    eps = jax.device_put(jnp.arange(CH, dtype=jnp.float32) * 1e-9)
    jax.block_until_ready(inp.points)

    rows = []

    def run(name, body, carry0):
        fn = jax.jit(lambda c, e: jax.lax.scan(body, c, e))
        best = timeit(fn, (carry0, eps), leaf=lambda o: o[1])
        rows.append((name, best))
        return best

    # floor
    run("floor (empty)", lambda c, e: (c + e, c), jnp.zeros(()))

    # full tracking step
    def body_full(c, e):
        st, acc = c
        st2, out = pl.tracking_step(
            st._replace(win=st.win._replace(p=st.win.p + e * 0)), inp,
            consts, dcfg, scfg,
        )
        # keep the state cycle stable: reuse st but fold output scalar
        return (st, acc + out.solve_cost), out.solve_cost

    run("tracking_step", body_full, (track, jnp.zeros(())))

    # deskew
    def body_deskew(c, e):
        pts = scan_mod.deskew(
            inp.points, inp.ray_t, jnp.asarray([0.1, 0.0, 0.0]) + c[1] * 0,
            jnp.asarray([0.0, 0.0, 0.1 + e]),
        )
        return (c[0], jnp.sum(pts[0])), jnp.sum(pts[0])

    run("deskew", body_deskew, (jnp.zeros(()), jnp.zeros(())))

    # extraction (both impls)
    kwx = dict(
        continuous_threshold=dcfg.line_continuous_threshold,
        min_len=dcfg.line_min_len,
        max_dis=dcfg.line_max_dis,
        tolerance_angle_rad=dcfg.tolerance_angle_rad,
        resolution=dcfg.resolution,
        max_lines=scfg.max_lines,
        max_corners=scfg.max_corners,
    )

    def body_ext_xla(c, e):
        feats = scan_mod.extract_features(
            inp.points + e, inp.point_valid, fast_prefix=scfg.fast_prefix, **kwx
        )
        s = jnp.sum(feats.p1[0]) + feats.n_lines
        return (c[0], s), s

    run("extract xla", body_ext_xla, (jnp.zeros(()), jnp.zeros(())))

    def body_ext_pl(c, e):
        feats = scan_mod.extract_features_pallas(
            inp.points + e, inp.point_valid,
            interpret=jax.default_backend() != "tpu", **kwx
        )
        s = jnp.sum(feats.p1[0]) + feats.n_lines
        return (c[0], s), s

    run("extract pallas", body_ext_pl, (jnp.zeros(()), jnp.zeros(())))

    # extraction lines only (no corner pairing) — isolates the corner stage
    from liwslam.ops import extract as ext

    def body_ext_lines(c, e):
        e1, e2, lv, gap = ext.extract_lines_pallas(
            inp.points + e, inp.point_valid,
            continuous_threshold=dcfg.line_continuous_threshold,
            min_len=dcfg.line_min_len,
            max_dis=dcfg.line_max_dis,
            tolerance_angle_rad=dcfg.tolerance_angle_rad,
            max_lines=scfg.max_lines,
            interpret=jax.default_backend() != "tpu",
        )
        s = jnp.sum(e1[0]) + jnp.sum(lv)
        return (c[0], s), s

    run("extract pallas lines-only", body_ext_lines, (jnp.zeros(()), jnp.zeros(())))

    # matching (uses the real submap state)
    feats0 = scan_mod.extract_features_pallas(
        inp.points, inp.point_valid,
        interpret=jax.default_backend() != "tpu", **kwx
    )
    feats0 = jax.tree_util.tree_map(jax.device_put, feats0)

    def body_match(c, e):
        match = mm.match_lines(
            track.pair.ref, feats0, track.win.p[-1] + e, track.win.q[-1],
            consts.T_imu_to_laser, resolution=dcfg.resolution,
        )
        s = jnp.sum(match.ref_p1[0]) + match.n
        return (c[0], s), s

    run("match_lines", body_match, (jnp.zeros(()), jnp.zeros(())))

    # add_scan
    def body_addscan(c, e):
        pair2 = mm.add_scan(
            track.pair, feats0, track.win.p[-1] + e, track.win.q[-1],
            consts.T_imu_to_laser,
            ref_n_accumulation=scfg.ref_n_accumulation,
            motion_filter_p=dcfg.ref_motion_filter_p,
            motion_filter_q=dcfg.ref_motion_filter_q,
        )
        s = pair2.ref.n.astype(jnp.float32) + jnp.sum(pair2.ref.p1[0])
        return (c[0], s), s

    run("add_scan", body_addscan, (jnp.zeros(()), jnp.zeros(())))

    # preint (imu + wheel)
    from liwslam.ops.preint_parallel import imu_interval_parallel

    def body_preint(c, e):
        imu = track.imu._replace(X=track.imu.X.at[9].add(e))
        ic = imu_interval_parallel(
            imu, inp.imu_acc, inp.imu_gyro, inp.imu_t_us, inp.imu_mask,
            inp.dt_us, dcfg.imu_Q,
        )
        wc = pre.wheel_add_samples(
            track.wheel, inp.wheel_pose, inp.wheel_t_us, inp.wheel_mask
        )
        wc = pre.wheel_update_only_t(wc, inp.dt_us)
        wres = pre.wheel_result(wc, dcfg.wheel_sigma)
        s = ic.X[0] + wres.delta_T[0, 3]
        return (c[0], s), s

    run("preint imu+wheel", body_preint, (jnp.zeros(()), jnp.zeros(())))

    # solve kernel (via the real factor data of this frame)
    from liwslam.ops import track_solve

    match0 = mm.match_lines(
        track.pair.ref, feats0, track.win.p[-1], track.win.q[-1],
        consts.T_imu_to_laser, resolution=dcfg.resolution,
    )
    imu_res0 = pre.imu_result(track.imu)
    wres0 = pre.wheel_result(track.wheel, dcfg.wheel_sigma)
    data0 = pl._build_factor_data(track, imu_res0, wres0, match0, scfg, jnp.float32)
    data0 = jax.tree_util.tree_map(jax.device_put, data0)
    free = jnp.zeros(pl.W_TRACK * 15).at[15:].set(1.0).at[6:9].set(1.0)

    def body_solve(c, e):
        x, cost, dH, dg = track_solve.lm_solve_track(
            track.win.flat() + e, free, data0, consts,
            max_iters=scfg.solver_max_iterations,
            interpret=jax.default_backend() != "tpu",
            early_exit=scfg.solver_early_exit,
        )
        return (c[0], cost), cost

    run("track_solve kernel", body_solve, (jnp.zeros(()), jnp.zeros(())))

    floor = rows[0][1]
    print(f"CH={CH}; floor={floor * 1e3:.2f} ms/call")
    for name, best in rows[1:]:
        net = (best - floor) / CH * 1e6
        print(f"{name:28s} {best * 1e3:8.2f} ms  net {net:7.1f} us/frame")


if __name__ == "__main__":
    main()
