"""The front-end odometry pipeline: one fused device program per frame.

Reference counterpart: ``trajectory::add_sensor_data(laser)`` and
``do_tracking`` (``src/trajectory/trajectory.cpp:137-277,525-560``) plus the
solver entry points (``src/factor/solver.cpp``).  The reference spreads a
frame across five threads and two Ceres problems; here the entire
per-frame pipeline — de-skew, preintegration, dead reckoning, feature
extraction, submap matching, the sliding-window LM solve, marginalization,
keyframe decision, submap accumulation — is ONE jitted XLA program, and a
whole chunk of frames runs as ``lax.scan`` over it without touching the
host (liwslam.frontend.driver feeds packed chunks).

Window note: with laser-only input the reference's tracking window is
exactly two frames — ``pop_frame_for_tracking`` (trajectory.cpp:590-623)
pops to the last laser frame after every solve, so at solve time the
window is [previous, current].  All frames but the last have p/q frozen
(solver.cpp:787-794); fast_mode additionally freezes biases and skips the
marginalization prior.  The 10-frame window exists only during
initialization (host-orchestrated, liwslam.frontend.init).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from liwslam.core import geometry as geo
from liwslam.core import hostmath
from liwslam.frontend import matching as mm
from liwslam.frontend import preintegration as pre
from liwslam.frontend import scan as scan_mod
from liwslam.solve import factors as fac
from liwslam.solve import gn

W_TRACK = 2  # tracking window size (see module docstring)


class StaticCfg(NamedTuple):
    """Trace-time configuration (shapes + algorithm switches).

    Everything here specializes the compiled program; runtime-tunable
    scalars live in DynCfg / SolveConsts instead."""

    max_points: int
    max_lines: int
    max_corners: int
    max_matches: int
    ref_capacity: int
    acc_corner_capacity: int
    ref_n_accumulation: int
    fast_mode: bool
    solver_max_iterations: int
    solver_method: str
    # "auto" | "on" | "off" — one-shot N^2 prefix forms in extraction
    # (core/fastscan); part of the jit cache key so same-process A/Bs of
    # the two paths are valid (an earlier module-global switch was not)
    fast_prefix: str = "off"
    # pallas LM loop: while_loop early exit vs fixed-trip fori
    solver_early_exit: bool = True
    # "auto" | "pallas" | "xla" — line extraction as ONE Pallas launch
    # (ops/extract) vs the XLA scan chain (frontend/scan); auto picks
    # pallas on TPU (the per-frame program is launch-latency-bound)
    extract_impl: str = "auto"


class DynCfg(NamedTuple):
    """Runtime scalar parameters (device arrays: change freely, no
    recompile)."""

    line_continuous_threshold: jnp.ndarray
    line_min_len: jnp.ndarray
    line_max_dis: jnp.ndarray
    tolerance_angle_rad: jnp.ndarray
    resolution: jnp.ndarray
    ref_motion_filter_p: jnp.ndarray
    ref_motion_filter_q: jnp.ndarray
    kf_p_threshold: jnp.ndarray
    kf_q_threshold: jnp.ndarray
    wheel_sigma: jnp.ndarray  # (3,)
    imu_Q: jnp.ndarray  # (12,12)


def make_static_cfg(params) -> StaticCfg:
    return StaticCfg(
        max_points=params.max_points,
        max_lines=params.max_lines,
        max_corners=params.max_corners,
        max_matches=params.max_lines,
        ref_capacity=params.ref_capacity,
        acc_corner_capacity=4 * params.max_corners,
        ref_n_accumulation=params.ref_n_accumulation,
        fast_mode=params.fast_mode,
        solver_max_iterations=params.solver_max_iterations,
        solver_method=params.solver_method,
        fast_prefix=params.fast_prefix,
        solver_early_exit=params.solver_early_exit,
        extract_impl=params.extract_impl,
    )


@hostmath.setup_fn
def make_dyn_cfg(params, dtype=jnp.float32) -> DynCfg:
    return DynCfg(
        line_continuous_threshold=jnp.asarray(params.line_continuous_threshold, dtype),
        line_min_len=jnp.asarray(params.line_min_len, dtype),
        line_max_dis=jnp.asarray(params.line_max_dis, dtype),
        tolerance_angle_rad=jnp.asarray(params.line_max_tolerance_angle_rad, dtype),
        resolution=jnp.asarray(params.laser_resolution, dtype),
        ref_motion_filter_p=jnp.asarray(params.ref_motion_filter_p, dtype),
        ref_motion_filter_q=jnp.asarray(params.ref_motion_filter_q, dtype),
        kf_p_threshold=jnp.asarray(params.key_frame_p_motion_threshold, dtype),
        kf_q_threshold=jnp.asarray(params.key_frame_q_motion_threshold, dtype),
        wheel_sigma=jnp.asarray(params.wheel_sigma, dtype),
        imu_Q=pre.imu_noise_Q(params).astype(dtype),
    )


class TrackState(NamedTuple):
    """Everything that persists frame-to-frame on device."""

    # sliding window (W_TRACK frames): slot -1 is "current"
    win: fac.WindowState
    # preintegrator carries (times relative to the previous frame stamp)
    imu: pre.ImuCarry
    wheel: pre.WheelCarry
    # double-buffered reference submap
    pair: mm.SubmapPair
    # marginalization prior (solver.cpp:390-441)
    prior_J: jnp.ndarray  # (15,15)
    prior_X: jnp.ndarray  # (15,)
    prior_res: jnp.ndarray  # (15,)
    prior_valid: jnp.ndarray  # () bool
    # keyframe bookkeeping
    last_keyframe_T: jnp.ndarray  # (4,4) laser-frame pose of last keyframe
    acc_corners: jnp.ndarray  # (K,3) world-frame corners since last keyframe
    acc_valid: jnp.ndarray  # (K,)
    angular_local: jnp.ndarray  # (3,) current_angular_local


class FrameInput(NamedTuple):
    """Per-frame packed sensor slices (host-assembled; times are int32
    microseconds relative to the PREVIOUS frame's stamp)."""

    dt_us: jnp.ndarray  # () int32 — frame stamp minus previous stamp
    imu_acc: jnp.ndarray  # (I,3)
    imu_gyro: jnp.ndarray  # (I,3)
    imu_t_us: jnp.ndarray  # (I,) int32
    imu_mask: jnp.ndarray  # (I,)
    wheel_pose: jnp.ndarray  # (Wh,4,4)
    wheel_t_us: jnp.ndarray  # (Wh,)
    wheel_mask: jnp.ndarray  # (Wh,)
    points: jnp.ndarray  # (N,3) laser frame
    point_valid: jnp.ndarray  # (N,)
    ray_t: jnp.ndarray  # (N,) seconds relative to frame stamp


class FrameOutput(NamedTuple):
    p: jnp.ndarray  # (3,)
    q: jnp.ndarray
    v: jnp.ndarray
    bs: jnp.ndarray  # (6,)
    is_keyframe: jnp.ndarray  # () bool
    kf_corners: jnp.ndarray  # (K,3) world-frame corners (valid on keyframe)
    kf_corner_valid: jnp.ndarray  # (K,)
    n_match: jnp.ndarray  # () int32
    n_lines: jnp.ndarray  # () int32
    solve_cost: jnp.ndarray  # ()
    scan_p1: jnp.ndarray  # (L,3) extracted lines (laser frame) for backend
    scan_p2: jnp.ndarray
    scan_line_valid: jnp.ndarray


@hostmath.setup_fn
def init_track_state(p0, q0, v0, bs0, scfg: StaticCfg, dtype=jnp.float32) -> TrackState:
    win = fac.WindowState(
        p=jnp.tile(jnp.asarray(p0, dtype)[None], (W_TRACK, 1)),
        q=jnp.tile(jnp.asarray(q0, dtype)[None], (W_TRACK, 1)),
        v=jnp.tile(jnp.asarray(v0, dtype)[None], (W_TRACK, 1)),
        bs=jnp.tile(jnp.asarray(bs0, dtype)[None], (W_TRACK, 1)),
    )
    return TrackState(
        win=win,
        imu=pre.imu_reset(0, jnp.asarray(bs0, dtype)[:3], jnp.asarray(bs0, dtype)[3:]),
        wheel=pre.wheel_reset(0, dtype),
        pair=mm.empty_pair(scfg.ref_capacity, dtype),
        prior_J=jnp.zeros((15, 15), dtype),
        prior_X=jnp.zeros(15, dtype),
        prior_res=jnp.zeros(15, dtype),
        prior_valid=jnp.asarray(False),
        last_keyframe_T=geo.make_tf(jnp.asarray(p0, dtype), jnp.asarray(q0, dtype)),
        acc_corners=jnp.zeros((scfg.acc_corner_capacity, 3), dtype),
        acc_valid=jnp.zeros(scfg.acc_corner_capacity, bool),
        angular_local=jnp.zeros(3, dtype),
    )


def _build_factor_data(
    st: TrackState,
    imu_res: pre.ImuPreintResult,
    wheel_res: pre.WheelPreintResult,
    match: mm.LaserMatch,
    scfg: StaticCfg,
    dtype,
) -> fac.FactorData:
    W = W_TRACK
    M = match.new_p1.shape[0]
    eye15 = jnp.eye(15, dtype=dtype)
    return fac.FactorData(
        imu_X=jnp.stack([jnp.zeros(15, dtype), imu_res.X]),
        imu_J=jnp.stack([eye15, imu_res.J]),
        imu_sqrtP=jnp.stack([eye15, imu_res.sqrt_inverse_P]),
        imu_Dt=jnp.stack([jnp.zeros((), dtype), imu_res.Dt]),
        imu_valid=jnp.asarray([False, True]),
        wheel_dT=jnp.stack([jnp.eye(4, dtype=dtype), wheel_res.delta_T]),
        wheel_sqrt=jnp.stack([jnp.eye(3, dtype=dtype), wheel_res.sqrt_inverse_P]),
        wheel_valid=jnp.asarray([False, True]),
        laser_l1p1=match.ref_p1,
        laser_l1p2=match.ref_p2,
        laser_l2p1=match.new_p1,
        laser_l2p2=match.new_p2,
        laser_i_idx=-jnp.ones(M, jnp.int32),
        laser_j_idx=jnp.full((M,), W - 1, jnp.int32),
        laser_ref_p=jnp.tile(match.ref_pose_p[None], (M, 1)),
        laser_ref_q=jnp.tile(match.ref_pose_q[None], (M, 1)),
        laser_valid=match.valid,
        ground_weight=jnp.asarray(jnp.sqrt(float(W)), dtype),
        frame_valid=jnp.ones(W, bool),
        prior_J=st.prior_J,
        prior_X=st.prior_X,
        prior_res=st.prior_res,
        prior_idx=jnp.asarray(W - 2, jnp.int32),
        prior_valid=st.prior_valid & jnp.asarray(not scfg.fast_mode),
    )


def _wrap_q(x, W, dtype):
    st = fac.WindowState.from_flat(x, W)
    return st._replace(q=geo.normalize_so3(st.q)).flat()


def tracking_step(
    state: TrackState,
    inp: FrameInput,
    consts: fac.SolveConsts,
    dcfg: DynCfg,
    scfg: StaticCfg,
):
    """One laser frame through the full front end.  Pure; scan-able."""
    dtype = state.win.p.dtype
    Til = consts.T_imu_to_laser
    Tiw = consts.T_imu_to_wheel

    cur_p = state.win.p[-1]
    cur_q = state.win.q[-1]
    cur_v = state.win.v[-1]
    cur_bs = state.win.bs[-1]

    # --- 1. de-skew with the current twist estimate (trajectory.cpp:140-147)
    T_w_l = geo.tf_compose(geo.make_tf(cur_p, cur_q), Til)
    R_wl = T_w_l[:3, :3]
    R_il = Til[:3, :3]
    ang_laser = geo.log_SO3(R_il.T @ geo.exp_so3(state.angular_local) @ R_il)
    pts = scan_mod.deskew(inp.points, inp.ray_t, R_wl.T @ cur_v, ang_laser)

    # --- 2. preintegrate up to the frame stamp (trajectory.cpp:176-184)
    # log-depth associative-scan form (ops/preint_parallel; equivalent to
    # imu_add_samples + imu_update_only_t for the packer's prefix masks)
    from liwslam.ops.preint_parallel import imu_interval_parallel

    imu_c = imu_interval_parallel(
        state.imu,
        inp.imu_acc,
        inp.imu_gyro,
        inp.imu_t_us,
        inp.imu_mask,
        inp.dt_us,
        dcfg.imu_Q,
    )
    imu_res = pre.imu_result(imu_c)
    wheel_c = pre.wheel_add_samples(
        state.wheel, inp.wheel_pose, inp.wheel_t_us, inp.wheel_mask
    )
    wheel_c = pre.wheel_update_only_t(wheel_c, inp.dt_us)
    wheel_res = pre.wheel_result(wheel_c, dcfg.wheel_sigma)

    # reset carries for the next interval; rebase times to this frame
    imu_next = pre.imu_reset(0, cur_bs[:3], cur_bs[3:], dtype)._replace(
        last_acc=imu_c.last_acc,
        last_gyro=imu_c.last_gyro,
        last_t_us=imu_c.last_t_us - inp.dt_us,
        has_sample=imu_c.has_sample,
    )
    wheel_next = pre.wheel_rebase(pre.wheel_reset(wheel_c, dtype), inp.dt_us)

    ang = imu_res.X[6:9] / jnp.maximum(imu_res.Dt, 1e-6)

    # --- 3. dead reckoning via the wheel delta (trajectory.cpp:82-98,189-192)
    delta_imu = geo.tf_compose(geo.tf_compose(Tiw, wheel_res.delta_T), geo.tf_inv(Tiw))
    pred_T = geo.tf_compose(geo.make_tf(cur_p, cur_q), delta_imu)
    pred_p, pred_q = geo.log_SE3(pred_T)

    # --- 4. feature extraction -------------------------------------------
    if scan_mod.resolve_extract_impl(scfg.extract_impl) == "pallas":
        feats = scan_mod.extract_features_pallas(
            pts,
            inp.point_valid,
            continuous_threshold=dcfg.line_continuous_threshold,
            min_len=dcfg.line_min_len,
            max_dis=dcfg.line_max_dis,
            tolerance_angle_rad=dcfg.tolerance_angle_rad,
            resolution=dcfg.resolution,
            max_lines=scfg.max_lines,
            max_corners=scfg.max_corners,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        feats = scan_mod.extract_features(
            pts,
            inp.point_valid,
            continuous_threshold=dcfg.line_continuous_threshold,
            min_len=dcfg.line_min_len,
            max_dis=dcfg.line_max_dis,
            tolerance_angle_rad=dcfg.tolerance_angle_rad,
            resolution=dcfg.resolution,
            max_lines=scfg.max_lines,
            max_corners=scfg.max_corners,
            fast_prefix=scfg.fast_prefix,
        )

    # --- 5. match against the reference submap ----------------------------
    match = mm.match_lines(
        state.pair.ref, feats, pred_p, pred_q, Til, resolution=dcfg.resolution
    )

    # --- 6. slide the window and solve -------------------------------------
    win = fac.WindowState(
        p=jnp.stack([cur_p, pred_p]),
        q=jnp.stack([cur_q, pred_q]),
        v=jnp.stack([cur_v, cur_v]),
        bs=jnp.stack([cur_bs, cur_bs]),
    )
    data = _build_factor_data(state, imu_res, wheel_res, match, scfg, dtype)
    free = jnp.zeros(W_TRACK * 15, dtype)
    free = free.at[15:].set(1.0)  # last frame fully free
    free = free.at[6:9].set(1.0)  # frame-0 velocity (never frozen)
    if not scfg.fast_mode:
        free = free.at[9:15].set(1.0)  # frame-0 biases free unless fast

    method = scfg.solver_method
    if method == "auto":
        # trace-time resolution: the one-kernel pallas solve wins on TPU
        # (1.41 vs 1.91 ms/frame measured); XLA chol elsewhere (pallas
        # interpret mode on CPU is far slower than the native XLA path)
        method = "pallas" if jax.default_backend() == "tpu" else "chol"
    if method == "pallas":
        # one-kernel LM + Schur reduction (ops/track_solve); interpret
        # mode on non-TPU backends so CPU tests drive the same math
        from liwslam.ops import track_solve

        # statically-frozen dims skip their in-kernel factorization steps
        # (frame-0 pose always; biases too in fast_mode — solver.cpp:744)
        frozen = (0, 1, 2, 3, 4, 5)
        if scfg.fast_mode:
            frozen = frozen + (9, 10, 11, 12, 13, 14)
        x_opt, cost, dH, dg = track_solve.lm_solve_track(
            win.flat(),
            free,
            data,
            consts,
            max_iters=scfg.solver_max_iterations,
            interpret=jax.default_backend() != "tpu",
            early_exit=scfg.solver_early_exit,
            frozen_dims=frozen,
        )
        if scfg.fast_mode:
            prior_J, prior_X, prior_res, prior_valid = (
                state.prior_J,
                state.prior_X,
                state.prior_res,
                jnp.asarray(False),
            )
        else:
            prior_J, prior_res = gn.sqrt_prior(dH, dg)
            prior_X = x_opt[15:]
            prior_valid = jnp.asarray(True)
    else:
        res_fn = lambda x: fac.stack_residuals(
            fac.WindowState.from_flat(x, W_TRACK), data, consts
        )
        x_opt, cost, _, lin_opt = gn.lm_solve(
            res_fn,
            win.flat(),
            free,
            gn.LMConfig(
                max_iters=scfg.solver_max_iterations, method=method
            ),
            wrap_fn=lambda x: _wrap_q(x, W_TRACK, dtype),
            return_lin=True,
        )
        # --- 7. marginalization prior (solver.cpp:257-442) -----------------
        if scfg.fast_mode:
            prior_J, prior_X, prior_res, prior_valid = (
                state.prior_J,
                state.prior_X,
                state.prior_res,
                jnp.asarray(False),
            )
        else:
            lin_J, lin_res, lin_X = gn.marginalize(
                res_fn, x_opt, keep=15, lin=lin_opt
            )
            prior_J, prior_X, prior_res = lin_J, lin_X, lin_res
            prior_valid = jnp.asarray(True)
    win = fac.WindowState.from_flat(x_opt, W_TRACK)
    new_p, new_q, new_v, new_bs = win.p[-1], win.q[-1], win.v[-1], win.bs[-1]

    # --- 8. keyframe decision (trajectory.cpp:247-270) ---------------------
    cur_laser_T = geo.tf_compose(geo.make_tf(new_p, new_q), Til)
    dkp, dkq = geo.log_SE3(geo.tf_compose(geo.tf_inv(state.last_keyframe_T), cur_laser_T))
    moved = (geo.safe_norm(dkp) >= dcfg.kf_p_threshold) | (
        geo.safe_norm(dkq) >= dcfg.kf_q_threshold
    )
    n_match = match.n
    n_lines = feats.n_lines
    is_kf = moved | (n_match < (n_lines - n_match))

    # corner accumulation in the world laser frame (trajectory.cpp:239-243)
    # — one-hot matmul append, no scatter (round-3 gather/scatter sweep)
    cw = geo.tf_apply(cur_laser_T, feats.corners)
    K = state.acc_corners.shape[0]
    off = jnp.cumsum(feats.corner_valid.astype(jnp.int32)) - 1
    base = jnp.sum(state.acc_valid.astype(jnp.int32))
    widx = jnp.where(feats.corner_valid, base + off, K + 1)
    ohc = (
        widx[:, None] == jnp.arange(K, dtype=jnp.int32)[None, :]
    ).astype(dtype)  # (C,K), distinct columns
    placed = ohc.T @ jnp.concatenate(
        [cw, feats.corner_valid.astype(dtype)[:, None]], 1
    )  # (K,4)
    touched = placed[:, 3] > 0.5
    acc_c = jnp.where(touched[:, None], placed[:, :3], state.acc_corners)
    acc_v = state.acc_valid | touched

    out = FrameOutput(
        p=new_p,
        q=new_q,
        v=new_v,
        bs=new_bs,
        is_keyframe=is_kf,
        kf_corners=acc_c,
        kf_corner_valid=acc_v & is_kf,
        n_match=n_match,
        n_lines=n_lines,
        solve_cost=cost,
        scan_p1=feats.p1,
        scan_p2=feats.p2,
        scan_line_valid=feats.line_valid,
    )

    # reset accumulator on keyframe
    acc_c = jnp.where(is_kf, 0.0, 1.0) * acc_c
    acc_v = jnp.where(is_kf, jnp.zeros_like(acc_v), acc_v)
    last_kf_T = jnp.where(is_kf, cur_laser_T, state.last_keyframe_T)

    # --- 9. accumulate the scan into the reference submap ------------------
    pair = mm.add_scan(
        state.pair,
        feats,
        new_p,
        new_q,
        Til,
        ref_n_accumulation=scfg.ref_n_accumulation,
        motion_filter_p=dcfg.ref_motion_filter_p,
        motion_filter_q=dcfg.ref_motion_filter_q,
    )

    new_state = TrackState(
        win=win,
        imu=imu_next._replace(
            X=imu_next.X.at[9:15].set(new_bs)  # reset biases to the solve
        ),
        wheel=wheel_next,
        pair=pair,
        prior_J=prior_J,
        prior_X=prior_X,
        prior_res=prior_res,
        prior_valid=prior_valid,
        last_keyframe_T=last_kf_T,
        acc_corners=acc_c,
        acc_valid=acc_v,
        angular_local=ang,
    )
    return new_state, out


def run_chunk(state: TrackState, inputs: FrameInput, consts, dcfg, scfg: StaticCfg):
    """lax.scan the tracking step over a packed chunk of frames."""

    def body(st, inp):
        return tracking_step(st, inp, consts, dcfg, scfg)

    return jax.lax.scan(body, state, inputs)
