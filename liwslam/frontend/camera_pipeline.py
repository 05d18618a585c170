"""Camera-enabled front end: the reference's (dormant) monocular path, live.

Reference counterpart: ``trajectory::add_sensor_data(camera)``
(``src/trajectory/trajectory.cpp:279-380``) plus the camera rows of both
solver entry points (``src/factor/solver.cpp:60-85`` init,
``solver.cpp:641-666`` tracking) and the landmark bookkeeping of
``feature_manger`` (``src/trajectory/camera_manager.cpp:100-311``).

With ``enable_camera`` the reference interleaves camera frames into the
sliding window: the FIRST camera message after each laser frame becomes a
full window frame (two consecutive camera frames are rejected,
trajectory.cpp:301), with its own IMU/wheel preintegration interval and its
own ``do_tracking`` solve; camera reprojection factors tie the newest
camera frame's pose to free landmark world points, which are triangulated
in-window (``estimate_features``, trajectory.cpp:562-589) and
outlier-filtered (``filter_outlier_world_point``, trajectory.cpp:689-730).

TPU-native structure (one fused program per laser frame, scan-able):

    [prev frame] --imu/wheel A--> [camera frame] --imu/wheel B--> [laser]
                     camera solve                    laser solve

Each laser-frame step optionally contains a CAMERA SUB-STEP (lax.cond on
image presence): split the interval's preintegration at the camera stamp,
LK-track + replenish features, record observations, triangulate mature
landmarks, solve the 2-frame window [prev frozen, camera free] jointly
with free landmarks (imu+wheel+ground+prior+camera rows), filter outliers,
marginalize the previous frame into the prior, then hand the state to the
unchanged laser tracking step for the remainder of the interval.

LK runs at FULL camera rate, like the reference's add_frame-on-every-
message behavior (trajectory.cpp:279-310): the interval's later camera
messages are packed as ``cam_extra_imgs`` and tracked (no observation
recording), keeping LK baselines at one camera period (round-3 fix of a
round-2 deviation; see tests/test_camera_rate.py for the fast-rotation
track-survival gate).

Documented deviations from the reference (all capability-preserving):

- The reference's laser-frame solve also carries camera rows, but with all
  camera-frame poses frozen those rows touch only landmark variables and
  are exactly separable from the pose problem — we fold that landmark
  refinement into the camera sub-step's joint solve instead.
- The marginalization prior keeps the 15-dim frame block only; camera
  observation history is carried by the live observation window rather
  than by linearized landmark blocks (the reference stores 3k landmark
  columns in the prior, marginalization_factor.h; carrying both the live
  window obs AND a landmark prior would double-count them).  MEASURED
  (round 3, tests/test_camera_e2e.py::test_prior_history_length_within
  _noise): halving the carried history (Wc 8 -> 4, which discards more
  than the landmark-column deviation does) left ATE within noise —
  the carried-history tail is not load-bearing on this workload.

The landmark table reuses :class:`liwslam.camera.features.FeatureWindow`
slot-aligned with the tracker: slot f of the LK track table IS landmark
slot f, so observation recording, triangulation
(:func:`features.triangulate_ready`) and reprojection scoring
(:func:`features.reproj_error`) need no id joins on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from liwslam.camera import features as ft
from liwslam.camera import tracker as trk
from liwslam.core import geometry as geo
from liwslam.core import hostmath
from liwslam.frontend import pipeline as pl
from liwslam.frontend import preintegration as pre
from liwslam.solve import factors as fac
from liwslam.solve import gn


class CamStaticCfg(NamedTuple):
    """Trace-time camera configuration."""

    n_features: int  # landmark/track slot capacity F
    obs_window: int  # Wc observation ring length
    max_new_per_frame: int  # replenishment slot cap per frame (static)
    min_obs: int  # observations required before triangulation
    lk_radius: int
    lk_levels: int
    lk_iters: int
    solver_max_iterations: int
    fast_mode: bool
    # static NMS cell size (>= feature_min_dis) for select_features'
    # dense cell-grid suppression (reshape needs a static tile)
    cell_px: int = 10
    # joint solve: "schur" (landmark-Schur LM, solve/cam_schur.py) or
    # "chol" (generic dense LM over the (30+3F)-dim state)
    solver: str = "schur"
    # LK implementation: "pallas" one-kernel descent (ops/lk.py) or
    # "xla" einsum sampling (camera/tracker.py); resolved from "auto"
    lk_impl: str = "xla"


class CamDynCfg(NamedTuple):
    """Runtime camera scalars/arrays (no recompile on change)."""

    K: jnp.ndarray  # (3,3)
    K_inv: jnp.ndarray  # (3,3)
    T_imu_to_camera: jnp.ndarray  # (4,4)
    sqrt_info: jnp.ndarray  # (2,) camera whitening (fx/sigma)
    feature_min_dis: jnp.ndarray  # () px
    max_feature_num: jnp.ndarray  # () int32 replenish-to target
    min_parallax: jnp.ndarray  # () normalized-plane parallax gate
    max_reproj_err: jnp.ndarray  # () normalized (max_camera_reproject_error/fx)
    max_feature_dis: jnp.ndarray  # () max landmark depth [m]
    lk_max_err: jnp.ndarray  # () LK verification gate (fraction of range)


def make_cam_static_cfg(params) -> CamStaticCfg:
    return CamStaticCfg(
        n_features=params.cam_feature_capacity,
        obs_window=params.cam_obs_window,
        max_new_per_frame=params.cam_feature_capacity,
        min_obs=params.cam_min_obs,
        lk_radius=params.cam_lk_radius,
        lk_levels=params.cam_lk_levels,
        lk_iters=params.cam_lk_iters,
        solver_max_iterations=params.solver_max_iterations,
        fast_mode=params.fast_mode,
        cell_px=max(1, int(-(-float(params.feature_min_dis) // 1))),
        solver=params.cam_solver,
        lk_impl=params.cam_lk_impl,
    )


@hostmath.setup_fn
def make_cam_dyn_cfg(params, dtype=jnp.float32) -> CamDynCfg:
    import numpy as np

    K = np.asarray(params.mat_camera_K(), np.float64)
    fx = K[0, 0]
    return CamDynCfg(
        K=jnp.asarray(K, dtype),
        K_inv=jnp.asarray(np.linalg.inv(K), dtype),
        T_imu_to_camera=jnp.asarray(params.mat_T_imu_to_camera(), dtype),
        sqrt_info=jnp.asarray(fx / np.asarray(params.camera_sigma), dtype),
        feature_min_dis=jnp.asarray(params.feature_min_dis, dtype),
        max_feature_num=jnp.asarray(params.max_feature_num, jnp.int32),
        min_parallax=jnp.asarray(params.cam_min_parallax, dtype),
        # params.cpp:176-190 normalizes the pixel threshold by fx
        max_reproj_err=jnp.asarray(params.max_camera_reproject_error / fx, dtype),
        max_feature_dis=jnp.asarray(params.max_camera_feature_dis, dtype),
        lk_max_err=jnp.asarray(params.cam_lk_max_err, dtype),
    )


class CamTrackState(NamedTuple):
    """Per-stream camera state (slot-aligned track table + landmark window).

    ``fw`` slot f <-> track slot f.  ``ring_*`` hold the (frozen) IMU-frame
    poses of the ``obs_window`` most recent accepted camera frames — the
    window poses for camera residual rows of non-current observations."""

    fw: ft.FeatureWindow
    px: jnp.ndarray  # (F,2) current pixel positions (in prev_img)
    live: jnp.ndarray  # (F,) bool — LK chain alive
    ring_p: jnp.ndarray  # (Wc,3)
    ring_q: jnp.ndarray  # (Wc,3)
    ring_valid: jnp.ndarray  # (Wc,)
    prev_img: jnp.ndarray  # (H,W)
    prev_valid: jnp.ndarray  # () bool


@hostmath.setup_fn
def init_cam_state(img_h, img_w, ccfg: CamStaticCfg, dtype=jnp.float32) -> CamTrackState:
    F, Wc = ccfg.n_features, ccfg.obs_window
    return CamTrackState(
        fw=ft.empty_window(F, Wc, dtype),
        px=jnp.zeros((F, 2), dtype),
        live=jnp.zeros(F, bool),
        ring_p=jnp.zeros((Wc, 3), dtype),
        ring_q=jnp.zeros((Wc, 3), dtype),
        ring_valid=jnp.zeros(Wc, bool),
        prev_img=jnp.zeros((img_h, img_w), dtype),
        prev_valid=jnp.asarray(False),
    )


# ---------------------------------------------------------------------------
# tracking + observation recording (camera_manager::add_frame +
# feature_manger::add_match)


def px_to_norm(px, K_inv):
    """Pixel -> normalized camera plane."""
    ones = jnp.ones_like(px[..., :1])
    h = jnp.concatenate([px, ones], -1) @ K_inv.T
    return h[..., :2]


def norm_to_px(xy, K):
    ones = jnp.ones_like(xy[..., :1])
    h = jnp.concatenate([xy, ones], -1) @ K.T
    return h[..., :2]


def observe(cam: CamTrackState, img, ccfg: CamStaticCfg, cdyn: CamDynCfg,
            replenish: bool = True):
    """LK-track existing features into ``img`` and replenish new ones
    (camera_manager.cpp:55-113).  Pure bookkeeping; no window recording.

    ``replenish=False`` runs the LK half only — used for the interval's
    non-accepted camera messages: a feature spawned there cannot be
    OBSERVED before the next accepted frame, whose own replenish finds
    the same corners, so skipping it is observation-equivalent and about
    halves the cost of full-camera-rate tracking (measured round 3)."""
    fw = cam.fw

    impl = ccfg.lk_impl
    if impl == "auto":
        # measured (r4, same-process full-bench A/Bs after the pooled-
        # pyramid fix): XLA einsum LK wins at 160x120 (479 vs 354 fps —
        # the pallas kernel's per-sample dynamic-slice+roll floor
        # dominates small images), the pallas one-kernel descent edges
        # ahead at 640x480 (338 vs 331) and is resolution-independent.
        # Pick by image area at trace time.
        from liwslam.ops import lk as lk_mod

        H_img, W_img = img.shape
        big = H_img * W_img >= 300_000
        fits = ccfg.lk_radius <= lk_mod.MAX_RADIUS
        impl = (
            "pallas"
            if (big and fits and jax.default_backend() == "tpu")
            else "xla"
        )
    if impl == "pallas":
        from liwslam.ops import lk as lk_mod

        new_px, ok = lk_mod.lk_track_pallas(
            cam.prev_img,
            img,
            cam.px,
            cam.live & cam.prev_valid,
            radius=ccfg.lk_radius,
            iters=ccfg.lk_iters,
            levels=ccfg.lk_levels,
            max_err=cdyn.lk_max_err,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        new_px, ok = trk.lk_track(
            cam.prev_img,
            img,
            cam.px,
            cam.live & cam.prev_valid,
            radius=ccfg.lk_radius,
            iters=ccfg.lk_iters,
            levels=ccfg.lk_levels,
            max_err=cdyn.lk_max_err,
        )
    px = jnp.where(ok[:, None], new_px, cam.px)
    live = ok
    if not replenish:
        return cam._replace(
            px=px, live=live, prev_img=img, prev_valid=jnp.asarray(True)
        )

    # replenish up to max_feature_num live tracks (goodFeaturesToTrack with
    # min-distance masking, camera_manager.cpp:93-113)
    n_live = jnp.sum(live.astype(jnp.int32))
    budget = jnp.maximum(cdyn.max_feature_num - n_live, 0)
    fresh_px, fresh_ok = trk.select_features(
        img,
        ccfg.max_new_per_frame,
        cdyn.feature_min_dis,
        existing_xy=px,
        existing_valid=live,
        budget=budget,
        cell_px=ccfg.cell_px,
    )
    # place fresh tracks into dead slots (slot-aligned with fw): a reused
    # slot starts a NEW landmark -> clear its observation history
    F = px.shape[0]
    free = ~live
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    slot_by_rank = jnp.full((F,), F + 1, jnp.int32).at[
        jnp.where(free, free_rank, F + 1)
    ].set(jnp.arange(F, dtype=jnp.int32), mode="drop")
    fresh_rank = jnp.cumsum(fresh_ok.astype(jnp.int32)) - 1
    dest = jnp.where(
        fresh_ok & (fresh_rank < jnp.sum(free.astype(jnp.int32))),
        slot_by_rank[jnp.clip(fresh_rank, 0, F - 1)],
        F + 1,
    )
    px = px.at[dest].set(fresh_px, mode="drop")
    live = live.at[dest].set(fresh_ok, mode="drop")
    new_ids = fw.next_id + fresh_rank.astype(jnp.int32)
    placed = jnp.zeros(F, bool).at[dest].set(fresh_ok, mode="drop")
    ids = jnp.where(placed, -1, fw.ids)  # invalidate first
    ids = ids.at[dest].set(new_ids, mode="drop")
    obs_mask = jnp.where(placed[:, None], False, fw.obs_mask)
    ready = jnp.where(placed, False, fw.ready)
    n_new = jnp.sum(fresh_ok.astype(jnp.int32))
    fw = fw._replace(
        ids=ids, obs_mask=obs_mask, ready=ready, next_id=fw.next_id + n_new
    )
    return cam._replace(fw=fw, px=px, live=live, prev_img=img, prev_valid=jnp.asarray(True))


def record(cam: CamTrackState, p, q, cdyn: CamDynCfg) -> CamTrackState:
    """Record the current tracks as observations of an ACCEPTED camera
    frame at IMU-frame pose (p, q) (feature_manger::add_match)."""
    fw = cam.fw
    Wc = fw.obs.shape[1]
    obs = jnp.concatenate([fw.obs[:, 1:], jnp.zeros_like(fw.obs[:, :1])], 1)
    mask = jnp.concatenate(
        [fw.obs_mask[:, 1:], jnp.zeros_like(fw.obs_mask[:, :1])], 1
    )
    xy = px_to_norm(cam.px, cdyn.K_inv)
    obs = obs.at[:, Wc - 1].set(xy)
    mask = mask.at[:, Wc - 1].set(cam.live & (fw.ids >= 0))
    ring_p = jnp.concatenate([cam.ring_p[1:], p[None]], 0)
    ring_q = jnp.concatenate([cam.ring_q[1:], q[None]], 0)
    ring_valid = jnp.concatenate(
        [cam.ring_valid[1:], jnp.ones_like(cam.ring_valid[:1])], 0
    )
    return cam._replace(
        fw=fw._replace(obs=obs, obs_mask=mask),
        ring_p=ring_p,
        ring_q=ring_q,
        ring_valid=ring_valid,
    )


def camera_rows(fw: ft.FeatureWindow, world, ring_p, ring_q, ring_valid,
                cur_p, cur_q, cdyn: CamDynCfg):
    """(F*Wc, 2) whitened reprojection rows.  Slot Wc-1's pose is the free
    current camera frame; older slots use the frozen ring poses
    (solver.cpp:641-666: window frames are constant except the last)."""
    F, Wc = fw.obs_mask.shape
    Tic = cdyn.T_imu_to_camera

    def one(f, w):
        is_cur = w == Wc - 1
        p = jnp.where(is_cur, cur_p, ring_p[w])
        q = jnp.where(is_cur, cur_q, ring_q[w])
        r = fac.camera_residual(p, q, world[f], fw.obs[f, w], Tic, cdyn.sqrt_info)
        use = fw.obs_mask[f, w] & fw.ready[f] & ring_valid[w]
        return r * use.astype(r.dtype)

    ff, ww = jnp.meshgrid(jnp.arange(F), jnp.arange(Wc), indexing="ij")
    return jax.vmap(jax.vmap(one))(ff, ww).reshape(F * Wc, 2)


def filter_outliers(cam: CamTrackState, cur_p, cur_q, cdyn: CamDynCfg) -> CamTrackState:
    """filter_outlier_world_point (trajectory.cpp:689-730): drop ready
    landmarks by reprojection error / depth gates against the NEWEST frame,
    then drop every feature without an observation in the newest frame
    (remove_all_features_without_lastest_frame)."""
    fw = cam.fw
    Wc = fw.obs.shape[1]
    T_w_c = geo.tf_compose(geo.make_tf(cur_p, cur_q), cdyn.T_imu_to_camera)
    cm = jax.vmap(lambda wpt: geo.tf_apply(geo.tf_inv(T_w_c), wpt))(fw.world)
    z = cm[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    proj = cm[:, :2] / zs[:, None]
    err = jnp.linalg.norm(proj - fw.obs[:, Wc - 1], axis=-1)
    has_latest = fw.obs_mask[:, Wc - 1]
    bad = fw.ready & has_latest & (
        (err > cdyn.max_reproj_err) | (z > cdyn.max_feature_dis) | (z < 0.1)
    )
    drop = bad | ~has_latest
    fw = fw._replace(
        ids=jnp.where(drop, -1, fw.ids),
        ready=fw.ready & ~drop,
        obs_mask=fw.obs_mask & ~drop[:, None],
    )
    return cam._replace(fw=fw, live=cam.live & ~drop)


# ---------------------------------------------------------------------------
# the camera sub-step solve


def _cam_factor_data(st: pl.TrackState, imu_res, wheel_res, scfg, dtype):
    """W=2 FactorData for the [prev, camera] interval — no laser rows."""
    eye15 = jnp.eye(15, dtype=dtype)
    z3 = jnp.zeros((1, 3), dtype)
    return fac.FactorData(
        imu_X=jnp.stack([jnp.zeros(15, dtype), imu_res.X]),
        imu_J=jnp.stack([eye15, imu_res.J]),
        imu_sqrtP=jnp.stack([eye15, imu_res.sqrt_inverse_P]),
        imu_Dt=jnp.stack([jnp.zeros((), dtype), imu_res.Dt]),
        imu_valid=jnp.asarray([False, True]),
        wheel_dT=jnp.stack([jnp.eye(4, dtype=dtype), wheel_res.delta_T]),
        wheel_sqrt=jnp.stack([jnp.eye(3, dtype=dtype), wheel_res.sqrt_inverse_P]),
        wheel_valid=jnp.asarray([False, True]),
        laser_l1p1=z3,
        laser_l1p2=z3,
        laser_l2p1=z3,
        laser_l2p2=z3,
        laser_i_idx=-jnp.ones(1, jnp.int32),
        laser_j_idx=jnp.ones(1, jnp.int32),
        laser_ref_p=z3,
        laser_ref_q=z3,
        laser_valid=jnp.zeros(1, bool),
        ground_weight=jnp.asarray(jnp.sqrt(2.0), dtype),
        frame_valid=jnp.ones(2, bool),
        prior_J=st.prior_J,
        prior_X=st.prior_X,
        prior_res=st.prior_res,
        prior_idx=jnp.asarray(0, jnp.int32),
        prior_valid=st.prior_valid & jnp.asarray(not scfg.fast_mode),
    )


def camera_sub_step(
    state: pl.TrackState,
    cam: CamTrackState,
    inp,  # pl.FrameInput (full laser interval)
    cam_img,
    cam_t_us,  # () int32, relative to the previous frame stamp
    consts: fac.SolveConsts,
    dcfg: pl.DynCfg,
    scfg: pl.StaticCfg,
    ccfg: CamStaticCfg,
    cdyn: CamDynCfg,
):
    """Process the interval's accepted camera frame; returns the updated
    (state, cam) positioned AT the camera stamp plus the FrameInput
    remainder for the laser part of the interval."""
    dtype = state.win.p.dtype
    cur_p, cur_q = state.win.p[-1], state.win.q[-1]
    cur_v, cur_bs = state.win.v[-1], state.win.bs[-1]

    # --- preintegrate [prev, camera] ------------------------------------
    m1_imu = inp.imu_mask & (inp.imu_t_us <= cam_t_us)
    from liwslam.ops.preint_parallel import imu_interval_parallel

    imu_c = imu_interval_parallel(
        state.imu, inp.imu_acc, inp.imu_gyro, inp.imu_t_us, m1_imu, cam_t_us, dcfg.imu_Q
    )
    imu_res = pre.imu_result(imu_c)
    m1_wh = inp.wheel_mask & (inp.wheel_t_us <= cam_t_us)
    wheel_c = pre.wheel_add_samples(state.wheel, inp.wheel_pose, inp.wheel_t_us, m1_wh)
    wheel_c = pre.wheel_update_only_t(wheel_c, cam_t_us)
    wheel_res = pre.wheel_result(wheel_c, dcfg.wheel_sigma)

    ang = imu_res.X[6:9] / jnp.maximum(imu_res.Dt, 1e-6)

    # --- dead reckoning to the camera stamp (update_current_status) ------
    Tiw = consts.T_imu_to_wheel
    delta_imu = geo.tf_compose(geo.tf_compose(Tiw, wheel_res.delta_T), geo.tf_inv(Tiw))
    pred_T = geo.tf_compose(geo.make_tf(cur_p, cur_q), delta_imu)
    pred_p, pred_q = geo.log_SE3(pred_T)

    # --- feature tracking + observation recording ------------------------
    cam = observe(cam, cam_img, ccfg, cdyn)
    cam = record(cam, pred_p, pred_q, cdyn)
    cam = cam._replace(
        fw=ft.triangulate_ready(
            cam.fw,
            cam.ring_p,
            cam.ring_q,
            cdyn.T_imu_to_camera,
            min_obs=ccfg.min_obs,
            min_parallax=cdyn.min_parallax,
        )
    )

    # --- joint [prev frozen, cam free] + landmarks solve -----------------
    F = cam.fw.ids.shape[0]
    win = fac.WindowState(
        p=jnp.stack([cur_p, pred_p]),
        q=jnp.stack([cur_q, pred_q]),
        v=jnp.stack([cur_v, cur_v]),
        bs=jnp.stack([cur_bs, cur_bs]),
    )
    data = _cam_factor_data(state, imu_res, wheel_res, scfg, dtype)
    fw = cam.fw
    n_obs = jnp.sum(fw.obs_mask.astype(jnp.int32), axis=1)

    free30 = jnp.zeros(30, dtype)
    free30 = free30.at[15:30].set(1.0)
    free30 = free30.at[6:9].set(1.0)
    if not scfg.fast_mode:
        free30 = free30.at[9:15].set(1.0)
    lm_free = fw.ready & (n_obs >= 2)
    lm_cfg = gn.LMConfig(
        max_iters=ccfg.solver_max_iterations, method="chol"
    )
    res30 = lambda x: fac.stack_residuals(
        fac.WindowState.from_flat(x, 2), data, consts
    )

    solver = ccfg.solver
    if solver == "auto":
        # the one-kernel pallas solve wins on TPU (kernel-count collapse);
        # XLA landmark-Schur elsewhere (interpret mode is far slower than
        # the native XLA path for CPU tests)
        solver = "pallas" if jax.default_backend() == "tpu" else "schur"
    kernel_prior = None
    if solver == "pallas":
        # ONE kernel: landmark-Schur LM + the base-only marginalization
        # Schur reduction (ops/cam_solve) — the gn.marginalize pass below
        # is subsumed by the kernel's dH/dg outputs
        from liwslam.ops import cam_solve

        use = fw.obs_mask & fw.ready[:, None] & cam.ring_valid[None, :]
        frozen = (0, 1, 2, 3, 4, 5)
        if scfg.fast_mode:
            frozen = frozen + (9, 10, 11, 12, 13, 14)
        x30_opt, world_opt, cost, k_dH, k_dg = cam_solve.lm_solve_cam(
            win.flat(),
            free30,
            fw.world,
            lm_free,
            fw.obs,
            use,
            cam.ring_p,
            cam.ring_q,
            data,
            consts,
            cdyn.T_imu_to_camera,
            cdyn.sqrt_info,
            max_iters=ccfg.solver_max_iterations,
            interpret=jax.default_backend() != "tpu",
            frozen_dims=frozen,
        )
        kernel_prior = (k_dH, k_dg)
    elif solver == "schur":
        # landmark-Schur LM (solve/cam_schur.py): 30-tangent base + 9-
        # tangent reprojection rows, 30-dim reduced system, batched 3x3
        # landmark back-substitution — the reference's SPARSE_SCHUR
        # structure, parity-tested against the dense path
        from liwslam.solve import cam_schur

        use = fw.obs_mask & fw.ready[:, None] & cam.ring_valid[None, :]
        x30_opt, world_opt, cost = cam_schur.lm_solve_cam_schur(
            res30,
            win.flat(),
            free30,
            fw.world,
            lm_free,
            fw.obs,
            use,
            cam.ring_p,
            cam.ring_q,
            cdyn.T_imu_to_camera,
            cdyn.sqrt_info,
            lm_cfg,
            wrap30=lambda x: pl._wrap_q(x, 2, dtype),
        )
    else:

        def res_fn(x):
            st2 = fac.WindowState.from_flat(x[:30], 2)
            world = x[30:].reshape(F, 3)
            base = fac.stack_residuals(st2, data, consts)
            rows = camera_rows(
                fw, world, cam.ring_p, cam.ring_q, cam.ring_valid,
                st2.p[1], st2.q[1], cdyn,
            )
            return jnp.concatenate([base, rows.reshape(-1)])

        free = jnp.concatenate(
            [free30, jnp.repeat(lm_free.astype(dtype), 3)]
        )
        x0 = jnp.concatenate([win.flat(), fw.world.reshape(-1)])

        def wrap(x):
            return x.at[:30].set(pl._wrap_q(x[:30], 2, dtype))

        x_opt, cost, _ = gn.lm_solve(res_fn, x0, free, lm_cfg, wrap_fn=wrap)
        x30_opt = x_opt[:30]
        world_opt = x_opt[30:].reshape(F, 3)

    win = fac.WindowState.from_flat(x30_opt, 2)
    cam = cam._replace(fw=fw._replace(world=world_opt))

    # --- prior: marginalize the previous frame (keep the camera frame) ---
    if scfg.fast_mode:
        prior_J, prior_X, prior_res, prior_valid = (
            state.prior_J,
            state.prior_X,
            state.prior_res,
            jnp.asarray(False),
        )
    elif kernel_prior is not None:
        # fused path: the kernel already produced the Schur-reduced
        # (dH, dg) at the solution; only the eigendecomposition remains
        prior_J, prior_res = gn.sqrt_prior(*kernel_prior)
        prior_X = x30_opt[15:]
        prior_valid = jnp.asarray(True)
    else:
        prior_J, prior_res, prior_X = gn.marginalize(res30, x30_opt, keep=15)
        prior_valid = jnp.asarray(True)

    new_p, new_q = win.p[-1], win.q[-1]
    cam = filter_outliers(cam, new_p, new_q, cdyn)
    # overwrite the newest ring slot with the SOLVED camera pose
    Wc = cam.ring_p.shape[0]
    cam = cam._replace(
        ring_p=cam.ring_p.at[Wc - 1].set(new_p),
        ring_q=cam.ring_q.at[Wc - 1].set(new_q),
    )

    # --- continuation carries for the laser remainder --------------------
    new_bs = win.bs[-1]
    imu_next = pre.imu_reset(0, new_bs[:3], new_bs[3:], dtype)._replace(
        last_acc=imu_c.last_acc,
        last_gyro=imu_c.last_gyro,
        last_t_us=imu_c.last_t_us - cam_t_us,
        has_sample=imu_c.has_sample,
    )
    wheel_next = pre.wheel_rebase(pre.wheel_reset(wheel_c, dtype), cam_t_us)

    state2 = state._replace(
        win=win,
        imu=imu_next._replace(X=imu_next.X.at[9:15].set(new_bs)),
        wheel=wheel_next,
        prior_J=prior_J,
        prior_X=prior_X,
        prior_res=prior_res,
        prior_valid=prior_valid,
        angular_local=ang,
    )
    inp_rest = inp._replace(
        dt_us=inp.dt_us - cam_t_us,
        imu_t_us=inp.imu_t_us - cam_t_us,
        imu_mask=inp.imu_mask & (inp.imu_t_us > cam_t_us),
        wheel_t_us=inp.wheel_t_us - cam_t_us,
        wheel_mask=inp.wheel_mask & (inp.wheel_t_us > cam_t_us),
    )
    n_tracked = jnp.sum((cam.fw.obs_mask[:, -1]).astype(jnp.int32))
    cam_out = CamFrameOutput(
        p=new_p,
        q=new_q,
        valid=jnp.asarray(True),
        n_tracked=n_tracked,
        n_ready=jnp.sum(cam.fw.ready.astype(jnp.int32)),
        solve_cost=cost,
    )
    return state2, cam, inp_rest, cam_out


class FrameInputCam(NamedTuple):
    """FrameInput plus the interval's camera messages.

    ``cam_img`` is the ACCEPTED frame (first message after the previous
    laser frame — it becomes a window frame, trajectory.cpp:301);
    ``cam_extra_imgs`` are the interval's later messages, which the
    reference still LK-tracks through ``camera_manger_.add_frame``
    (trajectory.cpp:279-310) without recording observations — keeping LK
    baselines at one camera period.  NE is sized per stream by the
    packer (0 when the camera rate matches the laser rate)."""

    base: pl.FrameInput
    cam_img: jnp.ndarray  # (H,W) f32
    cam_t_us: jnp.ndarray  # () int32 relative to previous frame stamp
    cam_valid: jnp.ndarray  # () bool
    cam_extra_imgs: jnp.ndarray  # (NE,H,W) f32 (NE may be 0)
    cam_extra_mask: jnp.ndarray  # (NE,) bool


class CamFrameOutput(NamedTuple):
    p: jnp.ndarray  # (3,) camera-frame-time IMU pose
    q: jnp.ndarray
    valid: jnp.ndarray  # ()
    n_tracked: jnp.ndarray  # () int32
    n_ready: jnp.ndarray  # () int32
    solve_cost: jnp.ndarray  # ()


def tracking_step_cam(
    state: pl.TrackState,
    cam: CamTrackState,
    inp: FrameInputCam,
    consts: fac.SolveConsts,
    dcfg: pl.DynCfg,
    scfg: pl.StaticCfg,
    ccfg: CamStaticCfg,
    cdyn: CamDynCfg,
):
    """One laser frame with the optional camera sub-step.  Pure; scan-able."""

    def with_cam(args):
        state, cam = args
        return camera_sub_step(
            state, cam, inp.base, inp.cam_img, inp.cam_t_us,
            consts, dcfg, scfg, ccfg, cdyn,
        )

    def without_cam(args):
        state, cam = args
        dtype = state.win.p.dtype
        out = CamFrameOutput(
            p=jnp.zeros(3, dtype),
            q=jnp.zeros(3, dtype),
            valid=jnp.asarray(False),
            n_tracked=jnp.asarray(0, jnp.int32),
            n_ready=jnp.sum(cam.fw.ready.astype(jnp.int32)),
            solve_cost=jnp.zeros((), dtype),
        )
        return state, cam, inp.base, out

    state2, cam2, inp_rest, cam_out = jax.lax.cond(
        inp.cam_valid, with_cam, without_cam, (state, cam)
    )

    # full-camera-rate LK: the interval's LATER camera messages keep the
    # track chain advancing at one-camera-period baselines (the
    # reference runs add_frame on every message before any accept gate,
    # trajectory.cpp:279-310); observations are NOT recorded for them.
    if inp.cam_extra_imgs.shape[0] > 0:

        def obs_extra(cm, im):
            img, m = im
            cm2 = observe(cm, img, ccfg, cdyn, replenish=False)
            cm2 = jax.tree_util.tree_map(
                lambda a, b: jnp.where(m, a, b), cm2, cm
            )
            return cm2, None

        cam2, _ = jax.lax.scan(
            obs_extra, cam2, (inp.cam_extra_imgs, inp.cam_extra_mask)
        )

    new_state, out = pl.tracking_step(state2, inp_rest, consts, dcfg, scfg)
    return (new_state, cam2), (out, cam_out)


def run_chunk_cam(state, cam, inputs: FrameInputCam, consts, dcfg, scfg, ccfg, cdyn):
    """lax.scan over a packed chunk of camera-annotated frames."""

    def body(carry, inp):
        st, cm = carry
        return tracking_step_cam(st, cm, inp, consts, dcfg, scfg, ccfg, cdyn)

    return jax.lax.scan(body, (state, cam), inputs)
