"""Per-landmark feature window bookkeeping (the reference's feature_manger).

Capability parity with ``feature_info`` / ``feature_manger``
(``src/trajectory/camera_manager.{h,cpp}:100-311``, ``camera_type.h``):

- per-landmark observation history across the sliding window with
  track ids (``feature_info::feature_point_infos``),
- multi-view SVD triangulation init once a landmark has >= ``min_obs``
  parallax-gated observations (``camera_manager.cpp:179-190``; gating at
  ``push_frame``, ``camera_manager.cpp:140-164``),
- window shift ``pop_frame`` dropping the oldest frame's observations
  (``camera_manager.cpp:166-178``),
- outlier removal by mean reprojection error, the camera half of
  ``trajectory::filter_outlier_world_point`` (``trajectory.cpp:689-730``),
- the residual stack rows for the sliding-window solve
  (``solver.cpp:669-698`` adds camera factors for the latest frame's
  features; ``init_solve`` adds all frames').

TPU-native redesign: the reference's ``std::map<id, feature_info>`` of
observation deques becomes a fixed-capacity struct-of-arrays — landmarks
are slots, observations a dense (F, W, 2) array with a mask — so every
operation below is a pure, jittable array program (scatter/gather +
vmapped triangulation), and the joint pose+landmark refinement reuses the
same masked LM as the laser path.

The camera capability is dormant by default exactly like the reference
(``enable_camera: false`` in every shipped config, ``config/params.yaml:6``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from liwslam.core import geometry as geo
from liwslam.solve import factors as fac
from liwslam.solve import gn

_EPS = 1e-9


class FeatureWindow(NamedTuple):
    """Fixed-capacity landmark table over a W-frame sliding window."""

    ids: jnp.ndarray  # (F,) int32 track id, -1 = empty slot
    obs: jnp.ndarray  # (F,W,2) normalized camera-plane observations
    obs_mask: jnp.ndarray  # (F,W) bool
    world: jnp.ndarray  # (F,3) triangulated world point
    ready: jnp.ndarray  # (F,) bool — world point initialized
    next_id: jnp.ndarray  # () int32 — allocator for new tracks


def empty_window(F: int, W: int, dtype=jnp.float32) -> FeatureWindow:
    return FeatureWindow(
        ids=-jnp.ones(F, jnp.int32),
        obs=jnp.zeros((F, W, 2), dtype),
        obs_mask=jnp.zeros((F, W), bool),
        world=jnp.zeros((F, 3), dtype),
        ready=jnp.zeros(F, bool),
        next_id=jnp.zeros((), jnp.int32),
    )


def push_frame(fw: FeatureWindow, tr_ids, tr_xy, tr_valid) -> FeatureWindow:
    """Record one frame's tracked features in window slot W-1.

    ``tr_ids`` (T,) int32: ids of tracked features (-1 or invalid mask for
    lost ones); fresh detections use id -2 and are allocated new ids.
    Call :func:`shift` first when the window advances.
    """
    F = fw.ids.shape[0]
    W = fw.obs.shape[1]

    # --- existing tracks: match tr_ids to slots -------------------------
    eqm = (tr_ids[:, None] == fw.ids[None, :]) & tr_valid[:, None] & (
        tr_ids[:, None] >= 0
    )  # (T,F)
    slot_of = jnp.argmax(eqm, axis=1)  # (T,)
    has_slot = jnp.any(eqm, axis=1)
    widx = jnp.where(has_slot, slot_of, F + 1)
    obs = fw.obs.at[widx, W - 1].set(tr_xy, mode="drop")
    obs_mask = fw.obs_mask.at[widx, W - 1].set(has_slot, mode="drop")

    # --- fresh detections: allocate free slots in order ------------------
    fresh = tr_valid & (tr_ids == -2)
    free = fw.ids < 0
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank among free slots
    slot_by_rank = jnp.full((F,), F + 1, jnp.int32).at[
        jnp.where(free, free_rank, F + 1)
    ].set(jnp.arange(F, dtype=jnp.int32), mode="drop")
    fresh_rank = jnp.cumsum(fresh.astype(jnp.int32)) - 1  # (T,)
    dest = jnp.where(
        fresh & (fresh_rank < jnp.sum(free.astype(jnp.int32))),
        slot_by_rank[jnp.clip(fresh_rank, 0, F - 1)],
        F + 1,
    )
    new_ids = fw.next_id + fresh_rank.astype(jnp.int32)
    ids = fw.ids.at[dest].set(new_ids, mode="drop")
    obs = obs.at[dest, W - 1].set(tr_xy, mode="drop")
    obs_mask = obs_mask.at[dest, W - 1].set(fresh, mode="drop")
    n_new = jnp.sum(fresh.astype(jnp.int32))

    return fw._replace(
        ids=ids, obs=obs, obs_mask=obs_mask, next_id=fw.next_id + n_new
    )


def assigned_ids(fw: FeatureWindow, tr_ids, tr_valid):
    """The ids under which :func:`push_frame` stored this frame's features
    (fresh detections receive newly allocated ids)."""
    fresh = tr_valid & (tr_ids == -2)
    fresh_rank = jnp.cumsum(fresh.astype(jnp.int32)) - 1
    return jnp.where(fresh, fw.next_id + fresh_rank, tr_ids)


def shift(fw: FeatureWindow) -> FeatureWindow:
    """Advance the window by one frame (new frame enters at slot W-1)."""
    obs = jnp.concatenate([fw.obs[:, 1:], jnp.zeros_like(fw.obs[:, :1])], 1)
    obs_mask = jnp.concatenate(
        [fw.obs_mask[:, 1:], jnp.zeros_like(fw.obs_mask[:, :1])], 1
    )
    return fw._replace(obs=obs, obs_mask=obs_mask)


def pop_oldest(fw: FeatureWindow) -> FeatureWindow:
    """feature_manger::pop_frame (camera_manager.cpp:166-178): drop the
    oldest frame's observations; slots left without observations are freed."""
    fw = shift(fw)
    alive = jnp.any(fw.obs_mask, axis=1)
    return fw._replace(
        ids=jnp.where(alive, fw.ids, -1),
        ready=fw.ready & alive,
    )


def _cam_poses(win_p, win_q, T_imu_to_cam):
    return jax.vmap(lambda p, q: geo.make_tf(p, q) @ T_imu_to_cam)(win_p, win_q)


def parallax(fw: FeatureWindow) -> jnp.ndarray:
    """(F,) max pairwise image-plane displacement between observations —
    the triangulation gate (camera_manager.cpp:155-163 gates on feature
    movement before counting an observation)."""
    d = jnp.linalg.norm(
        fw.obs[:, :, None, :] - fw.obs[:, None, :, :], axis=-1
    )  # (F,W,W)
    pm = fw.obs_mask[:, :, None] & fw.obs_mask[:, None, :]
    return jnp.max(jnp.where(pm, d, 0.0), axis=(1, 2))


def triangulate_ready(
    fw: FeatureWindow,
    win_p,
    win_q,
    T_imu_to_cam,
    *,
    min_obs: int = 5,
    min_parallax: float = 0.02,
) -> FeatureWindow:
    """Initialize world points of landmarks with enough parallax-gated
    observations (multi-view SVD, camera_manager.cpp:179-190 /
    e_cv::triangulate_points_SVD common.cpp:124-154)."""
    from liwslam.camera.triangulation import triangulate_svd

    T_w_c = _cam_poses(win_p, win_q, T_imu_to_cam)  # (W,4,4)

    def tri(obs, mask):
        cam_pts = jnp.concatenate([obs, jnp.ones_like(obs[:, :1])], -1)
        wp, _ = triangulate_svd(cam_pts, T_w_c, mask)
        return wp

    pts = jax.vmap(tri)(fw.obs, fw.obs_mask)  # (F,3)
    n_obs = jnp.sum(fw.obs_mask.astype(jnp.int32), axis=1)
    init = (
        (fw.ids >= 0)
        & ~fw.ready
        & (n_obs >= min_obs)
        & (parallax(fw) >= min_parallax)
    )
    return fw._replace(
        world=jnp.where(init[:, None], pts, fw.world),
        ready=fw.ready | init,
    )


def reproj_error(fw: FeatureWindow, win_p, win_q, T_imu_to_cam):
    """(F,) mean normalized-plane reprojection error over observations of
    ready landmarks (trajectory::filter_outlier_world_point semantics)."""
    T_w_c = _cam_poses(win_p, win_q, T_imu_to_cam)
    T_c_w = jax.vmap(geo.tf_inv)(T_w_c)

    def per_lm(world, obs, mask):
        cam = jax.vmap(lambda T: geo.tf_apply(T, world))(T_c_w)  # (W,3)
        z = jnp.where(jnp.abs(cam[:, 2]) < _EPS, _EPS, cam[:, 2])
        proj = cam[:, :2] / z[:, None]
        err = jnp.linalg.norm(proj - obs, axis=-1)
        behind = cam[:, 2] <= 0.0
        err = jnp.where(behind, 1e3, err)  # points behind a camera: outlier
        n = jnp.maximum(jnp.sum(mask.astype(world.dtype)), 1.0)
        return jnp.sum(jnp.where(mask, err, 0.0)) / n

    return jax.vmap(per_lm)(fw.world, fw.obs, fw.obs_mask)


def filter_outliers(
    fw: FeatureWindow, win_p, win_q, T_imu_to_cam, *, max_err: float
) -> FeatureWindow:
    """Drop ready landmarks whose mean reprojection error exceeds the
    (fx-normalized) threshold (trajectory.cpp:689-730; threshold derivation
    params.cpp:176-190)."""
    err = reproj_error(fw, win_p, win_q, T_imu_to_cam)
    bad = fw.ready & (err > max_err)
    return fw._replace(
        ids=jnp.where(bad, -1, fw.ids),
        ready=fw.ready & ~bad,
        obs_mask=fw.obs_mask & ~bad[:, None],
    )


def camera_residual_rows(
    fw: FeatureWindow,
    win: fac.WindowState,
    T_imu_to_cam,
    sqrt_info,
    *,
    latest_only: bool = False,
):
    """(F*W, 2) whitened reprojection residual rows for the window solve.

    ``latest_only`` reproduces the tracking-time problem (solver.cpp:669-698
    adds camera factors only for the latest frame's features); init_solve
    uses all observations."""
    F, W = fw.obs_mask.shape

    def one(f, w):
        r = fac.camera_residual(
            win.p[w], win.q[w], fw.world[f], fw.obs[f, w], T_imu_to_cam, sqrt_info
        )
        use = fw.obs_mask[f, w] & fw.ready[f]
        if latest_only:
            use = use & (w == W - 1)
        return r * use.astype(r.dtype)

    ff, ww = jnp.meshgrid(jnp.arange(F), jnp.arange(W), indexing="ij")
    return jax.vmap(jax.vmap(one))(ff, ww).reshape(F * W, 2)


def refine_window(
    fw: FeatureWindow,
    win: fac.WindowState,
    T_imu_to_cam,
    sqrt_info,
    *,
    free_frame_mask=None,
    max_iters: int = 10,
):
    """Joint pose+landmark bundle refinement (the camera rows of
    ``init_solve``/``estimate_features``, solver.cpp:50-169): masked LM over
    the flat state [frames | world points].  Landmark columns of non-ready
    slots are frozen; frame freezing follows ``free_frame_mask``."""
    Wn = win.p.shape[0]
    F = fw.ids.shape[0]
    dtype = win.p.dtype
    x0 = jnp.concatenate([win.flat(), fw.world.reshape(-1)])

    def res_fn(x):
        st = fac.WindowState.from_flat(x[: Wn * 15], Wn)
        world = x[Wn * 15 :].reshape(F, 3)
        return camera_residual_rows(
            fw._replace(world=world), st, T_imu_to_cam, sqrt_info
        ).reshape(-1)

    free_frames = (
        jnp.ones((Wn, 15), dtype)
        if free_frame_mask is None
        else jnp.asarray(free_frame_mask, dtype).reshape(Wn, 15)
    )
    free_lms = jnp.tile(fw.ready[:, None].astype(dtype), (1, 3))
    free = jnp.concatenate([free_frames.reshape(-1), free_lms.reshape(-1)])
    x_opt, cost, iters = gn.lm_solve(
        res_fn, x0, free, gn.LMConfig(max_iters=max_iters)
    )
    win_out = fac.WindowState.from_flat(x_opt[: Wn * 15], Wn)
    fw_out = fw._replace(world=x_opt[Wn * 15 :].reshape(F, 3))
    return fw_out, win_out, cost
