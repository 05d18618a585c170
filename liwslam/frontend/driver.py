"""Host orchestration: stream packing, initialization, chunked tracking.

Reference counterparts:

- dispatch_queue (``src/trajectory/dispatch.h:192-241``): strict global
  time ordering of sensor messages.  For offline streams the total order is
  a pure function of timestamps, so the host pre-merges every IMU/wheel
  sample into the laser frame interval it precedes (same result as the
  reference's run-time merge, but vectorizable and replayable).
- ``trajectory::check_and_processing_initialize``
  (``trajectory.cpp:381-487``): the 10-frame bootstrap window with its
  ≥2-matched-lines gate and full reset on failure — host control flow
  driving jitted device pieces.
- the TRACKING loop: packed chunks of frames run as one
  ``lax.scan`` program on device (liwslam.frontend.pipeline.run_chunk).

Known deviation: after initialization the reference seeds
``last_keyframe_tf`` with the IMU-frame pose (trajectory.cpp:484) although
keyframe deltas are measured between LASER-frame poses; we use the laser
pose consistently (affects only the timing of the first keyframe).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from liwslam.core import geometry as geo
from liwslam.frontend import camera_pipeline as cpl
from liwslam.frontend import matching as mm
from liwslam.frontend import pipeline as pl
from liwslam.frontend import preintegration as pre
from liwslam.frontend import scan as scan_mod
from liwslam.solve import factors as fac
from liwslam.solve import gn


@dataclass
class FrontendResult:
    """Per-frame front-end outputs (the TUM 'fornt_end.txt' equivalent)."""

    t_us: np.ndarray  # (F,)
    p: np.ndarray  # (F,3) IMU-frame world position
    q: np.ndarray  # (F,3)
    v: np.ndarray  # (F,3)
    bs: np.ndarray  # (F,6)
    is_keyframe: np.ndarray  # (F,)
    n_match: np.ndarray  # (F,)
    n_lines: np.ndarray  # (F,)
    kf_corners: list  # per keyframe: (k,3) world-frame corner arrays
    kf_indices: np.ndarray  # frame indices of keyframes
    kf_scans: list  # per keyframe: (p1, p2) line arrays (laser frame)
    # camera sub-frames (enable_camera only; empty otherwise)
    cam_t_us: np.ndarray = None  # (C,) accepted camera frame stamps
    cam_p: np.ndarray = None  # (C,3) camera-frame-time IMU poses
    cam_q: np.ndarray = None  # (C,3)
    cam_n_tracked: np.ndarray = None  # (C,)
    cam_n_ready: np.ndarray = None  # (C,)

    def T_w_imu(self):
        return np.asarray(geo.make_tf(jnp.asarray(self.p), jnp.asarray(self.q)))

    def tum_poses(self, T_imu_to_wheel):
        """Wheel/base-frame TUM poses (trajectory.cpp:549-559)."""
        return self.T_w_imu() @ np.asarray(T_imu_to_wheel)


def _pad(a, n, fill=0):
    a = np.asarray(a)
    out = np.full((n,) + a.shape[1:], fill, a.dtype)
    k = min(len(a), n)
    out[:k] = a[:k]
    return out, k


def clean_scan(points, valid, min_range=0.1, min_spacing=0.01):
    """convert::laser_to_point_times filters (common.cpp:4-40): drop
    NaN/inf/short returns and points closer than 1 cm to their predecessor."""
    pts = np.asarray(points, np.float32)
    ok = np.asarray(valid, bool) & np.isfinite(pts).all(-1)
    ok &= np.linalg.norm(pts[:, :2], axis=-1) >= min_range
    # spacing filter against the previous *kept* point — vector approx:
    # against the previous raw point (differs only on runs of near-dups)
    d = np.linalg.norm(np.diff(pts[:, :2], axis=0), axis=-1)
    ok[1:] &= (d >= min_spacing) | ~ok[:-1]
    return pts, ok


class Frontend:
    """Streaming front end: feed sensor streams, get trajectory out."""

    def __init__(self, params, dtype=jnp.float32):
        self.params = params
        self.dtype = dtype
        self.consts = fac.make_consts(params, dtype)
        self.scfg = pl.make_static_cfg(params)
        self.dcfg = pl.make_dyn_cfg(params, dtype)
        if params.enable_camera:
            self.ccfg = cpl.make_cam_static_cfg(params)
            self.cdyn = cpl.make_cam_dyn_cfg(params, dtype)
        self._compiled = {}
        # camera rows solved inside the init window (filled by
        # _finish_init when enable_camera; reported by run())
        self._init_cam_rows = []
        from liwslam.utils.record import Record

        # per-stage timing stats (reference `record`, record.h:19-93;
        # the trajectory's recorder instruments spawn_scan/match/solve —
        # those stages are fused on-device here, so we record at the
        # host-visible granularity: packing, init, per-chunk device time)
        self.recorder = Record("frontend")

    # -- jitted pieces ------------------------------------------------------

    def _step_fn(self):
        if "step" not in self._compiled:
            consts, dcfg, scfg = self.consts, self.dcfg, self.scfg

            @jax.jit
            def step(state, inp):
                return pl.tracking_step(state, inp, consts, dcfg, scfg)

            self._compiled["step"] = step
        return self._compiled["step"]

    def _chunk_fn(self):
        if "chunk" not in self._compiled:
            consts, dcfg, scfg = self.consts, self.dcfg, self.scfg

            @jax.jit
            def chunk(state, inputs):
                return pl.run_chunk(state, inputs, consts, dcfg, scfg)

            self._compiled["chunk"] = chunk
        return self._compiled["chunk"]

    def _cam_chunk_fn(self):
        if "cam_chunk" not in self._compiled:
            consts, dcfg, scfg = self.consts, self.dcfg, self.scfg
            ccfg, cdyn = self.ccfg, self.cdyn

            @jax.jit
            def chunk(state, cam, inputs):
                return cpl.run_chunk_cam(
                    state, cam, inputs, consts, dcfg, scfg, ccfg, cdyn
                )

            self._compiled["cam_chunk"] = chunk
        return self._compiled["cam_chunk"]

    def _cam_observe_fn(self):
        """Jitted feature tracking only (init-time camera chain)."""
        if "cam_observe" not in self._compiled:
            ccfg, cdyn = self.ccfg, self.cdyn

            @jax.jit
            def obs(cam, img):
                return cpl.observe(cam, img, ccfg, cdyn)

            self._compiled["cam_observe"] = obs
        return self._compiled["cam_observe"]

    def _cam_observe_lk_fn(self):
        """LK-only observe (no replenish) for non-accepted messages."""
        if "cam_observe_lk" not in self._compiled:
            ccfg, cdyn = self.ccfg, self.cdyn

            @jax.jit
            def obs(cam, img):
                return cpl.observe(cam, img, ccfg, cdyn, replenish=False)

            self._compiled["cam_observe_lk"] = obs
        return self._compiled["cam_observe_lk"]

    def _cam_record_fn(self):
        if "cam_record" not in self._compiled:
            cdyn = self.cdyn

            @jax.jit
            def rec(cam, p, q):
                return cpl.record(cam, p, q, cdyn)

            self._compiled["cam_record"] = rec
        return self._compiled["cam_record"]

    def _extract_fn(self):
        if "extract" not in self._compiled:
            dcfg, scfg = self.dcfg, self.scfg

            @jax.jit
            def extract(pts, valid):
                if scan_mod.resolve_extract_impl(scfg.extract_impl) == "pallas":
                    return scan_mod.extract_features_pallas(
                        pts,
                        valid,
                        continuous_threshold=dcfg.line_continuous_threshold,
                        min_len=dcfg.line_min_len,
                        max_dis=dcfg.line_max_dis,
                        tolerance_angle_rad=dcfg.tolerance_angle_rad,
                        resolution=dcfg.resolution,
                        max_lines=scfg.max_lines,
                        max_corners=scfg.max_corners,
                        interpret=jax.default_backend() != "tpu",
                    )
                return scan_mod.extract_features(
                    pts,
                    valid,
                    continuous_threshold=dcfg.line_continuous_threshold,
                    min_len=dcfg.line_min_len,
                    max_dis=dcfg.line_max_dis,
                    tolerance_angle_rad=dcfg.tolerance_angle_rad,
                    resolution=dcfg.resolution,
                    max_lines=scfg.max_lines,
                    max_corners=scfg.max_corners,
                    fast_prefix=scfg.fast_prefix,
                )

            self._compiled["extract"] = extract
        return self._compiled["extract"]

    def _preint_fn(self):
        """Preintegrate one inter-frame interval and produce results."""
        if "preint" not in self._compiled:
            dcfg = self.dcfg

            @jax.jit
            def preint(imu_c, wheel_c, inp: pl.FrameInput, new_ba, new_bw):
                imu_c = pre.imu_add_samples(
                    imu_c, inp.imu_acc, inp.imu_gyro, inp.imu_t_us, inp.imu_mask, dcfg.imu_Q
                )
                imu_c = pre.imu_update_only_t(imu_c, inp.dt_us, dcfg.imu_Q)
                imu_res = pre.imu_result(imu_c)
                wheel_c = pre.wheel_add_samples(
                    wheel_c, inp.wheel_pose, inp.wheel_t_us, inp.wheel_mask
                )
                wheel_c = pre.wheel_update_only_t(wheel_c, inp.dt_us)
                wheel_res = pre.wheel_result(wheel_c, dcfg.wheel_sigma)
                # two continuations: 'keep' (frame skipped — integrals keep
                # accumulating, reference never resets on skipped frames)
                # and 'next' (frame accepted — integrals reset)
                imu_keep = pre.imu_rebase(imu_c, inp.dt_us)
                wheel_keep = pre.wheel_rebase(wheel_c, inp.dt_us)
                imu_next = pre.imu_reset(0, new_ba, new_bw)._replace(
                    last_acc=imu_c.last_acc,
                    last_gyro=imu_c.last_gyro,
                    last_t_us=imu_c.last_t_us - inp.dt_us,
                    has_sample=imu_c.has_sample,
                )
                wheel_next = pre.wheel_rebase(
                    pre.wheel_reset(wheel_c), inp.dt_us
                )
                return (imu_keep, wheel_keep), (imu_next, wheel_next), imu_res, wheel_res

            self._compiled["preint"] = preint
        return self._compiled["preint"]

    def _match_fn(self):
        if "match" not in self._compiled:
            consts, dcfg = self.consts, self.dcfg

            @jax.jit
            def match(sub, feats, p, q):
                return mm.match_lines(
                    sub, feats, p, q, consts.T_imu_to_laser, resolution=dcfg.resolution
                )

            self._compiled["match"] = match
        return self._compiled["match"]

    # -- stream packing ------------------------------------------------------

    def pack_frames(self, streams, frame_sel=None):
        """Slice IMU/wheel streams into per-laser-frame FrameInputs (numpy).

        Returns a list of FrameInput (numpy leaves) for laser frames
        [1..F-1] relative to their predecessors, plus frame timestamps."""
        prm = self.params
        # reproduce the dispatch layer's per-sensor monotonicity filtering
        # and strict global time order (dispatch.h:110-241) before slicing
        from liwslam.io import dispatch as dp

        use_cam = prm.enable_camera
        sensor_times = [
            np.asarray(streams.imu_t_us) * 1e-6,
            np.asarray(streams.wheel_t_us) * 1e-6,
            np.asarray(streams.laser_t_us) * 1e-6,
        ]
        if use_cam:
            cam_ts_all = np.asarray(getattr(streams, "cam_t_us", np.zeros(0, np.int64)))
            if len(cam_ts_all) == 0:
                raise ValueError("enable_camera=True but the stream has no camera data")
            sensor_times.append(cam_ts_all * 1e-6)
        order_s, order_i = dp.merge(sensor_times, watermark=1, drain=True)
        imu_keep = np.sort(order_i[order_s == 0])
        wheel_keep = np.sort(order_i[order_s == 1])
        laser_keep = np.sort(order_i[order_s == 2])
        cam_keep = np.sort(order_i[order_s == 3]) if use_cam else np.zeros(0, np.int64)

        lt = np.asarray(streams.laser_t_us)[laser_keep]
        laser_orig = laser_keep
        if frame_sel is not None:
            lt = lt[frame_sel]
            laser_orig = laser_keep[frame_sel]
        # FPS frame gate (trajectory.cpp:170, min_delta_t = 1/FPS derived at
        # params.cpp:188): skip laser frames closer than min_delta_t to the
        # last ACCEPTED frame.  IMU/wheel samples of skipped frames fall into
        # the next accepted frame's interval (the reference likewise keeps
        # integrating across skipped frames).  Dataset presets use FPS=1000,
        # which passes everything, exactly like the reference configs.
        min_dt_us = int(round(prm.min_delta_t * 1e6))
        if len(lt) > 1 and min_dt_us > 1:
            keep = [0]
            for idx in range(1, len(lt)):
                if int(lt[idx]) - int(lt[keep[-1]]) >= min_dt_us:
                    keep.append(idx)
            keep = np.asarray(keep)
            lt = lt[keep]
            laser_orig = laser_orig[keep]
        F = len(lt)
        it = np.asarray(streams.imu_t_us)[imu_keep]
        wt = np.asarray(streams.wheel_t_us)[wheel_keep]
        imu_acc_f = np.asarray(streams.imu_acc)[imu_keep]
        imu_gyro_f = np.asarray(streams.imu_gyro)[imu_keep]
        wheel_pose_f = np.asarray(streams.wheel_pose)[wheel_keep]
        # static per-stream capacity for the interval's EXTRA camera
        # messages (beyond the accepted first): 0 when camera rate <=
        # laser rate, (rate ratio - 1) otherwise
        cam_extra_cap = 0
        if use_cam:
            ct_all = cam_ts_all[cam_keep]
            for k in range(F):
                ta = lt[k - 1] if k > 0 else 0
                n_in = int(np.count_nonzero((ct_all > ta) & (ct_all <= lt[k])))
                cam_extra_cap = max(cam_extra_cap, n_in - 1)
        frames = []
        for k in range(F):
            t0 = lt[k - 1] if k > 0 else 0
            t1 = lt[k]
            si = (it > t0) & (it <= t1)
            sw = (wt > t0) & (wt <= t1)
            acc, ni = _pad(imu_acc_f[si], prm.max_imu_per_frame)
            gyr, _ = _pad(imu_gyro_f[si], prm.max_imu_per_frame)
            its, _ = _pad((it[si] - t0).astype(np.int32), prm.max_imu_per_frame)
            im = np.arange(prm.max_imu_per_frame) < ni
            wp, nw = _pad(wheel_pose_f[sw], prm.max_wheel_per_frame)
            wp[nw:] = np.eye(4, dtype=np.float32)
            wts, _ = _pad((wt[sw] - t0).astype(np.int32), prm.max_wheel_per_frame)
            wm = np.arange(prm.max_wheel_per_frame) < nw
            ko = laser_orig[k]
            pts, ok = clean_scan(streams.laser_points[ko], streams.laser_valid[ko])
            pts, npts = _pad(pts, prm.max_points)
            okp, _ = _pad(ok, prm.max_points)
            rayt, _ = _pad(streams.laser_times_rel[ko], prm.max_points)
            base = pl.FrameInput(
                dt_us=np.int32(t1 - t0),
                imu_acc=acc,
                imu_gyro=gyr,
                imu_t_us=its,
                imu_mask=im,
                wheel_pose=wp,
                wheel_t_us=wts,
                wheel_mask=wm,
                points=pts,
                point_valid=okp,
                ray_t=rayt,
            )
            if use_cam:
                # the FIRST camera message after the previous laser frame
                # becomes the interval's camera frame (trajectory.cpp:301
                # rejects a camera frame when the window's newest frame is
                # already a camera frame); LATER messages are still packed
                # and LK-tracked at full camera rate (add_frame runs on
                # every message, trajectory.cpp:279-310)
                ct = cam_ts_all[cam_keep]
                sel = np.flatnonzero((ct > t0) & (ct <= t1))
                h_px, w_px = streams.cam_images.shape[1:3]
                NE = cam_extra_cap
                extra = np.zeros((NE, h_px, w_px), np.float32)
                emask = np.zeros(NE, bool)
                for j, s in enumerate(sel[1 : NE + 1]):
                    extra[j] = np.asarray(
                        streams.cam_images[cam_keep[s]], np.float32
                    )
                    emask[j] = True
                if len(sel):
                    ci = cam_keep[sel[0]]
                    base = cpl.FrameInputCam(
                        base=base,
                        cam_img=np.asarray(streams.cam_images[ci], np.float32),
                        cam_t_us=np.int32(int(cam_ts_all[ci]) - t0),
                        cam_valid=np.bool_(True),
                        cam_extra_imgs=extra,
                        cam_extra_mask=emask,
                    )
                else:
                    base = cpl.FrameInputCam(
                        base=base,
                        cam_img=np.zeros((h_px, w_px), np.float32),
                        cam_t_us=np.int32(0),
                        cam_valid=np.bool_(False),
                        cam_extra_imgs=extra,
                        cam_extra_mask=emask,
                    )
            frames.append(base)
        return frames, lt

    # -- initialization ------------------------------------------------------

    @staticmethod
    def _split_frame(base: pl.FrameInput, cam_t: int):
        """Split one interval's FrameInput at the camera stamp (numpy)."""
        cam_t = int(cam_t)
        m1i = base.imu_mask & (base.imu_t_us <= cam_t)
        m2i = base.imu_mask & (base.imu_t_us > cam_t)
        m1w = base.wheel_mask & (base.wheel_t_us <= cam_t)
        m2w = base.wheel_mask & (base.wheel_t_us > cam_t)
        inp_a = base._replace(dt_us=np.int32(cam_t), imu_mask=m1i, wheel_mask=m1w)
        inp_b = base._replace(
            dt_us=np.int32(int(base.dt_us) - cam_t),
            imu_t_us=(base.imu_t_us - cam_t).astype(np.int32),
            imu_mask=m2i,
            wheel_t_us=(base.wheel_t_us - cam_t).astype(np.int32),
            wheel_mask=m2w,
        )
        return inp_a, inp_b

    def initialize(self, frames, lt):
        """Run the INITIALIZING state machine.  Returns
        (TrackState, first_tracking_frame_index, init_window_result, times,
        cam_state-or-None) or raises if the stream ends first.

        With ``enable_camera`` the init window interleaves camera frames
        exactly like the reference (trajectory.cpp:279-370:
        ``slide_window_size`` counts frames of BOTH types, the first frame
        must be laser, camera frames carry their own preintegration
        interval), and camera observations are LK-tracked throughout —
        including over skipped frames, since the reference runs
        ``camera_manger_.add_frame`` before any accept gate."""
        self._init_cam_rows = []
        prm = self.params
        dtype = self.dtype
        use_cam = prm.enable_camera
        W = prm.slide_window_size
        preint = self._preint_fn()
        extract = self._extract_fn()
        match_fn = self._match_fn()
        if use_cam:
            observe = self._cam_observe_fn()
            observe_lk = self._cam_observe_lk_fn()
            rec_fn = self._cam_record_fn()
            h_px, w_px = frames[0].cam_img.shape
            cam_state = cpl.init_cam_state(h_px, w_px, self.ccfg, dtype)

            def obs_extras(cs, fk):
                # the interval's later camera messages: LK-track only
                # (full camera rate, trajectory.cpp:279-310)
                if fk.cam_extra_imgs.shape[0] == 0:
                    return cs
                mask = np.asarray(fk.cam_extra_mask)
                for j in range(fk.cam_extra_imgs.shape[0]):
                    if mask[j]:
                        cs = observe_lk(cs, jnp.asarray(fk.cam_extra_imgs[j]))
                return cs
            cam_state = jax.tree_util.tree_map(jnp.asarray, cam_state)
        else:
            cam_state = None

        p0, q0 = geo.log_SE3(geo.tf_inv(jnp.asarray(prm.mat_T_imu_to_wheel(), dtype)))
        k = 0
        n_frames = len(frames)
        Tiw64 = prm.mat_T_imu_to_wheel()

        def dead_reckon(cur_p, cur_q, wheel_res):
            delta_imu = (
                Tiw64 @ np.asarray(wheel_res.delta_T, np.float64) @ np.linalg.inv(Tiw64)
            )
            T_new = np.asarray(geo.make_tf(cur_p, cur_q), np.float64) @ delta_imu
            return geo.log_SE3(jnp.asarray(T_new, dtype))

        while True:
            # fresh session state (init_current_status, trajectory.cpp:39-68)
            imu_c = pre.imu_reset(0, jnp.zeros(3, dtype), jnp.zeros(3, dtype))
            wheel_c = pre.wheel_reset(0, dtype)
            cur_p, cur_q = jnp.asarray(p0), jnp.asarray(q0)
            window = []  # per accepted frame dicts (type laser|camera)
            cam_entries = []  # window indices of camera entries
            if use_cam:
                # a failed window discards its recorded observations (the
                # LK chain itself survives, like the reference's
                # camera_manager outliving the window reset)
                cam_state = cam_state._replace(
                    fw=cam_state.fw._replace(
                        obs_mask=jnp.zeros_like(cam_state.fw.obs_mask),
                        ready=jnp.zeros_like(cam_state.fw.ready),
                    ),
                    ring_valid=jnp.zeros_like(cam_state.ring_valid),
                )
            front_sub = None
            started = False
            imu_seen = 0
            wheel_seen = 0
            while k < n_frames:
                fk = frames[k]
                base_np = fk.base if use_cam else fk
                has_cam = use_cam and bool(fk.cam_valid)
                inp = jax.tree_util.tree_map(jnp.asarray, base_np)
                imu_seen += int(np.asarray(base_np.imu_mask).sum())
                wheel_seen += int(np.asarray(base_np.wheel_mask).sum())
                # feed samples even for skipped frames (preint keeps running)
                keep, nxt, imu_res, wheel_res = preint(
                    imu_c, wheel_c, inp, cur_q * 0, cur_q * 0
                )
                accepted = True
                if imu_seen < 2 or wheel_seen < 2:
                    accepted = False
                elif not started:
                    # static-start gate (trajectory.cpp:163-165): wheel
                    # delta conjugated into the laser frame
                    dT = np.asarray(wheel_res.delta_T)
                    Tlw = np.linalg.inv(prm.mat_T_imu_to_laser()) @ Tiw64
                    dl = Tlw @ dT @ np.linalg.inv(Tlw)
                    dp, dq = geo.log_SE3(jnp.asarray(dl, dtype))
                    if (
                        float(jnp.linalg.norm(dp)) < prm.p_motion_threshold
                        and float(jnp.linalg.norm(dq)) < prm.q_motion_threshold
                    ):
                        accepted = False
                    else:
                        started = True
                if not accepted:
                    imu_c, wheel_c = keep
                    if has_cam:  # LK chain runs before any accept gate
                        cam_state = observe(cam_state, jnp.asarray(fk.cam_img))
                        cam_state = obs_extras(cam_state, fk)
                    k += 1
                    continue
                if has_cam and window:
                    # camera window entry with its own preint interval
                    inp_a, inp_b = self._split_frame(base_np, fk.cam_t_us)
                    _, nxt_a, imu_res_a, wheel_res_a = preint(
                        imu_c, wheel_c,
                        jax.tree_util.tree_map(jnp.asarray, inp_a),
                        cur_q * 0, cur_q * 0,
                    )
                    imu_c, wheel_c = nxt_a
                    cam_p, cam_q = dead_reckon(cur_p, cur_q, wheel_res_a)
                    cam_state = observe(cam_state, jnp.asarray(fk.cam_img))
                    cam_state = rec_fn(cam_state, cam_p, cam_q)
                    window.append(
                        dict(
                            type="camera",
                            t_us=int(lt[k - 1] if k else 0) + int(fk.cam_t_us),
                            p=cam_p,
                            q=cam_q,
                            imu=imu_res_a,
                            wheel=wheel_res_a,
                            feats=None,
                            match=None,
                            n_tracked=int(np.sum(np.asarray(cam_state.live))),
                        )
                    )
                    cam_entries.append(len(window) - 1)
                    cam_state = obs_extras(cam_state, fk)
                    cur_p, cur_q = cam_p, cam_q
                    _, nxt_b, imu_res, wheel_res = preint(
                        imu_c, wheel_c,
                        jax.tree_util.tree_map(jnp.asarray, inp_b),
                        cur_q * 0, cur_q * 0,
                    )
                    imu_c, wheel_c = nxt_b
                else:
                    if has_cam:  # first frame must be laser (trajectory.cpp:303)
                        cam_state = observe(cam_state, jnp.asarray(fk.cam_img))
                        cam_state = obs_extras(cam_state, fk)
                    imu_c, wheel_c = nxt
                cur_p, cur_q = dead_reckon(cur_p, cur_q, wheel_res)
                feats = extract(inp.points, inp.point_valid)
                if front_sub is None:
                    front_sub = mm.submap_from_scan(
                        feats, cur_p, cur_q, prm.ref_capacity
                    )
                    match = None
                else:
                    match = match_fn(front_sub, feats, cur_p, cur_q)
                    if int(match.n) < 2:
                        # reset everything (trajectory.cpp:412-418)
                        k += 1
                        break
                window.append(
                    dict(
                        type="laser",
                        t_us=int(lt[k]),
                        p=cur_p,
                        q=cur_q,
                        imu=imu_res,
                        wheel=wheel_res,
                        feats=feats,
                        match=match,
                    )
                )
                k += 1
                if len(window) >= W:
                    track, st_opt, cam_state = self._finish_init(
                        window, cam_state, cam_entries
                    )
                    times = np.asarray([f["t_us"] for f in window])
                    return track, k, st_opt, times, cam_state
            else:
                raise RuntimeError(
                    f"stream ended during initialization (frame {k}/{n_frames})"
                )

    def _finish_init(self, window, cam_state=None, cam_entries=()):
        """init_solve + submap rebuild + marginalization -> TrackState.

        With camera entries present, the init solve carries camera
        reprojection rows over free landmarks exactly like
        ``do_init_solve(..., enable_camera_factor=true)``
        (solver.cpp:60-85,171-174): landmarks are triangulated first
        (``estimate_features(true)``, trajectory.cpp:419) and features that
        fail triangulation are dropped."""
        prm = self.params
        dtype = self.dtype
        W = len(window)
        M = prm.max_lines

        st = fac.WindowState(
            p=jnp.stack([f["p"] for f in window]),
            q=jnp.stack([f["q"] for f in window]),
            v=jnp.zeros((W, 3), dtype),
            bs=jnp.zeros((W, 6), dtype),
        )
        eye15 = jnp.eye(15, dtype=dtype)
        Ms = M * W
        l1p1 = np.zeros((Ms, 3), np.float32)
        l1p2 = np.zeros((Ms, 3), np.float32)
        l2p1 = np.zeros((Ms, 3), np.float32)
        l2p2 = np.zeros((Ms, 3), np.float32)
        j_idx = np.zeros(Ms, np.int32)
        lvalid = np.zeros(Ms, bool)
        for i, f in enumerate(window):
            if f["match"] is None:
                continue
            sl = slice(i * M, (i + 1) * M)
            l1p1[sl] = np.asarray(f["match"].ref_p1)
            l1p2[sl] = np.asarray(f["match"].ref_p2)
            l2p1[sl] = np.asarray(f["match"].new_p1)
            l2p2[sl] = np.asarray(f["match"].new_p2)
            j_idx[sl] = i
            lvalid[sl] = np.asarray(f["match"].valid)
        data = fac.FactorData(
            imu_X=jnp.stack(
                [window[i]["imu"].X if i > 0 else jnp.zeros(15, dtype) for i in range(W)]
            ),
            imu_J=jnp.stack(
                [window[i]["imu"].J if i > 0 else eye15 for i in range(W)]
            ),
            imu_sqrtP=jnp.stack(
                [
                    window[i]["imu"].sqrt_inverse_P if i > 0 else eye15
                    for i in range(W)
                ]
            ),
            imu_Dt=jnp.stack(
                [window[i]["imu"].Dt if i > 0 else jnp.zeros((), dtype) for i in range(W)]
            ),
            imu_valid=jnp.asarray([i > 0 for i in range(W)]),
            wheel_dT=jnp.stack(
                [
                    window[i]["wheel"].delta_T if i > 0 else jnp.eye(4, dtype=dtype)
                    for i in range(W)
                ]
            ),
            wheel_sqrt=jnp.stack(
                [
                    window[i]["wheel"].sqrt_inverse_P
                    if i > 0
                    else jnp.eye(3, dtype=dtype)
                    for i in range(W)
                ]
            ),
            wheel_valid=jnp.asarray([i > 0 for i in range(W)]),
            laser_l1p1=jnp.asarray(l1p1),
            laser_l1p2=jnp.asarray(l1p2),
            laser_l2p1=jnp.asarray(l2p1),
            laser_l2p2=jnp.asarray(l2p2),
            laser_i_idx=jnp.zeros(Ms, jnp.int32),  # vs frame 0 (init_solve)
            laser_j_idx=jnp.asarray(j_idx),
            laser_ref_p=jnp.zeros((Ms, 3), dtype),
            laser_ref_q=jnp.zeros((Ms, 3), dtype),
            laser_valid=jnp.asarray(lvalid),
            ground_weight=jnp.asarray(np.sqrt(W), dtype),
            frame_valid=jnp.ones(W, bool),
            prior_J=jnp.zeros((15, 15), dtype),
            prior_X=jnp.zeros(15, dtype),
            prior_res=jnp.zeros(15, dtype),
            prior_idx=jnp.asarray(0, jnp.int32),
            prior_valid=jnp.asarray(False),
        )
        consts = self.consts

        use_cam = cam_state is not None and len(cam_entries) > 0
        if use_cam:
            ccfg, cdyn = self.ccfg, self.cdyn
            Wc = self.ccfg.obs_window
            F = self.ccfg.n_features
            # obs slot w <-> window frame index (last Wc camera entries sit
            # in the newest ring/obs slots, by construction of record())
            taken = list(cam_entries)[-Wc:]
            slot_to_frame = np.full(Wc, -1, np.int32)
            for j, widx in enumerate(taken):
                slot_to_frame[Wc - len(taken) + j] = widx
            slot_valid = slot_to_frame >= 0
            # estimate_features(true): triangulate from the dead-reckoned
            # ring poses; features that fail stay out of the solve and are
            # removed afterwards
            fw0 = cam_state.fw._replace(ready=jnp.zeros_like(cam_state.fw.ready))
            fw0 = jax.jit(
                lambda fw: cpl.ft.triangulate_ready(
                    fw,
                    cam_state.ring_p,
                    cam_state.ring_q,
                    cdyn.T_imu_to_camera,
                    min_obs=min(ccfg.min_obs, max(2, len(taken) // 2)),
                    min_parallax=cdyn.min_parallax,
                )
            )(fw0)
            ready_init = np.asarray(fw0.ready)
            obs_np = jnp.asarray(fw0.obs)
            obs_mask_np = jnp.asarray(fw0.obs_mask) & jnp.asarray(slot_valid)[None, :]
            s2f = jnp.asarray(np.maximum(slot_to_frame, 0), jnp.int32)
            Tic = cdyn.T_imu_to_camera
            sq_info = cdyn.sqrt_info
            ready_j = jnp.asarray(ready_init)

            def cam_rows(x):
                stw = fac.WindowState.from_flat(x[: W * 15], W)
                world = x[W * 15 :].reshape(F, 3)

                def one(f, w):
                    fi = s2f[w]
                    r = fac.camera_residual(
                        stw.p[fi], stw.q[fi], world[f], obs_np[f, w], Tic, sq_info
                    )
                    use = obs_mask_np[f, w] & ready_j[f]
                    return r * use.astype(r.dtype)

                ff, ww = jnp.meshgrid(jnp.arange(F), jnp.arange(Wc), indexing="ij")
                return jax.vmap(jax.vmap(one))(ff, ww).reshape(-1)

            res_fn = lambda x: jnp.concatenate(
                [
                    fac.stack_residuals(
                        fac.WindowState.from_flat(x[: W * 15], W), data, consts
                    ),
                    cam_rows(x),
                ]
            )
            free = jnp.concatenate(
                [
                    jnp.ones(W * 15, dtype),
                    jnp.repeat(jnp.asarray(ready_init, dtype), 3),
                ]
            )
            x0 = jnp.concatenate([st.flat(), fw0.world.reshape(-1)])
            wrap = lambda x: x.at[: W * 15].set(pl._wrap_q(x[: W * 15], W, dtype))
        else:
            res_fn = lambda x: fac.stack_residuals(
                fac.WindowState.from_flat(x, W), data, consts
            )
            free = jnp.ones(W * 15, dtype)
            x0 = st.flat()
            wrap = lambda x: pl._wrap_q(x, W, dtype)
        x_full, cost, _ = jax.jit(
            lambda x0: gn.lm_solve(
                res_fn,
                x0,
                free,
                gn.LMConfig(max_iters=self.params.init_solver_max_iterations),
                wrap_fn=wrap,
            )
        )(x0)
        x_opt = x_full[: W * 15]
        st_opt = fac.WindowState.from_flat(x_opt, W)
        if use_cam:
            # estimate_features(true) removal + optimized landmarks; ring
            # poses become the OPTIMIZED camera-frame poses
            world_opt = x_full[W * 15 :].reshape(F, 3)
            rj = jnp.asarray(ready_init)
            fw1 = fw0._replace(
                world=world_opt,
                ready=rj,
                ids=jnp.where(rj, fw0.ids, -1),
                obs_mask=fw0.obs_mask & rj[:, None],
            )
            ring_p = np.asarray(cam_state.ring_p).copy()
            ring_q = np.asarray(cam_state.ring_q).copy()
            stp = np.asarray(st_opt.p)
            stq = np.asarray(st_opt.q)
            for w in range(Wc):
                if slot_valid[w]:
                    ring_p[w] = stp[slot_to_frame[w]]
                    ring_q[w] = stq[slot_to_frame[w]]
            cam_state = cam_state._replace(
                fw=fw1,
                live=cam_state.live & rj,
                ring_p=jnp.asarray(ring_p),
                ring_q=jnp.asarray(ring_q),
                ring_valid=jnp.asarray(slot_valid),
            )
            # camera entries solved inside the init window are reported in
            # FrontendResult.cam_* too (advisor r2: they were silently
            # omitted).  Poses come from the optimized window; n_ready is
            # the post-init triangulation count (shared by all entries).
            n_ready_init = int(np.sum(ready_init))
            self._init_cam_rows = [
                (
                    window[i]["t_us"],
                    np.asarray(st_opt.p[i]),
                    np.asarray(st_opt.q[i]),
                    int(window[i].get("n_tracked", 0)),
                    n_ready_init,
                )
                for i in cam_entries
            ]

        # rebuild submaps from optimized poses (trajectory.cpp:466-478)
        pair = mm.empty_pair(prm.ref_capacity, dtype)
        add = jax.jit(
            lambda pair, feats, p, q: mm.add_scan(
                pair,
                feats,
                p,
                q,
                consts.T_imu_to_laser,
                ref_n_accumulation=prm.ref_n_accumulation,
                motion_filter_p=self.dcfg.ref_motion_filter_p,
                motion_filter_q=self.dcfg.ref_motion_filter_q,
            )
        )
        for i, f in enumerate(window):
            if f["feats"] is not None:
                pair = add(pair, f["feats"], st_opt.p[i], st_opt.q[i])

        # marginalization seeds the prior (trajectory.cpp:479); the laser
        # ref side becomes the frozen optimized frame-0 pose
        data_m = data._replace(
            laser_i_idx=-jnp.ones(Ms, jnp.int32),
            laser_ref_p=jnp.tile(st_opt.p[0][None], (Ms, 1)),
            laser_ref_q=jnp.tile(st_opt.q[0][None], (Ms, 1)),
        )
        res_fn_m = lambda x: fac.stack_residuals(
            fac.WindowState.from_flat(x, W), data_m, consts
        )
        lin_J, lin_res, lin_X = jax.jit(
            lambda x: gn.marginalize(res_fn_m, x, keep=15)
        )(x_opt)

        track = pl.init_track_state(
            st_opt.p[-1], st_opt.q[-1], st_opt.v[-1], st_opt.bs[-1], self.scfg, dtype
        )
        track = track._replace(
            pair=pair,
            prior_J=lin_J,
            prior_X=lin_X,
            prior_res=lin_res,
            prior_valid=jnp.asarray(not prm.fast_mode),
            last_keyframe_T=geo.make_tf(st_opt.p[-1], st_opt.q[-1])
            @ consts.T_imu_to_laser,
        )
        return track, st_opt, cam_state

    # -- full run -------------------------------------------------------------

    def run(self, streams, chunk_size=32, chunk_callback=None) -> FrontendResult:
        """Run the full stream.  ``chunk_callback(info)`` fires after each
        drained chunk with the chunk's frames and keyframe payloads — the
        hook the online runner (liwslam.online) uses to feed the back end
        concurrently, replacing the reference's front-end→back-end thread
        handoff (keyframe_manager.cpp:399-417)."""
        rec = self.recorder
        rec.begin_record()
        frames, lt = self.pack_frames(streams)
        rec.end_record("pack_frames")
        rec.begin_record()
        track, k0, st_init, init_times, cam_state = self.initialize(frames, lt)
        rec.end_record("initialize")
        use_cam = self.params.enable_camera
        chunk_fn = self._cam_chunk_fn() if use_cam else self._chunk_fn()

        out_t, out_p, out_q, out_v, out_bs = [], [], [], [], []
        out_kf, out_nm, out_nl = [], [], []
        kf_corners, kf_indices, kf_scans = [], [], []
        # (t_us, p, q, n_tracked, n_ready) per camera frame; init-window
        # entries (solved by init_solve) come first, in time order
        cam_rows = list(self._init_cam_rows)

        # init window frames are reported too (they're part of fornt_end.txt)
        out_t.extend(int(t) for t in init_times)

        st_init_n = len(init_times)
        k = k0
        F = len(frames)
        while k < F:
            n = min(chunk_size, F - k)
            batch = jax.tree_util.tree_map(
                lambda *xs: jnp.asarray(np.stack(xs)), *frames[k : k + n]
            )
            rec.begin_record()
            if use_cam:
                (track, cam_state), (outs, cam_outs) = chunk_fn(
                    track, cam_state, batch
                )
                cam_outs = jax.tree_util.tree_map(np.asarray, cam_outs)
                for i in range(n):
                    if cam_outs.valid[i]:
                        t0 = int(lt[k + i - 1]) if k + i > 0 else 0
                        cam_rows.append(
                            (
                                t0 + int(frames[k + i].cam_t_us),
                                cam_outs.p[i],
                                cam_outs.q[i],
                                int(cam_outs.n_tracked[i]),
                                int(cam_outs.n_ready[i]),
                            )
                        )
            else:
                track, outs = chunk_fn(track, batch)
            outs = jax.tree_util.tree_map(np.asarray, outs)
            rec.end_record("track_chunk")
            rec.add_record("frames per chunk", n)
            rec.add_record(
                "lines each frame", float(np.mean(outs.n_lines))
            )
            rec.add_record(
                "match line size", float(np.mean(outs.n_match))
            )
            chunk_kfs = []
            for i in range(n):
                out_t.append(int(lt[k + i]))
                out_p.append(outs.p[i])
                out_q.append(outs.q[i])
                out_v.append(outs.v[i])
                out_bs.append(outs.bs[i])
                out_kf.append(bool(outs.is_keyframe[i]))
                out_nm.append(int(outs.n_match[i]))
                out_nl.append(int(outs.n_lines[i]))
                if outs.is_keyframe[i]:
                    kf_indices.append(st_init_n + len(out_p) - 1)
                    cv = outs.kf_corner_valid[i]
                    kf_corners.append(outs.kf_corners[i][cv])
                    lv = outs.scan_line_valid[i]
                    kf_scans.append((outs.scan_p1[i][lv], outs.scan_p2[i][lv]))
                    chunk_kfs.append(
                        dict(
                            frame_index=st_init_n + len(out_p) - 1,
                            t_us=int(lt[k + i]),
                            p=outs.p[i],
                            q=outs.q[i],
                            corners=kf_corners[-1],
                            scan_lines=kf_scans[-1],
                        )
                    )
            if chunk_callback is not None:
                chunk_callback(
                    dict(
                        frame_start=st_init_n + len(out_p) - n,
                        t_us=[int(lt[k + i]) for i in range(n)],
                        p=outs.p[:n],
                        q=outs.q[:n],
                        keyframes=chunk_kfs,
                    )
                )
            k += n

        # prepend init-window states (optimized by init_solve) — v/bs too,
        # so every per-frame array shares length F and v[i] matches t_us[i]
        init_p = np.asarray(st_init.p)
        init_q = np.asarray(st_init.q)
        init_v = np.asarray(st_init.v)
        init_bs = np.asarray(st_init.bs)

        def _cat(init_a, rows):
            return np.concatenate([init_a, np.stack(rows)]) if rows else init_a

        return FrontendResult(
            t_us=np.asarray(out_t),
            p=_cat(init_p, out_p),
            q=_cat(init_q, out_q),
            v=_cat(init_v, out_v),
            bs=_cat(init_bs, out_bs),
            is_keyframe=np.asarray([False] * st_init_n + out_kf),
            n_match=np.asarray([0] * st_init_n + out_nm),
            n_lines=np.asarray([0] * st_init_n + out_nl),
            kf_corners=kf_corners,
            kf_indices=np.asarray(kf_indices, np.int64),
            kf_scans=kf_scans,
            cam_t_us=np.asarray([r[0] for r in cam_rows], np.int64),
            cam_p=(
                np.stack([r[1] for r in cam_rows]) if cam_rows else np.zeros((0, 3))
            ),
            cam_q=(
                np.stack([r[2] for r in cam_rows]) if cam_rows else np.zeros((0, 3))
            ),
            cam_n_tracked=np.asarray([r[3] for r in cam_rows], np.int64),
            cam_n_ready=np.asarray([r[4] for r in cam_rows], np.int64),
        )
