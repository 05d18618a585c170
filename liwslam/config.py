"""Typed configuration for liwslam.

Reproduces the capability surface of the reference parameter system
(``src/utilies/params.{h,cpp}``: singleton ``param::manager`` loading ~60
params from the ROS param server, ``PARAM(x)`` macro, derived values in
``check_param``) as a frozen dataclass + YAML loader — no singletons, no
macros.  Parameters that feed jitted device code are split into a separate
:class:`DeviceConsts` pytree of arrays so that changing a noise sigma does
not trigger recompilation; structural parameters (capacities, window size)
are Python ints and *do* specialize the compiled program.

Per-sequence presets mirror ``config/{params,office,corridor,cafe}.yaml``.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import Any

import numpy as np

# ---------------------------------------------------------------------------
# helpers


def _mat4(vals) -> np.ndarray:
    a = np.asarray(vals, dtype=np.float64).reshape(4, 4)
    return a


def _vec(vals, n) -> np.ndarray:
    a = np.asarray(vals, dtype=np.float64).reshape(n)
    return a


_IDENTITY4 = tuple(float(x) for x in np.eye(4).reshape(-1))


@dataclass(frozen=True)
class Params:
    """All tunables of the pipeline.

    Field names follow the reference YAML keys (``config/params.yaml``) so a
    reference user can bring their configs over unchanged; TPU-specific
    structural fields are grouped at the bottom.
    """

    # --- sensor enables (config/params.yaml:6-9) ---
    enable_laser: bool = True
    enable_camera: bool = False

    # --- extrinsics: 4x4 row-major (config/params.yaml:13-34) ---
    T_imu_to_wheel: tuple = _IDENTITY4
    T_imu_to_camera: tuple = _IDENTITY4
    T_imu_to_laser: tuple = _IDENTITY4
    camera_K: tuple = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)

    # --- rates / gravity ---
    FPS: float = 40.0
    g: float = 9.8

    # --- noise sigmas (per second / per meter) ---
    imu_noise_acc_sigma: tuple = (0.0163, 0.0163, 0.0163)
    imu_bias_acc_sigma: tuple = (0.00499, 0.00499, 0.00499)
    imu_noise_gyro_sigma: tuple = (0.003208, 0.003208, 0.003208)
    imu_bias_gyro_sigma: tuple = (0.000499, 0.000499, 0.000499)
    wheel_sigma: tuple = (0.1, 99999.0, 999.99)  # len / dir / yaw, per meter
    camera_sigma: tuple = (20.0, 20.0)
    max_camera_reproject_error: float = 20.0
    max_camera_feature_dis: float = 50.0
    manifold_p_sigma: float = 0.01  # m      (ground-plane z)
    manifold_q_sigma: float = 0.001  # rad   (roll/pitch)

    # --- camera tracking ---
    max_feature_num: int = 5
    feature_min_dis: float = 50.0

    # --- initialization ---
    slide_window_size: int = 10
    p_motion_threshold: float = 0.1
    q_motion_threshold: float = 0.05

    # --- laser feature extraction ---
    w_laser_each_scan: float = 100.0
    h_laser_each_scan: float = 100.0
    laser_resolution: float = 0.05
    line_continuous_threshold: float = 0.1
    line_min_len: float = 0.05
    line_max_dis: float = 0.03
    line_max_tolerance_angle: float = 175.0  # degrees
    line_to_line_sigma: float = 0.001

    # --- keyframe gating ---
    key_frame_p_motion_threshold: float = 0.1
    key_frame_q_motion_threshold: float = 0.1

    # --- loop closure ---
    a_res: float = 0.05
    d_res: float = 0.05
    submap_count: int = 10
    laser_loop_min_match_threshold: int = 8
    loop_detect_min_interval: int = 100
    verify_loop_rate: float = 0.5
    loop_max_dis: float = 999.0
    loop_edge_k: float = 10.0
    loop_max_tf_p: float = 999.0
    loop_max_tf_q: float = 999.0
    loop_sigma_p: tuple = (0.01, 0.01, 0.01)
    loop_sigma_q: tuple = (0.001, 0.001, 0.001)

    # --- backend ---
    use_ground_p_factor: bool = True
    use_ground_q_factor: bool = False
    pose_graph_solve_interval_s: float = 10.0  # keyframe_manager.cpp:843

    # --- front-end reference submap ---
    ref_motion_filter_p: float = 0.01
    ref_motion_filter_q: float = 0.01
    ref_n_accumulation: int = 2
    fast_mode: bool = True

    # --- output ---
    output_tum: bool = False
    output_dir: str = "/tmp/liwslam"

    # ------------------------------------------------------------------
    # TPU-native structural capacities (no reference counterpart: the
    # reference uses dynamic std::vector/deque; XLA wants static shapes).
    # ------------------------------------------------------------------
    max_points: int = 2048  # laser beams per scan (padded)
    max_lines: int = 64  # extracted lines per scan
    max_corners: int = 32  # corners per scan
    max_matches: int = 64  # line matches used by the solver
    ref_capacity: int = 1024  # line capacity of a reference submap
    max_imu_per_frame: int = 64  # IMU samples between consecutive frames
    max_wheel_per_frame: int = 64
    map_corner_capacity: int = 128  # corners per loop descriptor map
    # camera path capacities/knobs (enable_camera; reference uses dynamic
    # std::map feature tables — XLA wants fixed slots)
    cam_feature_capacity: int = 64  # landmark/track slots F
    cam_obs_window: int = 10  # observation ring length Wc
    cam_min_obs: int = 5  # obs needed before triangulation (camera_manager.cpp:179)
    cam_min_parallax: float = 0.02  # normalized-plane parallax gate
    cam_lk_radius: int = 7
    cam_lk_levels: int = 3
    cam_lk_iters: int = 6
    cam_lk_max_err: float = 0.1  # LK verify gate (fraction of dynamic range)
    # LK implementation: "auto" (xla below 300k px; the pallas kernel on
    # TPU at/above it — its one-launch descent is resolution-independent
    # and wins at real camera geometry, measured in camera_pipeline.observe),
    # "pallas" (whole pyramid descent as ONE TPU kernel, ops/lk.py),
    # "xla" (einsum patch sampling, camera/tracker.py)
    cam_lk_impl: str = "auto"
    # camera joint pose+landmark solve: "auto" (pallas on TPU, schur
    # elsewhere), "pallas" (ONE-kernel landmark-Schur LM + fused
    # marginalization, ops/cam_solve.py), "schur" (XLA landmark-Schur LM,
    # the reference's SPARSE_SCHUR structure; parity-tested) or "chol"
    # (generic dense LM over the (30+3F)-dim state)
    cam_solver: str = "auto"
    keyframe_capacity: int = 4096  # pose-graph node capacity
    edge_capacity: int = 8192  # pose-graph edge capacity
    loop_probe_count: int = 5  # match_map probes (keyframe_manager.cpp:1139)
    solver_max_iterations: int = 10  # LM iterations (fast_mode cap, solver.cpp:801)
    init_solver_max_iterations: int = 50
    # tracking LM step solver: "auto" (pallas on TPU, chol elsewhere),
    # "pallas" (whole LM + Schur reduction as ONE TPU kernel,
    # ops/track_solve.py; measured 1.41 vs 1.91 ms/frame against chol),
    # "chol" (XLA normal eqs + 30x30 Cholesky), or "qr" (augmented LSQ,
    # best conditioning); init solve and pose graph always use "qr"
    solver_method: str = "auto"
    # pallas tracking kernel: exit the in-kernel LM loop at convergence
    # instead of running frozen iterations to max_iters (identical
    # result; ~2x less in-kernel work at mean 3.1 converged iterations)
    solver_early_exit: bool = True
    # extraction prefix passes: "auto" (one-shot N^2 fastscan forms on
    # TPU, log-depth scans elsewhere), "on", "off".  Measured round 3
    # (tools/ab_fastscan.py, same-process TPU A/B, 5 passes): on wins
    # 997 vs 978 fps median (~2%), consistent across passes.
    fast_prefix: str = "auto"
    # line extraction implementation: "auto" (ONE Pallas launch on TPU,
    # ops/extract; XLA scan chain elsewhere), "pallas", "xla".  The
    # kernel collapses extraction's launch chain + (N,N) HBM temporaries
    # into in-VMEM log-depth scans (round 5; parity-pinned in
    # tests/test_extract_pallas.py)
    extract_impl: str = "auto"
    dtype: str = "float32"  # device dtype for the solve path

    # ------------------------------------------------------------------

    def __post_init__(self):
        # Mirror param::manager::check_param (params.cpp-style validation)
        assert self.FPS > 0
        assert self.slide_window_size >= 2
        if not self.enable_laser:
            # The reference gates the laser at ingest (lvio_2d_node.cpp:33
            # and the dispatch watermark, dispatch.h:202-212), implying a
            # camera+IMU+wheel-only arrangement; liwslam's frontend is
            # structurally laser-frame-driven (frames are created per laser
            # scan, frontend/driver.py), so that mode is unsupported —
            # reject loudly instead of silently ignoring the knob.
            raise ValueError(
                "enable_laser=false (laser-off camera+IMU+wheel mode) is "
                "not supported by liwslam: the frontend is laser-frame-"
                "driven. Run with enable_laser=true (optionally with "
                "enable_camera=true for laser+camera fusion)."
            )

    # Derived values ----------------------------------------------------

    @property
    def min_delta_t(self) -> float:
        return 1.0 / self.FPS

    @property
    def line_max_tolerance_angle_rad(self) -> float:
        return math.radians(self.line_max_tolerance_angle)

    @property
    def grid_w(self) -> int:
        return int(self.w_laser_each_scan / self.laser_resolution) + 1

    @property
    def grid_h(self) -> int:
        return int(self.h_laser_each_scan / self.laser_resolution) + 1

    @property
    def n_dist_bins(self) -> int:
        # des_i quick_des sizing: (100m / d_res + 1) bits (keyframe_manager.cpp:21-24)
        return int(100.0 / self.d_res + 1)

    @property
    def n_angle_bins(self) -> int:
        # match_des rotation-vote histogram (keyframe_manager.cpp:1052)
        return int(2 * math.pi / self.a_res) + 2

    def mat_T_imu_to_wheel(self) -> np.ndarray:
        return _mat4(self.T_imu_to_wheel)

    def mat_T_imu_to_camera(self) -> np.ndarray:
        return _mat4(self.T_imu_to_camera)

    def mat_T_imu_to_laser(self) -> np.ndarray:
        return _mat4(self.T_imu_to_laser)

    def mat_camera_K(self) -> np.ndarray:
        return np.asarray(self.camera_K, dtype=np.float64).reshape(3, 3)

    def replace(self, **kw) -> "Params":
        return dataclasses.replace(self, **kw)

    # Loading ------------------------------------------------------------

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "Params":
        known = {f.name for f in dataclasses.fields(Params)}
        kw = {}
        for k, v in d.items():
            if k not in known:
                continue  # topics etc. are I/O concerns, handled by liwslam.io
            if isinstance(v, list):
                v = tuple(float(x) for x in v)
            kw[k] = v
        return Params(**kw)

    @staticmethod
    def from_yaml(path: str) -> "Params":
        import yaml

        with open(path) as f:
            return Params.from_dict(yaml.safe_load(f))


# ---------------------------------------------------------------------------
# Per-sequence presets mirroring the reference configs.  Extrinsics below are
# the OpenLORIS calibrations shipped with the reference (config/office.yaml).

_OPENLORIS_T_IMU_TO_WHEEL = (
    0.0040697, -0.9998940, -0.0139789, -0.061,
    0.0099712, 0.0140189, -0.9998520, 0.919,
    0.9999420, 0.0039297, 0.0100272, -0.224,
    0.0, 0.0, 0.0, 1.0,
)
_OPENLORIS_T_IMU_TO_LASER = (
    0.0019070, -0.9999900, 0.0040438, 0.024,
    0.0459794, -0.0039519, -0.9989346, -0.078,
    0.9989406, 0.0020909, 0.0459714, -0.071,
    0.0, 0.0, 0.0, 1.0,
)
_OPENLORIS_T_IMU_TO_CAMERA = (
    0.9999740, -0.0039879, -0.0060079, -0.020,
    0.0040119, 0.9999840, 0.0039879, 0.005,
    0.0059919, -0.0040119, 0.9999740, 0.011,
    0.0, 0.0, 0.0, 1.0,
)
_OPENLORIS_K = (611.45, 0.0, 433.203, 0.0, 611.485, 249.473, 0.0, 0.0, 1.0)

_OPENLORIS_COMMON = dict(
    T_imu_to_wheel=_OPENLORIS_T_IMU_TO_WHEEL,
    T_imu_to_laser=_OPENLORIS_T_IMU_TO_LASER,
    T_imu_to_camera=_OPENLORIS_T_IMU_TO_CAMERA,
    camera_K=_OPENLORIS_K,
    FPS=1000.0,
    key_frame_p_motion_threshold=0.05,
    key_frame_q_motion_threshold=0.05,
    a_res=0.03,
    d_res=0.03,
    loop_edge_k=10.0,
    loop_max_tf_p=1.0,
    loop_max_tf_q=0.5,
    loop_sigma_p=(0.1, 0.1, 0.1),
    loop_sigma_q=(0.01, 0.01, 0.01),
    use_ground_p_factor=True,
    use_ground_q_factor=True,
    fast_mode=False,
)


def office() -> Params:
    """OpenLORIS office sequences (config/office.yaml)."""
    return Params(
        **_OPENLORIS_COMMON,
        wheel_sigma=(0.5, 99999.0, 999.99),
        manifold_q_sigma=0.0005,
        laser_resolution=0.05,
        line_continuous_threshold=0.1,
        line_max_dis=0.03,
        line_to_line_sigma=0.001,
        submap_count=30,
        laser_loop_min_match_threshold=5,
        loop_detect_min_interval=100,
        loop_max_dis=1.0,
        ref_n_accumulation=2,
    )


def corridor() -> Params:
    """OpenLORIS corridor sequences (config/corridor.yaml)."""
    return Params(
        **_OPENLORIS_COMMON,
        wheel_sigma=(0.02, 99999.0, 999.99),
        manifold_q_sigma=0.0001,
        laser_resolution=0.1,
        line_continuous_threshold=0.5,
        line_max_dis=0.1,
        line_to_line_sigma=0.01,
        submap_count=10,
        laser_loop_min_match_threshold=7,
        loop_detect_min_interval=300,
        loop_max_dis=99999.0,
        ref_n_accumulation=100,
        ref_capacity=4096,
    )


def cafe() -> Params:
    """OpenLORIS cafe sequences (config/cafe.yaml)."""
    return Params(
        **_OPENLORIS_COMMON,
        wheel_sigma=(0.2, 99999.0, 999.99),
        manifold_q_sigma=0.001,
        laser_resolution=0.03,
        line_continuous_threshold=0.1,
        line_max_dis=0.03,
        line_to_line_sigma=0.001,
        submap_count=10,
        laser_loop_min_match_threshold=8,
        loop_detect_min_interval=100,
        loop_max_dis=1.0,
        ref_n_accumulation=2,
    )


def market() -> Params:
    """OpenLORIS market sequences.  The reference's launch file
    (``launch/lvio_2d_market.launch``) points at a ``config/market.yaml``
    that is MISSING from the reference repository — this preset is liwslam's
    own composition for that capability: cafe's dynamic-scene settings scaled
    to the much larger market hall (coarser grid, longer loop search radius,
    stronger dedup of the bigger corner population)."""
    return Params(
        **_OPENLORIS_COMMON,
        wheel_sigma=(0.2, 99999.0, 999.99),
        manifold_q_sigma=0.001,
        laser_resolution=0.05,
        line_continuous_threshold=0.2,
        line_max_dis=0.05,
        line_to_line_sigma=0.005,
        submap_count=10,
        laser_loop_min_match_threshold=8,
        loop_detect_min_interval=200,
        loop_max_dis=5.0,
        ref_n_accumulation=10,
        ref_capacity=2048,
        map_corner_capacity=256,
    )


def base() -> Params:
    """The reference base config (config/params.yaml)."""
    return Params()


PRESETS = {
    "base": base,
    "office": office,
    "corridor": corridor,
    "cafe": cafe,
    "market": market,
}
