"""Scan-to-submap line matching and the double-buffered reference submap.

Capability parity with ``src/trajectory/laser_manager.{h,cpp}``:

- ``do_match`` (laser_manager.cpp:244-348): project each new line's
  midpoint through the predicted relative transform into the reference
  scan, gather nearby reference lines, pick the best by direction angle
  (< 10 deg), then drop matches whose point-to-line distance exceeds
  1.2x the mean.
- ``add_scan`` (laser_manager.cpp:424-496): accumulate each scan's lines
  into a reference submap and a half-phase "spawning" submap; every
  ``ref_n_accumulation`` scans the spawning buffer is promoted; a motion
  filter skips near-duplicate scans.

TPU-native redesign: the reference rasterizes lines into a lazily
allocated 2001x2001 cell grid and gathers a 3x3 neighborhood per query
(``my_2d_vec``, my_struct.h:9-62).  Here the submap is a fixed-capacity
line *array* and candidate gathering is a dense (new_lines x ref_lines)
score matrix — pure VPU work with no data-dependent memory access, which
is both faster and simpler on TPU.  The 3x3-cell neighborhood test
becomes "transformed midpoint within ~(1+kk)*resolution*sqrt2 of the
reference segment", which admits the same candidate set up to cell
quantization.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from liwslam.core import geometry as geo
from liwslam.core import hostmath
from liwslam.frontend.scan import ScanFeatures, _point_segment_dist

_EPS = 1e-8


class RefSubmap(NamedTuple):
    """Fixed-capacity line submap (laser_submap + accumulated scan lines).

    Lines are stored in the LASER frame of the submap's keyframe; ``pose_p``
    / ``pose_q`` is that keyframe's IMU-frame world pose, exactly like
    ``laser_submap::{current_p,current_q}`` (laser_type.h)."""

    p1: jnp.ndarray  # (R,3)
    p2: jnp.ndarray  # (R,3)
    valid: jnp.ndarray  # (R,) bool
    n: jnp.ndarray  # () int32 number of stored lines
    pose_p: jnp.ndarray  # (3,)
    pose_q: jnp.ndarray  # (3,)
    active: jnp.ndarray  # () bool — submap exists


def empty_submap(capacity: int, dtype=jnp.float32) -> RefSubmap:
    return RefSubmap(
        p1=jnp.zeros((capacity, 3), dtype),
        p2=jnp.zeros((capacity, 3), dtype),
        valid=jnp.zeros(capacity, bool),
        n=jnp.zeros((), jnp.int32),
        pose_p=jnp.zeros(3, dtype),
        pose_q=jnp.zeros(3, dtype),
        active=jnp.asarray(False),
    )


def submap_from_scan(scan: ScanFeatures, pose_p, pose_q, capacity: int) -> RefSubmap:
    """Create a submap seeded with one scan's lines (in its own frame)."""
    sub = empty_submap(capacity, scan.p1.dtype)
    sub = sub._replace(
        pose_p=pose_p, pose_q=pose_q, active=jnp.asarray(True)
    )
    return append_lines(sub, scan.p1, scan.p2, scan.line_valid)


def append_lines(sub: RefSubmap, p1, p2, valid) -> RefSubmap:
    """Append lines (already in the submap's laser frame); overflow drops.

    The row writes go through ONE one-hot matmul instead of three
    scatters (TPU scatters serialize; round-3 gather/scatter sweep)."""
    cap = sub.p1.shape[0]
    dtype = sub.p1.dtype
    offsets = jnp.cumsum(valid.astype(jnp.int32)) - 1
    idx = jnp.where(valid, sub.n + offsets, cap + 1)  # OOB -> drop
    oh = (idx[:, None] == jnp.arange(cap, dtype=jnp.int32)[None, :]).astype(
        dtype
    )  # (L,cap): at most one 1 per row, distinct columns
    payload = jnp.concatenate(
        [p1, p2, valid.astype(dtype)[:, None]], 1
    )  # (L,7)
    placed = oh.T @ payload  # (cap,7)
    touched = placed[:, 6] > 0.5
    new_p1 = jnp.where(touched[:, None], placed[:, :3], sub.p1)
    new_p2 = jnp.where(touched[:, None], placed[:, 3:6], sub.p2)
    new_valid = sub.valid | touched
    n_new = jnp.minimum(
        sub.n + jnp.sum(valid.astype(jnp.int32)), cap
    ).astype(jnp.int32)
    return sub._replace(p1=new_p1, p2=new_p2, valid=new_valid, n=n_new)


class LaserMatch(NamedTuple):
    """Fixed-capacity laser_match (laser_type.h): per new line, the matched
    reference line's endpoints in the reference keyframe's laser frame."""

    ref_p1: jnp.ndarray  # (L,3)
    ref_p2: jnp.ndarray  # (L,3)
    new_p1: jnp.ndarray  # (L,3)
    new_p2: jnp.ndarray  # (L,3)
    valid: jnp.ndarray  # (L,)
    ref_pose_p: jnp.ndarray  # (3,) frozen pose of the reference frame
    ref_pose_q: jnp.ndarray  # (3,)

    @property
    def n(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def match_lines(
    ref: RefSubmap,
    scan: ScanFeatures,
    cur_p,
    cur_q,
    T_imu_to_laser,
    *,
    resolution: float,
    kk: int = 0,
    max_angle_deg: float = 10.0,
    mean_dist_k: float = 1.2,
) -> LaserMatch:
    """do_match (laser_manager.cpp:244-348) as a dense score matrix."""
    dtype = scan.p1.dtype
    Til = jnp.asarray(T_imu_to_laser, dtype)
    T1 = geo.tf_compose(geo.make_tf(ref.pose_p, ref.pose_q), Til)
    T2 = geo.tf_compose(geo.make_tf(jnp.asarray(cur_p, dtype), jnp.asarray(cur_q, dtype)), Til)
    T_1_2 = geo.tf_compose(geo.tf_inv(T1), T2)

    # transform new lines into the reference laser frame
    q1 = geo.tf_apply(T_1_2, scan.p1)
    q2 = geo.tf_apply(T_1_2, scan.p2)
    mid = 0.5 * (q1 + q2)

    # candidate gate: midpoint near the reference segment (3x3(+kk) cells).
    # Componentwise squared-distance form: (L,R) planes only, no (L,R,2)
    # temporaries, no sqrt (compare d^2 to gate^2) — measured kernel-count
    # cut round 3
    gate = (1.0 + kk + 0.5) * resolution * jnp.sqrt(2.0)
    ax, ay = ref.p1[:, 0][None, :], ref.p1[:, 1][None, :]  # (1,R)
    abx = (ref.p2[:, 0] - ref.p1[:, 0])[None, :]
    aby = (ref.p2[:, 1] - ref.p1[:, 1])[None, :]
    ab2 = jnp.maximum(abx * abx + aby * aby, _EPS)
    mx, my = mid[:, 0][:, None], mid[:, 1][:, None]  # (L,1)
    t = jnp.clip(((mx - ax) * abx + (my - ay) * aby) / ab2, 0.0, 1.0)
    dx = mx - ax - t * abx
    dy = my - ay - t * aby
    d2_mid = dx * dx + dy * dy  # (L,R)
    cand = (d2_mid <= gate * gate) & ref.valid[None, :] & scan.line_valid[:, None]

    # direction angle (argmin over candidates)
    v2 = q2 - q1
    v1 = ref.p2 - ref.p1
    v2n = v2[:, :2] / jnp.maximum(jnp.linalg.norm(v2[:, :2], axis=-1, keepdims=True), _EPS)
    v1n = v1[:, :2] / jnp.maximum(jnp.linalg.norm(v1[:, :2], axis=-1, keepdims=True), _EPS)
    cosang = jnp.abs(v2n @ v1n.T)  # (L,R)
    ang = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
    ang = jnp.where(cand, ang, jnp.pi)
    best = jnp.argmin(ang, axis=1)  # (L,)
    best_ang = jnp.min(ang, axis=1)
    matched = best_ang < jnp.deg2rad(max_angle_deg)

    # winner rows via one-hot matmul, not row gathers
    sel = (
        best[:, None] == jnp.arange(ang.shape[1], dtype=jnp.int32)[None, :]
    ).astype(dtype)
    bp12 = sel @ jnp.concatenate([ref.p1, ref.p2], 1)  # (L,6)
    bp1 = bp12[:, :3]
    bp2 = bp12[:, 3:]

    # mean point-to-line distance filter (laser_manager.cpp:315-345)
    d1 = geo.dis_from_line(q1, bp1, bp2)
    d2 = geo.dis_from_line(q2, bp1, bp2)
    dis = 0.5 * (d1 + d2)
    nm = jnp.maximum(jnp.sum(matched.astype(dtype)), 1.0)
    aver = jnp.sum(jnp.where(matched, dis, 0.0)) / nm
    # <= + eps: the reference's strict '<' drops *all* matches when every
    # distance is identical (e.g. exact re-observation) — clearly unintended
    keep = matched & (dis <= aver * mean_dist_k + 1e-9)

    return LaserMatch(
        ref_p1=bp1,
        ref_p2=bp2,
        new_p1=scan.p1,
        new_p2=scan.p2,
        valid=keep & ref.active,
        ref_pose_p=ref.pose_p,
        ref_pose_q=ref.pose_q,
    )


class SubmapPair(NamedTuple):
    """Double-buffered reference accumulation state of laser_manager."""

    ref: RefSubmap
    spawning: RefSubmap
    count: jnp.ndarray  # () int32 — current_count
    last_add_T: jnp.ndarray  # (4,4)


@hostmath.setup_fn
def empty_pair(capacity: int, dtype=jnp.float32) -> SubmapPair:
    return SubmapPair(
        ref=empty_submap(capacity, dtype),
        spawning=empty_submap(capacity, dtype),
        count=jnp.zeros((), jnp.int32),
        last_add_T=jnp.eye(4, dtype=dtype),
    )


def _where_tree(pred, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def add_scan(
    pair: SubmapPair,
    scan: ScanFeatures,
    cur_p,
    cur_q,
    T_imu_to_laser,
    *,
    ref_n_accumulation: int,
    motion_filter_p: float,
    motion_filter_q: float,
) -> SubmapPair:
    """add_scan (laser_manager.cpp:424-496), branch-free."""
    # constructors return HOST numpy state (hostmath.setup_fn); coerce so
    # eager (un-jitted) use still gets .at[] — identity under jit
    pair = jax.tree_util.tree_map(jnp.asarray, pair)
    dtype = scan.p1.dtype
    capacity = pair.ref.p1.shape[0]
    Til = jnp.asarray(T_imu_to_laser, dtype)
    cur_T = geo.make_tf(jnp.asarray(cur_p, dtype), jnp.asarray(cur_q, dtype))

    # ---- case A: no reference yet -> seed it with this scan -------------
    seeded = submap_from_scan(scan, jnp.asarray(cur_p, dtype), jnp.asarray(cur_q, dtype), capacity)
    pair_seeded = SubmapPair(
        ref=seeded,
        spawning=pair.spawning,
        count=jnp.ones((), jnp.int32),
        last_add_T=cur_T,
    )

    # ---- motion filter ---------------------------------------------------
    dp, dq = geo.log_SE3(geo.tf_compose(geo.tf_inv(pair.last_add_T), cur_T))
    still = (jnp.linalg.norm(dp) < motion_filter_p) & (
        jnp.linalg.norm(dq) < motion_filter_q
    )

    # ---- case B: accumulate into ref (+ spawning) ------------------------
    def lines_in(sub: RefSubmap):
        T_sub = geo.make_tf(sub.pose_p, sub.pose_q)
        l_rel = geo.tf_compose(geo.tf_compose(geo.tf_compose(geo.tf_inv(Til), geo.tf_inv(T_sub)), cur_T), Til)
        return geo.tf_apply(l_rel, scan.p1), geo.tf_apply(l_rel, scan.p2)

    a1, a2 = lines_in(pair.ref)
    ref_acc = append_lines(pair.ref, a1, a2, scan.line_valid)
    s1, s2 = lines_in(pair.spawning)
    spawn_acc = _where_tree(
        pair.spawning.active,
        append_lines(pair.spawning, s1, s2, scan.line_valid),
        pair.spawning,
    )
    count = pair.count + 1

    # spawn the half-phase buffer at count == n_acc/2
    fresh = submap_from_scan(
        scan, jnp.asarray(cur_p, dtype), jnp.asarray(cur_q, dtype), capacity
    )
    spawn_now = jnp.logical_and(
        jnp.logical_not(pair.spawning.active), count == ref_n_accumulation // 2
    )
    spawn_acc = _where_tree(spawn_now, fresh, spawn_acc)

    # promote at count == n_acc
    promote = count == ref_n_accumulation
    ref_out = _where_tree(promote, spawn_acc, ref_acc)
    spawn_out = _where_tree(promote, fresh, spawn_acc)
    count = jnp.where(promote, jnp.asarray(ref_n_accumulation // 2, jnp.int32), count)

    pair_acc = SubmapPair(
        ref=ref_out, spawning=spawn_out, count=count, last_add_T=cur_T
    )

    # ---- select: seed / skip / accumulate --------------------------------
    out = _where_tree(pair.ref.active, pair_acc, pair_seeded)
    skipped = pair._replace()  # motion-filtered: unchanged
    out = _where_tree(jnp.logical_and(pair.ref.active, still), skipped, out)
    return out
