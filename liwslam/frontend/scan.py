"""Vectorized laser line/corner extraction (the reference's ``spawn_scan``).

Capability parity with ``src/trajectory/laser_manager.cpp:350-422`` plus the
line-fit helpers at ``laser_manager.cpp:19-94`` and corner spawning inside
``scan::add_line`` (``laser_manager.cpp:137-191``):

1. split the scan into contiguous segments at range discontinuities,
2. corner response = cos of the angle over a ±3-point window, with
   non-max suppression,
3. breakpoints bound candidate lines; near-collinear joints (angle above
   ``line_max_tolerance_angle``) are merged through,
4. each span is fit with a total-least-squares line, gated by max
   point-to-line distance and minimum length,
5. corners = intersections of line pairs meeting at 30°-150° with both
   segments passing near the intersection.

TPU-native redesign (one fused program, no data-dependent shapes):

- segments via cumsum of break flags; per-point segment bounds via
  ``segment_min/max``; responses and NMS as shifted comparisons,
- per-span line fits from *prefix sums* of point moments (every candidate
  span is an O(1) range query),
- the reference's sequential "skip step after accepting a maximum" and
  "merge from the last accepted breakpoint" loops are replaced by their
  order-independent local equivalents (strict NMS; per-joint collinearity
  test).  On real scans these select the same breakpoints except for ties.
- line fit is true TLS (normal direction = minor eigenvector of the 2x2
  scatter), where the reference uses the smallest right singular vector of
  ``[x y 1]`` (an algebraic fit).  For spans that pass the 3 cm
  ``line_max_dis`` gate the two coincide to measurement noise.
- corner pair gating uses point-to-segment distance <= 2*resolution in
  place of the reference's shared-grid-cell test (laser_manager.cpp:175-189).

Output capacities are static: ``max_lines`` / ``max_corners`` winners are
compacted in scan order.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from liwslam.core import fastscan

_BIG = 1e9
_EPS = 1e-8

# Module-level default for the fast-prefix switch (one-shot N^2 forms of
# the prefix passes, core/fastscan).  Only consulted when a caller passes
# ``fast_prefix=None``; the production path threads the choice through
# StaticCfg so it participates in the jit cache key (a module global read
# at trace time would bake the FIRST compile's choice into every cached
# program and silently invalidate same-process A/Bs).
FAST_PREFIX = False


def resolve_fast_prefix(setting) -> bool:
    """Resolve a fast-prefix setting to a trace-time bool.

    ``None`` -> module default; ``"auto"`` -> on for TPU backends (the
    one-shot forms trade O(N^2) FLOPs for sequential kernel depth, a win
    only where the program is latency-bound); ``"on"``/``"off"``/bool ->
    as given."""
    if setting is None:
        return bool(FAST_PREFIX)
    if isinstance(setting, bool):
        return setting
    if setting == "auto":
        return jax.default_backend() == "tpu"
    if setting in ("on", "off"):
        return setting == "on"
    raise ValueError(f"bad fast_prefix setting: {setting!r}")


def resolve_extract_impl(setting) -> str:
    """Trace-time resolution of the extraction implementation switch:
    "auto" -> the one-launch Pallas kernel on TPU (the per-frame program
    is launch-latency-bound), the XLA chain elsewhere."""
    if setting == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    if setting in ("pallas", "xla"):
        return setting
    raise ValueError(f"bad extract_impl setting: {setting!r}")


def _cumsum(x, axis=0, fast=False):
    return fastscan.cumsum_tri(x, axis) if fast else jnp.cumsum(x, axis)


def _packed_prefix_max(packed, fast=False):
    if fast:
        return fastscan.prefix_max(packed)
    return jax.lax.associative_scan(jnp.maximum, packed, axis=0)


class ScanFeatures(NamedTuple):
    """Fixed-capacity equivalent of the reference ``scan`` object
    (laser_type.h): lines + corners extracted from one laser sweep."""

    p1: jnp.ndarray  # (L,3) line start points (laser frame, z=0)
    p2: jnp.ndarray  # (L,3) line end points
    line_valid: jnp.ndarray  # (L,) bool
    corners: jnp.ndarray  # (C,3)
    corner_valid: jnp.ndarray  # (C,) bool

    @property
    def n_lines(self):
        return jnp.sum(self.line_valid.astype(jnp.int32))

    @property
    def n_corners(self):
        return jnp.sum(self.corner_valid.astype(jnp.int32))


def _compact(valid, cap, *arrays, fast=False):
    """Take the first ``cap`` valid rows (scan order) of each array.

    rank-one-hot MXU matmul instead of top_k (round 4): ``lax.top_k``
    lowers to a log^2-depth sorting network on TPU — pure sequential
    latency for what is just a stable compaction.  rank = exclusive
    prefix count of valid rows; the (cap, N) one-hot ``rank == l`` picks
    winner rows with one matmul.  (The round-2 scatter form was worse
    still — TPU scatters serialize.)"""
    N = valid.shape[0]
    vf = valid.astype(jnp.float32)
    rank_inc = (
        fastscan.cumsum_tri(vf[:, None], 0)[:, 0] if fast else jnp.cumsum(vf)
    )
    rank = (rank_inc - vf).astype(jnp.int32)  # exclusive rank among valid
    n_valid = rank_inc[-1].astype(jnp.int32)
    lane = jnp.arange(cap, dtype=jnp.int32)
    out_valid = lane < n_valid
    if not arrays:
        return (out_valid,)
    # winner rows via ONE one-hot matmul over the concatenated payload
    # (row gathers with data-dependent indices serialize on TPU)
    cols = [a.reshape(N, -1) for a in arrays]
    tbl = jnp.concatenate(cols, 1).astype(jnp.float32)  # (N, sum widths)
    oh = (
        (rank[None, :] == lane[:, None]) & valid[None, :]
    ).astype(jnp.float32)  # (cap, N)
    g = oh @ tbl
    outs = []
    o = 0
    for a, c in zip(arrays, cols):
        w = c.shape[1]
        outs.append(g[:, o : o + w].astype(a.dtype).reshape((cap,) + a.shape[1:]))
        o += w
    return (out_valid,) + tuple(outs)


def extract_features(
    points,
    valid,
    *,
    continuous_threshold: float,
    min_len: float,
    max_dis: float,
    tolerance_angle_rad: float,
    resolution: float,
    max_lines: int,
    max_corners: int,
    step: int = 3,
    fast_prefix=None,
) -> ScanFeatures:
    """points: (N,3) ordered scan points (z ignored); valid: (N,) bool."""
    fast = resolve_fast_prefix(fast_prefix)
    N = points.shape[0]
    dtype = points.dtype
    xy = points[:, :2]
    idx = jnp.arange(N, dtype=jnp.int32)

    # --- 1. segmentation ------------------------------------------------
    gap = jnp.linalg.norm(xy[1:] - xy[:-1], axis=-1)
    cont = jnp.concatenate(
        [
            jnp.zeros(1, bool),
            (gap <= continuous_threshold) & valid[1:] & valid[:-1],
        ]
    )
    # one fused prefix pass: [seg-break count | point moments].  f32 counts
    # are exact below 2^24; every log-depth scan pass on TPU costs ~10-20
    # sequential kernels, so fusing independent scans matters more than
    # dtype purity (measured ~0.1 ms/frame per scan saved).
    # Moments are computed about the scan CENTROID: the TLS covariance is
    # a difference of large prefix sums (sum x^2 - mean^2), and on
    # multi-meter coordinates the f32 cancellation noise rivals the span
    # variance itself (mm-scale endpoint error at 1080 beams, round 5);
    # centering is translation-equivariant and removes it.
    m = valid.astype(dtype)[:, None]
    n_all = jnp.maximum(jnp.sum(m), 1.0)
    ref_c = jnp.sum(xy * m, axis=0) / n_all  # (2,)
    xyc = xy - ref_c[None, :]
    x = xyc[:, 0:1] * m
    y = xyc[:, 1:2] * m
    cols = jnp.concatenate(
        [jnp.logical_not(cont).astype(dtype)[:, None], x, y, x * x, x * y, y * y, m],
        axis=1,
    )
    cs7 = _cumsum(cols, 0, fast=fast)
    seg_id = cs7[:, 0].astype(jnp.int32)
    cs = jnp.concatenate([jnp.zeros((1, 6), dtype), cs7[:, 1:7]], 0)
    # per-point segment bounds WITHOUT segment_min/max scatters (TPU
    # scatters serialize): seg_start = last segment-start at or before i
    # (fwd cummax), seg_end = next segment-start after i, minus one (rev
    # cummin) — one packed scan for both directions
    start_flag = jnp.logical_not(cont)  # first point of each segment
    packed0 = jnp.stack(
        [
            jnp.where(start_flag, idx, -1),
            -jnp.where(start_flag, idx, 2 * N)[::-1],
        ],
        -1,
    )
    pm0 = _packed_prefix_max(packed0, fast=fast)
    seg_start = pm0[:, 0]
    next_start = -pm0[::-1, 1]  # inclusive rev-min of start indices
    next_start = jnp.concatenate([next_start[1:], jnp.full((1,), N, jnp.int32)])
    seg_end = jnp.minimum(next_start - 1, N - 1)

    # --- 2. corner response (clac_cos over a clamped ±step window) -------
    # windowed SELECT over static shifts instead of xy[j_idx] gathers:
    # the clamped window offset is in [0, step], so each neighbor point
    # is one of step+1 statically shifted arrays (TPU row gathers with
    # data-dependent indices serialize — removing them was worth ~25%
    # of the whole frame, round 3)
    j_idx = jnp.maximum(idx - step, seg_start)
    k_idx = jnp.minimum(idx + step, seg_end)
    dj = idx - j_idx  # (N,) in 0..step
    dk = k_idx - idx
    xp = jnp.pad(xy, ((step, step), (0, 0)))
    pj = jnp.zeros_like(xy)
    pk = jnp.zeros_like(xy)
    for d in range(step + 1):
        sh_m = jax.lax.dynamic_slice_in_dim(xp, step - d, N)  # xy[i-d]
        sh_p = jax.lax.dynamic_slice_in_dim(xp, step + d, N)  # xy[i+d]
        pj = jnp.where((dj == d)[:, None], sh_m, pj)
        pk = jnp.where((dk == d)[:, None], sh_p, pk)
    v1 = pj - xy
    v2 = pk - xy
    n1 = jnp.linalg.norm(v1, axis=-1)
    n2 = jnp.linalg.norm(v2, axis=-1)
    resp = jnp.sum(v1 * v2, -1) / jnp.maximum(n1 * n2, _EPS)
    interior = (idx > seg_start) & (idx < seg_end) & valid
    resp = jnp.where(interior & (n1 > _EPS) & (n2 > _EPS), resp, -1.0)

    # --- 3. strict NMS within ±step (same segment, interior only) --------
    # static padded slices instead of clipped gathers: a gather of (N,)
    # with data-dependent indices serializes on TPU; shifts are views
    resp_vote = jnp.where(interior, resp, -_BIG)  # only interior votes
    rp = jnp.pad(resp_vote, (step, step), constant_values=-_BIG)
    sp = jnp.pad(seg_id, (step, step), constant_values=-1)
    neigh_max = jnp.full((N,), -_BIG, resp.dtype)
    for d in range(1, step + 1):
        for sgn in (-1, 1):
            off = step + sgn * d
            r_sh = jax.lax.dynamic_slice_in_dim(rp, off, N)
            s_sh = jax.lax.dynamic_slice_in_dim(sp, off, N)
            neigh_max = jnp.maximum(
                neigh_max, jnp.where(s_sh == seg_id, r_sh, -_BIG)
            )
    is_max = interior & (resp > neigh_max)

    # breakpoints: segment starts/ends + NMS maxima
    is_bp = is_max | ((idx == seg_start) | (idx == seg_end)) & valid

    # --- 3b. merge near-collinear joints --------------------------------
    # previous / next breakpoint index for every point (within segment).
    # Both directions in ONE packed scan: reverse-min(b) equals the
    # negated forward-cummax of -b reversed.
    packed = jnp.stack(
        [jnp.where(is_bp, idx, -1), -jnp.where(is_bp, idx, N + 1)[::-1]], -1
    )
    pm = _packed_prefix_max(packed, fast=fast)
    prev_bp = pm[:, 0]
    next_bp = -pm[::-1, 1]

    # for a bp at i: prev bp strictly before, next bp strictly after
    # (shift-by-one as concatenation, not a clipped gather)
    prev_of = jnp.concatenate([jnp.full((1,), -1, jnp.int32), prev_bp[:-1]])
    next_of = jnp.concatenate([next_bp[1:], jnp.full((1,), N + 1, jnp.int32)])
    # breakpoint positions can be any distance away -> gather needed; do
    # it as ONE-HOT MXU MATMULS over a [xy | seg] table (no serialized
    # row gathers).  Out-of-range indices hit no one-hot column and
    # yield zero rows; seg ids start at 1 so a zero row never matches.
    seg_f = seg_id.astype(dtype)
    tbl = jnp.concatenate([xy, seg_f[:, None]], 1)  # (N,3)

    def oh_rows(ix):
        oh = (ix[:, None] == idx[None, :]).astype(dtype)  # (N,N)
        return oh @ tbl

    gp = oh_rows(prev_of)
    gn_ = oh_rows(next_of)
    pprev = gp[:, :2]
    pnext = gn_[:, :2]
    has_prev = (prev_of >= 0) & (gp[:, 2] == seg_f)
    has_next = (next_of <= N - 1) & (gn_[:, 2] == seg_f)
    u1 = pprev - xy
    u2 = pnext - xy
    joint_cos = jnp.sum(u1 * u2, -1) / jnp.maximum(
        jnp.linalg.norm(u1, axis=-1) * jnp.linalg.norm(u2, axis=-1), _EPS
    )
    joint_angle = jnp.arccos(jnp.clip(joint_cos, -1.0, 1.0))
    # an interior bp survives only if the joint bends enough
    survives = jnp.abs(joint_angle) < tolerance_angle_rad
    is_endpoint = (idx == seg_start) | (idx == seg_end)
    keep_bp = is_bp & (is_endpoint | survives | ~(has_prev & has_next))

    # --- 4. candidate spans between consecutive kept breakpoints ---------
    # same packed-scan trick: [prev kept (fwd max) | next kept (rev min)]
    packed2 = jnp.stack(
        [jnp.where(keep_bp, idx, -1), -jnp.where(keep_bp, idx, N + 1)[::-1]], -1
    )
    pm2 = _packed_prefix_max(packed2, fast=fast)
    prev_kept = pm2[:, 0]
    kept_next = -pm2[::-1, 1]
    span_end = jnp.concatenate(
        [kept_next[1:], jnp.full((1,), N + 1, jnp.int32)]
    )
    cand_valid = keep_bp & (span_end <= N - 1) & (span_end - idx >= 2)
    i1 = idx
    i2 = jnp.clip(span_end, 0, N - 1)

    # every per-span quantity indexed by i2 comes out of ONE one-hot
    # matmul over a column-shifted table: row r = [cs[r] | xy[r-1] |
    # seg[r-1] | gap_full[r-1]], gathered at r = i2+1 (cs needs i2+1,
    # the rest need i2)
    gap_full = jnp.concatenate([jnp.zeros(1, dtype), gap])  # |p[i]-p[i-1]|
    spantbl = jnp.concatenate(
        [
            cs,  # (N+1,6) leading-zero-row prefix sums
            jnp.concatenate([jnp.zeros((1, 2), dtype), xyc]),
            jnp.concatenate([jnp.full((1,), -1.0, dtype), seg_f])[:, None],
            jnp.concatenate([jnp.zeros((1,), dtype), gap_full])[:, None],
        ],
        1,
    )  # (N+1, 10)
    oh2 = (
        (i2 + 1)[:, None] == jnp.arange(N + 1, dtype=jnp.int32)[None, :]
    ).astype(dtype)  # (N, N+1)
    g2 = oh2 @ spantbl  # (N,10)
    cand_valid = cand_valid & (g2[:, 8] == seg_f) & valid

    # range queries over the prefix-summed moments computed in step 1
    S = g2[:, :6] - cs[:N]  # cs[i2+1] - cs[i1], i1 = idx (static rows)
    n = jnp.maximum(S[:, 5], 1.0)
    mx, my = S[:, 0] / n, S[:, 1] / n
    cxx = S[:, 2] / n - mx * mx
    cxy = S[:, 3] / n - mx * my
    cyy = S[:, 4] / n - my * my
    # minor eigenvector of [[cxx,cxy],[cxy,cyy]] = line normal (TLS fit)
    tr = cxx + cyy
    det = cxx * cyy - cxy * cxy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4 - det, 0.0))
    lam_min = tr / 2 - disc
    # eigenvector for lam_min: rows of (C - lam_min I) span the normal's
    # orthogonal complement; use the better-conditioned row
    ex1 = jnp.stack([cxy, lam_min - cxx], -1)
    ex2 = jnp.stack([lam_min - cyy, cxy], -1)
    use1 = jnp.linalg.norm(ex1, axis=-1) > jnp.linalg.norm(ex2, axis=-1)
    nvec = jnp.where(use1[:, None], ex1, ex2)
    nnorm = jnp.maximum(jnp.linalg.norm(nvec, axis=-1, keepdims=True), _EPS)
    nvec = nvec / nnorm
    cc = -(nvec[:, 0] * mx + nvec[:, 1] * my)  # ax+by+c=0 through centroid

    # endpoints = projections of the span's first/last points onto the line
    def project(pt, nv, c):
        d = jnp.sum(pt * nv, -1) + c
        return pt - d[:, None] * nv

    # projections in centered coordinates, shifted back afterwards
    e1 = project(xyc, nvec, cc) + ref_c[None, :]  # xy[i1] with i1 = idx
    e2 = project(g2[:, 6:8], nvec, cc) + ref_c[None, :]  # xy[i2] (table)
    length = jnp.linalg.norm(e2 - e1, axis=-1)

    # max point-to-line distance over each candidate span, as ONE dense
    # (span x point) masked row-max — no segment_max scatter (TPU
    # scatters serialize; extraction ablation round 2).  Rows without a
    # valid candidate produce garbage that line_ok masks away.
    # points of span [i1, i2): the shared breakpoint i2 belongs to the
    # NEXT span (prev_kept grouping semantics of the scatter form)
    in_span = (
        (idx[None, :] >= i1[:, None])
        & (idx[None, :] < i2[:, None])
        & valid[None, :]
    )
    d_all = jnp.abs(
        jnp.einsum("nd,md->mn", xyc, nvec) + cc[:, None]
    )  # (span m, point n) — one MXU matmul
    max_d = jnp.max(jnp.where(in_span, d_all, 0.0), axis=1)

    line_ok = (
        cand_valid
        & (max_d <= max_dis)
        & (length >= min_len)
        & jnp.isfinite(length)
    )

    # beam spacing at the span ends: corners live where two segments meet,
    # but each segment's last return sits up to one beam spacing short of
    # the physical corner, so the corner gate must scale with it.
    # gap_full[i1+1] is a static shift; gap_full[i2] came from the table.
    gf_next = jnp.concatenate([gap_full[1:], gap_full[-1:]])
    end_gap = jnp.maximum(gf_next, g2[:, 9])

    lv, lp1, lp2, lgap = _compact(line_ok, max_lines, e1, e2, end_gap, fast=fast)
    z = jnp.zeros((max_lines, 1), dtype)
    lp1 = jnp.concatenate([lp1, z], 1)
    lp2 = jnp.concatenate([lp2, z], 1)

    # --- 5. corners -------------------------------------------------------
    corners, corner_valid = _find_corners(
        lp1[:, :2], lp2[:, :2], lv, resolution, max_corners, dtype, end_gap=lgap
    )
    cz = jnp.zeros((max_corners, 1), dtype)
    corners = jnp.concatenate([corners, cz], 1)

    return ScanFeatures(
        p1=lp1, p2=lp2, line_valid=lv, corners=corners, corner_valid=corner_valid
    )


def extract_features_pallas(
    points,
    valid,
    *,
    continuous_threshold: float,
    min_len: float,
    max_dis: float,
    tolerance_angle_rad: float,
    resolution: float,
    max_lines: int,
    max_corners: int,
    interpret: bool = False,
) -> ScanFeatures:
    """extract_features with the line stages as ONE Pallas launch
    (ops/extract.extract_lines_pallas); corner pairing runs on the
    compacted (max_lines,)-sized outputs.  Parity pinned in
    tests/test_extract_pallas.py."""
    from liwslam.ops import extract as ext

    dtype = points.dtype
    e1, e2, lv, lgap = ext.extract_lines_pallas(
        points,
        valid,
        continuous_threshold=continuous_threshold,
        min_len=min_len,
        max_dis=max_dis,
        tolerance_angle_rad=tolerance_angle_rad,
        max_lines=max_lines,
        interpret=interpret,
    )
    z = jnp.zeros((max_lines, 1), dtype)
    lp1 = jnp.concatenate([e1.astype(dtype), z], 1)
    lp2 = jnp.concatenate([e2.astype(dtype), z], 1)
    corners, corner_valid = _find_corners(
        lp1[:, :2], lp2[:, :2], lv, resolution, max_corners, dtype,
        end_gap=lgap.astype(dtype),
    )
    cz = jnp.zeros((max_corners, 1), dtype)
    corners = jnp.concatenate([corners, cz], 1)
    return ScanFeatures(
        p1=lp1, p2=lp2, line_valid=lv, corners=corners,
        corner_valid=corner_valid,
    )


def _point_segment_dist(p, a, b):
    """Distance from points p (...,2) to segments (a,b) (...,2)."""
    ab = b - a
    t = jnp.sum((p - a) * ab, -1) / jnp.maximum(jnp.sum(ab * ab, -1), _EPS)
    t = jnp.clip(t, 0.0, 1.0)
    proj = a + t[..., None] * ab
    return jnp.linalg.norm(p - proj, axis=-1)


def _find_corners(p1, p2, valid, resolution, max_corners, dtype, end_gap=None):
    """Intersections of line pairs meeting at 30-150 deg, both segments
    passing near the intersection (scan::add_line corner logic).

    ``end_gap`` (L,): beam spacing at each line's ends; the nearness gate
    adapts to it so sparse long-range scans still yield corners (the
    reference's fixed shared-cell test implicitly assumes dense beams)."""
    L = p1.shape[0]
    d = p2 - p1
    length = jnp.linalg.norm(d, axis=-1)
    dirs = d / jnp.maximum(length, _EPS)[:, None]

    cosang = jnp.abs(dirs @ dirs.T)  # (L,L)
    ang = jnp.arccos(jnp.clip(dirs @ dirs.T, -1.0, 1.0))
    ang_ok = (ang > jnp.deg2rad(30.0)) & (ang < jnp.deg2rad(150.0))
    del cosang

    # infinite-line intersection via 2x2 solve: n_i . x = n_i . p_i
    nvec = jnp.stack([-dirs[:, 1], dirs[:, 0]], -1)  # normals
    bvals = jnp.sum(nvec * p1, -1)
    A00 = nvec[:, None, 0]
    A01 = nvec[:, None, 1]
    A10 = nvec[None, :, 0]
    A11 = nvec[None, :, 1]
    detA = A00 * A11 - A01 * A10
    b0 = bvals[:, None] * jnp.ones((1, L), dtype)
    b1 = bvals[None, :] * jnp.ones((L, 1), dtype)
    safe_det = jnp.where(jnp.abs(detA) < _EPS, 1.0, detA)
    xi = (b0 * A11 - b1 * A01) / safe_det
    yi = (A00 * b1 - A10 * b0) / safe_det
    X = jnp.stack([xi, yi], -1)  # (L,L,2)

    if end_gap is None:
        end_gap = jnp.zeros(L, dtype)
    gate = jnp.maximum(
        2.0 * resolution,
        1.6 * jnp.maximum(end_gap[:, None], end_gap[None, :]),
    )
    near_i = _point_segment_dist(X, p1[:, None, :], p2[:, None, :]) <= gate
    near_j = _point_segment_dist(X, p1[None, :, :], p2[None, :, :]) <= gate
    long_ok = (length[:, None] > 0.1) & (length[None, :] > 0.1)
    pair_ok = (
        ang_ok
        & near_i
        & near_j
        & long_ok
        & valid[:, None]
        & valid[None, :]
        & (jnp.abs(detA) > _EPS)
        & (jnp.arange(L)[:, None] < jnp.arange(L)[None, :])
    )
    flat_ok = pair_ok.reshape(-1)
    flat_X = X.reshape(-1, 2)
    cv, cpts = _compact(flat_ok, max_corners, flat_X)
    return cpts, cv


def deskew(points, times_rel, linear, angular):
    """Motion de-skew (sensor::laser::correct, sensor.h:51-94): rotate each
    ray by its per-point time offset under the current twist estimate.

    points: (N,3); times_rel: (N,) seconds relative to scan stamp;
    linear/angular: (3,) laser-frame twist.

    Rodrigues form directly on the points — same math as the previous
    per-point SE3 build (make_tf + tf_apply) with a third of the kernels:
    no (N,4,4) materialization, no batched 4x4 matvecs (round 3)."""
    dt = times_rel[:, None]  # (N,1)
    w = dt * angular[None, :]  # (N,3) rotation vectors
    v = dt * linear[None, :]
    th2 = jnp.sum(w * w, -1, keepdims=True)
    th = jnp.sqrt(jnp.maximum(th2, 1e-24))
    k = w / th
    c = jnp.cos(th)
    s = jnp.sin(th)
    kxp = jnp.cross(k, points)
    kdp = jnp.sum(k * points, -1, keepdims=True)
    rot = points * c + kxp * s + k * kdp * (1.0 - c)
    # tiny angles: first order (matches exp_so3's small-angle guard)
    rot = jnp.where(th2 < 1e-12, points + jnp.cross(w, points), rot)
    return rot + v
