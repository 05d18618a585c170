"""Pallas TPU kernel: the whole laser line extraction in ONE launch.

The XLA extraction (frontend/scan.extract_features — the reference's
``spawn_scan``, laser_manager.cpp:350-422) is the single biggest block of
the per-frame program (~0.3 ms of the 0.72 ms frame, r3/r4 profiles): it
chains several prefix scans, windowed selects, and five (N,N)-sized
one-hot/mask matmuls, each of which round-trips an ~5 MB temporary
through HBM and costs a kernel launch.  The per-frame program is
LATENCY-bound (CLAUDE.md TPU rules), so the win is collapsing the launch
chain, not FLOPs.

This kernel runs every stage in VMEM in one launch:

- logical 1-D per-point arrays live as LANE vectors (rows of (R, N)
  blocks, N a multiple of 128),
- prefix sums / maxes are log-depth roll+select doublings (11 steps at
  N=1152) — multi-column scans share one roll per step,
- the XLA path's "gather xy at the previous/next breakpoint" one-hot
  matmuls become PAYLOAD-CARRYING scans: the (key, payload) argmax
  doubling propagates the breakpoint's coordinates/prefix-sums directly,
  so no (N,N) one-hot ever exists,
- the per-span max point-to-line distance (a dense (N,N) masked matmul
  in XLA) becomes a span-segmented suffix-max doubling (spans are
  contiguous, so a same-span-id guard on each doubling step is exact),
- line compaction is a masked-reduction rank select into (L,) rows.

Corner pairing (frontend/scan._find_corners) stays outside on the
compacted (L,)-sized outputs: it is O(max_lines^2) = (64, 64) work.

Parity with extract_features is pinned by tests/test_extract_pallas.py
(interpret mode on CPU); selection ties can differ only on degenerate
equal-response neighbors, which real scans do not produce.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9
_EPS = 1e-8
_STEP = 3  # corner-response half window (laser_manager.cpp:375-408)


def _round_up(n, m):
    return -(-n // m) * m


def _lanes(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _fwd_cumsum(x, N):
    """Inclusive prefix sum along lanes (all rows independently)."""
    lanes = _lanes(x.shape)
    d = 1
    while d < N:
        x = x + jnp.where(lanes >= d, pltpu.roll(x, d, 1), 0.0)
        d *= 2
    return x


def _fwd_scan_payload(key, payload, N):
    """Inclusive forward argmax-carry: at lane i, (max key over [0, i],
    payload of that argmax).  Keys are distinct (-1 or the lane index)."""
    lanes_k = _lanes(key.shape)
    d = 1
    while d < N:
        k2 = pltpu.roll(key, d, 1)
        p2 = pltpu.roll(payload, d, 1)
        take = (lanes_k >= d) & (k2 > key)
        key = jnp.where(take, k2, key)
        payload = jnp.where(take, p2, payload)
        d *= 2
    return key, payload


def _rev_scan_payload(key, payload, N):
    """Inclusive reverse argmax-carry: at lane i, max key over [i, N-1]."""
    lanes_k = _lanes(key.shape)
    d = 1
    while d < N:
        k2 = pltpu.roll(key, N - d, 1)
        p2 = pltpu.roll(payload, N - d, 1)
        take = (lanes_k < N - d) & (k2 > key)
        key = jnp.where(take, k2, key)
        payload = jnp.where(take, p2, payload)
        d *= 2
    return key, payload


def _shift_prev(x, N, fill):
    """out[i] = x[i-1]; out[0] = fill."""
    lanes = _lanes(x.shape)
    return jnp.where(lanes >= 1, pltpu.roll(x, 1, 1), fill)


def _shift_next(x, N, fill):
    """out[i] = x[i+1]; out[N-1] = fill."""
    lanes = _lanes(x.shape)
    return jnp.where(lanes <= N - 2, pltpu.roll(x, N - 1, 1), fill)


def _kernel(
    sc_ref,  # SMEM (8,) scalars: [cont_thr, min_len, max_dis, tol_angle,
    #                              n_real, 0, 0, 0]
    pts_ref,  # VMEM (8, N): rows [x, y, valid, 0...]
    out_ref,  # VMEM (8, L): rows [valid, x1, y1, x2, y2, end_gap, 0, 0]
    *,
    N: int,
    L: int,
):
    f32 = jnp.float32
    x = pts_ref[0:1, :]
    y = pts_ref[1:2, :]
    valid = pts_ref[2:3, :] > 0.5
    lanes = _lanes(x.shape)
    lanes_f = lanes.astype(f32)
    n_real = sc_ref[4]
    in_n = lanes < n_real  # padded tail lanes are dead
    valid = valid & in_n

    cont_thr = sc_ref[0]
    min_len = sc_ref[1]
    max_dis = sc_ref[2]
    tol_angle = sc_ref[3]  # cos(tolerance_angle_rad), see `survives`

    # --- 1. segmentation -------------------------------------------------
    xm1 = _shift_prev(x, N, 0.0)
    ym1 = _shift_prev(y, N, 0.0)
    gapx = x - xm1
    gapy = y - ym1
    gap = jnp.sqrt(gapx * gapx + gapy * gapy)  # (1,N); lane 0 garbage
    vprev = _shift_prev(valid.astype(f32), N, 0.0) > 0.5
    cont = (lanes >= 1) & (gap <= cont_thr) & valid & vprev
    start_flag = jnp.logical_not(cont)
    gap_full = jnp.where(lanes >= 1, gap, 0.0)  # |p[i]-p[i-1]|, [0]=0

    # fused 7-column inclusive prefix sums: [seg count | x y xx xy yy m]
    # — moments about the scan centroid (matches frontend/scan: the TLS
    # covariance cancellation in f32 is mm-scale otherwise)
    m = valid.astype(f32)
    n_all = jnp.maximum(jnp.sum(m), 1.0)
    refx = jnp.sum(x * m) / n_all
    refy = jnp.sum(y * m) / n_all
    xc = x - refx
    yc = y - refy
    xv = xc * m
    yv = yc * m
    cols = jnp.concatenate(
        [
            start_flag.astype(f32),
            xv,
            yv,
            xv * xc,
            xv * yc,
            yv * yc,
            m,
            jnp.zeros_like(m),
        ],
        axis=0,
    )  # (8,N)
    incl = _fwd_cumsum(cols, N)
    seg_f = incl[0:1, :]  # segment id as f32 count (exact below 2^24)
    incl6 = incl[1:7, :]  # inclusive moment sums
    excl6 = incl6 - cols[1:7, :]  # exclusive prefix at i

    # --- seg_start / seg_end (key scans, no payload needed) --------------
    kstart = jnp.where(start_flag, lanes_f, -1.0)
    seg_start_f, _ = _fwd_scan_payload(kstart, kstart, N)
    # next segment start strictly after i: reverse-min == -revmax(-key)
    knext = jnp.where(start_flag, -lanes_f, -f32(2 * N))
    nstart_neg, _ = _rev_scan_payload(knext, knext, N)
    next_start_f = -_shift_next(nstart_neg, N, -f32(N))
    seg_end_f = jnp.minimum(next_start_f - 1.0, f32(N - 1))
    # clamp to the real tail: points beyond n_real are invalid anyway
    seg_end_f = jnp.minimum(seg_end_f, n_real - 1.0)

    # --- 2. corner response over the clamped +-STEP window ---------------
    dj = lanes_f - jnp.maximum(lanes_f - _STEP, seg_start_f)  # in [0,3]
    dk = jnp.minimum(lanes_f + _STEP, seg_end_f) - lanes_f
    pjx = jnp.zeros_like(x)
    pjy = jnp.zeros_like(x)
    pkx = jnp.zeros_like(x)
    pky = jnp.zeros_like(x)
    for d in range(_STEP + 1):
        xr = pltpu.roll(x, d, 1) if d else x  # x[i-d]
        yr = pltpu.roll(y, d, 1) if d else y
        xs = pltpu.roll(x, N - d, 1) if d else x  # x[i+d]
        ys = pltpu.roll(y, N - d, 1) if d else y
        df = f32(d)
        pjx = jnp.where(dj == df, xr, pjx)
        pjy = jnp.where(dj == df, yr, pjy)
        pkx = jnp.where(dk == df, xs, pkx)
        pky = jnp.where(dk == df, ys, pky)
    v1x = pjx - x
    v1y = pjy - y
    v2x = pkx - x
    v2y = pky - y
    nrm1 = jnp.sqrt(v1x * v1x + v1y * v1y)
    nrm2 = jnp.sqrt(v2x * v2x + v2y * v2y)
    resp = (v1x * v2x + v1y * v2y) / jnp.maximum(nrm1 * nrm2, _EPS)
    interior = (lanes_f > seg_start_f) & (lanes_f < seg_end_f) & valid
    resp = jnp.where(interior & (nrm1 > _EPS) & (nrm2 > _EPS), resp, -1.0)

    # --- 3. strict NMS within +-STEP (same segment, interior votes) ------
    resp_vote = jnp.where(interior, resp, -_BIG)
    neigh_max = jnp.full_like(resp, -_BIG)
    for d in range(1, _STEP + 1):
        for shift, lane_ok in (
            (d, lanes >= d),  # neighbor i-d
            (N - d, lanes <= N - 1 - d),  # neighbor i+d
        ):
            r_sh = pltpu.roll(resp_vote, shift, 1)
            s_sh = pltpu.roll(seg_f, shift, 1)
            neigh_max = jnp.maximum(
                neigh_max,
                jnp.where(lane_ok & (s_sh == seg_f), r_sh, -_BIG),
            )
    is_max = interior & (resp > neigh_max)
    is_endpoint = (lanes_f == seg_start_f) | (lanes_f == seg_end_f)
    is_bp = is_max | (is_endpoint & valid)

    # --- 3b. merge near-collinear joints (payload scans for prev/next bp)
    kb = jnp.where(is_bp, lanes_f, -1.0)
    pay_f = jnp.concatenate([x, y, seg_f, jnp.zeros_like(x)], 0)  # (4,N)
    kf_in, pf_in = _fwd_scan_payload(kb, pay_f, N)
    prev_key = _shift_prev(kf_in, N, -1.0)
    prev_pay = _shift_prev(pf_in, N, 0.0)
    kbr = jnp.where(is_bp, -lanes_f, -f32(2 * N))
    kr_in, pr_in = _rev_scan_payload(kbr, pay_f, N)
    next_key = -_shift_next(kr_in, N, f32(2 * N))  # lane of next bp
    next_pay = _shift_next(pr_in, N, 0.0)
    has_prev = (prev_key >= 0.0) & (prev_pay[2:3, :] == seg_f)
    has_next = (next_key <= f32(N - 1)) & (next_pay[2:3, :] == seg_f)
    u1x = prev_pay[0:1, :] - x
    u1y = prev_pay[1:2, :] - y
    u2x = next_pay[0:1, :] - x
    u2y = next_pay[1:2, :] - y
    jn1 = jnp.sqrt(u1x * u1x + u1y * u1y)
    jn2 = jnp.sqrt(u2x * u2x + u2y * u2y)
    joint_cos = (u1x * u2x + u1y * u2y) / jnp.maximum(jn1 * jn2, _EPS)
    # angle < tol  <=>  cos(angle) > cos(tol) on [0, pi] — avoids an
    # in-kernel arccos (sc_ref[3] carries cos(tolerance_angle_rad))
    survives = jnp.clip(joint_cos, -1.0, 1.0) > tol_angle
    keep_bp = is_bp & (
        is_endpoint | survives | jnp.logical_not(has_prev & has_next)
    )

    # --- 4. spans between consecutive kept breakpoints -------------------
    # reverse payload scan brings (incl6[j], x[j], y[j], seg[j], gap[j])
    # of the NEXT kept bp j back to every lane
    kk = jnp.where(keep_bp, -lanes_f, -f32(2 * N))
    pay_sp = jnp.concatenate(
        [incl6, xc, yc, seg_f, gap_full, jnp.zeros_like(x), jnp.zeros_like(x)],
        0,
    )  # (12,N) — endpoint coords centered (projections happen centered)
    kr2, pr2 = _rev_scan_payload(kk, pay_sp, N)
    i2_f = -_shift_next(kr2, N, f32(2 * N))  # lane of next kept bp (> i)
    sp = _shift_next(pr2, N, 0.0)
    cs_i2 = sp[0:6, :]  # incl prefix at i2 == cs[i2+1]
    x_i2 = sp[6:7, :]
    y_i2 = sp[7:8, :]
    seg_i2 = sp[8:9, :]
    gap_i2 = sp[9:10, :]
    cand_valid = (
        keep_bp
        & (i2_f <= f32(N - 1))
        & (i2_f - lanes_f >= 2.0)
        & (seg_i2 == seg_f)
        & valid
    )

    # --- TLS line fit from prefix moments --------------------------------
    S = cs_i2 - excl6  # (6,N): [sx sy sxx sxy syy n] over [i1, i2]
    n = jnp.maximum(S[5:6, :], 1.0)
    mx = S[0:1, :] / n
    my = S[1:2, :] / n
    cxx = S[2:3, :] / n - mx * mx
    cxy = S[3:4, :] / n - mx * my
    cyy = S[4:5, :] / n - my * my
    tr = cxx + cyy
    det = cxx * cyy - cxy * cxy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    lam_min = tr / 2.0 - disc
    e1xv = cxy
    e1yv = lam_min - cxx
    e2xv = lam_min - cyy
    e2yv = cxy
    use1 = e1xv * e1xv + e1yv * e1yv > e2xv * e2xv + e2yv * e2yv
    nx = jnp.where(use1, e1xv, e2xv)
    ny = jnp.where(use1, e1yv, e2yv)
    nn = jnp.maximum(jnp.sqrt(nx * nx + ny * ny), _EPS)
    nx = nx / nn
    ny = ny / nn
    cc = -(nx * mx + ny * my)

    d1 = xc * nx + yc * ny + cc
    e1x = xc - d1 * nx
    e1y = yc - d1 * ny
    d2 = x_i2 * nx + y_i2 * ny + cc
    e2x = x_i2 - d2 * nx
    e2y = y_i2 - d2 * ny
    lex = e2x - e1x
    ley = e2y - e1y
    length = jnp.sqrt(lex * lex + ley * ley)

    # --- per-span max point-to-line distance (segmented suffix max) ------
    # propagate each span's (nx, ny, cc) forward from its kept bp, then
    # suffix-max the per-point |distance| with a same-span guard (spans
    # are contiguous, so the guard makes the doubling exact)
    kfw = jnp.where(keep_bp, lanes_f, -1.0)
    pay_ln = jnp.concatenate([nx, ny, cc, jnp.zeros_like(x)], 0)
    span_id, pay_pt = _fwd_scan_payload(kfw, pay_ln, N)
    pd = jnp.abs(xc * pay_pt[0:1, :] + yc * pay_pt[1:2, :] + pay_pt[2:3, :])
    # XLA form: invalid points contribute 0 via where(in_span, d, 0)
    pd = jnp.where(valid & (span_id >= 0.0), pd, 0.0)
    # the shared breakpoint i2 belongs to the NEXT span -> it already has
    # span_id == i2 there (inclusive forward scan), matching [i1, i2)
    md = pd
    sid = span_id
    d = 1
    while d < N:
        md2 = pltpu.roll(md, N - d, 1)
        sid2 = pltpu.roll(sid, N - d, 1)
        ok = (lanes <= N - 1 - d) & (sid2 == sid)
        md = jnp.maximum(md, jnp.where(ok, md2, 0.0))
        d *= 2
    max_d = md  # at a kept bp i1: max over its span [i1, i2)

    line_ok = (
        cand_valid
        & (max_d <= max_dis)
        & (length >= min_len)
        & jnp.isfinite(length)
    )

    # beam spacing at the span ends (corner gate scaling)
    gf_next = jnp.where(
        lanes <= N - 2, pltpu.roll(gap_full, N - 1, 1), gap_full
    )
    end_gap = jnp.maximum(gf_next, gap_i2)

    # --- 5. compact the first L winners in scan order --------------------
    okf = line_ok.astype(f32)
    rank_incl = _fwd_cumsum(okf, N)
    rank = rank_incl - okf  # exclusive rank among winners
    payload_out = jnp.concatenate(
        [e1x + refx, e1y + refy, e2x + refx, e2y + refy, end_gap,
         jnp.zeros_like(x)], 0
    )  # (6,N) — endpoints back in absolute coordinates
    # (L, N) selection mask; L rows of reductions (L <= 128 keeps this
    # a single-tile broadcast compare)
    li = jax.lax.broadcasted_iota(jnp.int32, (L, N), 0).astype(f32)
    sel = (rank == li) & line_ok  # broadcast (1,N) -> (L,N)
    self32 = sel.astype(f32)
    outs = []
    for r in range(5):
        row = payload_out[r : r + 1, :]  # (1,N)
        outs.append(jnp.sum(self32 * row, axis=1)[None, :])  # (1,L)
    n_win = rank_incl[0:1, N - 1 : N]  # total winners
    lv = (
        jax.lax.broadcasted_iota(jnp.int32, (1, L), 1).astype(f32) < n_win
    ).astype(f32)
    out_ref[:] = jnp.concatenate(
        [lv] + outs + [jnp.zeros((2, L), f32)], axis=0
    )


@functools.partial(
    jax.jit, static_argnames=("max_lines", "interpret")
)
def extract_lines_pallas(
    points,  # (N,3) or (N,2)
    valid,  # (N,) bool
    *,
    continuous_threshold,
    min_len,
    max_dis,
    tolerance_angle_rad,
    max_lines: int,
    interpret: bool = False,
):
    """One-launch line extraction; returns (e1 (L,2), e2 (L,2),
    line_valid (L,), end_gap (L,)) matching frontend/scan.extract_features
    through its line-compaction stage (corner pairing happens outside on
    these compacted outputs)."""
    f32 = jnp.float32
    N0 = points.shape[0]
    N = _round_up(max(N0, 256), 128)
    L = max_lines
    xyv = jnp.zeros((8, N), f32)
    xyv = xyv.at[0, :N0].set(points[:, 0].astype(f32))
    xyv = xyv.at[1, :N0].set(points[:, 1].astype(f32))
    xyv = xyv.at[2, :N0].set(valid.astype(f32))
    sc = jnp.stack(
        [
            jnp.asarray(continuous_threshold, f32),
            jnp.asarray(min_len, f32),
            jnp.asarray(max_dis, f32),
            jnp.cos(jnp.asarray(tolerance_angle_rad, f32)),
            jnp.asarray(N0, f32),
            f32(0.0),
            f32(0.0),
            f32(0.0),
        ]
    )
    out = pl.pallas_call(
        functools.partial(_kernel, N=N, L=L),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, L), f32),
        interpret=interpret,
    )(sc, xyv)
    lv = out[0, :] > 0.5
    e1 = out[1:3, :].T
    e2 = out[3:5, :].T
    end_gap = out[5, :]
    zero = jnp.where(lv[:, None], 1.0, 0.0)
    return e1 * zero, e2 * zero, lv, end_gap * zero[:, 0]
