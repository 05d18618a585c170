"""Monocular feature tracking (the reference's dormant camera path).

Capability parity with ``camera_manager`` (``src/trajectory/
camera_manager.cpp:31-113``): Shi-Tomasi corner selection +
pyramidal Lucas-Kanade optical flow with per-track ids and
minimum-distance replenishment.  The reference ships this end-to-end but
disables it in every config (``config/params.yaml:6`` enable_camera:
false, readme QA #1); we keep the same default-off posture.

TPU-native implementation: both the corner response and LK are expressed
as fixed-shape jnp programs (separable gradients, patch gathers via
dynamic slicing under vmap) rather than OpenCV calls.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _grad(img):
    gx = (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1)) * 0.5
    gy = (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0)) * 0.5
    return gx, gy


def _band(n, r, dtype):
    """(n,n) band matrix B[i,j] = 1 for |i-j| <= r (clamped at borders —
    same sums as the cumsum form, which clamps the window to the image)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (jnp.abs(ii - jj) <= r).astype(dtype)


def _box(img, r):
    """Box filter with a (2r+1) square window.

    Two band-matrix matmuls (MXU) instead of the round-1 cumsum chains:
    at real camera resolution (640x480) the lane-axis cumsum is log-depth
    over 640 lanes and dominated select_features; B_y @ img @ B_x is two
    dense matmuls the MXU eats (~300 MFLOP at 480p)."""
    H, W = img.shape
    By = _band(H, r, img.dtype)
    Bx = _band(W, r, img.dtype)
    return By @ img @ Bx


def shi_tomasi_response(img, window=2):
    """min-eigenvalue corner response (goodFeaturesToTrack's score)."""
    gx, gy = _grad(img)
    Ixx = _box(gx * gx, window)
    Iyy = _box(gy * gy, window)
    Ixy = _box(gx * gy, window)
    tr = Ixx + Iyy
    det = Ixx * Iyy - Ixy * Ixy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4 - det, 0.0))
    return tr / 2 - disc  # lambda_min


def select_features(img, n_max, min_dis, existing_xy=None, existing_valid=None,
                    budget=None, cell_px=None):
    """Corner selection with minimum mutual distance and distance to
    existing tracks (camera_manager.cpp:93-113).

    TPU-native redesign (round 3): DENSE cell-grid non-max suppression
    instead of the reference's greedy strongest-first walk — the greedy
    form needed a ~224-step sequential lax.scan (~3 ms/frame on TPU).
    The image is tiled into cells of ``cell_px`` (>= min_dis); a cell's
    best response survives only if it beats every pixel of the 3x3 cell
    neighborhood, which guarantees any two survivors are > cell_px
    apart.  Survivors are ranked by response and the top ``budget``
    taken.  Deviation from the reference: selection is near-maximal NMS
    rather than greedy strongest-first — same min-distance guarantee,
    slightly different picks on crowded scenes.

    ``n_max`` is the static slot capacity; ``budget`` (optional, traced)
    caps how many are actually taken this call.  ``cell_px`` must be a
    static int when ``min_dis`` is traced (production passes it from
    CamStaticCfg)."""
    import numpy as np

    H, W = img.shape
    if cell_px is None:
        cell_px = max(1, int(np.ceil(float(min_dis))))
    cs = int(cell_px)
    resp = shi_tomasi_response(img)

    if existing_xy is None:
        existing_xy = jnp.zeros((0, 2), img.dtype)
        existing_valid = jnp.zeros(0, bool)
    if budget is None:
        budget = jnp.asarray(n_max, jnp.int32)

    # response gate scaled by intensity² (the Shi-Tomasi score is quadratic
    # in intensity) so 8-bit and [0,1]-normalized images behave alike
    resp_gate = 1e-4 * jnp.maximum(jnp.max(img), 1.0) ** 2

    Hc = -(-H // cs)
    Wc = -(-W // cs)
    big_neg = jnp.asarray(-3.4e38, resp.dtype)
    rp = jnp.full((Hc * cs, Wc * cs), big_neg, resp.dtype)
    rp = rp.at[:H, :W].set(resp)
    cells = rp.reshape(Hc, cs, Wc, cs)
    cell_max = jnp.max(cells, axis=(1, 3))  # (Hc,Wc)
    # per-cell argmax pixel (row-major within the cell)
    flat = cells.transpose(0, 2, 1, 3).reshape(Hc, Wc, cs * cs)
    amax = jnp.argmax(flat, axis=-1)
    wy = (amax // cs).astype(jnp.float32)
    wx = (amax % cs).astype(jnp.float32)
    cy = jnp.arange(Hc, dtype=jnp.float32)[:, None] * cs + wy
    cx = jnp.arange(Wc, dtype=jnp.float32)[None, :] * cs + wx
    # 3x3 cell-neighborhood max (pad with -inf)
    nb = jnp.pad(cell_max, 1, constant_values=big_neg)
    neigh = jnp.max(
        jnp.stack(
            [
                nb[1 + dy : 1 + dy + Hc, 1 + dx : 1 + dx + Wc]
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
                if not (dy == 0 and dx == 0)
            ]
        ),
        axis=0,
    )
    is_winner = (cell_max > neigh) & (cell_max > resp_gate)

    # distance to existing tracks (dense (Hc*Wc, T) matrix)
    cands = jnp.stack([cx.reshape(-1), cy.reshape(-1)], -1)  # (C,2)
    score = jnp.where(is_winner.reshape(-1), cell_max.reshape(-1), big_neg)
    if existing_xy.shape[0]:
        dd = jnp.linalg.norm(
            cands[:, None, :] - existing_xy[None, :, :], axis=-1
        )
        far = jnp.all(jnp.where(existing_valid[None, :], dd >= min_dis, True), axis=1)
        score = jnp.where(far, score, big_neg)

    k = min(n_max, score.shape[0])
    top_v, top_i = jax.lax.top_k(score, k)
    ok = (top_v > big_neg * 0.5) & (
        jnp.arange(k) < jnp.minimum(budget, jnp.asarray(n_max, jnp.int32))
    )
    out_xy = jnp.where(ok[:, None], cands[top_i], 0.0)
    if k < n_max:
        out_xy = jnp.concatenate(
            [out_xy, jnp.zeros((n_max - k, 2), img.dtype)]
        )
        ok = jnp.concatenate([ok, jnp.zeros(n_max - k, bool)])
    return out_xy, ok


def downsample2(img):
    """2x2 average-pool decimation (pyramid level step).

    ``lax.reduce_window`` with stride 2 — the earlier ``img[::2, ::2]``
    strided slices serialized on TPU at real camera resolution (measured
    r4: the 640x480 camera bench went 37 -> 500 fps when the pyramid
    level loop was removed; lane-axis stride-2 slicing was the cost)."""
    s = jax.lax.reduce_window(
        img, 0.0, jax.lax.add, (2, 2), (2, 2), "VALID"
    )
    return 0.25 * s


def build_pyramid(img, levels):
    """[img, half, quarter, ...] with ``levels`` entries."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(downsample2(pyr[-1]))
    return pyr


def _bilinear(img, xy):
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    H, W = img.shape
    x0c = jnp.clip(x0, 0, W - 2)
    y0c = jnp.clip(y0, 0, H - 2)
    fx = x - x0c
    fy = y - y0c
    v00 = img[y0c, x0c]
    v01 = img[y0c, x0c + 1]
    v10 = img[y0c + 1, x0c]
    v11 = img[y0c + 1, x0c + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _axis_weights(c, r, n):
    """(T, 2r+1, n) separable bilinear row/col selection weights for
    sampling positions c_t + [-r..r] along an axis of length n.

    Built from dense iota comparisons — NO gathers: the TPU lowers
    per-pixel gathers to serialized scalar loads, which made the original
    patch extraction ~19 ms/frame; as weights these become two MXU
    matmuls per patch set (measured round 3)."""
    c0 = jnp.floor(c)
    f = (c - c0)[:, None, None]  # (T,1,1)
    grid = c0[:, None] + jnp.arange(-r, r + 1, dtype=c.dtype)[None, :]  # (T,P)
    ax = jnp.arange(n, dtype=c.dtype)[None, None, :]  # (1,1,n)
    lo = (ax == grid[:, :, None]).astype(c.dtype)
    hi = (ax == grid[:, :, None] + 1.0).astype(c.dtype)
    return lo * (1.0 - f) + hi * f


def sample_patches(img, xy, r):
    """Bilinear (2r+1)x(2r+1) patches of ``img`` around centers ``xy``
    (T,2), returned flattened (T,(2r+1)^2) in the same order as the
    meshgrid offsets used by lk_track.  Out-of-bounds taps read 0 (the
    in-bounds verification gate in lk_track masks those tracks anyway).

    patch_t = Wy_t @ img @ Wx_t^T with separable one-hot interpolation
    weights — pure dense einsums on the MXU instead of per-pixel
    gathers."""
    H, W = img.shape
    Wy = _axis_weights(xy[:, 1], r, H)  # (T,P,H)
    Wx = _axis_weights(xy[:, 0], r, W)  # (T,P,W)
    rows = jnp.einsum("tph,hw->tpw", Wy, img)  # (T,P,W)
    patches = jnp.einsum("tpw,tqw->tpq", rows, Wx)  # (T,Py,Px)
    T = xy.shape[0]
    P = 2 * r + 1
    # meshgrid(indexing="xy") offsets enumerate x fastest: (dy, dx) -> dx
    # fastest = patches[t, dy, dx] flattened row-major matches
    return patches.reshape(T, P * P)


def lk_track(img0, img1, pts, valid, *, radius=7, iters=10, levels=3,
             max_err=0.1):
    """Pyramidal Lucas-Kanade: track pts (N,2) from img0 to img1.

    Returns (new_pts (N,2), ok (N,)).  Fixed shapes; ALL tracks advance
    together through each Newton step, with patch extraction as batched
    separable einsums (sample_patches) — the per-pixel-gather form cost
    ~19 ms/frame on TPU, this one ~0.5 ms (round 3).

    ``max_err`` is the mean-absolute-residual acceptance gate expressed as a
    fraction of the image's dynamic range (estimated as max(1, max(img0)) so
    both [0,1]-normalized and 8-bit [0,255] inputs verify identically)."""
    pyr0 = build_pyramid(img0, levels)
    pyr1 = build_pyramid(img1, levels)

    # intensity scale so the verification gate is invariant to 8-bit vs
    # [0,1]-normalized input (a raw 0.1 absolute threshold silently killed
    # every track on 8-bit images)
    err_gate = max_err * jnp.maximum(jnp.max(img0), 1.0)

    ex = jnp.asarray([1.0, 0.0], img0.dtype)
    ey = jnp.asarray([0.0, 1.0], img0.dtype)

    d = jnp.zeros_like(pts)
    for lvl in range(levels - 1, -1, -1):
        i0 = pyr0[lvl]
        i1 = pyr1[lvl]
        scale = 2.0**lvl
        base = pts / scale  # (T,2)
        patch0 = sample_patches(i0, base, radius)  # (T,PP)
        gx = 0.5 * (
            sample_patches(i0, base + ex, radius)
            - sample_patches(i0, base - ex, radius)
        )
        gy = 0.5 * (
            sample_patches(i0, base + ey, radius)
            - sample_patches(i0, base - ey, radius)
        )
        gxx = jnp.sum(gx * gx, -1) + 1e-4
        gxy = jnp.sum(gx * gy, -1)
        gyy = jnp.sum(gy * gy, -1) + 1e-4
        det = jnp.maximum(gxx * gyy - gxy * gxy, 1e-12)
        dl = d / scale

        def it(dl, _):
            patch1 = sample_patches(i1, base + dl, radius)
            e = patch0 - patch1
            bx = jnp.sum(e * gx, -1)
            by = jnp.sum(e * gy, -1)
            # closed-form 2x2 solve (no batched linalg.inv)
            ux = (gyy * bx - gxy * by) / det
            uy = (gxx * by - gxy * bx) / det
            return dl + jnp.stack([ux, uy], -1), None

        dl, _ = jax.lax.scan(it, dl, None, length=iters)
        d = dl * scale

    p1 = pts + d
    # verify: residual small and in-bounds
    patch1 = sample_patches(pyr1[0], p1, radius)
    patch0 = sample_patches(pyr0[0], pts, radius)
    err = jnp.mean(jnp.abs(patch0 - patch1), -1)
    H, W = img0.shape
    inb = (
        (p1[:, 0] >= radius)
        & (p1[:, 0] < W - radius)
        & (p1[:, 1] >= radius)
        & (p1[:, 1] < H - radius)
    )
    return p1, inb & (err < err_gate) & valid
