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


def _box(img, r):
    """Box filter with a (2r+1) square window via cumsum."""
    for ax in (0, 1):
        c = jnp.cumsum(img, axis=ax)
        pad = jnp.zeros_like(jnp.take(c, jnp.arange(r + 1), axis=ax))
        hi = jnp.concatenate([jnp.take(c, jnp.arange(2 * r, c.shape[ax]), axis=ax),
                              jnp.repeat(jnp.take(c, jnp.asarray([-1]), axis=ax), 2 * r, axis=ax)], axis=ax)
        lo = jnp.concatenate([jnp.zeros_like(jnp.take(c, jnp.arange(2 * r + 1), axis=ax)),
                              jnp.take(c, jnp.arange(c.shape[ax] - 2 * r - 1), axis=ax)], axis=ax)
        img = hi - lo
    return img


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
                    budget=None):
    """Top-n corner selection with minimum mutual distance and distance to
    existing tracks (camera_manager.cpp:93-113).  Greedy over the top-K
    responses, fixed shapes.

    ``n_max`` is the static slot capacity; ``budget`` (optional, traced)
    caps how many are actually taken this call — the reference replenishes
    only up to ``max_feature_num - n_tracked`` new corners per frame."""
    H, W = img.shape
    resp = shi_tomasi_response(img)
    K = 4 * n_max + 32
    flat = resp.reshape(-1)
    top_v, top_i = jax.lax.top_k(flat, K)
    ys = (top_i // W).astype(jnp.float32)
    xs = (top_i % W).astype(jnp.float32)
    cand = jnp.stack([xs, ys], -1)

    if existing_xy is None:
        existing_xy = jnp.zeros((0, 2), img.dtype)
        existing_valid = jnp.zeros(0, bool)
    if budget is None:
        budget = jnp.asarray(n_max, jnp.int32)

    # response gate scaled by intensity² (the Shi-Tomasi score is quadratic
    # in intensity) so 8-bit and [0,1]-normalized images behave alike
    resp_gate = 1e-4 * jnp.maximum(jnp.max(img), 1.0) ** 2

    def body(carry, i):
        chosen, n = carry
        c = cand[i]
        d_new = jnp.linalg.norm(chosen[:, :2] - c[None], axis=-1)
        ok_new = jnp.all(jnp.where(chosen[:, 2] > 0, d_new >= min_dis, True))
        d_old = jnp.linalg.norm(existing_xy - c[None], axis=-1)
        ok_old = jnp.all(jnp.where(existing_valid, d_old >= min_dis, True))
        take = ok_new & ok_old & (n < n_max) & (n < budget) & (top_v[i] > resp_gate)
        chosen = jnp.where(
            take,
            chosen.at[n].set(jnp.asarray([c[0], c[1], 1.0], img.dtype)),
            chosen,
        )
        return (chosen, n + take.astype(jnp.int32)), None

    chosen0 = jnp.zeros((n_max, 3), img.dtype)
    (chosen, n), _ = jax.lax.scan(body, (chosen0, jnp.asarray(0, jnp.int32)), jnp.arange(K))
    return chosen[:, :2], chosen[:, 2] > 0


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


def lk_track(img0, img1, pts, valid, *, radius=7, iters=10, levels=3,
             max_err=0.1):
    """Pyramidal Lucas-Kanade: track pts (N,2) from img0 to img1.

    Returns (new_pts (N,2), ok (N,)).  Fixed shapes, vmapped over tracks.

    ``max_err`` is the mean-absolute-residual acceptance gate expressed as a
    fraction of the image's dynamic range (estimated as max(1, max(img0)) so
    both [0,1]-normalized and 8-bit [0,255] inputs verify identically)."""
    pyr0 = [img0]
    pyr1 = [img1]
    for _ in range(levels - 1):
        pyr0.append(0.25 * (pyr0[-1][::2, ::2] + pyr0[-1][1::2, ::2] + pyr0[-1][::2, 1::2] + pyr0[-1][1::2, 1::2]))
        pyr1.append(0.25 * (pyr1[-1][::2, ::2] + pyr1[-1][1::2, ::2] + pyr1[-1][::2, 1::2] + pyr1[-1][1::2, 1::2]))

    offs = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-radius, radius + 1, dtype=jnp.float32),
            jnp.arange(-radius, radius + 1, dtype=jnp.float32),
            indexing="xy",
        ),
        -1,
    ).reshape(-1, 2)

    # intensity scale so the verification gate is invariant to 8-bit vs
    # [0,1]-normalized input (a raw 0.1 absolute threshold silently killed
    # every track on 8-bit images)
    err_gate = max_err * jnp.maximum(jnp.max(img0), 1.0)

    def track_one(p0):
        d = jnp.zeros(2, img0.dtype)
        for lvl in range(levels - 1, -1, -1):
            i0 = pyr0[lvl]
            i1 = pyr1[lvl]
            scale = 2.0**lvl
            base = p0 / scale
            patch0 = _bilinear(i0, base[None] + offs)
            gx = _bilinear(i0, base[None] + offs + jnp.asarray([1.0, 0.0])) - _bilinear(
                i0, base[None] + offs - jnp.asarray([1.0, 0.0])
            )
            gy = _bilinear(i0, base[None] + offs + jnp.asarray([0.0, 1.0])) - _bilinear(
                i0, base[None] + offs - jnp.asarray([0.0, 1.0])
            )
            gx = gx * 0.5
            gy = gy * 0.5
            G = jnp.asarray(
                [[jnp.sum(gx * gx), jnp.sum(gx * gy)], [jnp.sum(gx * gy), jnp.sum(gy * gy)]]
            )
            Ginv = jnp.linalg.inv(G + 1e-4 * jnp.eye(2, dtype=img0.dtype))
            dl = d / scale

            def it(dl, _):
                patch1 = _bilinear(i1, base[None] + dl[None] + offs)
                e = patch0 - patch1
                b = jnp.asarray([jnp.sum(e * gx), jnp.sum(e * gy)])
                return dl + Ginv @ b, None

            dl, _ = jax.lax.scan(it, dl, None, length=iters)
            d = dl * scale
        p1 = p0 + d
        # verify: residual small and in-bounds
        patch1 = _bilinear(pyr1[0], p1[None] + offs)
        patch0 = _bilinear(pyr0[0], p0[None] + offs)
        err = jnp.mean(jnp.abs(patch0 - patch1))
        H, W = img0.shape
        inb = (p1[0] >= radius) & (p1[0] < W - radius) & (p1[1] >= radius) & (p1[1] < H - radius)
        return p1, inb & (err < err_gate)

    new_pts, ok = jax.vmap(track_one)(pts)
    return new_pts, ok & valid
