"""Pallas LK kernel vs the XLA einsum LK (camera/tracker.lk_track)."""

import numpy as np
import jax.numpy as jnp

from liwslam.camera import tracker as trk
from liwslam.ops import lk


def _textured(H, W, seed=0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    img = (
        np.sin(x * 0.31) * np.cos(y * 0.23)
        + 0.5 * np.sin(x * 0.11 + y * 0.17)
        + 0.3 * rng.standard_normal((H, W)).astype(np.float32)
    )
    # smooth the noise a little so gradients are LK-friendly
    img = 0.25 * (
        img
        + np.roll(img, 1, 0)
        + np.roll(img, 1, 1)
        + np.roll(np.roll(img, 1, 0), 1, 1)
    )
    return img.astype(np.float32)


def _shifted(img, dx, dy):
    """Bilinear shift: img1(x) = img0(x - d) so tracking img0->img1
    recovers +d."""
    H, W = img.shape
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    xs = np.clip(x - dx, 0, W - 2)
    ys = np.clip(y - dy, 0, H - 2)
    x0 = np.floor(xs).astype(int)
    y0 = np.floor(ys).astype(int)
    fx = xs - x0
    fy = ys - y0
    return (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x0 + 1] * fx * (1 - fy)
        + img[y0 + 1, x0] * (1 - fx) * fy
        + img[y0 + 1, x0 + 1] * fx * fy
    ).astype(np.float32)


def test_lk_kernel_recovers_shift_and_matches_xla():
    H, W = 120, 160
    img0 = _textured(H, W)
    dx, dy = 3.6, -2.3
    img1 = _shifted(img0, dx, dy)
    rng = np.random.default_rng(1)
    T = 24
    pts = np.stack(
        [rng.uniform(25, W - 25, T), rng.uniform(25, H - 25, T)], -1
    ).astype(np.float32)
    valid = np.ones(T, bool)

    p_x, ok_x = trk.lk_track(
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(pts),
        jnp.asarray(valid), radius=7, iters=10, levels=3, max_err=0.1,
    )
    p_k, ok_k = lk.lk_track_pallas(
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(pts),
        jnp.asarray(valid), radius=7, iters=10, levels=3, max_err=0.1,
        interpret=True,
    )
    p_x, ok_x = np.asarray(p_x), np.asarray(ok_x)
    p_k, ok_k = np.asarray(p_k), np.asarray(ok_k)

    # the kernel must recover the true shift on surviving tracks
    assert ok_k.sum() >= T * 0.8, ok_k.sum()
    d = p_k[ok_k] - pts[ok_k]
    np.testing.assert_allclose(
        np.median(d, axis=0), [dx, dy], atol=0.15
    )
    # and agree with the XLA path where both survive (interior tracks,
    # same bilinear taps; fp ordering differs)
    both = ok_x & ok_k
    assert both.sum() >= T * 0.7
    np.testing.assert_allclose(p_k[both], p_x[both], atol=0.05)


def test_lk_kernel_kills_bad_tracks():
    H, W = 96, 128
    img0 = _textured(H, W, seed=2)
    # truly unrelated content (the _textured sin pattern is seed-invariant)
    rng1 = np.random.default_rng(9)
    img1 = rng1.standard_normal((H, W)).astype(np.float32)
    rng = np.random.default_rng(3)
    T = 16
    pts = np.stack(
        [rng.uniform(20, W - 20, T), rng.uniform(20, H - 20, T)], -1
    ).astype(np.float32)
    valid = np.ones(T, bool)
    valid[0] = False  # invalid in stays invalid out
    _, ok = lk.lk_track_pallas(
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(pts),
        jnp.asarray(valid), radius=7, iters=10, levels=3, max_err=0.1,
        interpret=True,
    )
    ok = np.asarray(ok)
    assert not ok[0]
    # unrelated images: most verification residuals must fail the gate
    assert ok.sum() <= T * 0.5, ok.sum()
