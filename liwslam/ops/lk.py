"""Pallas TPU kernel for pyramidal Lucas-Kanade tracking.

The XLA LK (camera/tracker.lk_track) re-expressed round 2's per-pixel
gathers as one-hot einsum patch sampling — fast in FLOPs, but the chain
still launches ~100 tiny kernels per call (3 pyramid levels x (setup +
iteration scan)), and at FULL camera rate three chained calls run per
laser interval.  Launch latency, not compute, is the cost (CLAUDE.md
TPU performance rules).  This kernel runs the ENTIRE pyramid descent for
all tracks in ONE launch, and its cost is resolution-independent (the
einsum form scales with image W*H; VERDICT r3 asks for real 640x480).

Patch access pattern (Mosaic constraints: dynamic sublane offsets must
be multiples of 8, lane offsets multiples of 128):

- pyramids are zero-PADDED with a (16-row, 128-lane) apron on every side
  (zero taps outside the image — the same boundary semantics as the
  one-hot weights, which drop out-of-range taps),
- per sample: one ALIGNED (32, 256) window load at the rounded-down
  origin, two dynamic ``pltpu.roll``s to bring the patch to (0, 0),
- bilinear interpolation + the +-1-pixel gradients derive from the SAME
  window via static rolls (one dynamic sample per pyramid level instead
  of four),
- patch sums reduce the masked window (the only quantities LK needs are
  Sum e*gx, Sum e*gy and the 2x2 gradient normal matrix).

Grid = one program per track; the image blocks have constant index maps
so they are fetched once and reused across programs.

Reference counterpart: cv::calcOpticalFlowPyrLK at
``src/trajectory/camera_manager.cpp:55-113``.  Parity with the XLA path
is pinned in tests/test_lk_kernel.py (interior tracks, interpret mode);
divergent/out-of-bounds tracks may differ (both implementations kill
them via the residual/in-bounds verification gate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 32  # window rows: 7 (align) + 15 (patch) + 1 (bilinear) + 2 (grad)
_LANES = 256  # window lanes: 127 (align) + 18
_UNROLL = 8  # independent track chains interleaved per loop iteration

# the fixed (32, 256) window must hold sublane alignment slack (7) +
# patch (2r+1) + bilinear (1) + gradient (2) rows — beyond this the
# rolled-in rows are garbage under pmask and tracks silently go wrong
MAX_RADIUS = (_ROWS - 7 - 1 - 2 - 1) // 2  # = 10


def _round_up(n, m):
    return -(-n // m) * m


def _pad_level(img):
    """Zero apron: 16 rows top / 128 lanes left, and enough on the high
    side that an aligned (32,256) window fits for any in-image origin
    (origin can sit at up to row H+15 / lane W+127 in padded coords)."""
    H, W = img.shape
    Hp = _round_up(H + 16 + _ROWS, 8)
    Wp = _round_up(W + 128 + _LANES, 128)
    out = jnp.zeros((Hp, Wp), img.dtype)
    return jax.lax.dynamic_update_slice(out, img, (16, 128))


def _sample_window(img_ref, by, bx, Hp, Wp):
    """Bilinearly interpolated (32,256) window with value[j,i] =
    img(by + j, bx + i) at patch origin (0,0); (by,bx) are float image
    coordinates (un-padded frame)."""
    y0 = jnp.floor(by)
    x0 = jnp.floor(bx)
    fy = by - y0
    fx = bx - x0
    y0p = jnp.clip(y0.astype(jnp.int32) + 16, 0, Hp - _ROWS)
    x0p = jnp.clip(x0.astype(jnp.int32) + 128, 0, Wp - _LANES)
    ya = pl.multiple_of((y0p // 8) * 8, 8)
    xa = pl.multiple_of((x0p // 128) * 128, 128)
    oy = y0p - ya
    ox = x0p - xa
    w = img_ref[pl.ds(ya, _ROWS), pl.ds(xa, _LANES)]
    w = pltpu.roll(pltpu.roll(w, -oy, 0), -ox, 1)
    # bilinear: v[j,i] = (1-fy)(1-fx) w[j,i] + ... (one static roll each)
    v = (1.0 - fy) * w + fy * pltpu.roll(w, _ROWS - 1, 0)
    v = (1.0 - fx) * v + fx * pltpu.roll(v, _LANES - 1, 1)
    return v


def _kernel(
    pos_ref,  # SMEM (T,2) f32 track positions (x, y)
    valid_ref,  # SMEM (T,) f32
    gate_ref,  # SMEM (1,) f32 residual gate (absolute intensity units)
    *refs,
    T: int,
    radius: int,
    iters: int,
    levels: int,
    shapes: tuple,  # ((Hp,Wp) per level,)
    dims: tuple,  # ((H,W) per level,) un-padded
):
    (*img_refs, out_ref) = refs
    p0 = img_refs[:levels]
    p1 = img_refs[levels:]
    dtype = jnp.float32
    P = 2 * radius + 1

    rr = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 1)
    pmask = ((rr < P) & (cc < P)).astype(dtype)

    def psum(a):
        return jnp.sum(jnp.sum(a * pmask, axis=0)[:, None], axis=0)[0]

    rows_out = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 0)
    lanes_out = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)

    # UNROLL independent track chains per group iteration: each chain is
    # a long serial dependency (sample -> scalar reductions -> next
    # sample address), so a single track leaves the VLIW pipeline mostly
    # stalled on reduce/scalar latency — interleaving 8 chains gives the
    # scheduler ILP to hide it (measured 1.8 -> 0.4 ms at T=48)
    U = _UNROLL
    n_groups = T // U  # wrapper pads T to a multiple of U

    def one_group(g, acc):
        ts = [g * U + k for k in range(U)]
        pxs = [pos_ref[t, 0] for t in ts]
        pys = [pos_ref[t, 1] for t in ts]

        dxs = [jnp.zeros((), dtype)] * U
        dys = [jnp.zeros((), dtype)] * U
        for lvl in range(levels - 1, -1, -1):
            Hp, Wp = shapes[lvl]
            Hl, Wl = dims[lvl]
            scale = dtype(2.0**lvl)
            bxs_ = [px / scale - radius for px in pxs]
            bys_ = [py / scale - radius for py in pys]
            patch0s, gxs, gys, gms = [], [], [], []
            for k in range(U):
                # window with 1-px margin: gradients from static rolls
                v0 = _sample_window(
                    p0[lvl], bys_[k] - 1.0, bxs_[k] - 1.0, Hp, Wp
                )
                patch0 = pltpu.roll(
                    pltpu.roll(v0, _ROWS - 1, 0), _LANES - 1, 1
                )
                gx = 0.5 * (
                    pltpu.roll(patch0, _LANES - 1, 1)
                    - pltpu.roll(patch0, 1, 1)
                )
                gy = 0.5 * (
                    pltpu.roll(patch0, _ROWS - 1, 0)
                    - pltpu.roll(patch0, 1, 0)
                )
                patch0s.append(patch0)
                gxs.append(gx)
                gys.append(gy)
            for k in range(U):
                gxx = psum(gxs[k] * gxs[k]) + 1e-4
                gxy = psum(gxs[k] * gys[k])
                gyy = psum(gys[k] * gys[k]) + 1e-4
                det = jnp.maximum(gxx * gyy - gxy * gxy, 1e-12)
                gms.append((gxx, gxy, gyy, det))

            def it(_, d):
                dl = list(d)
                es = []
                for k in range(U):
                    patch1 = _sample_window(
                        p1[lvl], bys_[k] + dl[2 * k + 1],
                        bxs_[k] + dl[2 * k], Hp, Wp,
                    )
                    es.append(patch0s[k] - patch1)
                out = []
                for k in range(U):
                    gxx, gxy, gyy, det = gms[k]
                    bxs2 = psum(es[k] * gxs[k])
                    bys2 = psum(es[k] * gys[k])
                    ux = (gyy * bxs2 - gxy * bys2) / det
                    uy = (gxx * bys2 - gxy * bxs2) / det
                    # bound the excursion (a diverged track dies at the
                    # verification gate anyway)
                    out.append(
                        jnp.clip(dl[2 * k] + ux, -dtype(Wl), dtype(Wl))
                    )
                    out.append(
                        jnp.clip(dl[2 * k + 1] + uy, -dtype(Hl), dtype(Hl))
                    )
                return tuple(out)

            d0 = []
            for k in range(U):
                d0 += [dxs[k] / scale, dys[k] / scale]
            dfin = jax.lax.fori_loop(0, iters, it, tuple(d0))
            dxs = [dfin[2 * k] * scale for k in range(U)]
            dys = [dfin[2 * k + 1] * scale for k in range(U)]

        # verification at level 0 (tracker.lk_track semantics)
        Hp0, Wp0 = shapes[0]
        H0, W0 = dims[0]
        r = dtype(radius)
        for k in range(U):
            vb0 = _sample_window(
                p0[0], pys[k] - radius, pxs[k] - radius, Hp0, Wp0
            )
            vb1 = _sample_window(
                p1[0], pys[k] + dys[k] - radius, pxs[k] + dxs[k] - radius,
                Hp0, Wp0,
            )
            err = psum(jnp.abs(vb0 - vb1)) / dtype(P * P)
            nx = pxs[k] + dxs[k]
            ny = pys[k] + dys[k]
            inb = (
                (nx >= r)
                & (nx < dtype(W0) - r)
                & (ny >= r)
                & (ny < dtype(H0) - r)
            )
            ok = inb & (err < gate_ref[0]) & (valid_ref[ts[k]] > 0)
            # masked row accumulate (dynamic sublane stores must be
            # 8-aligned, so no row indexing)
            vals = jnp.where(
                lanes_out == 0,
                nx,
                jnp.where(
                    lanes_out == 1,
                    ny,
                    jnp.where(lanes_out == 2, ok.astype(dtype), 0.0),
                ),
            )
            acc = jnp.where(rows_out == ts[k], vals, acc)
        return acc

    out_ref[:] = jax.lax.fori_loop(
        0, n_groups, one_group, jnp.zeros((T, 128), dtype)
    )


@functools.partial(
    jax.jit,
    static_argnames=("radius", "iters", "levels", "interpret"),
)
def lk_track_pallas(
    img0,
    img1,
    pts,
    valid,
    *,
    radius: int = 7,
    iters: int = 10,
    levels: int = 3,
    max_err=0.1,
    interpret: bool = False,
):
    """Drop-in for camera/tracker.lk_track: (new_pts (T,2), ok (T,))."""
    from liwslam.camera.tracker import build_pyramid

    if radius > MAX_RADIUS:
        raise ValueError(
            f"lk_track_pallas: radius {radius} exceeds the fixed "
            f"(rows={_ROWS}) window capacity (max {MAX_RADIUS}); use the "
            "XLA path (cam_lk_impl='xla') for larger radii"
        )

    dtype = jnp.float32
    T0 = pts.shape[0]
    T = _round_up(T0, _UNROLL)
    if T != T0:
        pts = jnp.concatenate(
            [pts, jnp.zeros((T - T0, 2), pts.dtype)], axis=0
        )
        valid = jnp.concatenate(
            [valid, jnp.zeros(T - T0, valid.dtype)], axis=0
        )
    pyr0 = build_pyramid(img0.astype(dtype), levels)
    pyr1 = build_pyramid(img1.astype(dtype), levels)
    dims = tuple(p.shape for p in pyr0)
    pad0 = [_pad_level(p) for p in pyr0]
    pad1 = [_pad_level(p) for p in pyr1]
    shapes = tuple(p.shape for p in pad0)

    gate = (max_err * jnp.maximum(jnp.max(img0), 1.0)).astype(dtype)[None]

    kern = functools.partial(
        _kernel,
        T=T,
        radius=radius,
        iters=iters,
        levels=levels,
        shapes=shapes,
        dims=dims,
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    img_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        in_specs=[
            smem(),
            smem(),
            smem(),
            *[img_spec() for _ in shapes],
            *[img_spec() for _ in shapes],
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 128), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        pts.astype(dtype),
        valid.astype(dtype),
        gate,
        *pad0,
        *pad1,
    )
    new_pts = out[:T0, 0:2]
    ok = out[:T0, 2] > 0.5
    return new_pts, ok
