"""Latency-optimized prefix operations for the TPU per-frame program.

The tracking step is LATENCY-bound (~1900 fused kernels x 1-2 us; see
CLAUDE.md TPU notes): every log-depth prefix pass (cumsum,
associative_scan) costs ~10-20 sequential kernels.  For the scan-sized
arrays of the front end (N ~ 1-2k) the same results come out of ONE
dense N^2 operation — a lower-triangular matmul on the MXU for cumsum, a
masked row-reduce for prefix max — trading trivially cheap FLOPs/bytes
(N^2 ~ 1-5 MB) for sequential depth.

Use these only where N is scan-sized; for large arrays the O(N^2) memory
loses (the descriptor/pose-graph paths keep their log-depth forms).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cumsum_tri(x, axis=0, block: int = 64):
    """Inclusive cumsum via blocked lower-triangular matmuls (MXU).

    Exact for f32 inputs whose prefix sums stay below 2^24 (counts,
    moments of meter-scale coordinates — true for every use here).
    Two levels like :func:`prefix_max`: in-block (block x block) tri
    matmuls + an exclusive running sum of block totals — the flat form
    read an (N, N) triangular constant (5 MB at N=1152) per call."""
    x = jnp.moveaxis(x, axis, 0)
    shape = x.shape
    N = shape[0]
    v = x.reshape(N, -1)
    C = v.shape[1]
    B = -(-N // block)
    pad = B * block - N
    if pad:
        v = jnp.concatenate([v, jnp.zeros((pad, C), v.dtype)])
    vb = v.reshape(B, block, C)
    tri = (
        jnp.arange(block, dtype=jnp.int32)[:, None]
        >= jnp.arange(block, dtype=jnp.int32)[None, :]
    ).astype(x.dtype)
    inb = jnp.einsum("ij,bjc->bic", tri, vb)  # in-block inclusive sums
    blk = inb[:, -1, :]  # (B,C) block totals
    btri = (
        jnp.arange(B, dtype=jnp.int32)[:, None]
        > jnp.arange(B, dtype=jnp.int32)[None, :]
    ).astype(x.dtype)  # strictly-before blocks
    prev = btri @ blk  # (B,C) exclusive running totals
    out = (inb + prev[:, None, :]).reshape(B * block, C)[:N]
    return jnp.moveaxis(out.reshape(shape), 0, axis)


def prefix_max(vals, block: int = 64):
    """Inclusive forward running max over axis 0, one-shot (no log-depth
    scan) in TWO blocked levels: in-block masked row-reduce over
    (B, block, block, C) + an exclusive running max of the tiny block
    maxima.  The flat (N, N, C) form moved ~10 MB of HBM per call at
    N=1152; blocking cuts the materialized intermediate ~N/block x
    (measured round 3) at the cost of two extra tiny kernels.

    vals: (N,) or (N,C)."""
    v = vals if vals.ndim > 1 else vals[:, None]
    N, C = v.shape
    big_neg = jnp.asarray(
        jnp.finfo(v.dtype).min
        if jnp.issubdtype(v.dtype, jnp.floating)
        else jnp.iinfo(v.dtype).min,
        v.dtype,
    )
    B = -(-N // block)
    pad = B * block - N
    if pad:
        v = jnp.concatenate([v, jnp.full((pad, C), big_neg, v.dtype)])
    vb = v.reshape(B, block, C)
    mask = (
        jnp.arange(block, dtype=jnp.int32)[:, None]
        <= jnp.arange(block, dtype=jnp.int32)[None, :]
    )  # (j, i): j <= i contributes to position i
    inb = jnp.max(
        jnp.where(mask[None, :, :, None], vb[:, :, None, :], big_neg), axis=1
    )  # (B, block, C) in-block inclusive cummax
    blk = inb[:, -1, :]  # (B,C) block maxima
    bmask = (
        jnp.arange(B, dtype=jnp.int32)[:, None]
        < jnp.arange(B, dtype=jnp.int32)[None, :]
    )  # strictly-before blocks
    prev = jnp.max(
        jnp.where(bmask[:, :, None], blk[:, None, :], big_neg), axis=0
    )  # (B,C) exclusive running max of earlier blocks
    out = jnp.maximum(inb, prev[:, None, :]).reshape(B * block, C)[:N]
    return out if vals.ndim > 1 else out[:, 0]


def suffix_min(vals):
    """Inclusive backward running min over axis 0 (same one-shot trick)."""
    return -prefix_max(-vals[::-1])[::-1]
