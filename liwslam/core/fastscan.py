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


def cumsum_tri(x, axis=0):
    """Inclusive cumsum via a lower-triangular matmul (MXU, one kernel).

    Exact for f32 inputs whose prefix sums stay below 2^24 (counts,
    moments of meter-scale coordinates — true for every use here)."""
    x = jnp.moveaxis(x, axis, 0)
    N = x.shape[0]
    tri = (
        jnp.arange(N, dtype=jnp.int32)[:, None]
        >= jnp.arange(N, dtype=jnp.int32)[None, :]
    ).astype(x.dtype)
    shape = x.shape
    out = tri @ x.reshape(N, -1)
    return jnp.moveaxis(out.reshape(shape), 0, axis)


def prefix_max(vals):
    """Inclusive forward running max over axis 0 via a masked row-reduce
    (one N^2 elementwise + one reduction instead of a log-depth scan).

    vals: (N,) or (N,C)."""
    v = vals if vals.ndim > 1 else vals[:, None]
    N = v.shape[0]
    mask = (
        jnp.arange(N, dtype=jnp.int32)[:, None]
        <= jnp.arange(N, dtype=jnp.int32)[None, :]
    )  # (j, i): j <= i contributes to position i
    big_neg = jnp.asarray(jnp.finfo(v.dtype).min if jnp.issubdtype(v.dtype, jnp.floating) else jnp.iinfo(v.dtype).min, v.dtype)
    out = jnp.max(
        jnp.where(mask[:, :, None], v[:, None, :], big_neg), axis=0
    )  # (N,C)
    return out if vals.ndim > 1 else out[:, 0]


def suffix_min(vals):
    """Inclusive backward running min over axis 0 (same one-shot trick)."""
    return -prefix_max(-vals[::-1])[::-1]
