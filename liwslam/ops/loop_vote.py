"""Pallas TPU kernel for loop-closure descriptor vote scoring (EXPERIMENT).

STATUS: parity-tested alternative, NOT the production path.  The keyframe
manager uses the batched XLA ``backend.loop.score_pairs`` (vmapped over
candidate maps), which amortizes kernel latency across the whole candidate
set — measured 64 map-pairs in 0.10 ms on a v5e chip (1.6 us/pair) vs
~1.6 ms for one pair through either single-pair implementation, both
compute-equivalent.  This kernel is kept as the starting point for a
future fused multi-pair Mosaic variant and as Pallas reference material;
delete if it bitrots.

Computes ``backend.loop.score_pairs`` — for every (probe corner i of map1,
candidate corner j of map2) the best rotation-consistency bin and its
unique-left-neighbor vote count (match_des semantics, reference
``src/trajectory/keyframe_manager.cpp:1034-1123``).

Kernel design (one grid program per probe corner i, all P candidates j at
once):

- for each left-hand neighbor k1 (a scalar loop over SMEM-resident probe
  rows) the (k2, j) distance-equality mask and rotation bins are computed
  once in VMEM; the pure-XLA path re-streams this elementwise chain once
  per 32-bit vote word,
- per-k1 "one vote per rotation bin" dedup packs the bins voted by k1
  for every candidate j into uint32 words via a halving bitwise-OR fold
  over sublanes (log2(P) static-slice steps),
- unpacked vote bits accumulate into a persistent (n_bins, P) histogram
  scratch laid out bins-on-sublanes / candidates-on-lanes, so the final
  max/argmax are lane-preserving sublane reductions and the result is a
  single dynamic row write,
- the popcount prefilter on the distance-bin bitmaps
  (keyframe_manager.cpp:1038-1049) is precomputed outside the kernel
  (it is O(NP*P*NWD) integer ops — negligible) and enters as a mask.

Requires P (corner capacity) to be a power of two >= 8 (default 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _popcount32(x):
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def _kernel(
    d1s_ref,  # (NPp,P) int32  SMEM: probe rows of m1.dist_q
    a1s_ref,  # (NPp,P) f32    SMEM: probe rows of m1.ang
    k1s_ref,  # (NPp,P) int32  SMEM: probe neighbor-valid masks
    d2t_ref,  # (P,P) int32    VMEM: m2.dist_q transposed (rows k2, cols j)
    a2t_ref,  # (P,P) f32      VMEM: m2.ang transposed
    k2t_ref,  # (P,P) int32    VMEM: candidate neighbor-valid, transposed
    okm_ref,  # (NPp,P) int32  VMEM: popcount-prefilter & validity gate
    counts_ref,  # (NPp,P) int32 out
    bins_ref,  # (NPp,P) int32 out
    hist_ref,  # (NW*32, P) int32 scratch
    *,
    P: int,
    a_res: float,
    n_angle_bins: int,
):
    i = pl.program_id(0)
    NW = (n_angle_bins + 31) // 32
    hist_ref[:] = jnp.zeros((NW * 32, P), jnp.int32)

    d2t = d2t_ref[:]
    a2t = a2t_ref[:]
    k2ok = k2t_ref[:] > 0
    shift32 = jax.lax.broadcasted_iota(jnp.uint32, (32, P), 0)

    def k1_body(k1, _):
        d1k = d1s_ref[i, k1]
        a1k = a1s_ref[i, k1]

        @pl.when(k1s_ref[i, k1] > 0)
        def _():
            eq = (d2t == d1k) & k2ok  # (k2, j)
            adiff = a1k - a2t
            adiff = jnp.where(adiff >= jnp.pi, adiff - 2 * jnp.pi, adiff)
            adiff = jnp.where(adiff < -jnp.pi, adiff + 2 * jnp.pi, adiff)
            bins = (adiff / a_res).astype(jnp.int32) + n_angle_bins // 2
            word = bins >> 5
            bit = (jnp.uint32(1) << (bins & 31).astype(jnp.uint32)).astype(
                jnp.uint32
            )
            for w in range(NW):
                contrib = jnp.where(eq & (word == w), bit, jnp.uint32(0))
                # halving OR fold over k2 (sublanes)
                n = P
                while n > 1:
                    n //= 2
                    contrib = contrib[:n, :] | contrib[n : 2 * n, :]
                # contrib (1,P): bins voted by k1 for each candidate j
                votes = ((contrib >> shift32) & jnp.uint32(1)).astype(jnp.int32)
                hist_ref[w * 32 : (w + 1) * 32, :] += votes  # (32,P)

        return 0

    jax.lax.fori_loop(0, P, k1_body, 0)

    # f32 for the reductions: Mosaic argmax supports only f32, and counts
    # are bounded by P << 2^24 so the conversion is exact
    row = jax.lax.broadcasted_iota(jnp.int32, (NW * 32, P), 0)
    hist = jnp.where(row < n_angle_bins, hist_ref[:].astype(jnp.float32), -1.0)
    best_cnt = jnp.max(hist, axis=0, keepdims=True).astype(jnp.int32)  # (1,P)
    best_bin = jnp.argmax(hist, axis=0).astype(jnp.int32).reshape(1, P)
    ok = okm_ref[pl.ds(i, 1), :] > 0
    counts_ref[pl.ds(i, 1), :] = jnp.where(ok, best_cnt + 1, 0)
    bins_ref[pl.ds(i, 1), :] = best_bin


@functools.partial(
    jax.jit,
    static_argnames=("a_res", "n_angle_bins", "min_match_threshold", "interpret"),
)
def score_pairs_pallas(
    m1,
    m2,
    probes,
    *,
    a_res: float,
    n_angle_bins: int,
    min_match_threshold: int,
    interpret: bool = False,
):
    """Drop-in replacement for ``backend.loop.score_pairs`` (same outputs)."""
    P = m1.points.shape[0]
    assert P >= 8 and (P & (P - 1)) == 0, "corner capacity must be a power of two"
    NP = probes.shape[0]
    NPp = max(8, -(-NP // 8) * 8)
    pad = NPp - NP
    probes_p = jnp.concatenate([probes, jnp.zeros(pad, probes.dtype)])

    ar = jnp.arange(P)
    d1s = m1.dist_q[probes_p]  # (NPp,P)
    a1s = m1.ang[probes_p]
    k1s = (
        m1.valid[None, :] & (ar[None, :] != probes_p[:, None])
    ).astype(jnp.int32)

    # popcount prefilter + validity gates, precomputed in plain XLA
    inter = jnp.sum(
        _popcount32(
            (m1.bitmap[probes_p][:, None, :] & m2.bitmap[None, :, :]).astype(
                jnp.int32
            )
        ),
        axis=-1,
    )  # (NPp,P)
    pv = m1.valid[probes_p] & (jnp.arange(NPp) < NP)
    okm = (
        (inter >= min_match_threshold) & pv[:, None] & m2.valid[None, :]
    ).astype(jnp.int32)

    NW = (n_angle_bins + 31) // 32
    kern = functools.partial(
        _kernel, P=P, a_res=a_res, n_angle_bins=n_angle_bins
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    smem = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.SMEM
    )
    counts, bins = pl.pallas_call(
        kern,
        grid=(NPp,),
        in_specs=[
            smem((NPp, P)),
            smem((NPp, P)),
            smem((NPp, P)),
            full((P, P)),
            full((P, P)),
            full((P, P)),
            full((NPp, P)),
        ],
        out_specs=[full((NPp, P)), full((NPp, P))],
        out_shape=[
            jax.ShapeDtypeStruct((NPp, P), jnp.int32),
            jax.ShapeDtypeStruct((NPp, P), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((NW * 32, P), jnp.int32)],
        interpret=interpret,
    )(
        d1s,
        a1s,
        k1s,
        m2.dist_q.T,
        m2.ang.T,
        (m2.valid[None, :] & (ar[None, :] != ar[:, None])).astype(jnp.int32).T,
        okm,
    )
    return counts[:NP], bins[:NP]
