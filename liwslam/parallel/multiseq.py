"""Batched multi-sequence front ends: data parallelism over sequences.

SLAM is sequential per stream (each frame depends on the previous state),
so single-stream throughput is bounded by per-frame latency; the scaling
axis is *many streams at once* (BASELINE config 3: batched multi-sequence
eval; config 5: multi-robot mapping).  The whole per-frame tracking
program (liwslam.frontend.pipeline.tracking_step) is pure, so a batch of
sequences is one ``vmap`` and shards across devices with a NamedSharding
on the batch dimension — XLA inserts zero collectives (embarrassingly
parallel), and ICI is left free for the shared pose-graph solve running
on an orthogonal mesh axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from liwslam.frontend import pipeline as pl


def batched_chunk_fn(consts, dcfg, scfg, mesh: Mesh = None, axis: str = "dp"):
    """Build a jitted (state_batch, input_batch) -> (state_batch, out_batch)
    over a leading sequence dimension, optionally sharded over ``axis``."""

    def run(states, inputs):
        return jax.vmap(
            lambda st, inp: pl.run_chunk(st, inp, consts, dcfg, scfg)
        )(states, inputs)

    # donate the carried state batch: callers thread the returned states,
    # and the copy of B ref-submap buffers per chunk was part of the
    # measured B=1 batching tax (tools/ab_batched.py, r4: 1218 -> 1267
    # fps from donation alone; the rest of the single-stream gap is the
    # per-op batch-dim overhead — at B=1 use the unbatched program)
    if mesh is None:
        return jax.jit(run, donate_argnums=(0,))

    sharding = NamedSharding(mesh, P(axis))

    def shard_batch(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P(axis))), tree
        )

    return jax.jit(run), shard_batch


def replicate_track_states(state, n):
    """Tile one TrackState into a batch of n identical sequence states."""
    return jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (n,) + (1,) * x.ndim), state
    )
