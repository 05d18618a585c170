"""Descriptor scoring invariants of the batched XLA production path.

The Pallas loop-vote kernel that used to live in ops/loop_vote.py was
deleted in round 3: the batched XLA ``backend.loop.score_pairs`` scores
64 map-pairs in 0.10 ms on a v5e (1.6 us/pair) and loop scoring is a
negligible share of backend time, so a fused multi-pair Mosaic kernel had
no production value.  These tests keep the scoring semantics pinned.
"""

import numpy as np
import jax.numpy as jnp

from liwslam.backend import loop as loop_mod


def _mk_feature(n, seed, P=16):
    pts = np.zeros((n, 3))
    pts[:, :2] = np.random.default_rng(seed).uniform(-4.0, 4.0, (n, 2))
    return loop_mod.build_map_feature(
        [pts], np.eye(4), 0, d_res=0.05, capacity=P, n_dist_bins=2001, seed=seed
    )


KW = dict(
    a_res=0.05,
    n_angle_bins=int(2 * np.pi / 0.05) + 2,
    min_match_threshold=3,
)


def test_self_match_scores_highest():
    probes = jnp.arange(5, dtype=jnp.int32)
    m1 = _mk_feature(12, 1)
    c_self, _ = loop_mod.score_pairs(m1, _mk_feature(12, 1), probes, **KW)
    c_other, _ = loop_mod.score_pairs(m1, _mk_feature(12, 7), probes, **KW)
    assert int(np.asarray(c_self).max()) > int(np.asarray(c_other).max())
    # a perfect self-match recovers (almost) every corner
    assert int(np.asarray(c_self).max()) >= 10


def test_invalid_probe_scores_nothing():
    m1 = _mk_feature(9, 3)  # 9 valid of capacity 16
    m2 = _mk_feature(5, 3)
    probes = jnp.asarray([0, 8, 12], jnp.int32)  # includes an invalid probe
    c, b = loop_mod.score_pairs(m1, m2, probes, **KW)
    assert (np.asarray(c[2]) == 0).all()
