"""Pallas kernel parity vs the pure-XLA reference implementations.

Kernels are exercised in interpreter mode on CPU (tests/conftest.py forces
the CPU platform); compiled-mode parity on real TPU is checked in bench
tooling.
"""

import numpy as np
import jax.numpy as jnp

from liwslam.backend import loop as loop_mod
from liwslam.ops import loop_vote


def _mk_feature(n, seed, P=16):
    pts = np.zeros((n, 3))
    pts[:, :2] = np.random.default_rng(seed).uniform(-4.0, 4.0, (n, 2))
    return loop_mod.build_map_feature(
        [pts], np.eye(4), 0, d_res=0.05, capacity=P, n_dist_bins=2001, seed=seed
    )


def test_loop_vote_kernel_matches_reference():
    kw = dict(
        a_res=0.05,
        n_angle_bins=int(2 * np.pi / 0.05) + 2,
        min_match_threshold=3,
    )
    probes = jnp.arange(5, dtype=jnp.int32)
    m1 = _mk_feature(12, 1)
    for other_seed in (1, 7):  # self-match and non-match
        m2 = _mk_feature(12, other_seed)
        c_ref, b_ref = loop_mod.score_pairs(m1, m2, probes, **kw)
        c_pl, b_pl = loop_vote.score_pairs_pallas(
            m1, m2, probes, interpret=True, **kw
        )
        assert (np.asarray(c_ref) == np.asarray(c_pl)).all()
        # the winning bin may differ only where several bins tie on votes;
        # with these constellations the scored pairs are tie-free
        agree = (np.asarray(b_ref) == np.asarray(b_pl)) | (np.asarray(c_ref) == 0)
        assert agree.all()


def test_loop_vote_kernel_handles_partial_validity():
    kw = dict(
        a_res=0.05,
        n_angle_bins=int(2 * np.pi / 0.05) + 2,
        min_match_threshold=3,
    )
    m1 = _mk_feature(9, 3)  # 9 valid of capacity 16
    m2 = _mk_feature(5, 3)
    probes = jnp.asarray([0, 8, 12], jnp.int32)  # includes an invalid probe
    c_ref, b_ref = loop_mod.score_pairs(m1, m2, probes, **kw)
    c_pl, b_pl = loop_vote.score_pairs_pallas(m1, m2, probes, interpret=True, **kw)
    assert (np.asarray(c_ref) == np.asarray(c_pl)).all()
    assert (np.asarray(c_ref[2]) == 0).all()  # invalid probe scores nothing
