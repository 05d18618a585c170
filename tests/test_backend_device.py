"""Device-side descriptor-map construction: parity with the host oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from liwslam import config
from liwslam.backend import loop as loop_mod


def prm_small():
    return config.office().replace(
        map_corner_capacity=32,
        d_res=0.05,
        a_res=0.05,
    )


def corner_soup(rng, n=60, scale=5.0, dup_frac=0.4):
    """Random corners with deliberate near-duplicates (exercises both the
    blend and the drop branch of the dedup)."""
    base = rng.uniform(-scale, scale, size=(n, 2))
    n_dup = int(n * dup_frac)
    dup = base[rng.integers(0, n, n_dup)] + rng.normal(0, 0.04, (n_dup, 2))
    pts = np.concatenate([base, dup])
    pts = pts[rng.permutation(len(pts))]
    # f32 so the host oracle and the f32 device path see IDENTICAL values
    # (a distance straddling a dedup threshold would otherwise flip)
    return np.concatenate([pts, np.zeros((len(pts), 1))], -1).astype(np.float32)


def test_dedup_device_matches_oracle(rng):
    prm = prm_small()
    pts = corner_soup(rng)
    # oracle: host sequential dedup (shuffle disabled by taking raw output)
    kept_ref: list = []
    for c in pts:
        dup = False
        for k in range(len(kept_ref)):
            d = np.linalg.norm((c - kept_ref[k])[:2])
            if d < prm.d_res / 2:
                kept_ref[k] = (kept_ref[k] * 3 + c) / 4
            if d < prm.d_res * 5:
                dup = True
                break
        if not dup:
            kept_ref.append(c.astype(np.float64))
    kept_ref = np.asarray(kept_ref)[: prm.map_corner_capacity]

    kept_dev, n_dev = jax.jit(
        lambda p, m: loop_mod.dedup_corners_device(
            p, m, prm.d_res, prm.map_corner_capacity
        )
    )(jnp.asarray(pts, jnp.float32), jnp.ones(len(pts), bool))
    n_dev = int(n_dev)
    assert n_dev == len(kept_ref), (n_dev, len(kept_ref))
    np.testing.assert_allclose(
        np.asarray(kept_dev)[:n_dev], kept_ref, atol=1e-4
    )


def test_build_map_feature_device_matches_host(rng):
    prm = prm_small()
    pts = corner_soup(rng, n=40)
    kw = dict(
        d_res=prm.d_res,
        capacity=prm.map_corner_capacity,
        n_dist_bins=prm.n_dist_bins,
    )
    # host build with an identity shuffle: monkey-set the rng so the
    # comparison is order-for-order.  Easier: compare with shuffle OFF on
    # the device and sort both by position.
    host = loop_mod.build_map_feature([pts], np.eye(4), 0, seed=1, **kw)
    dev = jax.jit(
        lambda p, m: loop_mod.build_map_feature_device(
            p, m, jnp.eye(4), **kw, perm=None
        )
    )(jnp.asarray(pts, jnp.float32), jnp.ones(len(pts), bool))

    hv = np.asarray(host.valid)
    dv = np.asarray(dev.valid)
    assert hv.sum() == dv.sum()
    hp = np.asarray(host.points)[hv]
    dp = np.asarray(dev.points)[dv]
    # same corner SET (host output is shuffled; device is insertion-order)
    oh = np.lexsort(hp[:, :2].T)
    od = np.lexsort(dp[:, :2].T)
    np.testing.assert_allclose(hp[oh], dp[od], atol=1e-4)
    # descriptors must agree under the same re-ordering
    hq = np.asarray(host.dist_q)[hv][oh][:, hv][:, oh]
    dq = np.asarray(dev.dist_q)[dv][od][:, dv][:, od]
    np.testing.assert_array_equal(hq, dq)
    ha = np.asarray(host.ang)[hv][oh][:, hv][:, oh]
    da = np.asarray(dev.ang)[dv][od][:, dv][:, od]
    np.testing.assert_allclose(ha, da, atol=1e-4)
    hb = np.asarray(host.bitmap)[hv][oh]
    db = np.asarray(dev.bitmap)[dv][od]
    np.testing.assert_array_equal(hb, db)


def test_device_shuffle_is_permutation(rng):
    prm = prm_small()
    pts = corner_soup(rng, n=30)
    kw = dict(
        d_res=prm.d_res,
        capacity=prm.map_corner_capacity,
        n_dist_bins=prm.n_dist_bins,
    )
    perm = np.random.default_rng(7).permutation(prm.map_corner_capacity).astype(
        np.int32
    )
    plain = loop_mod.build_map_feature_device(
        jnp.asarray(pts, jnp.float32), jnp.ones(len(pts), bool), jnp.eye(4),
        **kw, perm=None,
    )
    shuf = loop_mod.build_map_feature_device(
        jnp.asarray(pts, jnp.float32), jnp.ones(len(pts), bool), jnp.eye(4),
        **kw, perm=jnp.asarray(perm),
    )
    pv = np.asarray(plain.valid)
    sv = np.asarray(shuf.valid)
    assert pv.sum() == sv.sum()
    a = np.asarray(plain.points)[pv]
    b = np.asarray(shuf.points)[sv]
    # same set, different order (a permutation actually happened)
    np.testing.assert_allclose(
        a[np.lexsort(a[:, :2].T)], b[np.lexsort(b[:, :2].T)], atol=1e-6
    )
    assert not np.allclose(a, b)


def test_extract_correspondences_matches_loop_oracle(rng):
    prm = prm_small()
    world = rng.uniform(-4, 4, size=(14, 2))
    world = np.concatenate([world, np.zeros((14, 1))], -1)
    th = 0.7
    c, s = np.cos(th), np.sin(th)
    moved = world @ np.asarray([[c, s, 0], [-s, c, 0], [0, 0, 1.0]]) + np.asarray(
        [1.0, -0.5, 0.0]
    )
    kw = dict(
        d_res=prm.d_res,
        capacity=prm.map_corner_capacity,
        n_dist_bins=prm.n_dist_bins,
    )
    m1 = loop_mod.build_map_feature([moved], np.eye(4), 0, seed=1, **kw)
    m2 = loop_mod.build_map_feature([world], np.eye(4), 1, seed=2, **kw)
    counts, bins = loop_mod.score_pairs(
        m1, m2, jnp.arange(4, dtype=jnp.int32),
        a_res=prm.a_res, n_angle_bins=prm.n_angle_bins, min_match_threshold=4,
    )
    pi, pj = np.unravel_index(np.argmax(np.asarray(counts)), counts.shape)
    bi = int(np.asarray(bins)[pi, pj])
    a1, a2 = loop_mod.extract_correspondences(
        m1, m2, int(pi), int(pj), bi, a_res=prm.a_res, n_angle_bins=prm.n_angle_bins
    )
    b1, b2 = loop_mod._extract_correspondences_ref(
        m1, m2, int(pi), int(pj), bi, a_res=prm.a_res, n_angle_bins=prm.n_angle_bins
    )
    np.testing.assert_allclose(a1, b1, atol=0)
    np.testing.assert_allclose(a2, b2, atol=0)
