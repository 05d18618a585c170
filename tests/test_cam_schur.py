"""Landmark-Schur camera LM vs the generic dense LM on the same problem."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from liwslam.core import geometry as geo
from liwslam.solve import cam_schur, factors as fac, gn

F, WC = 12, 4
DT = jnp.float32


def _problem(seed=0, n_free_lm=9, n_use_drop=5):
    rng = np.random.default_rng(seed)
    Tic = jnp.asarray(np.eye(4), DT)
    sqrt_info = jnp.asarray([400.0, 400.0], DT)

    gt_world = rng.uniform(-2, 2, (F, 3)) + np.asarray([0, 0, 5.0])
    # wide baselines so depth is well-determined (the parity claim holds
    # regardless; the geometry-recovery gate needs conditioning)
    ring_p = rng.uniform(-1.0, 1.0, (WC, 3))
    ring_q = rng.normal(0, 0.05, (WC, 3))
    gt_cur_pq = rng.normal(0, 0.1, 6)

    # observations: project gt_world through each pose + pixel noise
    def proj(p, q, wld):
        T = np.asarray(geo.make_tf(jnp.asarray(p, DT), jnp.asarray(q, DT)))
        cam = np.linalg.inv(T) @ np.concatenate([wld, [1.0]])
        return cam[:2] / cam[2]

    obs = np.zeros((F, WC, 2))
    for f in range(F):
        for w in range(WC):
            p = gt_cur_pq[:3] if w == WC - 1 else ring_p[w]
            q = gt_cur_pq[3:] if w == WC - 1 else ring_q[w]
            obs[f, w] = proj(p, q, gt_world[f]) + rng.normal(0, 1e-3, 2)

    use = np.ones((F, WC), bool)
    use[rng.integers(0, F, n_use_drop), rng.integers(0, WC, n_use_drop)] = False
    lm_free = np.zeros(F, bool)
    lm_free[:n_free_lm] = True

    # base residual: a simple quadratic prior pulling x30 to a target
    # (equivalence needs any differentiable base rows, not realistic ones)
    target = np.zeros(30)
    target[15:18] = gt_cur_pq[:3] + rng.normal(0, 0.02, 3)
    target[18:21] = gt_cur_pq[3:] + rng.normal(0, 0.01, 3)
    w30 = np.full(30, 3.0)
    target_j = jnp.asarray(target, DT)
    w30_j = jnp.asarray(w30, DT)

    def res30_fn(x):
        return (x - target_j) * w30_j

    free30 = np.zeros(30)
    free30[15:30] = 1.0
    x0 = np.zeros(30)
    x0[15:18] = gt_cur_pq[:3] + 0.05
    x0[18:21] = gt_cur_pq[3:] - 0.02
    world0 = gt_world + rng.normal(0, 0.15, (F, 3))

    return dict(
        res30_fn=res30_fn,
        x0=jnp.asarray(x0, DT),
        free30=jnp.asarray(free30, DT),
        world0=jnp.asarray(world0, DT),
        lm_free=jnp.asarray(lm_free),
        obs=jnp.asarray(obs, DT),
        use=jnp.asarray(use),
        ring_p=jnp.asarray(ring_p, DT),
        ring_q=jnp.asarray(ring_q, DT),
        Tic=Tic,
        sqrt_info=sqrt_info,
        gt_world=gt_world,
        gt_cur_pq=gt_cur_pq,
    )


def _dense_reference(pr, cfg):
    """gn.lm_solve over the joint (30+3F)-dim state, rows built exactly
    like camera_pipeline.camera_rows."""
    obs, use = pr["obs"], pr["use"]
    ring_p, ring_q = pr["ring_p"], pr["ring_q"]
    Tic, sq = pr["Tic"], pr["sqrt_info"]
    lm_free = pr["lm_free"]

    def rows(x30, world):
        def one(f, w):
            is_cur = w == WC - 1
            p = jnp.where(is_cur, x30[15:18], ring_p[w])
            q = jnp.where(is_cur, x30[18:21], ring_q[w])
            r = fac.camera_residual(p, q, world[f], obs[f, w], Tic, sq)
            return r * use[f, w].astype(r.dtype)

        ff, ww = jnp.meshgrid(jnp.arange(F), jnp.arange(WC), indexing="ij")
        return jax.vmap(jax.vmap(one))(ff, ww).reshape(-1)

    def res_full(z):
        x30 = z[:30]
        world = z[30:].reshape(F, 3)
        return jnp.concatenate([pr["res30_fn"](x30), rows(x30, world)])

    free = jnp.concatenate(
        [pr["free30"], jnp.repeat(lm_free.astype(DT), 3)]
    )
    z0 = jnp.concatenate([pr["x0"], pr["world0"].reshape(-1)])
    z_opt, cost, _ = gn.lm_solve(res_full, z0, free, cfg)
    return z_opt[:30], z_opt[30:].reshape(F, 3), cost


@pytest.mark.parametrize("seed", [0, 3])
def test_schur_matches_dense(seed):
    pr = _problem(seed)
    cfg = gn.LMConfig(max_iters=30, ftol=1e-6, method="chol")
    x_d, w_d, c_d = jax.jit(lambda: _dense_reference(pr, cfg))()
    x_s, w_s, c_s = jax.jit(
        lambda: cam_schur.lm_solve_cam_schur(
            pr["res30_fn"], pr["x0"], pr["free30"], pr["world0"],
            pr["lm_free"], pr["obs"], pr["use"], pr["ring_p"], pr["ring_q"],
            pr["Tic"], pr["sqrt_info"], cfg,
        )
    )()
    # both must reach the same optimum (fp ordering differs; the damped
    # steps are algebraically identical)
    assert abs(float(c_s) - float(c_d)) < 0.02 * max(float(c_d), 1e-3), (
        float(c_s), float(c_d),
    )
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_d), atol=2e-3)
    lmf = np.asarray(pr["lm_free"])
    np.testing.assert_allclose(
        np.asarray(w_s)[lmf], np.asarray(w_d)[lmf], atol=5e-3
    )
    # frozen landmarks must not move in either path
    np.testing.assert_array_equal(
        np.asarray(w_s)[~lmf], np.asarray(pr["world0"])[~lmf]
    )
    # and both make real progress toward the simulated geometry (exact
    # recovery is a conditioning question, not what this test pins)
    err0 = np.linalg.norm(
        np.asarray(pr["world0"])[lmf] - pr["gt_world"][lmf], axis=1
    )
    err = np.linalg.norm(np.asarray(w_s)[lmf] - pr["gt_world"][lmf], axis=1)
    assert np.median(err) < 0.5 * np.median(err0), (
        np.median(err), np.median(err0),
    )
