"""Pallas camera-solve kernel vs the landmark-Schur XLA path.

Parity chain: ops/cam_solve (one kernel) vs solve/cam_schur (XLA) —
itself pinned against the generic dense LM in tests/test_cam_schur.py —
plus gn.marginalize for the fused prior reduction.  Kernels run in
interpreter mode on CPU (tests/conftest.py forces CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from liwslam.core import geometry as geo
from liwslam.ops import cam_solve
from liwslam.solve import cam_schur, factors as fac, gn

from tests.test_solver import CONSTS, PRM, empty_factor_data, two_frame_setup

F, WC = 12, 4
DT = jnp.float32


def _camera_problem(seed=0, n_free_lm=9, n_use_drop=5):
    """Real base rows (imu/wheel/ground/prior between two sim frames, no
    laser — _cam_factor_data structure) + synthetic reprojection rows."""
    rng = np.random.default_rng(seed)
    st, d0, _, _ = two_frame_setup()
    d = empty_factor_data(2, 1)
    d = d._replace(
        imu_X=d0.imu_X, imu_J=d0.imu_J, imu_sqrtP=d0.imu_sqrtP,
        imu_Dt=d0.imu_Dt, imu_valid=d0.imu_valid,
        wheel_dT=d0.wheel_dT, wheel_sqrt=d0.wheel_sqrt,
        wheel_valid=d0.wheel_valid, ground_weight=d0.ground_weight,
    )
    A = rng.normal(size=(15, 15)).astype(np.float32) * 0.3
    d = d._replace(
        prior_J=jnp.asarray(A + 5.0 * np.eye(15, dtype=np.float32)),
        prior_X=st.flat()[:15] + 0.01,
        prior_valid=jnp.asarray(True),
    )

    Tic = jnp.asarray(PRM.mat_T_imu_to_camera(), DT)
    sqrt_info = jnp.asarray([400.0, 400.0], DT)

    # landmarks in front of the current camera
    T_w_c1 = np.asarray(geo.make_tf(st.p[1], st.q[1])) @ np.asarray(Tic)
    pts_c = rng.uniform(-1.5, 1.5, (F, 3)) + np.asarray([0, 0, 5.0])
    gt_world = (T_w_c1 @ np.concatenate([pts_c, np.ones((F, 1))], 1).T).T[:, :3]

    # ring poses: small perturbations of the current pose
    ring_p = np.asarray(st.p[1])[None] + rng.uniform(-0.3, 0.3, (WC, 3))
    ring_q = np.asarray(st.q[1])[None] + rng.normal(0, 0.03, (WC, 3))

    def proj(p, q, wld):
        T = np.asarray(
            geo.make_tf(jnp.asarray(p, DT), jnp.asarray(q, DT))
        ) @ np.asarray(Tic)
        cam = np.linalg.inv(T) @ np.concatenate([wld, [1.0]])
        return cam[:2] / cam[2]

    obs = np.zeros((F, WC, 2))
    for f in range(F):
        for w in range(WC):
            p = np.asarray(st.p[1]) if w == WC - 1 else ring_p[w]
            q = np.asarray(st.q[1]) if w == WC - 1 else ring_q[w]
            obs[f, w] = proj(p, q, gt_world[f]) + rng.normal(0, 1e-3, 2)

    use = np.ones((F, WC), bool)
    use[rng.integers(0, F, n_use_drop), rng.integers(0, WC, n_use_drop)] = False
    lm_free = np.zeros(F, bool)
    lm_free[:n_free_lm] = True

    x0 = np.asarray(st.flat()).copy()
    x0[15:18] += [0.03, -0.02, 0.01]
    x0[18:21] += [0.01, -0.008, 0.015]
    free30 = np.zeros(30, np.float32)
    free30[15:] = 1.0
    free30[6:9] = 1.0
    free30[9:15] = 1.0
    world0 = gt_world + rng.normal(0, 0.1, (F, 3))

    return dict(
        data=d,
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
    )


def _reference(pr, max_iters=12):
    d = pr["data"]
    res30 = lambda x: fac.stack_residuals(
        fac.WindowState.from_flat(x, 2), d, CONSTS
    )
    from liwslam.frontend import pipeline as pl

    cfg = gn.LMConfig(max_iters=max_iters, method="chol")
    x_s, w_s, c_s = jax.jit(
        lambda: cam_schur.lm_solve_cam_schur(
            res30, pr["x0"], pr["free30"], pr["world0"], pr["lm_free"],
            pr["obs"], pr["use"], pr["ring_p"], pr["ring_q"], pr["Tic"],
            pr["sqrt_info"], cfg,
            wrap30=lambda x: pl._wrap_q(x, 2, DT),
        )
    )()
    return np.asarray(x_s), np.asarray(w_s), float(c_s)


def test_cam_kernel_matches_schur_path():
    pr = _camera_problem()
    x_ref, w_ref, c_ref = _reference(pr)
    x_k, w_k, c_k, dH_k, dg_k = cam_solve.lm_solve_cam(
        pr["x0"], pr["free30"], pr["world0"], pr["lm_free"], pr["obs"],
        pr["use"], pr["ring_p"], pr["ring_q"], pr["data"], CONSTS,
        pr["Tic"], pr["sqrt_info"], max_iters=12, interpret=True,
    )
    # same optimum up to fp ordering; poses tight, v/bias loose
    np.testing.assert_allclose(np.asarray(x_k)[15:21], x_ref[15:21], atol=1e-3)
    np.testing.assert_allclose(np.asarray(x_k), x_ref, atol=5e-3)
    lmf = np.asarray(pr["lm_free"])
    np.testing.assert_allclose(
        np.asarray(w_k)[lmf], w_ref[lmf], atol=5e-3
    )
    # frozen landmarks must not move
    np.testing.assert_array_equal(
        np.asarray(w_k)[~lmf], np.asarray(pr["world0"])[~lmf]
    )
    assert abs(c_k - c_ref) < 0.02 * max(c_ref, 1e-3), (float(c_k), c_ref)

    # the fused marginalization: reference Schur at the KERNEL's solution
    d = pr["data"]
    res30 = lambda x: fac.stack_residuals(
        fac.WindowState.from_flat(x, 2), d, CONSTS
    )
    r = np.asarray(res30(jnp.asarray(x_k)))
    J = np.asarray(jax.jacfwd(res30)(jnp.asarray(x_k)))
    H = J.T @ J
    g = -(J.T @ r)
    Hmm = H[:15, :15] + 1e-8 * np.eye(15)
    sol = np.linalg.solve(Hmm, np.concatenate([H[:15, 15:], g[:15, None]], 1))
    dH_ref = H[15:, 15:] - H[15:, :15] @ sol[:, :15]
    dH_ref = 0.5 * (dH_ref + dH_ref.T)
    dg_ref = g[15:] - H[15:, :15] @ sol[:, 15]
    scale = np.abs(dH_ref).max()
    rng = np.random.default_rng(5)
    dHk = np.asarray(dH_k, np.float64)
    for _ in range(16):
        v = rng.normal(size=15)
        v /= np.linalg.norm(v)
        qk = v @ dHk @ v
        qr = v @ dH_ref @ v
        assert abs(qk - qr) < 0.10 * max(abs(qr), 1e-4 * scale), (qk, qr)
    assert np.abs(np.asarray(dg_k, np.float64) - dg_ref).max() < 1e-4 * scale


def test_cam_kernel_no_camera_rows():
    """With every reprojection row masked out, the kernel must reduce to
    the base-only problem (same as the tracking solve minus laser)."""
    pr = _camera_problem()
    use0 = jnp.zeros_like(pr["use"])
    lmf0 = jnp.zeros_like(pr["lm_free"])
    d = pr["data"]
    res30 = lambda x: fac.stack_residuals(
        fac.WindowState.from_flat(x, 2), d, CONSTS
    )
    from liwslam.frontend import pipeline as pl

    x_ref, c_ref, _ = jax.jit(
        lambda: gn.lm_solve(
            res30, pr["x0"], pr["free30"],
            gn.LMConfig(max_iters=12, method="chol"),
            wrap_fn=lambda x: pl._wrap_q(x, 2, DT),
        )
    )()
    x_k, w_k, c_k, _, _ = cam_solve.lm_solve_cam(
        pr["x0"], pr["free30"], pr["world0"], lmf0, pr["obs"], use0,
        pr["ring_p"], pr["ring_q"], d, CONSTS, pr["Tic"], pr["sqrt_info"],
        max_iters=12, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref), atol=5e-3)
    np.testing.assert_array_equal(np.asarray(w_k), np.asarray(pr["world0"]))
    assert abs(float(c_k) - float(c_ref)) < 0.02 * max(float(c_ref), 1e-3)
