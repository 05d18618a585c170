"""Pallas tracking-solve kernel vs the XLA LM + marginalization path.

Kernels run in interpreter mode on CPU (tests/conftest.py forces CPU);
the real-TPU compile is exercised by bench/pipeline runs.
"""

import numpy as np
import jax
import jax.numpy as jnp

from liwslam import config
from liwslam.core import geometry as geo
from liwslam.ops import track_solve
from liwslam.solve import factors as fac
from liwslam.solve import gn

from tests.test_solver import CONSTS, empty_factor_data, two_frame_setup


def tracking_problem(with_prior=True, M=64):
    st, d0, _, _ = two_frame_setup()
    # rebuild with a realistic laser capacity, keeping the preint factors
    d = empty_factor_data(2, M)
    d = d._replace(
        imu_X=d0.imu_X, imu_J=d0.imu_J, imu_sqrtP=d0.imu_sqrtP,
        imu_Dt=d0.imu_Dt, imu_valid=d0.imu_valid,
        wheel_dT=d0.wheel_dT, wheel_sqrt=d0.wheel_sqrt,
        wheel_valid=d0.wheel_valid, ground_weight=d0.ground_weight,
    )
    rng = np.random.default_rng(3)
    ang = rng.uniform(0, np.pi, M)
    c0 = rng.uniform(-3, 3, (M, 2))
    u = np.stack([np.cos(ang), np.sin(ang)], -1)
    w1 = np.concatenate([c0 - u, np.zeros((M, 1))], -1)
    w2 = np.concatenate([c0 + u, np.zeros((M, 1))], -1)
    Til = np.asarray(CONSTS.T_imu_to_laser)
    T0 = np.asarray(geo.make_tf(st.p[0], st.q[0])) @ Til
    T1 = np.asarray(geo.make_tf(st.p[1], st.q[1])) @ Til
    to = lambda T, w: (
        np.linalg.inv(T) @ np.concatenate([w, np.ones((M, 1))], -1).T
    ).T[:, :3]
    valid = rng.random(M) > 0.3  # some masked rows
    # observation noise so the optimum is NOT at the exactly-zero-distance
    # clamp of safe_norm (perfect synthetic lines put every laser residual
    # on the non-smooth point, where subgradient branches of different
    # implementations legitimately differ)
    n1 = rng.normal(0, 5e-3, (M, 3)) * [1, 1, 0]
    n2 = rng.normal(0, 5e-3, (M, 3)) * [1, 1, 0]
    d = d._replace(
        laser_l1p1=jnp.asarray(to(T0, w1), jnp.float32),
        laser_l1p2=jnp.asarray(to(T0, w2), jnp.float32),
        laser_l2p1=jnp.asarray(to(T1, w1) + n1, jnp.float32),
        laser_l2p2=jnp.asarray(to(T1, w2) + n2, jnp.float32),
        laser_ref_p=jnp.tile(st.p[0][None], (M, 1)),
        laser_ref_q=jnp.tile(st.q[0][None], (M, 1)),
        laser_valid=jnp.asarray(valid),
        laser_j_idx=jnp.full((M,), 1, jnp.int32),  # tracking: last frame
    )
    if with_prior:
        # a plausible SPD prior block on frame 0
        A = rng.normal(size=(15, 15)).astype(np.float32) * 0.3
        d = d._replace(
            prior_J=jnp.asarray(A + 5.0 * np.eye(15, dtype=np.float32)),
            prior_X=st.flat()[:15] + 0.01,
            prior_valid=jnp.asarray(True),
        )
    x0 = np.asarray(st.flat()).copy()
    x0[15:18] += [0.04, -0.03, 0.01]
    x0[18:21] += [0.01, -0.01, 0.02]
    x0[21:24] += [0.03, 0.0, -0.02]
    free = np.zeros(30, np.float32)
    free[15:] = 1.0
    free[6:9] = 1.0
    free[9:15] = 1.0
    return st, d, jnp.asarray(x0, jnp.float32), jnp.asarray(free)


def reference_solution(d, x0, free, max_iters=8):
    res_fn = lambda x: fac.stack_residuals(
        fac.WindowState.from_flat(x, 2), d, CONSTS
    )
    x_opt, cost, _, lin = jax.jit(
        lambda x: gn.lm_solve(
            res_fn,
            x,
            free,
            gn.LMConfig(max_iters=max_iters, method="chol"),
            wrap_fn=lambda y: fac.WindowState.from_flat(y, 2)
            ._replace(q=geo.normalize_so3(fac.WindowState.from_flat(y, 2).q))
            .flat(),
            return_lin=True,
        )
    )(x0)
    r, J = lin
    H = np.asarray(J).T @ np.asarray(J)
    g = -(np.asarray(J).T @ np.asarray(r))
    Hmm = H[:15, :15] + 1e-8 * np.eye(15)
    sol = np.linalg.solve(Hmm, np.concatenate([H[:15, 15:], g[:15, None]], 1))
    dH = H[15:, 15:] - H[15:, :15] @ sol[:, :15]
    dg = g[15:] - H[15:, :15] @ sol[:, 15]
    return np.asarray(x_opt), float(cost), 0.5 * (dH + dH.T), dg


def test_kernel_residual_matches_stack():
    # the packed in-kernel residual must equal stack_residuals minus the
    # always-zero frame-0 imu/wheel rows
    st, d, x0, free = tracking_problem()
    state, imu_in, prior_in, laser_in = track_solve.pack_inputs(
        x0, free, d, CONSTS
    )
    res = track_solve._make_residual(
        np.asarray(state), np.asarray(imu_in), np.asarray(prior_in),
        np.asarray(laser_in), laser_in.shape[0],
    )
    # the kernel residual returns per-factor blocks (imu, wheel, laser
    # endpoint-1, laser endpoint-2, ground f0, ground f1, prior); the
    # stacked vector never exists on device — stack it here
    r_kernel = np.concatenate([np.atleast_1d(np.asarray(b)) for b in res(x0)])
    r_ref = np.asarray(
        fac.stack_residuals(fac.WindowState.from_flat(x0, 2), d, CONSTS)
    )
    # reference layout: imu (2,15) flat, wheel (2,3) flat, laser (M,2)
    # flat, ground (2,2) flat, prior (15,) — frame-0 imu/wheel rows zero
    M = d.laser_l1p1.shape[0]
    o = 36 + 2 * M
    # the kernel emits laser rows BLOCKED ([all endpoint-1 | all
    # endpoint-2]; Mosaic cannot reshape (M,2)->(2M,)) where
    # stack_residuals interleaves — permute the reference to match
    laser_ref = r_ref[36:o].reshape(M, 2).T.reshape(-1)
    want = np.concatenate(
        [r_ref[15:30], r_ref[33:36], laser_ref, r_ref[o : o + 4], r_ref[o + 4 :]]
    )
    # atol 3e-4: the round-5 fusion-friendly geometry rewrite reorders
    # f32 reference-side arithmetic by ~1e-4 absolute
    np.testing.assert_allclose(r_kernel, want, rtol=2e-4, atol=3e-4)


def test_kernel_solve_matches_xla_path():
    st, d, x0, free = tracking_problem()
    x_ref, c_ref, dH_ref, dg_ref = reference_solution(d, x0, free)
    x_k, c_k, dH_k, dg_k = track_solve.lm_solve_track(
        x0, free, d, CONSTS, max_iters=8, interpret=True
    )
    # weakly-determined components (v/bias) absorb fp-ordering noise in
    # the LM trajectory; poses must agree tightly, the rest loosely
    np.testing.assert_allclose(np.asarray(x_k)[15:21], x_ref[15:21], atol=5e-4)
    np.testing.assert_allclose(np.asarray(x_k), x_ref, atol=2e-3)
    # the kernel must converge at least as well as the XLA path
    assert float(c_k) <= c_ref * 1.02, (float(c_k), c_ref)

    # Schur comparison at the SAME linearization point (the kernel's
    # solution): dH entries span ~1e9 with f32 cancellation noise in the
    # small ones (inherent to both paths), so compare quadratic forms —
    # what the prior actually applies to a state perturbation
    res_fn = lambda x: fac.stack_residuals(
        fac.WindowState.from_flat(x, 2), d, CONSTS
    )
    r, J = np.asarray(res_fn(jnp.asarray(x_k))), np.asarray(
        jax.jacfwd(res_fn)(jnp.asarray(x_k))
    )
    H = J.T @ J
    g = -(J.T @ r)
    Hmm = H[:15, :15] + 1e-8 * np.eye(15)
    sol = np.linalg.solve(Hmm, np.concatenate([H[:15, 15:], g[:15, None]], 1))
    dH_at_k = H[15:, 15:] - H[15:, :15] @ sol[:, :15]
    dH_at_k = 0.5 * (dH_at_k + dH_at_k.T)
    dg_at_k = g[15:] - H[15:, :15] @ sol[:, 15]
    # This synthetic problem is deliberately extreme (64 perfect 2 m lines
    # at weight ~7e3 -> cond(H) ~1e9, 93% cancellation in the Schur
    # complement); measured: f32 H-build alone costs ~5% here, for BOTH
    # the kernel and the XLA pipeline path.  Contract: quadratic forms
    # within 10%, gradient error small against the curvature scale (what
    # bounds the induced prior-mean shift).  Real-data accuracy is gated
    # end-to-end by test_frontend_e2e with solver_method='pallas'.
    rng = np.random.default_rng(5)
    dH_k = np.asarray(dH_k, np.float64)
    scale = np.abs(dH_at_k).max()
    for _ in range(16):
        v = rng.normal(size=15)
        v /= np.linalg.norm(v)
        qk = v @ dH_k @ v
        qr = v @ dH_at_k @ v
        assert abs(qk - qr) < 0.10 * max(abs(qr), 1e-4 * scale), (qk, qr)
    assert np.abs(np.asarray(dg_k, np.float64) - dg_at_k).max() < 1e-4 * scale


def test_kernel_solve_no_prior():
    st, d, x0, free = tracking_problem(with_prior=False)
    x_ref, c_ref, _, _ = reference_solution(d, x0, free)
    x_k, c_k, _, _ = track_solve.lm_solve_track(
        x0, free, d, CONSTS, max_iters=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(x_k), x_ref, atol=5e-4)
    assert abs(float(c_k) - c_ref) < 0.02 * max(c_ref, 1.0)


def test_early_exit_identical_to_fixed_trip():
    """The while_loop early exit applies the same updates as the fori
    form (the body freezes all state once done), so results must agree
    to fp-reassociation noise — the two loop forms compile with
    different fusion, so bitwise equality is not guaranteed."""
    st, d, x0, free = tracking_problem()
    outs = {}
    for ee in (False, True):
        outs[ee] = track_solve.lm_solve_track(
            x0, free, d, CONSTS, max_iters=8, interpret=True, early_exit=ee
        )
    x_f, c_f, dH_f, dg_f = outs[False]
    x_w, c_w, dH_w, dg_w = outs[True]
    np.testing.assert_allclose(np.asarray(x_w), np.asarray(x_f), atol=1e-3)
    assert abs(float(c_w) - float(c_f)) <= 1e-3 * max(float(c_f), 1.0)
    scale = max(np.abs(np.asarray(dH_f)).max(), 1.0)
    np.testing.assert_allclose(
        np.asarray(dH_w) / scale, np.asarray(dH_f) / scale, atol=1e-3
    )
