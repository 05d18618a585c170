"""Factor residual zero-points, LM convergence, marginalization algebra."""

import numpy as np
import jax
import jax.numpy as jnp

from liwslam import config
from liwslam.core import geometry as geo
from liwslam.frontend import preintegration as pre
from liwslam.sim import world as sim
from liwslam.solve import factors as fac
from liwslam.solve import gn

PRM = config.office()
CONSTS = fac.make_consts(PRM)


def empty_factor_data(W, M, dtype=jnp.float32):
    z = jnp.zeros
    return fac.FactorData(
        imu_X=z((W, 15), dtype),
        imu_J=jnp.tile(jnp.eye(15, dtype=dtype), (W, 1, 1)),
        imu_sqrtP=jnp.tile(jnp.eye(15, dtype=dtype), (W, 1, 1)),
        imu_Dt=z(W, dtype),
        imu_valid=z(W, bool),
        wheel_dT=jnp.tile(jnp.eye(4, dtype=dtype), (W, 1, 1)),
        wheel_sqrt=jnp.tile(jnp.eye(3, dtype=dtype), (W, 1, 1)),
        wheel_valid=z(W, bool),
        laser_l1p1=z((M, 3), dtype),
        laser_l1p2=z((M, 3), dtype),
        laser_l2p1=z((M, 3), dtype),
        laser_l2p2=z((M, 3), dtype),
        laser_i_idx=-jnp.ones(M, jnp.int32),
        laser_j_idx=z(M, jnp.int32),
        laser_ref_p=z((M, 3), dtype),
        laser_ref_q=z((M, 3), dtype),
        laser_valid=z(M, bool),
        ground_weight=jnp.asarray(1.0, dtype),
        frame_valid=jnp.ones(W, bool),
        prior_J=jnp.eye(15, dtype=dtype),
        prior_X=z(15, dtype),
        prior_res=z(15, dtype),
        prior_idx=jnp.asarray(0, jnp.int32),
        prior_valid=jnp.asarray(False),
    )


def two_frame_setup(k=40):
    """Ground-truth states + preintegration between sim scans k, k+1."""
    track = sim.default_track("L")
    streams = sim.simulate(track, sim.square_room(), PRM, imu_hz=200, laser_hz=10)
    t0, t1 = streams.laser_t_us[k], streams.laser_t_us[k + 1]

    # ground-truth states
    def state_at(t_us):
        t = t_us * 1e-6
        T = np.asarray(streams.gt_T_w_imu[0])  # placeholder
        T = track.pose(t) @ np.linalg.inv(PRM.mat_T_imu_to_wheel())
        h = 1e-4
        Tp = track.pose(t + h) @ np.linalg.inv(PRM.mat_T_imu_to_wheel())
        Tm = track.pose(max(t - h, 0)) @ np.linalg.inv(PRM.mat_T_imu_to_wheel())
        v = (Tp[:3, 3] - Tm[:3, 3]) / (2 * h)
        p, q = geo.log_SE3(jnp.asarray(T, jnp.float32))
        return np.asarray(p), np.asarray(q), v.astype(np.float32)

    p0, q0, v0 = state_at(t0)
    p1, q1, v1 = state_at(t1)
    st = fac.WindowState(
        p=jnp.asarray(np.stack([p0, p1]), jnp.float32),
        q=jnp.asarray(np.stack([q0, q1]), jnp.float32),
        v=jnp.asarray(np.stack([v0, v1]), jnp.float32),
        bs=jnp.zeros((2, 6), jnp.float32),
    )

    # IMU preintegration over (t0, t1]
    Q = pre.imu_noise_Q(PRM)
    sel = (streams.imu_t_us > t0) & (streams.imu_t_us <= t1)
    # seed the carry with the last sample at or before t0 (zero-order hold)
    prev = np.where(streams.imu_t_us <= t0)[0][-1]
    c = pre.imu_reset(0, jnp.zeros(3), jnp.zeros(3))
    c = c._replace(
        last_acc=jnp.asarray(streams.imu_acc[prev]),
        last_gyro=jnp.asarray(streams.imu_gyro[prev]),
        has_sample=jnp.asarray(True),
    )
    c = pre.imu_add_samples(
        c,
        jnp.asarray(streams.imu_acc[sel]),
        jnp.asarray(streams.imu_gyro[sel]),
        jnp.asarray((streams.imu_t_us[sel] - t0).astype(np.int32)),
        jnp.ones(int(sel.sum()), bool),
        Q,
    )
    c = pre.imu_update_only_t(c, int(t1 - t0), Q)
    imu_res = pre.imu_result(c)

    # wheel preintegration over (t0, t1]
    selw = (streams.wheel_t_us > t0) & (streams.wheel_t_us <= t1)
    prevw = np.where(streams.wheel_t_us <= t0)[0][-1]
    wc = pre.wheel_reset(0)
    wc = wc._replace(
        last_pose=jnp.asarray(streams.wheel_pose[prevw]),
        last_pose_t_us=jnp.asarray(
            (streams.wheel_t_us[prevw] - t0).astype(np.int32)
        ),
        last_update_t_us=jnp.asarray(0, jnp.int32),
        has_sample=jnp.asarray(True),
    )
    wc = pre.wheel_add_samples(
        wc,
        jnp.asarray(streams.wheel_pose[selw]),
        jnp.asarray((streams.wheel_t_us[selw] - t0).astype(np.int32)),
        jnp.ones(int(selw.sum()), bool),
    )
    wc = pre.wheel_update_only_t(wc, int(t1 - t0))
    wheel_res = pre.wheel_result(wc, PRM.wheel_sigma)

    d = empty_factor_data(2, 8)
    d = d._replace(
        imu_X=d.imu_X.at[1].set(imu_res.X),
        imu_J=d.imu_J.at[1].set(imu_res.J),
        imu_sqrtP=d.imu_sqrtP.at[1].set(imu_res.sqrt_inverse_P),
        imu_Dt=d.imu_Dt.at[1].set(imu_res.Dt),
        imu_valid=d.imu_valid.at[1].set(True),
        wheel_dT=d.wheel_dT.at[1].set(wheel_res.delta_T),
        wheel_sqrt=d.wheel_sqrt.at[1].set(wheel_res.sqrt_inverse_P),
        wheel_valid=d.wheel_valid.at[1].set(True),
        ground_weight=jnp.asarray(np.sqrt(2.0), jnp.float32),
    )
    return st, d, streams, (t0, t1)


def test_residuals_near_zero_at_ground_truth():
    st, d, _, _ = two_frame_setup()
    r_imu = np.asarray(fac.imu_residual(st, d, CONSTS))[1]
    # whitened IMU residual at truth: small relative to sigma scale
    assert np.abs(r_imu).max() < 3.0, r_imu
    r_wheel = np.asarray(fac.wheel_residual(st, d, CONSTS))[1]
    assert np.abs(r_wheel).max() < 2.0, r_wheel
    r_ground = np.asarray(fac.ground_residual(st, d, CONSTS))
    assert np.abs(r_ground).max() < 2.0, r_ground


def test_lm_recovers_perturbed_frame():
    st, d, _, _ = two_frame_setup()
    x_true = st.flat()
    # perturb frame 1 pose + velocity
    x0 = np.asarray(x_true).copy()
    x0[15 + 0 : 15 + 3] += [0.05, -0.04, 0.0]
    x0[15 + 3 : 15 + 6] += [0.0, 0.0, 0.03]
    x0[15 + 6 : 15 + 9] += [0.05, -0.05, 0.0]
    free = np.zeros(30, np.float32)
    free[15:] = 1.0  # frame 0 frozen (SetParameterBlockConstant)

    res_fn = lambda x: fac.stack_residuals(
        fac.WindowState.from_flat(x, 2), d, CONSTS
    )
    x_opt, cost, iters = jax.jit(
        lambda x0: gn.lm_solve(res_fn, x0, jnp.asarray(free), gn.LMConfig(max_iters=20))
    )(jnp.asarray(x0, jnp.float32))
    x_opt = np.asarray(x_opt)
    # frozen frame untouched
    np.testing.assert_allclose(x_opt[:15], np.asarray(x_true)[:15], atol=1e-7)
    # recovered pose close to truth (IMU+wheel+ground only: yaw observable
    # via wheel yaw-norm only weakly; position via arc length + imu)
    err_p = np.linalg.norm(x_opt[15:17] - np.asarray(x_true)[15:17])
    err_p0 = np.linalg.norm(x0[15:17] - np.asarray(x_true)[15:17])
    assert err_p < 0.5 * err_p0, (err_p, err_p0)
    # z / roll / pitch controlled by ground factors
    assert abs(x_opt[17] - np.asarray(x_true)[17]) < 0.02


def test_lm_chol_matches_qr_on_tracking_problem():
    # the normal-equations path must land on the same optimum as the QR
    # path on a realistic whitened problem (laser rows weighted ~3e3)
    st, d, _, _ = two_frame_setup()
    rng = np.random.default_rng(7)
    M = d.laser_l1p1.shape[0]
    # synthetic wall lines observed from both frames (exactly consistent)
    ang = rng.uniform(0, np.pi, M)
    c0 = rng.uniform(-3, 3, (M, 2))
    u = np.stack([np.cos(ang), np.sin(ang)], -1)
    w1 = np.concatenate([c0 - u, np.zeros((M, 1))], -1)
    w2 = np.concatenate([c0 + u, np.zeros((M, 1))], -1)
    Til = np.asarray(CONSTS.T_imu_to_laser)
    T0 = np.asarray(geo.make_tf(st.p[0], st.q[0])) @ Til
    T1 = np.asarray(geo.make_tf(st.p[1], st.q[1])) @ Til
    to = lambda T, w: (np.linalg.inv(T) @ np.concatenate([w, np.ones((M, 1))], -1).T).T[:, :3]
    d = d._replace(
        laser_l1p1=jnp.asarray(to(T0, w1), jnp.float32),
        laser_l1p2=jnp.asarray(to(T0, w2), jnp.float32),
        laser_l2p1=jnp.asarray(to(T1, w1), jnp.float32),
        laser_l2p2=jnp.asarray(to(T1, w2), jnp.float32),
        laser_ref_p=jnp.tile(st.p[0][None], (M, 1)),
        laser_ref_q=jnp.tile(st.q[0][None], (M, 1)),
        laser_valid=jnp.ones(M, bool),
    )
    x0 = np.asarray(st.flat()).copy()
    x0[15:18] += [0.04, -0.03, 0.01]
    x0[18:21] += [0.01, -0.01, 0.02]
    free = np.zeros(30, np.float32)
    free[15:] = 1.0
    res_fn = lambda x: fac.stack_residuals(fac.WindowState.from_flat(x, 2), d, CONSTS)
    sols = {}
    for m in ("qr", "chol"):
        x_opt, cost, _ = jax.jit(
            lambda x, m=m: gn.lm_solve(
                res_fn, x, jnp.asarray(free), gn.LMConfig(max_iters=12, method=m)
            )
        )(jnp.asarray(x0, jnp.float32))
        sols[m] = (np.asarray(x_opt), float(cost))
    np.testing.assert_allclose(sols["chol"][0], sols["qr"][0], atol=2e-4)
    assert abs(sols["chol"][1] - sols["qr"][1]) < 0.02 * max(sols["qr"][1], 1.0)


def test_lm_simple_quadratic():
    A = jnp.asarray(np.random.default_rng(0).normal(size=(10, 4)), jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).normal(size=(10,)), jnp.float32)
    res = lambda x: A @ x - b
    x_opt, cost, it = gn.lm_solve(
        res, jnp.zeros(4), jnp.ones(4), gn.LMConfig(max_iters=25)
    )
    x_ls = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)[0]
    np.testing.assert_allclose(np.asarray(x_opt), x_ls, atol=1e-4)


def test_lm_respects_freeze_mask():
    A = jnp.asarray(np.random.default_rng(0).normal(size=(10, 4)), jnp.float32)
    b = jnp.asarray(np.ones(10), jnp.float32)
    res = lambda x: A @ x - b
    free = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    x0 = jnp.asarray([0.0, 0.5, 0.0, -0.5])
    x_opt, _, _ = gn.lm_solve(res, x0, free, gn.LMConfig(max_iters=25))
    x_opt = np.asarray(x_opt)
    assert x_opt[1] == 0.5 and x_opt[3] == -0.5


def test_marginalize_prior_algebra():
    # toy: r(x) = A x - b over 6 vars, keep last 2
    rng = np.random.default_rng(2)
    A = jnp.asarray(rng.normal(size=(12, 6)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(12,)), jnp.float32)
    res = lambda x: A @ x - b
    x_lin = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    lin_J, lin_res, lin_X = gn.marginalize(res, x_lin, keep=2)
    # lin_J' lin_J must equal the Schur complement
    An = np.asarray(A, np.float64)
    H = An.T @ An
    g = -(An.T @ (An @ np.asarray(x_lin, np.float64) - np.asarray(b, np.float64)))
    dH = H[4:, 4:] - H[4:, :4] @ np.linalg.inv(H[:4, :4]) @ H[:4, 4:]
    np.testing.assert_allclose(
        np.asarray(lin_J, np.float64).T @ np.asarray(lin_J, np.float64),
        dH,
        rtol=2e-3,
        atol=2e-3,
    )
    # the prior's minimizer: lin_J(x-lin_X) = -lin_res  =>  dH dx = dg
    dg = g[4:] - H[4:, :4] @ np.linalg.inv(H[:4, :4]) @ g[:4]
    dx = np.linalg.solve(dH, dg)
    lj = np.asarray(lin_J, np.float64)
    lr = np.asarray(lin_res, np.float64)
    dx_prior = np.linalg.lstsq(lj, -lr, rcond=None)[0]
    np.testing.assert_allclose(dx_prior, dx, rtol=1e-2, atol=1e-2)


def test_laser_residual_pulls_pose():
    # two identical wall lines; perturbed frame j must raise the residual
    st = fac.WindowState(
        p=jnp.zeros((2, 3)), q=jnp.zeros((2, 3)), v=jnp.zeros((2, 3)), bs=jnp.zeros((2, 6))
    )
    d = empty_factor_data(2, 4)
    l1 = (jnp.asarray([1.0, -1.0, 0.0]), jnp.asarray([1.0, 1.0, 0.0]))
    d = d._replace(
        laser_l1p1=d.laser_l1p1.at[0].set(l1[0]),
        laser_l1p2=d.laser_l1p2.at[0].set(l1[1]),
        laser_l2p1=d.laser_l2p1.at[0].set(l1[0]),
        laser_l2p2=d.laser_l2p2.at[0].set(l1[1]),
        laser_j_idx=d.laser_j_idx.at[0].set(1),
        laser_valid=d.laser_valid.at[0].set(True),
    )
    # identity extrinsic for clarity
    consts = CONSTS._replace(T_imu_to_laser=jnp.eye(4))
    r0 = np.asarray(fac.laser_residual(st, d, consts))
    # safe_norm floors the distance at 1e-8 -> residual floor ~7e-5
    np.testing.assert_allclose(r0, 0.0, atol=1e-4)
    st2 = st._replace(p=st.p.at[1, 0].add(0.1))
    r1 = np.asarray(fac.laser_residual(st2, d, consts))
    assert np.abs(r1[0]).max() > 1.0  # 0.1m at info 1000 * len weight


def test_prior_factor_residual():
    """edge_factor.h:27-77 semantics: zero at the prior point, linear in
    the deviation through sqrt_H; jacfwd matches -sqrt_H."""
    import jax

    rng = np.random.default_rng(0)
    A = rng.normal(size=(6, 6))
    sqrt_H = jnp.asarray(A @ A.T * 0.1 + np.eye(6), jnp.float32)
    pp = jnp.asarray(rng.normal(size=3), jnp.float32)
    pq = jnp.asarray(rng.normal(0, 0.3, 3), jnp.float32)
    r0 = fac.prior_factor_residual(pp, pq, pp, pq, sqrt_H)
    np.testing.assert_allclose(np.asarray(r0), 0.0, atol=1e-6)
    d = jnp.asarray(rng.normal(0, 0.01, 6), jnp.float32)
    r = fac.prior_factor_residual(pp + d[:3], pq + d[3:], pp, pq, sqrt_H)
    np.testing.assert_allclose(
        np.asarray(r), -np.asarray(sqrt_H) @ np.asarray(d), atol=1e-5
    )
    J = jax.jacfwd(lambda p, q: fac.prior_factor_residual(p, q, pp, pq, sqrt_H))(
        pp, pq
    )
    np.testing.assert_allclose(np.asarray(J), -np.asarray(sqrt_H)[:, :3], atol=1e-5)


def test_loop_edge_residual():
    """edge_factor.h:128-179 semantics: planar x/y/yaw rows in the wheel
    frame, rows 3-5 exactly zero; zero residual at the measured relative
    pose; finite differences match jacfwd."""
    import jax

    from liwslam import config

    rng = np.random.default_rng(1)
    Tiw = jnp.asarray(config.office().mat_T_imu_to_wheel(), jnp.float32)
    info6 = jnp.asarray([10.0, 10.0, 1.0, 1.0, 1.0, 25.0], jnp.float32)
    p_i = jnp.asarray(rng.normal(size=3), jnp.float32)
    q_i = jnp.asarray(rng.normal(0, 0.2, 3), jnp.float32)
    p_j = jnp.asarray(rng.normal(size=3), jnp.float32)
    q_j = jnp.asarray(rng.normal(0, 0.2, 3), jnp.float32)
    tf_ij = geo.tf_inv(geo.make_tf(p_i, q_i)) @ geo.make_tf(p_j, q_j)
    w_tf12 = geo.tf_inv(Tiw) @ tf_ij @ Tiw  # consistent measurement
    r = fac.loop_edge_residual(p_i, q_i, p_j, q_j, w_tf12, Tiw, info6)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=2e-5)
    # perturbed: rows 3-5 stay exactly zero, the rest respond
    r2 = fac.loop_edge_residual(
        p_i + 0.1, q_i, p_j, q_j, w_tf12, Tiw, info6
    )
    assert np.all(np.asarray(r2[3:]) == 0.0)
    assert np.linalg.norm(np.asarray(r2[:3])) > 1e-3
    # autodiff consistency (finite differences on the first pose)
    f = lambda p: fac.loop_edge_residual(p, q_i, p_j, q_j, w_tf12, Tiw, info6)
    J = np.asarray(jax.jacfwd(f)(p_i))
    eps = 1e-3
    for k in range(3):
        dp = np.zeros(3, np.float32)
        dp[k] = eps
        fd = (np.asarray(f(p_i + dp)) - np.asarray(f(p_i - dp))) / (2 * eps)
        np.testing.assert_allclose(J[:, k], fd, atol=2e-2)
