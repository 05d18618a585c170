"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from liwslam import config
from liwslam.backend import posegraph as pg
from liwslam.core import geometry as geo
from liwslam.parallel import posegraph_dist as pgd

from test_backend import _drifting_square, prm_small, se2


def _build_square_graph():
    true_T, odo_T = _drifting_square()
    K = len(true_T)
    Kc, Ec = 32, 64
    g = pg.empty_graph(Kc, Ec)
    p = np.zeros((Kc, 3), np.float32)
    q = np.zeros((Kc, 3), np.float32)
    for i in range(K):
        pp, qq = geo.log_SE3(jnp.asarray(odo_T[i], jnp.float32))
        p[i], q[i] = np.asarray(pp), np.asarray(qq)
    ei = np.zeros(Ec, np.int32)
    ej = np.zeros(Ec, np.int32)
    etf = np.tile(np.eye(4, dtype=np.float32), (Ec, 1, 1))
    ew = np.zeros(Ec, np.float32)
    for k in range(K - 1):
        ei[k], ej[k] = k, k + 1
        etf[k] = np.linalg.inv(odo_T[k]) @ odo_T[k + 1]
        ew[k] = 1.0
    ei[K - 1], ej[K - 1] = K - 1, 0
    etf[K - 1] = np.linalg.inv(true_T[K - 1]) @ true_T[0]
    ew[K - 1] = 10.0
    g = g._replace(
        p=jnp.asarray(p), q=jnp.asarray(q), node_valid=jnp.arange(Kc) < K,
        e_i=jnp.asarray(ei), e_j=jnp.asarray(ej), e_tf=jnp.asarray(etf),
        e_weight=jnp.asarray(ew), e_valid=jnp.arange(Ec) < K,
        n_nodes=jnp.asarray(K, jnp.int32), n_edges=jnp.asarray(K, jnp.int32),
    )
    return g, true_T, K


def test_sharded_pcg_matches_single_device():
    assert len(jax.devices()) >= 8
    g, true_T, K = _build_square_graph()
    consts = pg.make_pg_consts(prm_small())

    g1, cost1 = jax.jit(lambda g: pg.solve_pcg(g, consts, gn_iters=20, cg_iters=60))(g)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("pg",))
    g_sh = pgd.shard_edges(g, mesh, "pg")
    g8, cost8 = pgd.solve_pcg_sharded(
        g_sh, consts, mesh, axis="pg", gn_iters=20, cg_iters=60
    )

    # f32 psum reduction order perturbs the LM accept/reject path, so exact
    # pose equality is not expected; both must reach the same optimum
    # quality (cost within 5%, loop closed to a fraction of the drift)
    assert abs(float(cost8) - float(cost1)) < 0.05 * float(cost1) + 1e-3
    p1 = np.asarray(g1.p)[:K]
    p8 = np.asarray(g8.p)[:K]
    err_before = 1.69  # drift of the odometry-only square (see test_backend)
    err1 = np.linalg.norm(p1[:, :2] - true_T[:K, :2, 3], axis=1).max()
    err8 = np.linalg.norm(p8[:, :2] - true_T[:K, :2, 3], axis=1).max()
    assert err1 < 0.2 * err_before
    assert err8 < 0.2 * err_before


def test_batched_frontend_shards_over_sequences():
    from liwslam.frontend import pipeline as pl
    from liwslam.parallel import multiseq
    from liwslam.solve import factors as fac

    prm = config.office().replace(
        max_points=128, max_lines=16, max_corners=8, ref_capacity=128,
        max_imu_per_frame=8, max_wheel_per_frame=4, solver_max_iterations=3,
    )
    consts = fac.make_consts(prm)
    scfg = pl.make_static_cfg(prm)
    dcfg = pl.make_dyn_cfg(prm)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("dp",))
    run, shard = multiseq.batched_chunk_fn(consts, dcfg, scfg, mesh, "dp")

    B, F = 8, 2
    st = pl.init_track_state(
        jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(6), scfg
    )
    states = multiseq.replicate_track_states(st, B)

    rng = np.random.default_rng(0)
    ang = np.linspace(-np.pi, np.pi, prm.max_points, endpoint=False)
    pts = np.stack([3 * np.cos(ang), 3 * np.sin(ang), np.zeros_like(ang)], -1)
    one = pl.FrameInput(
        dt_us=np.int32(100000),
        imu_acc=np.tile(np.asarray([[0, 0, 9.8]], np.float32), (prm.max_imu_per_frame, 1)),
        imu_gyro=np.zeros((prm.max_imu_per_frame, 3), np.float32),
        imu_t_us=(np.arange(prm.max_imu_per_frame) * 12000 + 1000).astype(np.int32),
        imu_mask=np.ones(prm.max_imu_per_frame, bool),
        wheel_pose=np.tile(np.eye(4, dtype=np.float32), (prm.max_wheel_per_frame, 1, 1)),
        wheel_t_us=(np.arange(prm.max_wheel_per_frame) * 30000 + 5000).astype(np.int32),
        wheel_mask=np.ones(prm.max_wheel_per_frame, bool),
        points=pts.astype(np.float32),
        point_valid=np.ones(prm.max_points, bool),
        ray_t=np.zeros(prm.max_points, np.float32),
    )
    batch = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.broadcast_to(np.asarray(x)[None, None], (B, F) + np.asarray(x).shape).copy()),
        one,
    )
    states = shard(states)
    batch = shard(batch)
    new_states, outs = run(states, batch)
    assert np.isfinite(np.asarray(outs.p)).all()
    assert outs.p.shape == (B, F, 3)
    # all sequences identical input -> identical output
    np.testing.assert_allclose(
        np.asarray(outs.p[0]), np.asarray(outs.p[-1]), atol=1e-5
    )
