"""Multi-process `jax.distributed` bring-up + 1-vs-N equivalence check.

SURVEY §4's distributed test plan: run the SAME pose-graph solve on one
process and on N processes (each with its own CPU devices, collectives over
the distributed runtime) and assert tolerance-equal results.  Real
multi-host TPU pods are not reachable from this image; this runner proves
the `shard_map`/psum code crosses PROCESS boundaries — the part a
single-process virtual mesh cannot exercise (round-1 gap #5).

Usage:
    python tools/dist_runner.py                  # launcher: spawns 2 workers
    python tools/dist_runner.py --num-processes 2 --devices-per-proc 2
    # internal: --worker --process-id I (spawned by the launcher)

Prints one JSON verdict line from the launcher.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_graph(K, E, seed=0):
    import numpy as np
    import jax.numpy as jnp

    from liwslam import config
    from liwslam.backend import posegraph as pg
    from liwslam.core import geometry as geo

    rng = np.random.default_rng(seed)
    th = np.linspace(0, 2 * np.pi, K)
    gt_p = np.stack([10 * np.cos(th), 10 * np.sin(th), np.zeros(K)], -1)
    yaw = th + np.pi / 2
    # IMU-frame poses follow the pipeline convention (test_backend's
    # _drifting_square): T_w_imu = T_w_wheel @ T_imu_to_wheel^-1, so the
    # ground factors see a level wheel frame
    Tiw_inv = np.linalg.inv(config.office().mat_T_imu_to_wheel())

    def tf_of(k):
        c, s = np.cos(yaw[k]), np.sin(yaw[k])
        T = np.eye(4)
        T[:2, :2] = [[c, -s], [s, c]]
        T[:3, 3] = gt_p[k]
        return T @ Tiw_inv

    n_seq = K - 1
    ei = np.zeros(E, np.int32)
    ej = np.zeros(E, np.int32)
    etf = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
    ew = np.zeros(E, np.float32)
    for k in range(n_seq):
        ei[k], ej[k] = k, k + 1
        etf[k] = np.linalg.inv(tf_of(k)) @ tf_of(k + 1)
        ew[k] = 1.0
    n_loops = min(E - n_seq, K // 4)
    for n in range(n_loops):
        a = int(rng.integers(0, K // 2))
        b = int(rng.integers(K // 2, K - 1))
        ei[n_seq + n], ej[n_seq + n] = a, b
        etf[n_seq + n] = np.linalg.inv(tf_of(a)) @ tf_of(b)
        ew[n_seq + n] = 10.0
    drift = np.cumsum(rng.normal(0, 0.01, (K, 3)), 0) * [1, 1, 0]
    p0 = np.zeros((K, 3), np.float32)
    q0 = np.zeros((K, 3), np.float32)
    for k in range(K):
        pp, qq = geo.log_SE3(jnp.asarray(tf_of(k), jnp.float32))
        p0[k] = np.asarray(pp) + drift[k]
        q0[k] = np.asarray(qq)

    g = pg.empty_graph(K, E)
    return g._replace(
        p=jnp.asarray(p0, jnp.float32),
        q=jnp.asarray(q0, jnp.float32),
        node_valid=jnp.ones(K, bool),
        e_i=jnp.asarray(ei),
        e_j=jnp.asarray(ej),
        e_tf=jnp.asarray(etf),
        e_weight=jnp.asarray(ew),
        e_valid=jnp.arange(E) < (n_seq + n_loops),
        n_nodes=jnp.asarray(K, jnp.int32),
        n_edges=jnp.asarray(n_seq + n_loops, jnp.int32),
    )


def worker(args):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices_per_proc}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    sys.path.insert(0, REPO)
    import liwslam  # noqa: F401
    from liwslam import config
    from liwslam.backend import posegraph as pg
    from liwslam.parallel import posegraph_dist as pgd

    n_global = args.num_processes * args.devices_per_proc
    assert len(jax.devices()) == n_global, (len(jax.devices()), n_global)

    K, E = args.nodes, args.edges
    g = build_graph(K, E, seed=0)
    consts = pg.make_pg_consts(config.office())

    mesh = Mesh(np.asarray(jax.devices()).reshape(n_global), ("pg",))
    g_sh = pgd.shard_edges(g, mesh, "pg")
    g_out, cost = jax.jit(
        lambda g: pgd.solve_pcg_sharded(g, consts, mesh, "pg", gn_iters=30, cg_iters=40)
    )(g_sh)
    # out_specs are replicated: every process holds the full result
    p_out = np.asarray(jax.device_get(g_out.p))
    q_out = np.asarray(jax.device_get(g_out.q))

    if args.bench:
        # scaling-efficiency harness: time the SHARDED solve over the
        # global mesh (the number this produces on a real pod at N hosts
        # vs 1 host is the >=70%-efficiency BASELINE target; on virtual
        # CPU devices the absolute ratio is not meaningful, the harness
        # and its methodology are what ship)
        import time

        solve = jax.jit(
            lambda g: pgd.solve_pcg_sharded(
                g, consts, mesh, "pg", gn_iters=10, cg_iters=40
            )
        )
        jax.block_until_ready(solve(g_sh))
        ts = []
        for _ in range(args.bench_repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(solve(g_sh))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        if args.process_id == 0:
            with open(args.out, "w") as fh:
                json.dump(
                    {
                        "ok": True,
                        "bench": "posegraph_sharded",
                        "n_processes": args.num_processes,
                        "devices": n_global,
                        "K": K,
                        "E": E,
                        "ms": round(ts[len(ts) // 2] * 1e3, 3),
                    },
                    fh,
                )
        jax.distributed.shutdown()
        return

    if args.process_id == 0:
        # single-process baseline (unsharded solver on local devices)
        re0, rg0 = pg.graph_residuals(g, consts)
        cost0 = float(0.5 * (jnp.sum(re0 * re0) + jnp.sum(rg0 * rg0)))
        g1_out, cost1 = jax.jit(
            lambda g: pg.solve_pcg(g, consts, gn_iters=30, cg_iters=40)
        )(g)
        p1 = np.asarray(g1_out.p)
        dp = float(np.max(np.abs(p_out - p1)))
        cm = float(jax.device_get(cost))
        cs = float(cost1)
        # f32 psum reduction order perturbs the LM accept path, so exact
        # pose equality is not expected (tests/test_parallel.py rationale):
        # both solvers must reach the same optimum QUALITY
        ok = (
            abs(cm - cs) < 0.05 * cs + 1e-3
            and cm < 0.5 * cost0
            and cs < 0.5 * cost0
        )
        verdict = {
            "n_processes": args.num_processes,
            "devices_per_proc": args.devices_per_proc,
            "K": K,
            "E": E,
            "max_dp": dp,
            "cost_initial": cost0,
            "cost_multi": cm,
            "cost_single": cs,
            "ok": bool(ok),
        }
        with open(args.out, "w") as fh:
            json.dump(verdict, fh)
    jax.distributed.shutdown()


def worker_pipeline(args):
    """FULL pipeline across processes (VERDICT r4 task 4): each process
    runs its own robot's FRONT END on local devices; keyframes cross
    process boundaries via ``process_allgather``; process 0's keyframe
    manager detects the cross-session loop; the pose graph is broadcast
    and solved EDGE-SHARDED over the global mesh by all processes
    together; process 0 asserts trajectory parity with the single-process
    solver.  Matches SURVEY §2.5's build-target row (front-end replicas +
    sharded pose-graph solve)."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices_per_proc}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils as mh
    from jax.sharding import Mesh

    sys.path.insert(0, REPO)
    import liwslam  # noqa: F401
    from liwslam import config
    from liwslam.backend import posegraph as pg
    from liwslam.backend.manager import KeyframeManager
    from liwslam.frontend.driver import Frontend
    from liwslam.parallel import posegraph_dist as pgd
    from liwslam.sim import world as sim

    # establish the Gloo contexts while all processes are still aligned
    # (lazy init at the first collective has a 30 s rendezvous deadline;
    # the frontends below take minutes)
    mh.sync_global_devices("pipeline_boot")
    mh.process_allgather(np.zeros(1, np.float32))

    # the per-process frontend + manager run on LOCAL devices: under a
    # multi-process runtime, bare jit otherwise commits outputs to the
    # global device set and host fetches of them are illegal
    jax.config.update("jax_default_device", jax.local_devices()[0])

    session = args.process_id
    prm = config.office().replace(
        max_points=768,
        max_lines=48,
        max_corners=16,
        ref_capacity=384,
        max_imu_per_frame=32,
        max_wheel_per_frame=8,
        solver_max_iterations=5,
        init_solver_max_iterations=20,
        key_frame_p_motion_threshold=0.12,
        key_frame_q_motion_threshold=0.12,
        loop_detect_min_interval=1000,  # isolate the cross-session loop
        submap_count=8,
        pose_graph_solve_interval_s=4.0,
        loop_max_dis=2.5,
    )
    room = sim.square_room(size=12.0, obstacles=True, rich=True)
    leg = [(3.5, 0.35, 0.0, 0.0), (2.6, 0.25, 0.0, np.pi / 2 / 2.6)]
    # equal-length tracks: the keyframe allgather blocks until both
    # processes arrive, so similar frontend durations keep waits short
    if session == 0:
        track = sim.TwistTrack([(2.0, 0.0, 0.0, 0.0)] + leg * 3)
    else:
        T0 = sim.make_tf_np(np.array([0.9, -0.7]), 0.55)
        track = sim.TwistTrack([(2.0, 0.0, 0.0, 0.0)] + leg * 3, T0=T0)
    streams = sim.simulate(
        track, room, prm, imu_hz=100, wheel_hz=20, laser_hz=4,
        n_beams=720, noise=True, seed=3 + session,
    )
    res = Frontend(prm).run(streams, chunk_size=16)

    # ---- keyframes cross the process boundary (one allgather) ----------
    KC = args.kf_capacity
    kf_idx = np.flatnonzero(res.is_keyframe)[:KC]
    CC = 4 * prm.max_corners  # accumulated-corner capacity per keyframe
    pack = {
        "n": np.asarray([len(kf_idx)], np.int32),
        "t_us": np.zeros(KC, np.int64),
        "p": np.zeros((KC, 3), np.float64),
        "q": np.zeros((KC, 3), np.float64),
        "corners": np.zeros((KC, CC, 3), np.float32),
        "ccount": np.zeros(KC, np.int32),
    }
    for n, fi in enumerate(kf_idx):
        pack["t_us"][n] = res.t_us[fi]
        pack["p"][n] = res.p[fi]
        pack["q"][n] = res.q[fi]
        cn = np.asarray(res.kf_corners[n]).reshape(-1, 3)[:CC]
        pack["corners"][n, : len(cn)] = cn
        pack["ccount"][n] = len(cn)
    gathered = mh.process_allgather(pack)  # leading axis = process

    # ---- manager on process 0 (host loops + cadenced bookkeeping) ------
    Kc, Ec = args.graph_nodes, args.graph_edges
    empty = np.zeros((0, 3))
    zero_graph = {
        "p": np.zeros((Kc, 3), np.float32),
        "q": np.zeros((Kc, 3), np.float32),
        "node_valid": np.zeros(Kc, bool),
        "e_i": np.zeros(Ec, np.int32),
        "e_j": np.zeros(Ec, np.int32),
        "e_tf": np.zeros((Ec, 4, 4), np.float32),
        "e_weight": np.zeros(Ec, np.float32),
        "e_valid": np.zeros(Ec, bool),
        "n_nodes": np.zeros((), np.int32),
        "n_edges": np.zeros((), np.int32),
        "n_cross_loops": np.zeros((), np.int32),
    }
    if session == 0:
        mgr = KeyframeManager(prm)
        feed = []
        for s in range(args.num_processes):
            nk = int(gathered["n"][s][0])
            for n in range(nk):
                cn = int(gathered["ccount"][s][n])
                feed.append(
                    (
                        int(gathered["t_us"][s][n]),
                        s,
                        gathered["p"][s][n],
                        gathered["q"][s][n],
                        gathered["corners"][s][n][:cn],
                    )
                )
        feed.sort(key=lambda r: (r[0], r[1]))
        for t_us, s, p_, q_, corners in feed:
            mgr.add_keyframe(
                t_us=t_us, p=p_, q=q_, corners=corners,
                scan_lines=(empty, empty), session=s,
            )
        g0 = mgr._build_graph(min_K=Kc, min_E=Ec)
        assert g0.p.shape[0] == Kc and g0.e_i.shape[0] == Ec, (
            "graph outgrew the agreed static broadcast capacity"
        )
        n_cross = sum(
            1
            for i, j, _ in mgr.loop_edges
            if mgr.keyframes[i].session != mgr.keyframes[j].session
        )
        zero_graph = {
            **{f: np.asarray(getattr(g0, f)) for f in zero_graph if f != "n_cross_loops"},
            "n_cross_loops": np.asarray(n_cross, np.int32),
        }
    bc = mh.broadcast_one_to_all(zero_graph)
    n_cross = int(bc.pop("n_cross_loops"))
    g = pg.empty_graph(Kc, Ec)._replace(
        **{f: jnp.asarray(v) for f, v in bc.items()}
    )

    # ---- jointly executed edge-sharded solve over the global mesh ------
    consts = pg.make_pg_consts(prm)
    n_global = args.num_processes * args.devices_per_proc
    mesh = Mesh(np.asarray(jax.devices()).reshape(n_global), ("pg",))
    g_sh = pgd.shard_edges(g, mesh, "pg")
    g_out, cost = jax.jit(
        lambda gg: pgd.solve_pcg_sharded(
            gg, consts, mesh, "pg", gn_iters=20, cg_iters=40
        )
    )(g_sh)
    p_multi = np.asarray(jax.device_get(g_out.p))

    if session == 0:
        re0, rg0 = pg.graph_residuals(g, consts)
        cost0 = float(0.5 * (jnp.sum(re0 * re0) + jnp.sum(rg0 * rg0)))
        g1, cost1 = jax.jit(
            lambda gg: pg.solve_pcg(gg, consts, gn_iters=20, cg_iters=40)
        )(g)
        p_single = np.asarray(g1.p)
        K_real = int(bc["n_nodes"])
        dp = float(np.max(np.abs(p_multi[:K_real] - p_single[:K_real])))
        cm, cs = float(jax.device_get(cost)), float(cost1)
        ok = (
            n_cross >= 1
            and abs(cm - cs) < 0.05 * max(cs, 1e-9) + 1e-3
            and cm <= cost0 + 1e-6
            and dp < 0.05
        )
        verdict = {
            "mode": "pipeline",
            "n_processes": args.num_processes,
            "keyframes": K_real,
            "edges": int(bc["n_edges"]),
            "cross_session_loops": n_cross,
            "cost_initial": cost0,
            "cost_multi": cm,
            "cost_single": cs,
            "max_dp": dp,
            "ok": bool(ok),
        }
        with open(args.out, "w") as fh:
            json.dump(verdict, fh)
    # keep the shutdown barrier aligned (process 0's comparison solve
    # runs after the joint solve; others would hit the barrier early)
    mh.sync_global_devices("pipeline_done")
    jax.distributed.shutdown()


def launcher(args):
    out = args.out or tempfile.mktemp(suffix=".json")
    port = args.port
    procs = []
    for pid in range(args.num_processes):
        cmd = [
            sys.executable,
            os.path.abspath(__file__),
            "--worker",
            "--process-id",
            str(pid),
            "--num-processes",
            str(args.num_processes),
            "--devices-per-proc",
            str(args.devices_per_proc),
            "--coordinator",
            f"localhost:{port}",
            "--nodes",
            str(args.nodes),
            "--edges",
            str(args.edges),
            "--out",
            out,
        ]
        if args.bench:
            cmd += ["--bench", "--bench-repeats", str(args.bench_repeats)]
        if args.pipeline:
            cmd += [
                "--pipeline",
                "--kf-capacity", str(args.kf_capacity),
                "--graph-nodes", str(args.graph_nodes),
                "--graph-edges", str(args.graph_edges),
            ]
        env = dict(os.environ)
        procs.append(subprocess.Popen(cmd, env=env))
    rc = [p.wait(timeout=args.timeout) for p in procs]
    if any(rc):
        print(json.dumps({"ok": False, "returncodes": rc}))
        sys.exit(1)
    with open(out) as fh:
        verdict = json.load(fh)
    print(json.dumps(verdict))
    sys.exit(0 if verdict["ok"] else 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=2)
    ap.add_argument("--coordinator", default="localhost:12397")
    ap.add_argument("--port", type=int, default=12397)
    ap.add_argument("--nodes", type=int, default=64)
    ap.add_argument("--edges", type=int, default=128)
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--bench",
        action="store_true",
        help="time the sharded solve instead of the equivalence check "
        "(scaling-efficiency harness: run at --num-processes 1 and N, "
        "efficiency = t1 / (N * tN))",
    )
    ap.add_argument("--bench-repeats", type=int, default=5)
    ap.add_argument(
        "--pipeline",
        action="store_true",
        help="run the FULL pipeline across processes: per-process "
        "frontends -> keyframe allgather -> manager on process 0 -> "
        "jointly executed edge-sharded pose-graph solve",
    )
    ap.add_argument("--kf-capacity", type=int, default=96)
    ap.add_argument("--graph-nodes", type=int, default=256)
    ap.add_argument("--graph-edges", type=int, default=512)
    args = ap.parse_args()
    if args.worker:
        worker_pipeline(args) if args.pipeline else worker(args)
    else:
        launcher(args)


if __name__ == "__main__":
    main()
