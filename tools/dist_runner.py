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
    args = ap.parse_args()
    if args.worker:
        worker(args)
    else:
        launcher(args)


if __name__ == "__main__":
    main()
