"""Backend benchmarks at scale: descriptor build/scoring + pose-graph solve.

The axis where a TPU build should beat Ceres SPARSE_SCHUR (VERDICT round 1
weak #3): loop-descriptor throughput and `solve_pcg` at OpenLORIS-scale and
beyond (K ~ 10^4 keyframes, E ~ 3*10^4 edges).

Usage:
    python tools/bench_backend.py            # real TPU (default backend)
    python tools/bench_backend.py --cpu      # CPU smoke (small sizes)

Prints one JSON line per benchmark.  Methodology: same-process warmup +
median of repeats, block_until_ready (tunnel variance note in CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def bench(fn, *args, repeats=5):
    import jax

    out = fn(*args)  # compile + warm
    jax.block_until_ready(out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], out


def make_loop_graph(K, n_loops, seed=0):
    """Circle trajectory with drifty sequential edges + exact loop edges."""
    import numpy as np
    import jax.numpy as jnp

    from liwslam.backend import posegraph as pg

    rng = np.random.default_rng(seed)
    th = np.linspace(0, 4 * np.pi, K)  # two laps
    R = 20.0
    gt_p = np.stack([R * np.cos(th), R * np.sin(th), np.zeros(K)], -1)
    gt_yaw = th + np.pi / 2
    gt_q = np.stack([np.zeros(K), np.zeros(K), gt_yaw], -1)

    def tf_of(k):
        c, s = np.cos(gt_yaw[k]), np.sin(gt_yaw[k])
        T = np.eye(4)
        T[:2, :2] = [[c, -s], [s, c]]
        T[:3, 3] = gt_p[k]
        return T

    E = K - 1 + n_loops
    Ec = 1 << (E - 1).bit_length()
    Kc = K
    ei = np.zeros(Ec, np.int32)
    ej = np.zeros(Ec, np.int32)
    etf = np.tile(np.eye(4, dtype=np.float32), (Ec, 1, 1))
    ew = np.zeros(Ec, np.float32)
    # sequential edges from drifty odometry
    noisy_p = gt_p + np.cumsum(rng.normal(0, 0.01, (K, 3)), 0) * [1, 1, 0]
    for k in range(K - 1):
        ei[k], ej[k] = k, k + 1
        etf[k] = np.linalg.inv(tf_of(k)) @ tf_of(k + 1)
        ew[k] = 1.0
    # loop edges between the two laps
    half = K // 2
    for n in range(n_loops):
        a = rng.integers(0, half - 1)
        b = a + half
        ei[K - 1 + n], ej[K - 1 + n] = a, b
        etf[K - 1 + n] = np.linalg.inv(tf_of(a)) @ tf_of(b)
        ew[K - 1 + n] = 10.0

    yaw_noise = np.zeros((K, 3))
    yaw_noise[:, 2] = np.cumsum(rng.normal(0, 0.001, K))  # planar drift
    g = pg.empty_graph(Kc, Ec)
    return g._replace(
        p=jnp.asarray(noisy_p, jnp.float32),
        q=jnp.asarray(gt_q + yaw_noise, jnp.float32),
        node_valid=jnp.ones(Kc, bool),
        e_i=jnp.asarray(ei),
        e_j=jnp.asarray(ej),
        e_tf=jnp.asarray(etf),
        e_weight=jnp.asarray(ew),
        e_valid=jnp.arange(Ec) < E,
        n_nodes=jnp.asarray(K, jnp.int32),
        n_edges=jnp.asarray(E, jnp.int32),
    ), E


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="CPU smoke, small sizes")
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    import liwslam  # noqa: F401  (precision + compilation cache)
    from liwslam import config
    from liwslam.backend import loop as loop_mod
    from liwslam.backend import posegraph as pg

    backend = jax.default_backend()
    small = args.cpu

    # ---- 1. descriptor-map build (per laser keyframe) --------------------
    prm = config.office().replace(map_corner_capacity=128 if not small else 32)
    N = 512 if not small else 128
    rng = np.random.default_rng(0)
    pts = np.concatenate(
        [rng.uniform(-30, 30, (N, 2)), np.zeros((N, 1))], -1
    ).astype(np.float32)
    mask = np.ones(N, bool)
    perm = rng.permutation(prm.map_corner_capacity).astype(np.int32)

    build = jax.jit(
        lambda p, m, perm: loop_mod.build_map_feature_device(
            p,
            m,
            jnp.eye(4),
            d_res=prm.d_res,
            capacity=prm.map_corner_capacity,
            n_dist_bins=prm.n_dist_bins,
            perm=perm,
        )
    )
    t, mf = bench(build, pts, mask, perm, repeats=args.repeats)
    print(
        json.dumps(
            {
                "bench": "descriptor_build",
                "backend": backend,
                "n_corners_in": N,
                "capacity": prm.map_corner_capacity,
                "ms": round(t * 1e3, 3),
                "keyframes_per_s": round(1.0 / t, 1),
            }
        )
    )

    # ---- 2. pair scoring (probe map vs M candidates) ---------------------
    M = 64 if not small else 8
    n_probe = 5
    score = jax.jit(
        lambda m1, m2s, probes: jax.vmap(
            lambda m2: loop_mod.score_pairs(
                m1,
                m2,
                probes,
                a_res=prm.a_res,
                n_angle_bins=prm.n_angle_bins,
                min_match_threshold=prm.laser_loop_min_match_threshold,
            )
        )(m2s)
    )
    m2s = jax.tree_util.tree_map(lambda x: jnp.stack([x] * M), mf)
    probes = jnp.arange(n_probe, dtype=jnp.int32)
    t, _ = bench(score, mf, m2s, probes, repeats=args.repeats)
    npairs = M * n_probe * prm.map_corner_capacity
    print(
        json.dumps(
            {
                "bench": "loop_scoring",
                "backend": backend,
                "candidates": M,
                "probes": n_probe,
                "capacity": prm.map_corner_capacity,
                "ms": round(t * 1e3, 3),
                "map_pairs_per_s": round(M / t, 1),
                "corner_pairs_per_s": round(npairs / t, 0),
            }
        )
    )

    # ---- 3. pose-graph PCG solve at scale --------------------------------
    sizes = [(1024, 256), (4096, 1024), (10240, 20480)] if not small else [(256, 32)]
    for K, n_loops in sizes:
        g, E = make_loop_graph(K, n_loops)
        consts = pg.make_pg_consts(config.office())
        solve = jax.jit(lambda g: pg.solve_pcg(g, consts, gn_iters=15, cg_iters=50))
        re0, rg0 = pg.graph_residuals(g, consts)
        cost0 = float(0.5 * (jnp.sum(re0 * re0) + jnp.sum(rg0 * rg0)))
        t, (g_out, cost) = bench(solve, g, repeats=args.repeats)
        # solution sanity: drifted circle must tighten back toward loops
        print(
            json.dumps(
                {
                    "bench": "posegraph_pcg",
                    "backend": backend,
                    "K": K,
                    "E": E,
                    "ms": round(t * 1e3, 3),
                    "cost_reduction": round(cost0 / max(float(cost), 1e-9), 1),
                    "edges_per_s": round(E / t, 0),
                }
            )
        )


if __name__ == "__main__":
    main()
