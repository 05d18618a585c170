"""Collective-count evidence for the round-4 distributed pose-graph cut.

Counts, on the virtual 8-device CPU mesh test problem:
- CG iterations needed to reach the early-exit tolerance with the
  round-3 scalar-diagonal Jacobi preconditioner vs the round-4 6x6
  block-Jacobi preconditioner (CG psums == CG iterations: vectors are
  replicated, so only the matvec is a collective),
- the resulting psums per GN iteration:
    round 3: rhs + diag + 50 fixed CG + 2 cost            = 54
    round 4: 1 fused (rhs+Hb+cost) + measured CG + 1 cost = 2 + CG
- GN iterations actually executed (while_loop early exit) vs the fixed
  round-3 trip count.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python
tools/count_collectives.py   (forces CPU itself, like tests/conftest.py)
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from liwslam import config
from liwslam.backend import posegraph as pg
from liwslam.core import geometry as geo


def _loop_problem(K=512, seed=0):
    """Noisy circular trajectory with sequential + loop edges."""
    rng = np.random.default_rng(seed)
    Kcap = K
    g = pg.empty_graph(Kcap, 2 * Kcap)
    th = np.linspace(0, 2 * np.pi, K, endpoint=False)
    R = 10.0
    p_true = np.stack([R * np.cos(th), R * np.sin(th), np.zeros(K)], -1)
    q_true = np.stack([np.zeros(K), np.zeros(K), th + np.pi / 2], -1)
    p0 = p_true + rng.normal(0, 0.15, (K, 3)) * [1, 1, 0]
    q0 = q_true + rng.normal(0, 0.02, (K, 3)) * [0, 0, 1]

    def T_of(p, q):
        return np.asarray(geo.make_tf(jnp.asarray(p, jnp.float32), jnp.asarray(q, jnp.float32)))

    e_i, e_j, e_tf, e_w = [], [], [], []
    for k in range(K - 1):
        e_i.append(k)
        e_j.append(k + 1)
        e_tf.append(np.linalg.inv(T_of(p_true[k], q_true[k])) @ T_of(p_true[k + 1], q_true[k + 1]))
        e_w.append(1.0)
    for k in range(0, K, 16):  # loop edges across the circle
        j = (k + K // 2) % K
        e_i.append(k)
        e_j.append(j)
        e_tf.append(np.linalg.inv(T_of(p_true[k], q_true[k])) @ T_of(p_true[j], q_true[j]))
        e_w.append(2.0)
    E = len(e_i)
    g = g._replace(
        p=jnp.asarray(p0, jnp.float32),
        q=jnp.asarray(q0, jnp.float32),
        node_valid=jnp.arange(Kcap) < K,
        e_i=jnp.asarray(np.pad(e_i, (0, 2 * Kcap - E)), jnp.int32),
        e_j=jnp.asarray(np.pad(e_j, (0, 2 * Kcap - E), constant_values=1), jnp.int32),
        e_tf=jnp.asarray(
            np.concatenate([np.stack(e_tf), np.tile(np.eye(4), (2 * Kcap - E, 1, 1))]),
            jnp.float32,
        ),
        e_weight=jnp.asarray(np.pad(e_w, (0, 2 * Kcap - E)), jnp.float32),
        e_valid=jnp.arange(2 * Kcap) < E,
        n_nodes=jnp.asarray(K, jnp.int32),
        n_edges=jnp.asarray(E, jnp.int32),
    )
    return g


def cg_iters_to_tol(g, c, precond, lam=1e-6, cg_rtol=1e-2, max_iters=50):
    """CG iterations until rz <= rtol^2 * rz0 on the first GN system."""
    K = g.p.shape[0]
    dtype = jnp.float32
    fm = jnp.tile(g.node_valid[:, None], (1, 6)).astype(dtype)
    fm = fm.at[0, :].set(0.0)
    rhs, Hmul, diag, Hb, _ = pg._gn_normal_products(g, c, fm)
    dscale = jnp.maximum(diag, 1e-8)
    lam_k = jnp.asarray(lam, dtype)

    if precond == "block":
        Minv = pg._block_jacobi_inv(Hb, lam_k, dscale, dtype)
        Mapply = lambda r: jnp.einsum("kdc,kc->kd", Minv, r)
    else:
        M_inv = 1.0 / (dscale * (1.0 + lam_k))
        Mapply = lambda r: M_inv * r

    Amul = lambda x: Hmul(x) + lam_k * dscale * x
    x = jnp.zeros((K, 6), dtype)
    r = rhs
    z = Mapply(r)
    p = z
    rz = float(jnp.sum(r * z))
    rz0 = rz
    for i in range(max_iters):
        if rz <= cg_rtol**2 * rz0:
            return i
        Ap = Amul(p)
        alpha = rz / max(float(jnp.sum(p * Ap)), 1e-20)
        x = x + alpha * p
        r = r - alpha * Ap
        z = Mapply(r)
        rz_new = float(jnp.sum(r * z))
        beta = rz_new / max(rz, 1e-20)
        p = z + beta * p
        rz = rz_new
    return max_iters


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from dist_runner import build_graph

    prm = config.office()
    c = pg.make_pg_consts(prm)

    for name, g in [
        (
            "drifting-circle (dist_runner graph, K=512/E=640)",
            build_graph(512, 640, seed=0),
        ),
        ("high-noise circle (hard conditioning)", _loop_problem()),
    ]:
        it_diag = cg_iters_to_tol(g, c, "diag")
        it_block = cg_iters_to_tol(g, c, "block")
        before = 2 + 50 + 2
        after = 2 + it_block
        print(
            f"{name}:\n"
            f"  CG iters to 1e-2 residual: diag={it_diag} block={it_block}\n"
            f"  psums/GN-iter: round3 = {before} "
            f"(rhs+diag+50 fixed CG+2 cost), round4 = {after} "
            f"(fused+{it_block} CG+cost) -> {before / after:.1f}x fewer"
        )

    # end-to-end equivalence + GN early exit on the sharded path
    from jax.sharding import Mesh
    from liwslam.parallel import posegraph_dist as pgd

    g = build_graph(512, 640, seed=0)
    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices), ("pg",))
    g_sh = pgd.shard_edges(g, mesh, "pg")
    g1, c1 = jax.jit(lambda gg: pg.solve_pcg(gg, c, gn_iters=20, cg_iters=50))(g)
    g8, c8 = pgd.solve_pcg_sharded(g_sh, c, mesh, "pg", gn_iters=20, cg_iters=50)
    print(f"cost single={float(c1):.6f} sharded={float(c8):.6f}")
    err1 = float(jnp.max(jnp.abs(g1.p - g8.p)))
    print(f"max |p diff| single vs sharded: {err1:.2e}")


if __name__ == "__main__":
    main()
