"""Pose-graph optimization over keyframe poses (the back-end solve).

Capability parity with ``keyframe_manager::solve``
(``src/trajectory/keyframe_manager.cpp:722-838``): sequential edges
(weight 1), loop edges (weight ``loop_edge_k``), optional per-keyframe
ground factors, first keyframe fixed, relative-pose residual
``log_SE3(tf_j^-1 tf_i tf12)`` with the loop-sigma diagonal information.

TPU-native design — two interchangeable solvers over the same residuals:

- ``solve_dense``: stack all edge residuals, LM with QR (liwslam.solve.gn).
  Right for windows up to a few hundred keyframes.
- ``solve_pcg``: matrix-free Gauss-Newton; the Hessian-vector product is
  edge-wise gather -> 6x12 dense blocks -> segment-sum scatter, solved by
  Jacobi-preconditioned CG inside ``lax.while_loop``.  O(E) memory, no
  explicit H, and the edge dimension shards cleanly across devices
  (liwslam.parallel.posegraph_dist adds the psum).

Both operate on fixed-capacity padded arrays (nodes K, edges E) so the
growing pose graph never recompiles — capacity doubles on the host.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from liwslam.core import geometry as geo
from liwslam.solve import factors as fac
from liwslam.solve import gn


class PoseGraph(NamedTuple):
    """Fixed-capacity pose graph arrays."""

    p: jnp.ndarray  # (K,3)
    q: jnp.ndarray  # (K,3)
    node_valid: jnp.ndarray  # (K,)
    e_i: jnp.ndarray  # (E,) int32
    e_j: jnp.ndarray  # (E,) int32
    e_tf: jnp.ndarray  # (E,4,4) measured tf12 (pose_i^-1 pose_j at creation)
    e_weight: jnp.ndarray  # (E,)
    e_valid: jnp.ndarray  # (E,)
    n_nodes: jnp.ndarray  # () int32
    n_edges: jnp.ndarray  # () int32


def empty_graph(K: int, E: int, dtype=jnp.float32) -> PoseGraph:
    return PoseGraph(
        p=jnp.zeros((K, 3), dtype),
        q=jnp.zeros((K, 3), dtype),
        node_valid=jnp.zeros(K, bool),
        e_i=jnp.zeros(E, jnp.int32),
        e_j=jnp.zeros(E, jnp.int32),
        e_tf=jnp.tile(jnp.eye(4, dtype=dtype), (E, 1, 1)),
        e_weight=jnp.zeros(E, dtype),
        e_valid=jnp.zeros(E, bool),
        n_nodes=jnp.zeros((), jnp.int32),
        n_edges=jnp.zeros((), jnp.int32),
    )


class PGConsts(NamedTuple):
    info6: jnp.ndarray  # (6,) edge information diagonal
    T_imu_to_wheel: jnp.ndarray  # (4,4)
    ground_p_info: jnp.ndarray  # ()
    ground_q_info: jnp.ndarray  # ()
    use_ground_p: bool
    use_ground_q: bool


def make_pg_consts(params, dtype=jnp.float32) -> PGConsts:
    return PGConsts(
        info6=fac.edge_info6(params, dtype),
        T_imu_to_wheel=jnp.asarray(params.mat_T_imu_to_wheel(), dtype),
        ground_p_info=jnp.asarray(1.0 / params.manifold_p_sigma, dtype),
        ground_q_info=jnp.asarray(1.0 / params.manifold_q_sigma, dtype),
        use_ground_p=params.use_ground_p_factor,
        use_ground_q=params.use_ground_q_factor,
    )


def _edge_res_single(pi, qi, pj, qj, tf12, w, info6):
    return fac.edge_residual(pi, qi, pj, qj, tf12, info6, w)


def graph_residuals(g: PoseGraph, c: PGConsts):
    """All residual rows: edges (E,6) + ground (K,2)."""
    dtype = g.p.dtype
    r_e = jax.vmap(
        lambda i, j, tf, w: _edge_res_single(
            g.p[i], g.q[i], g.p[j], g.q[j], tf, w, c.info6
        )
    )(g.e_i, g.e_j, g.e_tf, g.e_weight)
    r_e = r_e * g.e_valid[:, None].astype(dtype)

    tf_w_o = geo.make_tf(g.p, g.q) @ c.T_imu_to_wheel
    rp = c.ground_p_info * tf_w_o[:, 2, 3] * (1.0 if c.use_ground_p else 0.0)
    ez = jnp.asarray([0.0, 0.0, 1.0], dtype)
    sinn = geo.safe_norm(jnp.cross(tf_w_o[:, :3, 2], ez[None]))
    rq = (
        c.ground_q_info
        * jnp.arcsin(jnp.clip(sinn, 0.0, 1.0 - 1e-6))
        * (1.0 if c.use_ground_q else 0.0)
    )
    r_g = jnp.stack([rp, rq], -1) * g.node_valid[:, None].astype(dtype)
    return r_e, r_g


# --------------------------------------------------------------------------
# dense path (small graphs, tests)


def solve_dense(g: PoseGraph, c: PGConsts, max_iters=30):
    K = g.p.shape[0]
    dtype = g.p.dtype

    def res_fn(x):
        p = x[: K * 3].reshape(K, 3)
        q = x[K * 3 :].reshape(K, 3)
        g2 = g._replace(p=p, q=q)
        r_e, r_g = graph_residuals(g2, c)
        return jnp.concatenate([r_e.reshape(-1), r_g.reshape(-1)])

    x0 = jnp.concatenate([g.p.reshape(-1), g.q.reshape(-1)])
    free = jnp.concatenate(
        [
            jnp.tile(g.node_valid[:, None], (1, 3)).reshape(-1),
            jnp.tile(g.node_valid[:, None], (1, 3)).reshape(-1),
        ]
    ).astype(dtype)
    # first keyframe fixed (keyframe_manager.cpp:748-752)
    free = free.at[0:3].set(0.0)
    free = free.at[K * 3 : K * 3 + 3].set(0.0)

    def wrap(x):
        q = x[K * 3 :].reshape(K, 3)
        return jnp.concatenate([x[: K * 3], geo.normalize_so3(q).reshape(-1)])

    x, cost, it = gn.lm_solve(res_fn, x0, free, gn.LMConfig(max_iters=max_iters), wrap)
    return g._replace(p=x[: K * 3].reshape(K, 3), q=x[K * 3 :].reshape(K, 3)), cost


# --------------------------------------------------------------------------
# matrix-free PCG path (large graphs; shards over edges)


def _edge_block_jacobians(g: PoseGraph, c: PGConsts):
    """Per-edge residual r (E,6) and Jacobian blocks w.r.t. (pi,qi,pj,qj)
    stacked as (E,6,12): [d/dpi d/dqi | d/dpj d/dqj]."""

    def one(i, j, tf, w):
        def f(xi, xj):
            return _edge_res_single(xi[:3], xi[3:], xj[:3], xj[3:], tf, w, c.info6)

        xi = jnp.concatenate([g.p[i], g.q[i]])
        xj = jnp.concatenate([g.p[j], g.q[j]])
        r = f(xi, xj)
        Ji = jax.jacfwd(f, argnums=0)(xi, xj)
        Jj = jax.jacfwd(f, argnums=1)(xi, xj)
        return r, Ji, Jj

    r, Ji, Jj = jax.vmap(one)(g.e_i, g.e_j, g.e_tf, g.e_weight)
    m = g.e_valid.astype(g.p.dtype)
    return r * m[:, None], Ji * m[:, None, None], Jj * m[:, None, None]


def _ground_block_jacobians(g: PoseGraph, c: PGConsts):
    def one(p, q):
        def f(x):
            tf_w_o = geo.make_tf(x[:3], x[3:]) @ c.T_imu_to_wheel
            rp = c.ground_p_info * tf_w_o[2, 3] * (1.0 if c.use_ground_p else 0.0)
            ez = jnp.asarray([0.0, 0.0, 1.0], x.dtype)
            sinn = geo.safe_norm(jnp.cross(tf_w_o[:3, 2], ez))
            rq = (
                c.ground_q_info
                * jnp.arcsin(jnp.clip(sinn, 0.0, 1.0 - 1e-6))
                * (1.0 if c.use_ground_q else 0.0)
            )
            return jnp.stack([rp, rq])

        x = jnp.concatenate([p, q])
        return f(x), jax.jacfwd(f)(x)

    r, J = jax.vmap(one)(g.p, g.q)
    m = g.node_valid.astype(g.p.dtype)
    return r * m[:, None], J * m[:, None, None]


def _gn_normal_products(g, c, free_mask):
    """Return (rhs (K,6), Hmul: (K,6)->(K,6), diag (K,6), Hb (K,6,6),
    (r_e, r_g)) of the masked Gauss-Newton normal equations at the
    current linearization.  ``Hb`` holds the 6x6 node-diagonal blocks of
    H (block-Jacobi preconditioner; cross blocks excluded)."""
    K = g.p.shape[0]
    dtype = g.p.dtype
    r_e, Ji, Jj = _edge_block_jacobians(g, c)
    r_g, Jg = _ground_block_jacobians(g, c)
    fm = free_mask  # (K,6)

    Ji = Ji * fm[g.e_i][:, None, :]
    Jj = Jj * fm[g.e_j][:, None, :]
    Jg = Jg * fm[:, None, :]

    # rhs = -J^T r
    rhs = jnp.zeros((K, 6), dtype)
    rhs = rhs.at[g.e_i].add(-jnp.einsum("erd,er->ed", Ji, r_e))
    rhs = rhs.at[g.e_j].add(-jnp.einsum("erd,er->ed", Jj, r_e))
    rhs = rhs - jnp.einsum("krd,kr->kd", Jg, r_g)

    # 6x6 node-diagonal blocks of H (for block-Jacobi preconditioning)
    Hb = jnp.zeros((K, 6, 6), dtype)
    Hb = Hb.at[g.e_i].add(jnp.einsum("erd,erc->edc", Ji, Ji))
    Hb = Hb.at[g.e_j].add(jnp.einsum("erd,erc->edc", Jj, Jj))
    Hb = Hb + jnp.einsum("krd,krc->kdc", Jg, Jg)
    diag = jnp.diagonal(Hb, axis1=1, axis2=2)

    def Hmul(x):  # x: (K,6)
        xi = x[g.e_i]
        xj = x[g.e_j]
        t = jnp.einsum("erd,ed->er", Ji, xi) + jnp.einsum("erd,ed->er", Jj, xj)
        out = jnp.zeros((K, 6), dtype)
        out = out.at[g.e_i].add(jnp.einsum("erd,er->ed", Ji, t))
        out = out.at[g.e_j].add(jnp.einsum("erd,er->ed", Jj, t))
        tg = jnp.einsum("krd,kd->kr", Jg, x)
        out = out + jnp.einsum("krd,kr->kd", Jg, tg)
        return out

    return rhs, Hmul, diag, Hb, (r_e, r_g)


def _block_jacobi_inv(Hb, lam_k, dscale, dtype):
    """Inverse 6x6 preconditioner blocks of A = H + lam*dscale*I.

    Free nodes get their true damped diagonal block; fixed/invalid nodes
    (zero rows in Hb) collapse to a scaled identity — their residual is
    identically zero through CG, so the scale there is irrelevant."""
    K = Hb.shape[0]
    eye6 = jnp.eye(6, dtype=dtype)
    M = Hb + jnp.einsum("kd,dc->kdc", lam_k * dscale, eye6)
    M = M + 1e-8 * eye6[None]
    return jnp.linalg.inv(M)


def _pcg_loop(rhs, Amul, Minv_apply, cg_iters, cg_rtol, dtype):
    """Preconditioned CG with early exit on rz <= cg_rtol^2 * rz0."""
    K = rhs.shape[0]
    x0 = jnp.zeros((K, 6), dtype)
    z0 = Minv_apply(rhs)
    rz0 = jnp.sum(rhs * z0)

    def cond(st):
        i, x, r, z, p, rz = st
        return jnp.logical_and(i < cg_iters, rz > cg_rtol**2 * rz0 + 1e-30)

    def body(st):
        i, x, r, z, p, rz = st
        Ap = Amul(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-20)
        x = x + alpha * p
        r = r - alpha * Ap
        z = Minv_apply(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-20)
        return (i + 1, x, r, z, z + beta * p, rz_new)

    st = (jnp.asarray(0, jnp.int32), x0, rhs, z0, z0, rz0)
    return jax.lax.while_loop(cond, body, st)[1]


def solve_pcg(
    g: PoseGraph,
    c: PGConsts,
    gn_iters=15,
    cg_iters=50,
    lam=1e-6,
):
    """Matrix-free damped Gauss-Newton with block-Jacobi-PCG inner solves.

    Round-4 redesign (shared with the sharded variant, whose collective
    count it bounds): 6x6 block-Jacobi preconditioning (CG converges in
    far fewer iterations than the scalar-diagonal form), CG early exit
    on relative residual, the current-point cost carried across GN
    iterations (one residual evaluation per iteration instead of two),
    and GN early exit once an accepted step stops improving."""
    K = g.p.shape[0]
    dtype = g.p.dtype
    fm = jnp.tile(g.node_valid[:, None], (1, 6)).astype(dtype)
    fm = fm.at[0, :].set(0.0)  # first keyframe fixed

    def cost_of(g2):
        r_e, r_g = graph_residuals(g2, c)
        return 0.5 * (jnp.sum(r_e * r_e) + jnp.sum(r_g * r_g))

    def gn_body(carry):
        g2, cost2, lam_k, it, done = carry
        rhs, Hmul, diag, Hb, _ = _gn_normal_products(g2, c, fm)
        dscale = jnp.maximum(diag, 1e-8)
        Minv = _block_jacobi_inv(Hb, lam_k, dscale, dtype)

        def Amul(x):
            return Hmul(x) + lam_k * dscale * x

        def Minv_apply(r):
            return jnp.einsum("kdc,kc->kd", Minv, r)

        dx = _pcg_loop(rhs, Amul, Minv_apply, cg_iters, 1e-2, dtype) * fm

        g_new = g2._replace(
            p=g2.p + dx[:, :3], q=geo.normalize_so3(g2.q + dx[:, 3:])
        )
        cost_new = cost_of(g_new)
        improved = cost_new < cost2
        g2 = jax.tree_util.tree_map(
            lambda a, b: jnp.where(improved, a, b), g_new, g2
        )
        cost1 = jnp.where(improved, cost_new, cost2)
        lam_k = jnp.clip(
            jnp.where(improved, lam_k * 0.5, lam_k * 8.0), 1e-9, 1e6
        )
        rel = jnp.abs(cost2 - cost_new) / jnp.maximum(cost2, 1e-20)
        # exit on an ACCEPTED step that stopped improving, or when the
        # trust region collapsed (lam railed after rejects) — a rejected
        # trial with small change must keep iterating so lam adaptation
        # can recover (measured: exiting on rejected-trial ftol left the
        # sharded solver 4x short of the single-chip optimum)
        done = done | (improved & (rel < 1e-5)) | (
            jnp.logical_not(improved) & (lam_k >= 1e6)
        )
        return (g2, cost1, lam_k, it + 1, done)

    def gn_cond(carry):
        *_, it, done = carry
        return jnp.logical_and(it < gn_iters, jnp.logical_not(done))

    g_out, cost_out, *_ = jax.lax.while_loop(
        gn_cond,
        gn_body,
        (
            g,
            cost_of(g),
            jnp.asarray(lam, dtype),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
        ),
    )
    return g_out, cost_out
