"""Distributed pose-graph Gauss-Newton over a device mesh.

No reference counterpart — the reference is single-process (SURVEY §2.5);
this is the new-design scaling path (BASELINE configs 4-5): the pose graph
grows unboundedly with trajectory length, and its Gauss-Newton normal
products are a sum over edges, so the edge dimension shards across devices
with one ``psum`` per product:

    H x = sum_e  J_e^T (J_e x_gathered)        (edges sharded, nodes replicated)
    rhs = -sum_e J_e^T r_e                      -> psum over the mesh axis

Node state (K x 6) is replicated — it is tiny (6 floats per keyframe)
relative to edge work, so the collective is one (K,6) psum per CG
iteration riding ICI.  This is ``shard_map`` over a 1-D mesh axis; it
composes with data-parallel multi-sequence front ends on an orthogonal
axis (liwslam.parallel.multiseq).

Collective budget per GN iteration (round-4 redesign, DCN-aware):
ONE fused (K,43) psum carrying rhs + 6x6 H node blocks + the
current-point cost (which also seeds the first GN iteration — there is
no separate initial-cost collective), one (K,6) psum per CG iteration
(CG dot products are local — vectors are replicated), and one scalar
psum for the trial cost.  The
6x6 block-Jacobi preconditioner plus CG early exit cut the CG psum
count several-fold vs the round-3 scalar-diagonal form, and the GN
while_loop stops once an accepted step stops improving (a converged
solve no longer burns full 50-psum inner loops).  Measured:
tools/count_collectives.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from liwslam.backend import posegraph as pg
from liwslam.core import geometry as geo


def shard_edges(g: pg.PoseGraph, mesh: Mesh, axis: str) -> pg.PoseGraph:
    """Place edge arrays sharded over ``axis``, node arrays replicated."""
    n = mesh.shape[axis]
    assert g.e_i.shape[0] % n == 0, "edge capacity must divide the mesh axis"
    e_sharding = NamedSharding(mesh, P(axis))
    r_sharding = NamedSharding(mesh, P())
    put = lambda x, s: jax.device_put(x, s)
    return g._replace(
        p=put(g.p, r_sharding),
        q=put(g.q, r_sharding),
        node_valid=put(g.node_valid, r_sharding),
        e_i=put(g.e_i, e_sharding),
        e_j=put(g.e_j, e_sharding),
        e_tf=put(g.e_tf, e_sharding),
        e_weight=put(g.e_weight, e_sharding),
        e_valid=put(g.e_valid, e_sharding),
        n_nodes=put(g.n_nodes, r_sharding),
        n_edges=put(g.n_edges, r_sharding),
    )


def solve_pcg_sharded(
    g: pg.PoseGraph,
    c: pg.PGConsts,
    mesh: Mesh,
    axis: str = "pg",
    gn_iters: int = 15,
    cg_iters: int = 50,
    lam: float = 1e-6,
):
    """Edge-sharded variant of posegraph.solve_pcg.

    Call with ``g`` laid out by :func:`shard_edges`.  Inside shard_map each
    device sees its slice of the edges and the full (replicated) node
    arrays; every normal-equation product ends in one psum."""
    K = g.p.shape[0]
    dtype = g.p.dtype
    ndev = mesh.shape[axis]

    node_spec = pg.PoseGraph(
        p=P(), q=P(), node_valid=P(),
        e_i=P(axis), e_j=P(axis), e_tf=P(axis), e_weight=P(axis), e_valid=P(axis),
        n_nodes=P(), n_edges=P(),
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(node_spec,),
        out_specs=(node_spec, P()),
        check_vma=False,
    )
    def run(g_local: pg.PoseGraph):
        fm = jnp.tile(g_local.node_valid[:, None], (1, 6)).astype(dtype)
        fm = fm.at[0, :].set(0.0)
        inv_n = 1.0 / ndev

        def cost_of(g2):
            r_e, r_g = pg.graph_residuals(g2, c)
            part = jnp.sum(r_e * r_e) + inv_n * jnp.sum(r_g * r_g)
            return 0.5 * jax.lax.psum(part, axis)

        def products(g2):
            """One fused psum carries rhs (cols 0:6), the 6x6 node blocks
            of H (cols 6:42) and the current-point cost partial (lane
            [0,42]) — round 4 cut from three collectives (rhs, diag, 2x
            cost) to ONE; diag falls out of the Hb blocks."""
            r_e, Ji, Jj = pg._edge_block_jacobians(g2, c)
            r_g, Jg = pg._ground_block_jacobians(g2, c)
            Ji = Ji * fm[g2.e_i][:, None, :]
            Jj = Jj * fm[g2.e_j][:, None, :]
            Jg = Jg * fm[:, None, :] * jnp.sqrt(inv_n)  # replicated: scale

            rhs = jnp.zeros((K, 6), dtype)
            rhs = rhs.at[g2.e_i].add(-jnp.einsum("erd,er->ed", Ji, r_e))
            rhs = rhs.at[g2.e_j].add(-jnp.einsum("erd,er->ed", Jj, r_e))
            rhs = rhs - jnp.einsum("krd,kr->kd", Jg, r_g) * jnp.sqrt(inv_n)

            Hb = jnp.zeros((K, 6, 6), dtype)
            Hb = Hb.at[g2.e_i].add(jnp.einsum("erd,erc->edc", Ji, Ji))
            Hb = Hb.at[g2.e_j].add(jnp.einsum("erd,erc->edc", Jj, Jj))
            Hb = Hb + jnp.einsum("krd,krc->kdc", Jg, Jg)

            cost_part = 0.5 * (
                jnp.sum(r_e * r_e) + inv_n * jnp.sum(r_g * r_g)
            )
            payload = jnp.concatenate(
                [rhs, Hb.reshape(K, 36)], axis=1
            )
            payload = jnp.concatenate(
                [payload, jnp.zeros((K, 1), dtype).at[0, 0].set(cost_part)],
                axis=1,
            )
            payload = jax.lax.psum(payload, axis)
            rhs = payload[:, 0:6]
            Hb = payload[:, 6:42].reshape(K, 6, 6)
            cost_here = payload[0, 42]

            def Hmul(x):
                t = jnp.einsum("erd,ed->er", Ji, x[g2.e_i]) + jnp.einsum(
                    "erd,ed->er", Jj, x[g2.e_j]
                )
                out = jnp.zeros((K, 6), dtype)
                out = out.at[g2.e_i].add(jnp.einsum("erd,er->ed", Ji, t))
                out = out.at[g2.e_j].add(jnp.einsum("erd,er->ed", Jj, t))
                tg = jnp.einsum("krd,kd->kr", Jg, x)
                out = out + jnp.einsum("krd,kr->kd", Jg, tg)
                return jax.lax.psum(out, axis)

            diag = jnp.diagonal(Hb, axis1=1, axis2=2)
            return rhs, Hmul, diag, Hb, cost_here

        def gn_body(carry):
            # cost2 (carried) is only the OUTPUT value; the current-point
            # cost rides the fused products psum (cost_here), which makes
            # the separate cost_of(g_local) seeding collective unnecessary
            # (cost_here == last iteration's accepted cost by construction)
            g2, cost2, lam_k, it, done = carry
            rhs, Hmul, diag, Hb, cost2 = products(g2)
            dscale = jnp.maximum(diag, 1e-8)
            Minv = pg._block_jacobi_inv(Hb, lam_k, dscale, dtype)

            def Amul(x):
                return Hmul(x) + lam_k * dscale * x

            def Minv_apply(r):
                return jnp.einsum("kdc,kc->kd", Minv, r)

            # CG dot products are LOCAL (x/r replicated); the only
            # collective per CG iteration is the Hmul psum
            dx = pg._pcg_loop(rhs, Amul, Minv_apply, cg_iters, 1e-2, dtype)
            dx = dx * fm
            g_new = g2._replace(
                p=g2.p + dx[:, :3], q=geo.normalize_so3(g2.q + dx[:, 3:])
            )
            cost_new = cost_of(g_new)  # one scalar psum
            improved = cost_new < cost2
            g2 = jax.tree_util.tree_map(
                lambda a, b: jnp.where(improved, a, b), g_new, g2
            )
            cost1 = jnp.where(improved, cost_new, cost2)
            lam_k = jnp.clip(
                jnp.where(improved, lam_k * 0.5, lam_k * 8.0), 1e-9, 1e6
            )
            rel = jnp.abs(cost2 - cost_new) / jnp.maximum(cost2, 1e-20)
            # accepted-step ftol or collapsed trust region only (see
            # posegraph.solve_pcg)
            done = done | (improved & (rel < 1e-5)) | (
                jnp.logical_not(improved) & (lam_k >= 1e6)
            )
            return (g2, cost1, lam_k, it + 1, done)

        def gn_cond(carry):
            *_, it, done = carry
            return jnp.logical_and(it < gn_iters, jnp.logical_not(done))

        assert gn_iters >= 1  # the first gn_body evaluates the seed cost
        g_out, cost_out, *_ = jax.lax.while_loop(
            gn_cond,
            gn_body,
            (
                g_local,
                jnp.asarray(jnp.inf, dtype),
                jnp.asarray(lam, dtype),
                jnp.asarray(0, jnp.int32),
                jnp.asarray(False),
            ),
        )
        return g_out, cost_out

    return run(g)
