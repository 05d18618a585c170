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
            r_e, Ji, Jj = pg._edge_block_jacobians(g2, c)
            r_g, Jg = pg._ground_block_jacobians(g2, c)
            Ji = Ji * fm[g2.e_i][:, None, :]
            Jj = Jj * fm[g2.e_j][:, None, :]
            Jg = Jg * fm[:, None, :] * jnp.sqrt(inv_n)  # replicated: scale

            rhs = jnp.zeros((K, 6), dtype)
            rhs = rhs.at[g2.e_i].add(-jnp.einsum("erd,er->ed", Ji, r_e))
            rhs = rhs.at[g2.e_j].add(-jnp.einsum("erd,er->ed", Jj, r_e))
            rhs = rhs - jnp.einsum("krd,kr->kd", Jg, r_g) * jnp.sqrt(inv_n)
            rhs = jax.lax.psum(rhs, axis)

            diag = jnp.zeros((K, 6), dtype)
            diag = diag.at[g2.e_i].add(jnp.einsum("erd,erd->ed", Ji, Ji))
            diag = diag.at[g2.e_j].add(jnp.einsum("erd,erd->ed", Jj, Jj))
            diag = diag + jnp.einsum("krd,krd->kd", Jg, Jg)
            diag = jax.lax.psum(diag, axis)

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

            return rhs, Hmul, diag

        def gn_body(k, carry):
            g2, lam_k = carry
            rhs, Hmul, diag = products(g2)
            dscale = jnp.maximum(diag, 1e-8)
            M_inv = 1.0 / (dscale * (1.0 + lam_k))

            def Amul(x):
                return Hmul(x) + lam_k * dscale * x

            x0 = jnp.zeros((K, 6), dtype)
            st = (x0, rhs, M_inv * rhs, M_inv * rhs, jnp.sum(rhs * (M_inv * rhs)))

            def cg_body(i, s):
                x, r, z, p, rz = s
                Ap = Amul(p)
                alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-20)
                x = x + alpha * p
                r = r - alpha * Ap
                z = M_inv * r
                rz_new = jnp.sum(r * z)
                beta = rz_new / jnp.maximum(rz, 1e-20)
                return (x, r, z, z + beta * p, rz_new)

            dx = jax.lax.fori_loop(0, cg_iters, cg_body, st)[0] * fm
            g_new = g2._replace(
                p=g2.p + dx[:, :3], q=geo.normalize_so3(g2.q + dx[:, 3:])
            )
            improved = cost_of(g_new) < cost_of(g2)
            g2 = jax.tree_util.tree_map(
                lambda a, b: jnp.where(improved, a, b), g_new, g2
            )
            return (g2, jnp.clip(jnp.where(improved, lam_k * 0.5, lam_k * 8.0), 1e-9, 1e6))

        g_out, _ = jax.lax.fori_loop(
            0, gn_iters, gn_body, (g_local, jnp.asarray(lam, dtype))
        )
        return g_out, cost_of(g_out)

    return run(g)
