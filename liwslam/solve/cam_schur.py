"""Landmark-Schur LM for the camera sub-step's joint pose+landmark solve.

The camera sub-step solves a classic bundle-adjustment structure: a
30-dim pose window [prev frozen, camera free] plus F landmark blocks of
3, coupled ONLY through the current frame's reprojection rows (older
observations use frozen ring poses, solver.cpp:641-666 semantics).  The
round-2 implementation fed the whole (30+3F)-dim state through the
generic dense LM (`gn.lm_solve`): a (30+3F)-tangent jacfwd and a
(30+3F)^2 Cholesky per iteration.  This module exploits the structure
the way the reference's SPARSE_SCHUR does:

- base rows (imu/wheel/ground/prior) linearize with 30 tangents,
- reprojection rows linearize with 9 tangents each (6 pose + 3 landmark),
  vmapped over the F x Wc observation table,
- the normal equations assemble into Hpp (30x30), block-diagonal Hll
  (F x 3x3) and the Hpl coupling (F x 6x3, current-frame rows only),
- the damped step solves the 30-dim Schur complement and back-substitutes
  landmarks through closed-form 3x3 inverses.

LM semantics (damping schedule, freeze masks, ftol/xtol termination)
mirror `gn.lm_solve` so the two paths are interchangeable; a parity test
pins them against each other (tests/test_cam_schur.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from liwslam.core import geometry as geo
from liwslam.solve import factors as fac
from liwslam.solve import gn


def _inv3(M):
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], -1),
        ],
        -2,
    )
    return adj / det[..., None, None]


def lm_solve_cam_schur(
    res30_fn,
    x0_30,
    free30,
    world0,  # (F,3)
    lm_free,  # (F,) bool
    obs,  # (F,Wc,2) normalized observations
    use,  # (F,Wc) bool row mask (obs_mask & ready & ring_valid)
    ring_p,  # (Wc,3) frozen camera-frame poses (slot Wc-1 value unused)
    ring_q,  # (Wc,3)
    Tic,
    sqrt_info,
    cfg: gn.LMConfig = gn.LMConfig(),
    wrap30=None,
):
    """Returns (x30_opt, world_opt, cost)."""
    dtype = x0_30.dtype
    F, Wc = use.shape
    free30 = free30.astype(dtype)
    fm = free30 > 0
    lmf = lm_free.astype(dtype)
    umask = use.astype(dtype)
    is_cur = (jnp.arange(Wc) == Wc - 1).astype(dtype)  # (Wc,)

    def row_fn(z, obs_xy, rp, rq, cur):
        p = cur * z[:3] + (1.0 - cur) * rp
        q = cur * z[3:6] + (1.0 - cur) * rq
        return fac.camera_residual(p, q, z[6:9], obs_xy, Tic, sqrt_info)

    eye9 = jnp.eye(9, dtype=dtype)

    def lin_rows(x30, world):
        pq = x30[15:21]

        def one(f, w):
            z0 = jnp.concatenate([pq, world[f]])
            h = lambda z: row_fn(z, obs[f, w], ring_p[w], ring_q[w], is_cur[w])
            r, lin = jax.linearize(h, z0)
            J9 = jax.vmap(lin)(eye9)  # (9,2)
            return r, J9.T  # (2,), (2,9)

        ff, ww = jnp.meshgrid(jnp.arange(F), jnp.arange(Wc), indexing="ij")
        r, J9 = jax.vmap(jax.vmap(one))(ff, ww)  # (F,Wc,2), (F,Wc,2,9)
        u = umask[:, :, None]
        r = r * u
        Jp = J9[..., :6] * u[..., None]  # zero rows for non-current w by construction
        Jw = J9[..., 6:9] * u[..., None] * lmf[:, None, None, None]
        return r, Jp, Jw

    def lin_base(x30):
        r_b, J_b = gn._linearize(res30_fn, x30)
        return r_b, J_b * free30[None, :]

    def cost_of(r_b, r_c):
        return 0.5 * (jnp.sum(r_b * r_b) + jnp.sum(r_c * r_c))

    def damped_step(lin, lam):
        r_b, J_b, r_c, Jp, Jw = lin
        Hpp = J_b.T @ J_b
        g30 = -(J_b.T @ r_b)
        Hpp = Hpp.at[15:21, 15:21].add(jnp.einsum("fwce,fwcg->eg", Jp, Jp))
        g30 = g30.at[15:21].add(-jnp.einsum("fwce,fwc->e", Jp, r_c))
        Hll = jnp.einsum("fwca,fwcb->fab", Jw, Jw)  # (F,3,3)
        Hpl = jnp.einsum("fwce,fwcb->feb", Jp, Jw)  # (F,6,3)
        gl = -jnp.einsum("fwcb,fwc->fb", Jw, r_c)  # (F,3)

        # LM damping + freeze handling, exactly like gn._damped_step_chol
        diag = jnp.diagonal(Hpp)
        damped = diag + lam * jnp.maximum(diag, 1e-12)
        A = jnp.where(fm[:, None] & fm[None, :], Hpp, 0.0)
        A = A.at[jnp.arange(30), jnp.arange(30)].set(
            jnp.where(fm, damped, 1.0)
        )
        dglg = jnp.diagonal(Hll, axis1=1, axis2=2)  # (F,3)
        dampedL = dglg + lam * jnp.maximum(dglg, 1e-12)
        active = lm_free[:, None, None]
        eye3 = jnp.eye(3, dtype=dtype)
        HllA = jnp.where(
            active,
            Hll + eye3[None] * (dampedL - dglg)[:, :, None],
            eye3[None],
        )
        glA = jnp.where(lm_free[:, None], gl, 0.0)
        HplA = Hpl * lmf[:, None, None]

        Hinv = _inv3(HllA)  # (F,3,3)
        E = jnp.einsum("feb,fbc,fgc->eg", HplA, Hinv, HplA)  # (6,6)
        c6 = jnp.einsum("feb,fbc,fc->e", HplA, Hinv, glA)  # (6,)
        S = A.at[15:21, 15:21].add(-E)
        b = jnp.where(fm, g30, 0.0).at[15:21].add(-c6)

        s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(S), 1e-20))
        Ss = S * s[:, None] * s[None, :]
        L = jnp.linalg.cholesky(Ss)
        y = jax.scipy.linalg.solve_triangular(L, s * b, lower=True)
        y = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
        dxp = s * y
        ok = jnp.all(jnp.isfinite(dxp))
        dxp = jnp.where(ok, dxp, 0.0) * free30
        rhs_l = glA - jnp.einsum("feb,e->fb", HplA, dxp[15:21])
        dxl = jnp.einsum("fbc,fc->fb", Hinv, rhs_l) * lmf[:, None]
        dxl = jnp.where(jnp.isfinite(dxl), dxl, 0.0)
        return dxp, dxl

    # --- LM loop (gn.lm_solve semantics) --------------------------------
    r_b0, J_b0 = lin_base(x0_30)
    r_c0, Jp0, Jw0 = lin_rows(x0_30, world0)
    c0 = cost_of(r_b0, r_c0)

    def body(carry):
        x, wld, lin, lam, cbest, it, done = carry
        dxp, dxl = damped_step(lin, lam)
        x_t = x + dxp
        if wrap30 is not None:
            x_t = wrap30(x_t)
        w_t = wld + dxl
        rb_t, Jb_t = lin_base(x_t)
        rc_t, Jp_t, Jw_t = lin_rows(x_t, w_t)
        c_t = cost_of(rb_t, rc_t)
        accept = c_t < cbest
        sel = lambda a, b2: jnp.where(accept, a, b2)
        x = sel(x_t, x)
        wld = jnp.where(accept, w_t, wld)
        lin = jax.tree_util.tree_map(
            lambda a, b2: jnp.where(accept, a, b2),
            (rb_t, Jb_t, rc_t, Jp_t, Jw_t),
            lin,
        )
        c1 = jnp.where(accept, c_t, cbest)
        lam = jnp.where(accept, lam * cfg.lam_down, lam * cfg.lam_up)
        lam = jnp.clip(lam, cfg.lam_min, cfg.lam_max)
        rel_change = jnp.abs(cbest - c_t) / jnp.maximum(cbest, 1e-20)
        dxn = jnp.maximum(
            jnp.max(jnp.abs(dxp)), jnp.max(jnp.abs(dxl))
        )
        xn = jnp.maximum(jnp.max(jnp.abs(x)), jnp.max(jnp.abs(wld)))
        xtol_hit = dxn < cfg.xtol * (xn + cfg.xtol)
        # stall: rejected trial with the trust region collapsed (lam railed
        # at max) — matches gn.lm_solve's body so the paths terminate alike
        stalled = jnp.logical_not(accept) & (lam >= cfg.lam_max)
        done = done | (rel_change < cfg.ftol) | xtol_hit | stalled
        return (x, wld, lin, lam, c1, it + 1, done)

    def cond(carry):
        *_, it, done = carry
        return jnp.logical_and(it < cfg.max_iters, jnp.logical_not(done))

    x, wld, lin, lam, c, it, _ = jax.lax.while_loop(
        cond,
        body,
        (
            x0_30,
            world0,
            (r_b0, J_b0, r_c0, Jp0, Jw0),
            jnp.asarray(cfg.lam_init, dtype),
            c0,
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
        ),
    )
    return x, wld, c
