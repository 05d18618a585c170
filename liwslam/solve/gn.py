"""Masked Levenberg-Marquardt on a flat state vector, fully jittable.

Replaces both ``ceres::Solve`` call sites of the reference
(``solver.cpp:795-802`` tracking, ``solver.cpp:161-168`` init, and the
back-end pose graph at ``keyframe_manager.cpp:812-819``): trust-region LM
with Jacobian relinearization per accepted step.

Design choices for TPU + float32:

- The damped step solves the *augmented least squares* problem by QR,
  ``[J; sqrt(lam)*diag(colnorm)] dx = [-r; 0]`` — conditioning ~cond(J),
  not cond(J)^2 like explicit normal equations, which matters because the
  whitened laser rows carry weights up to ~3e3.
- Frozen parameters (Ceres ``SetParameterBlockConstant``,
  solver.cpp:787-794) are zeroed J columns with unit augmentation, which
  decouples them exactly (dx_frozen == 0).
- so3 state components are angle-wrapped after every accepted step — the
  additive-plus-wrap local parameterization of factor_common.h:37-60.
- Fixed iteration count inside ``lax.while_loop`` with accept/reject
  lambda adaptation; early function-tolerance exit like Ceres.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LMConfig(NamedTuple):
    max_iters: int = 10
    lam_init: float = 1e-4
    lam_up: float = 4.0
    lam_down: float = 0.33
    lam_min: float = 1e-10
    lam_max: float = 1e8
    # function_tolerance.  Ceres defaults to 1e-6 in f64; the cost here is
    # evaluated in f32 whose summation noise floor is ~sqrt(eps_f32)=3e-4
    # relative — a tighter setting just burns iterations flipping
    # accept/reject on noise (measured: cost plateaus after 2-3 iters and
    # then oscillates by +-3e-5 relative).  Applied to |cost change| on
    # both accepted AND rejected steps: a rejected trial whose cost moved
    # by less than the noise floor means the local model is exhausted.
    ftol: float = 3e-4
    xtol: float = 1e-7  # Ceres parameter_tolerance (1e-8), f32-safe
    method: str = "qr"  # "qr" (augmented LSQ) or "chol" (normal equations)


def _linearize(res_fn, x):
    # one pass: primal + all D tangents through the linearized program
    r, lin = jax.linearize(res_fn, x)
    Jm = jax.vmap(lin)(jnp.eye(x.shape[0], dtype=x.dtype)).T
    return r, Jm


def _damped_step(Jm, r, lam, free_mask, dtype):
    D = Jm.shape[1]
    Jm = Jm * free_mask[None, :]
    colnorm = jnp.sqrt(jnp.sum(Jm * Jm, axis=0))
    # augmentation: LM damping for free cols, unit pin for frozen cols
    aug = jnp.where(
        free_mask > 0, jnp.sqrt(lam) * jnp.maximum(colnorm, 1e-6), 1.0
    )
    A = jnp.concatenate([Jm, jnp.diag(aug)], axis=0)
    b = jnp.concatenate([-r, jnp.zeros(D, dtype)])
    Q, R = jnp.linalg.qr(A)
    dx = jax.scipy.linalg.solve_triangular(R, Q.T @ b, lower=False)
    return dx * free_mask


def _damped_step_chol(Jm, r, lam, free_mask, dtype):
    """Same damped step via normal equations + Cholesky.

    Forming H = J'J is one MXU matmul and the factorization is DxD
    (D ~ 30 for tracking) instead of a tall Householder QR — much lower
    latency per LM iteration on TPU.  cond(H) = cond(J)^2, so the system
    is Jacobi-preconditioned (symmetric diagonal scaling) before the f32
    factorization; the damping lam*diag(H) matches the QR variant's
    sqrt(lam)*colnorm row augmentation exactly.
    """
    D = Jm.shape[1]
    Jm = Jm * free_mask[None, :]
    H = Jm.T @ Jm
    g = Jm.T @ r
    diag = jnp.diagonal(H)
    damped = diag + lam * jnp.maximum(diag, 1e-12)
    # frozen columns: decoupled unit rows (dx_frozen == 0 exactly)
    fm = free_mask > 0
    outer = fm[:, None] & fm[None, :]
    A = jnp.where(outer, H, 0.0)
    A = A.at[jnp.arange(D), jnp.arange(D)].set(jnp.where(fm, damped, 1.0))
    b = jnp.where(fm, -g, 0.0)
    s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(A), 1e-20))
    As = A * s[:, None] * s[None, :]
    L = jnp.linalg.cholesky(As)
    y = jax.scipy.linalg.solve_triangular(L, s * b, lower=True)
    y = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    dx = s * y
    # fall back to zero step if the factorization failed (keeps LM's
    # reject path live instead of poisoning the state with NaNs)
    ok = jnp.all(jnp.isfinite(dx))
    return jnp.where(ok, dx * free_mask, jnp.zeros_like(dx))


def lm_solve(
    res_fn: Callable,
    x0: jnp.ndarray,
    free_mask: jnp.ndarray,
    cfg: LMConfig = LMConfig(),
    wrap_fn: Callable = None,
    return_lin: bool = False,
):
    """Minimize |res_fn(x)|^2 over x (free components only).

    res_fn: flat x -> flat residual (differentiable).
    free_mask: (D,) 1.0 free / 0.0 frozen.
    wrap_fn: optional post-update normalization (angle wrap).
    Returns (x_opt, final_cost, n_iters); with ``return_lin=True`` also
    the (r, J) linearization AT x_opt — carried out of the loop for free
    (each iteration linearizes at its trial point anyway), so callers
    like marginalization need no extra Jacobian pass.
    """
    dtype = x0.dtype
    free_mask = free_mask.astype(dtype)

    step_fn = _damped_step_chol if cfg.method == "chol" else _damped_step

    # invariant: (x, r, J, c0) always correspond to the best-so-far point
    def body(carry):
        x, r, J, lam, c0, it, done = carry
        dx = step_fn(J, r, lam, free_mask, dtype)
        x_t = x + dx
        if wrap_fn is not None:
            x_t = wrap_fn(x_t)
        r_t, J_t = _linearize(res_fn, x_t)
        c_t = 0.5 * jnp.sum(r_t * r_t)
        accept = c_t < c0
        x = jnp.where(accept, x_t, x)
        r = jnp.where(accept, r_t, r)
        J = jnp.where(accept, J_t, J)
        c1 = jnp.where(accept, c_t, c0)
        lam = jnp.where(accept, lam * cfg.lam_down, lam * cfg.lam_up)
        lam = jnp.clip(lam, cfg.lam_min, cfg.lam_max)
        rel_change = jnp.abs(c0 - c_t) / jnp.maximum(c0, 1e-20)
        # termination (Ceres semantics, f32-aware): function_tolerance on
        # the trial step's |cost change| (accepted or not — see ftol
        # docstring); parameter_tolerance on the proposed step size; stall
        # when the trust region collapsed (lam railed at max after rejects)
        xtol_hit = jnp.max(jnp.abs(dx)) < cfg.xtol * (jnp.max(jnp.abs(x)) + cfg.xtol)
        stalled = jnp.logical_not(accept) & (lam >= cfg.lam_max)
        done = (rel_change < cfg.ftol) | xtol_hit | stalled
        return (x, r, J, lam, c1, it + 1, done)

    def cond(carry):
        it, done = carry[5], carry[6]
        return jnp.logical_and(it < cfg.max_iters, jnp.logical_not(done))

    r0, J0 = _linearize(res_fn, x0)
    c0 = 0.5 * jnp.sum(r0 * r0)
    x, r_f, J_f, lam, c_fin, iters, _ = jax.lax.while_loop(
        cond,
        body,
        (x0, r0, J0, jnp.asarray(cfg.lam_init, dtype), c0, jnp.asarray(0), jnp.asarray(False)),
    )
    if return_lin:
        return x, c_fin, iters, (r_f, J_f)
    return x, c_fin, iters


def marginalize(res_fn: Callable, x: jnp.ndarray, keep: int, lin=None):
    """Schur-complement marginalization (solver.cpp:4-40, 257-442).

    Linearizes ``res_fn`` at ``x`` over ALL variables, eliminates all but
    the LAST ``keep`` entries of the flat state, and eigendecomposes the
    reduced information into a square-root prior:

        H = J'J,  g = -J'r
        dH = Hrr - Hrm Hmm^-1 Hmr,   dg = gr - Hrm Hmm^-1 gm
        lin_J = sqrt(S) V',   lin_res = -sqrt(S)^-1 V' dg   (clamped eigs)

    Returns (lin_J (keep,keep), lin_res (keep,), lin_X (keep,)).
    """
    dtype = x.dtype
    r, Jm = _linearize(res_fn, x) if lin is None else lin
    H = Jm.T @ Jm
    g = -(Jm.T @ r)
    D = x.shape[0]
    m = D - keep
    Hmm = H[:m, :m]
    Hmr = H[:m, m:]
    Hrm = H[m:, :m]
    Hrr = H[m:, m:]
    gm = g[:m]
    gr = g[m:]
    # solve instead of explicit inverse; tiny jitter guards f32 singularity,
    # Jacobi equilibration keeps the f32 solve accurate at cond ~1e9
    Hmm = Hmm + 1e-8 * jnp.eye(m, dtype=dtype)
    s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(Hmm), 1e-20))
    sol = s[:, None] * jnp.linalg.solve(
        Hmm * s[:, None] * s[None, :],
        s[:, None] * jnp.concatenate([Hmr, gm[:, None]], 1),
    )
    dH = Hrr - Hrm @ sol[:, :keep]
    dg = gr - Hrm @ sol[:, keep]
    lin_J, lin_res = sqrt_prior(dH, dg)
    lin_X = x[m:]
    return lin_J, lin_res, lin_X


def sqrt_prior(dH, dg):
    """Square-root prior from a Schur-reduced (information, gradient) pair
    — the eigendecomposition tail of ``marginalize`` (solver.cpp:390-405),
    split out so a kernel-computed dH/dg can reuse it."""
    dH = 0.5 * (dH + dH.T)
    eps = 1e-8
    S, V = jnp.linalg.eigh(dH)
    S_cl = jnp.where(S > eps, S, 0.0)
    S_inv = jnp.where(S > eps, 1.0 / S, 0.0)
    lin_J = jnp.sqrt(S_cl)[:, None] * V.T
    lin_res = -(jnp.sqrt(S_inv)[:, None] * V.T @ dg)
    return lin_J, lin_res
