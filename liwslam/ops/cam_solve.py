"""Pallas TPU mega-kernel for the camera sub-step's joint solve.

Round 3 left the camera path paying ~10x vs laser-only, with the cost
measured as DIFFUSE KERNEL COUNT (profile_camera.py): the landmark-Schur
LM (solve/cam_schur.py) plus the separate 30-dim marginalization pass
together launch hundreds of tiny XLA kernels per accepted camera frame.
This module applies the build's flagship technique (ops/track_solve) to
its slowest path: ONE kernel launch covering

- the base-row linearization (imu/wheel/ground/prior of the 2-frame
  [prev, camera] window — the same fixed structure as the tracking
  kernel, with zero-weight laser rows; ``track_solve._make_residual``
  is reused verbatim),
- the reprojection-row linearization (9 forward tangents through the
  whitened normalized-plane residual, ``camera_factor.h:36-67``
  semantics, rows laid out as (Wc, F) grids),
- the landmark-Schur normal equations: Hpp (30x30), block-diagonal Hll
  as six (F,) entry vectors, the Hpl coupling (current-frame rows only
  by construction), closed-form 3x3 landmark inverses,
- the damped 30-dim reduced solve (hand-rolled Cholesky) + landmark
  back-substitution, inside the LM accept/reject ``while_loop`` with
  early exit (gn.lm_solve / cam_schur termination semantics),
- the base-only Schur reduction at the solution that feeds the
  marginalization prior (``gn.marginalize`` keep=15 math — previously
  a SECOND full linearization pass outside the solve).

Outputs match solve/cam_schur.lm_solve_cam_schur + gn.marginalize up to
fp reordering (parity-tested in tests/test_cam_solve.py).

Reference counterparts: ``src/factor/solver.cpp:641-666`` (camera rows
of the tracking problem), SPARSE_SCHUR landmark elimination, and the
marginalization assembly at ``solver.cpp:257-442``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from liwslam.ops.track_solve import (
    D,
    _EPS,
    _cholesky,
    _diag,
    _eye,
    _make_residual,
    _max1d,
    _mv,
    _row_of,
    _solve_lower,
    _solve_upper_t,
    _sum1d,
    _t_exp_so3,
    pack_inputs,
)

# pose tangent block of the current (camera) frame inside the 30-dim state
_P0 = 15  # x[15:18] = p1, x[18:21] = q1


def _sum2(a):
    """Scalar sum of a 2-D array: sublane reduce twice (lane-axis
    reductions of short vectors trip Mosaic; see track_solve._sum1d)."""
    return _sum1d(jnp.sum(a, axis=0))


def _kernel(
    state_ref,  # (32,128): track_solve layout + camera scalars
    imu_ref,  # (40,128)
    prior_ref,  # (24,128)
    laser_ref,  # (8,128) zero-weight rows (no laser factor here)
    cam_ref,  # (3*Wcp,128): obs_x / obs_y / use row blocks, F lanes
    ring_ref,  # (Wcp,128): cols 0:3 ring_p, 3:6 ring_q
    lm_ref,  # (F,128): cols 0:3 world0, col 3 lm_free
    out_ref,  # (16,128): row0 x_opt, row8 lane0 cost
    wld_ref,  # (F,128): cols 0:3 world_opt
    schur_ref,  # (24,128): rows0:15 dH, row16 dg
    *,
    frozen_dims: tuple,
    Wc: int,
    Wcp: int,
    F: int,
    max_iters: int,
    lam_init: float,
    lam_up: float,
    lam_down: float,
    lam_min: float,
    lam_max: float,
    ftol: float,
    xtol: float,
):
    dtype = jnp.float32
    state = state_ref[:]
    imu_in = imu_ref[:]
    prior_in = prior_ref[:]
    laser_in = laser_ref[:]
    cam_in = cam_ref[:]
    ring_in = ring_ref[:]
    lm_in = lm_ref[:]

    x0 = state[0, 0:D]
    free = state[24, 0:D]
    scal16 = state[16, 0:16]
    si0, si1 = scal16[8], scal16[9]
    TicM = state[4:8, 16:20]
    Ric = tuple(tuple(TicM[i, j] for j in range(3)) for i in range(3))
    tic = (TicM[0, 3], TicM[1, 3], TicM[2, 3])

    obs_x = cam_in[0:Wcp, 0:F]
    obs_y = cam_in[Wcp : 2 * Wcp, 0:F]
    use = cam_in[2 * Wcp : 3 * Wcp, 0:F]
    ring = (ring_in[:, 0], ring_in[:, 1], ring_in[:, 2])
    ringq = (ring_in[:, 3], ring_in[:, 4], ring_in[:, 5])
    w0 = (lm_in[:, 0], lm_in[:, 1], lm_in[:, 2])
    lmf = lm_in[:, 3]  # (F,) 1.0 free / 0.0 frozen
    lmf_row = lmf[None, :]  # (1,F)

    wids = jax.lax.broadcasted_iota(jnp.int32, (Wcp, 1), 0)[:, 0]
    cur = (wids == Wc - 1).astype(dtype)  # (Wcp,)
    ncur = 1.0 - cur

    # ---- base residual: the tracking structure minus laser -------------
    residual_b = _make_residual(state, imu_in, prior_in, laser_in, 8)

    def lin_base(x):
        r = residual_b(x)
        J = jax.jacfwd(residual_b)(x)
        return r, J

    def cost_base(r):
        return 0.5 * sum(b * b if b.ndim == 0 else _sum1d(b * b) for b in r)

    def normal_eqs_base(r, J, mask_cols):
        Hs, gs = [], []
        for rb, Jb in zip(r, J):
            if Jb.ndim == 1:
                Jm = Jb * free if mask_cols else Jb
                Hs.append(Jm[:, None] * Jm[None, :])
                gs.append(-(Jm * rb))
            else:
                Jm = Jb * free[None, :] if mask_cols else Jb
                Hs.append(jnp.dot(Jm.T, Jm, preferred_element_type=dtype))
                gs.append(-jnp.sum(Jm * rb[:, None], axis=0))
        return sum(Hs), sum(gs)

    # ---- camera rows as (Wcp,F) grids ----------------------------------
    # row (w,f): whitened reprojection of landmark f in window frame w;
    # frame Wc-1 uses the free current pose, older frames the frozen ring
    # poses (solver.cpp:641-666: window frames constant except the last)
    def cam_rows(p1x, p1y, p1z, q1x, q1y, q1z, wx, wy, wz):
        px = cur * p1x + ncur * ring[0]
        py = cur * p1y + ncur * ring[1]
        pz = cur * p1z + ncur * ring[2]
        qx = cur * q1x + ncur * ringq[0]
        qy = cur * q1y + ncur * ringq[1]
        qz = cur * q1z + ncur * ringq[2]
        R = _t_exp_so3(qx, qy, qz)  # entries (Wcp,)
        # R_wc = R_wi @ Ric; t_wc = p + R_wi tic
        Rwc = tuple(
            tuple(
                sum(R[i][k] * Ric[k][j] for k in range(3)) for j in range(3)
            )
            for i in range(3)
        )
        twc = tuple(
            (px, py, pz)[i] + sum(R[i][k] * tic[k] for k in range(3))
            for i in range(3)
        )
        # u = wpt - t_wc, grids (Wcp,F); cam = R_wc^T u
        u = tuple((wx, wy, wz)[j][None, :] - twc[j][:, None] for j in range(3))
        cam = tuple(
            sum(Rwc[j][i][:, None] * u[j] for j in range(3)) for i in range(3)
        )
        z = jnp.where(jnp.abs(cam[2]) < 1e-9, 1e-9, cam[2])
        rx = si0 * (obs_x - cam[0] / z) * use
        ry = si1 * (obs_y - cam[1] / z) * use
        return rx, ry

    zF = jnp.zeros((F,), dtype)
    oF = zF + 1.0
    z0 = jnp.zeros((), dtype)
    o0 = z0 + 1.0

    def lin_rows(x, wld):
        primals = (x[15], x[16], x[17], x[18], x[19], x[20], *wld)
        (rx, ry), lin = jax.linearize(cam_rows, *primals)
        Jp = []  # 6 pose tangents, (Wcp,F) x/y pairs
        for k in range(6):
            t = [z0] * 6 + [zF] * 3
            t[k] = o0
            Jp.append(lin(*t))
        Jw = []  # 3 landmark tangents (diagonal in f -> ones tangent)
        for a in range(3):
            t = [z0] * 6 + [zF] * 3
            t[6 + a] = oF
            jx, jy = lin(*t)
            # landmark columns masked by lm_free (cam_schur Jw * lmf)
            Jw.append((jx * lmf_row, jy * lmf_row))
        return rx, ry, tuple(Jp), tuple(Jw)

    ii = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
    ids = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)[:, 0]

    def damped_step(lin, lam):
        r_b, J_b, rx, ry, Jp, Jw = lin
        H, g = normal_eqs_base(r_b, J_b, mask_cols=True)
        # current-frame pose block += camera rows (6x6 at [15:21,15:21])
        for e in range(6):
            ge = -_sum2(Jp[e][0] * rx + Jp[e][1] * ry)
            g = g + jnp.where(ids == _P0 + e, ge, 0.0)
            for gg in range(e, 6):
                h = _sum2(Jp[e][0] * Jp[gg][0] + Jp[e][1] * Jp[gg][1])
                pat = (ii == _P0 + e) & (jj == _P0 + gg)
                if gg != e:
                    pat = pat | ((ii == _P0 + gg) & (jj == _P0 + e))
                H = H + jnp.where(pat, h, 0.0)

        # landmark blocks, entries as (F,) vectors
        Hll = {}
        for a in range(3):
            for b in range(a, 3):
                Hll[(a, b)] = jnp.sum(
                    Jw[a][0] * Jw[b][0] + Jw[a][1] * Jw[b][1], axis=0
                )
        gl = [-jnp.sum(Jw[a][0] * rx + Jw[a][1] * ry, axis=0) for a in range(3)]
        Hpl = [
            [
                jnp.sum(Jp[e][0] * Jw[a][0] + Jp[e][1] * Jw[a][1], axis=0)
                for a in range(3)
            ]
            for e in range(6)
        ]

        # LM damping + freeze (cam_schur damped_step semantics)
        diag = _diag(H)
        damped = diag + lam * jnp.maximum(diag, 1e-12)
        fm = free > 0
        A = H * (free[:, None] * free[None, :])
        A = jnp.where(
            ii == jj,
            jnp.where(fm, damped, 1.0)[:, None] * _eye(D, dtype),
            A,
        )
        lmb = lmf > 0
        dL = [
            jnp.where(
                lmb,
                Hll[(a, a)] + lam * jnp.maximum(Hll[(a, a)], 1e-12),
                1.0,
            )
            for a in range(3)
        ]
        off = {
            (a, b): jnp.where(lmb, Hll[(a, b)], 0.0)
            for a in range(3)
            for b in range(a + 1, 3)
        }
        # closed-form 3x3 inverse (adjugate/det) of the damped blocks
        a_, b_, c_ = dL[0], off[(0, 1)], off[(0, 2)]
        e_, f_ = dL[1], off[(1, 2)]
        i_ = dL[2]
        cA = e_ * i_ - f_ * f_
        cB = -(b_ * i_ - f_ * c_)
        cC = b_ * f_ - e_ * c_
        det = a_ * cA + b_ * cB + c_ * cC
        det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        Hinv = {
            (0, 0): cA / det,
            (0, 1): cB / det,
            (0, 2): cC / det,
            (1, 1): (a_ * i_ - c_ * c_) / det,
            (1, 2): -(a_ * f_ - c_ * b_) / det,
            (2, 2): (a_ * e_ - b_ * b_) / det,
        }

        def hinv(a, b):
            return Hinv[(a, b)] if a <= b else Hinv[(b, a)]

        glA = [jnp.where(lmb, gl[a], 0.0) for a in range(3)]
        # K[e][b] = sum_a Hpl[e][a] Hinv[a][b]
        K = [
            [sum(Hpl[e][a] * hinv(a, b) for a in range(3)) for b in range(3)]
            for e in range(6)
        ]
        # S = A - E (Schur of the landmark blocks into the pose block)
        for e in range(6):
            for gg in range(e, 6):
                Eeg = _sum1d(sum(K[e][b] * Hpl[gg][b] for b in range(3)))
                pat = (ii == _P0 + e) & (jj == _P0 + gg)
                if gg != e:
                    pat = pat | ((ii == _P0 + gg) & (jj == _P0 + e))
                A = A - jnp.where(pat, Eeg, 0.0)
        b_vec = jnp.where(fm, g, 0.0)
        for e in range(6):
            c6e = _sum1d(sum(K[e][b] * glA[b] for b in range(3)))
            b_vec = b_vec - jnp.where(ids == _P0 + e, c6e, 0.0)

        s = 1.0 / jnp.sqrt(jnp.maximum(_diag(A), 1e-20))
        As = A * s[:, None] * s[None, :]
        # statically-frozen dims are identity rows with zero rhs: their
        # factorization steps are exact no-ops (track_solve semantics)
        L = _cholesky(As, D, skip=frozen_dims)
        y = _solve_lower(L, s * b_vec, D, skip=frozen_dims)
        y = _solve_upper_t(L, y, D, skip=frozen_dims)
        dxp = s * y
        bad = jnp.where(jnp.isfinite(dxp), 0.0, 1.0)
        ok = _sum1d(bad) < 0.5
        dxp = jnp.where(ok, dxp, jnp.zeros_like(dxp)) * free
        # landmark back-substitution
        rhs = [
            glA[a] - sum(Hpl[e][a] * dxp[_P0 + e] for e in range(6))
            for a in range(3)
        ]
        dxl = [
            sum(hinv(a, b) * rhs[b] for b in range(3)) * lmf for a in range(3)
        ]
        dxl = [jnp.where(jnp.isfinite(d), d, 0.0) for d in dxl]
        return dxp, tuple(dxl)

    def _so3_wrap_scale(wx_, wy_, wz_):
        theta = jnp.sqrt(
            jnp.maximum(wx_ * wx_ + wy_ * wy_ + wz_ * wz_, _EPS * _EPS)
        )
        two_pi = 2.0 * jnp.pi
        wrapped = theta - two_pi * jnp.floor((theta + jnp.pi) / two_pi)
        return jnp.where(theta > jnp.pi, wrapped / theta, 1.0)

    def wrap(x):
        s1 = _so3_wrap_scale(x[3], x[4], x[5])
        s2 = _so3_wrap_scale(x[18], x[19], x[20])
        mult = jnp.where(
            (ids >= 3) & (ids < 6),
            s1,
            jnp.where((ids >= 18) & (ids < 21), s2, 1.0),
        )
        return x * mult

    def cost_of(r_b, rx, ry):
        return cost_base(r_b) + 0.5 * (_sum2(rx * rx) + _sum2(ry * ry))

    r_b0, J_b0 = lin_base(x0)
    rx0, ry0, Jp0, Jw0 = lin_rows(x0, w0)
    c0 = cost_of(r_b0, rx0, ry0)

    def body(carry):
        x, wld, lin, lam, cbest, it, done = carry
        dxp, dxl = damped_step(lin, lam)
        x_t = wrap(x + dxp)
        w_t = tuple(wld[a] + dxl[a] for a in range(3))
        rb_t, Jb_t = lin_base(x_t)
        rx_t, ry_t, Jp_t, Jw_t = lin_rows(x_t, w_t)
        c_t = cost_of(rb_t, rx_t, ry_t)
        accept = c_t < cbest
        sel = lambda a, b: jax.tree_util.tree_map(
            lambda u, v: jnp.where(accept, u, v), a, b
        )
        x = jnp.where(accept, x_t, x)
        wld = sel(w_t, wld)
        lin = sel((rb_t, Jb_t, rx_t, ry_t, Jp_t, Jw_t), lin)
        c1 = jnp.where(accept, c_t, cbest)
        lam_n = jnp.where(accept, lam * lam_down, lam * lam_up)
        lam_n = jnp.clip(lam_n, lam_min, lam_max)
        rel_change = jnp.abs(cbest - c_t) / jnp.maximum(cbest, 1e-20)
        dxn = jnp.maximum(
            _max1d(jnp.abs(dxp)),
            jnp.max(jnp.stack([_max1d(jnp.abs(d)) for d in dxl])),
        )
        xn = jnp.maximum(
            _max1d(jnp.abs(x)),
            jnp.max(jnp.stack([_max1d(jnp.abs(w)) for w in wld])),
        )
        xtol_hit = dxn < xtol * (xn + xtol)
        stalled = jnp.logical_not(accept) & (lam_n >= lam_max)
        done = done | (rel_change < ftol) | xtol_hit | stalled
        return (x, wld, lin, lam_n, c1, it + 1, done)

    def cond(carry):
        *_, it, done = carry
        return jnp.logical_and(it < max_iters, jnp.logical_not(done))

    x, wld, lin, lam, c, _, _ = jax.lax.while_loop(
        cond,
        body,
        (
            x0,
            w0,
            (r_b0, J_b0, rx0, ry0, Jp0, Jw0),
            jnp.asarray(lam_init, dtype),
            c0,
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
        ),
    )

    # ---- base-only Schur reduction at the solution (gn.marginalize
    # keep=15 — the camera sub-step's prior drops the landmark columns by
    # design; see camera_pipeline module docstring "documented deviations")
    r_b, J_b = lin[0], lin[1]
    H, gm_full = normal_eqs_base(r_b, J_b, mask_cols=False)
    Hmm = H[0:15, 0:15] + 1e-8 * _eye(15, dtype)
    sm = 1.0 / jnp.sqrt(jnp.maximum(_diag(Hmm), 1e-20))
    Lm = _cholesky(Hmm * sm[:, None] * sm[None, :], 15)
    solX = sm[:, None] * _solve_upper_t(
        Lm, _solve_lower(Lm, sm[:, None] * H[0:15, 15:30], 15), 15
    )
    solg = sm * _solve_upper_t(Lm, _solve_lower(Lm, sm * gm_full[0:15], 15), 15)
    dH = H[15:30, 15:30] - H[15:30, 0:15] @ solX
    dg = gm_full[15:30] - _mv(H[15:30, 0:15], solg)
    dH = 0.5 * (dH + dH.T)

    out_ref[0, 0:D] = x
    out_ref[8, 0:1] = c[None]
    cols8 = jax.lax.broadcasted_iota(jnp.int32, (F, 8), 1)
    warr = jnp.where(
        cols8 == 0,
        wld[0][:, None],
        jnp.where(cols8 == 1, wld[1][:, None], jnp.where(cols8 == 2, wld[2][:, None], 0.0)),
    )
    wld_ref[0:F, 0:8] = warr
    schur_ref[0:15, 0:15] = dH
    schur_ref[16, 0:15] = dg


def _round8(n):
    return -(-n // 8) * 8


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "ftol", "xtol", "interpret", "frozen_dims"),
)
def lm_solve_cam(
    x0,
    free,
    world0,  # (F,3)
    lm_free,  # (F,) bool
    obs,  # (F,Wc,2) normalized observations
    use,  # (F,Wc) bool (obs_mask & ready & ring_valid)
    ring_p,  # (Wc,3)
    ring_q,  # (Wc,3)
    data,  # FactorData, W=2 (laser rows ignored: zero-weight)
    consts,
    Tic,  # (4,4)
    sqrt_info,  # (2,)
    *,
    max_iters: int = 10,
    frozen_dims: tuple = (0, 1, 2, 3, 4, 5),
    ftol: float = 3e-4,
    xtol: float = 1e-7,
    interpret: bool = False,
):
    """One-kernel camera joint solve + marginalization.

    Returns (x30_opt, world_opt (F,3), cost, dH (15,15), dg (15,)):
    the LM solution over [prev, camera] pose window + landmarks, and the
    base-only Schur-reduced prior information at the solution (feed to
    gn.sqrt_prior)."""
    dtype = jnp.float32
    F, Wc = use.shape
    Wcp = _round8(Wc)

    state, imu_in, prior_in, laser_in = pack_inputs(x0, free, data, consts)
    # no laser factor in the camera sub-step: zero-weight rows
    laser_in = jnp.zeros((8, 128), dtype)
    state = state.at[16, 8:10].set(sqrt_info.astype(dtype))
    state = state.at[4:8, 16:20].set(Tic.astype(dtype))

    cam_in = jnp.zeros((3 * Wcp, 128), dtype)
    cam_in = cam_in.at[0:Wc, 0:F].set(obs[:, :, 0].T)
    cam_in = cam_in.at[Wcp : Wcp + Wc, 0:F].set(obs[:, :, 1].T)
    cam_in = cam_in.at[2 * Wcp : 2 * Wcp + Wc, 0:F].set(
        use.T.astype(dtype)
    )
    ring_in = jnp.zeros((Wcp, 128), dtype)
    ring_in = ring_in.at[0:Wc, 0:3].set(ring_p.astype(dtype))
    ring_in = ring_in.at[0:Wc, 3:6].set(ring_q.astype(dtype))
    lm_in = jnp.zeros((F, 128), dtype)
    lm_in = lm_in.at[:, 0:3].set(world0.astype(dtype))
    lm_in = lm_in.at[:, 3].set(lm_free.astype(dtype))

    kern = functools.partial(
        _kernel,
        Wc=Wc,
        Wcp=Wcp,
        F=F,
        max_iters=max_iters,
        frozen_dims=tuple(frozen_dims),
        lam_init=1e-4,
        lam_up=4.0,
        lam_down=0.33,
        lam_min=1e-10,
        lam_max=1e8,
        ftol=ftol,
        xtol=xtol,
    )
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out, wld, schur = pl.pallas_call(
        kern,
        in_specs=[vm() for _ in range(7)],
        out_specs=[vm(), vm(), vm()],
        out_shape=[
            jax.ShapeDtypeStruct((16, 128), dtype),
            jax.ShapeDtypeStruct((F, 128), dtype),
            jax.ShapeDtypeStruct((24, 128), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(state, imu_in, prior_in, laser_in, cam_in, ring_in, lm_in)
    x_opt = out[0, 0:D]
    cost = out[8, 0]
    world_opt = wld[:, 0:3]
    dH = schur[0:15, 0:15]
    dg = schur[16, 0:15]
    return x_opt, world_opt, cost, dH, dg
