"""Parity: one-launch Pallas line extraction (ops/extract) vs the XLA
extraction chain (frontend/scan.extract_features).

The kernel re-derives every stage of the reference's ``spawn_scan``
(laser_manager.cpp:350-422) as in-VMEM log-depth scans; these tests pin
it line-for-line and corner-for-corner against the XLA path (interpret
mode on CPU) across noise-free and noisy simulator scans."""

import numpy as np
import pytest
import jax.numpy as jnp

from liwslam import config
from liwslam.frontend import scan as scan_mod
from liwslam.sim import world as sim


def _kw(prm):
    return dict(
        continuous_threshold=prm.line_continuous_threshold,
        min_len=prm.line_min_len,
        max_dis=prm.line_max_dis,
        tolerance_angle_rad=prm.line_max_tolerance_angle_rad,
        resolution=prm.laser_resolution,
        max_lines=prm.max_lines,
        max_corners=prm.max_corners,
    )


def _greedy_align(pa, pb, atol):
    """Align two scan-ordered row sets; returns (#matched, #unmatched).
    Tolerates single-row insertions/deletions (knife-edge gate flips)."""
    ia = ib = matched = 0
    while ia < len(pa) and ib < len(pb):
        if np.allclose(pa[ia], pb[ib], atol=atol):
            matched += 1
            ia += 1
            ib += 1
        elif len(pb) - ib > len(pa) - ia:
            ib += 1
        else:
            ia += 1
    return matched, (len(pa) - matched) + (len(pb) - matched)


def _compare(streams, prm, stride=7, atol=2e-3, miss_frac=0.02):
    """Endpoint-level agreement on matched lines/corners.

    The two paths run the same math in different f32 summation orders
    (log-depth doubling vs XLA cumsum), so (a) matched endpoints agree to
    ~mm, and (b) a span sitting exactly ON a gate (length == min_len,
    max_d == max_dis) can flip in or out — rare single-line knife-edge
    flips are tolerated, bounded in aggregate below."""
    kw = _kw(prm)
    n_frames = tot_lines = tot_line_miss = tot_corners = tot_corner_miss = 0
    for k in range(0, len(streams.laser_t_us), stride):
        pts = jnp.asarray(streams.laser_points[k])
        v = jnp.asarray(streams.laser_valid[k])
        a = scan_mod.extract_features(pts, v, **kw)
        b = scan_mod.extract_features_pallas(pts, v, interpret=True, **kw)
        va = np.asarray(a.line_valid)
        vb = np.asarray(b.line_valid)
        assert abs(int(va.sum()) - int(vb.sum())) <= 1, f"frame {k}: line count"
        ra = np.concatenate([np.asarray(a.p1)[va], np.asarray(a.p2)[va]], 1)
        rb = np.concatenate([np.asarray(b.p1)[vb], np.asarray(b.p2)[vb]], 1)
        m, miss = _greedy_align(ra, rb, atol)
        tot_lines += max(len(ra), len(rb))
        tot_line_miss += miss
        ca = np.asarray(a.corner_valid)
        cb = np.asarray(b.corner_valid)
        assert abs(int(ca.sum()) - int(cb.sum())) <= 2, f"frame {k}: corner count"
        mc, missc = _greedy_align(
            np.asarray(a.corners)[ca], np.asarray(b.corners)[cb], atol
        )
        tot_corners += max(int(ca.sum()), int(cb.sum()))
        tot_corner_miss += missc
        n_frames += 1
    assert n_frames >= 5
    assert tot_lines > 0
    # knife-edge flips must stay rare: <= 2% of all lines/corners
    assert tot_line_miss <= max(2, miss_frac * tot_lines), (
        tot_line_miss,
        tot_lines,
    )
    assert tot_corner_miss <= max(2, 0.05 * tot_corners), (
        tot_corner_miss,
        tot_corners,
    )


@pytest.mark.parametrize("noise", [False, True])
def test_parity_sim_scans(noise):
    prm = config.office().replace(max_points=512, max_lines=48, max_corners=16)
    streams = sim.simulate(
        sim.default_track("L"),
        sim.square_room(obstacles=True),
        prm,
        imu_hz=100,
        wheel_hz=20,
        laser_hz=5,
        n_beams=360,
        noise=noise,
        seed=0,
    )
    _compare(streams, prm)


def test_parity_dense_scan():
    """Bench-like geometry: 1080 beams, rich room (more segments/corners)."""
    prm = config.office().replace(max_points=1152, max_lines=64, max_corners=16)
    streams = sim.simulate(
        sim.TwistTrack([(4.0, 0.3, 0.0, 0.2)]),
        sim.square_room(size=12.0, obstacles=True, rich=True),
        prm,
        imu_hz=100,
        wheel_hz=20,
        laser_hz=5,
        n_beams=1080,
        noise=True,
        seed=3,
    )
    # atol 1 cm: at 1080 noisy beams, SHORT spans' TLS directions are
    # f32-rounding-dominated in both paths (few-mm endpoint deviations on
    # ~0.1 m lines); still far inside the 3 cm max_dis gate, and the
    # downstream solver weighs short lines down by sqrt(len)
    _compare(streams, prm, stride=3, atol=1e-2, miss_frac=0.03)


def test_degenerate_scans():
    """Empty / all-invalid / single-segment inputs don't produce garbage."""
    prm = config.office().replace(max_points=256, max_lines=16, max_corners=8)
    kw = _kw(prm)
    pts = jnp.zeros((256, 3), jnp.float32)
    v = jnp.zeros(256, bool)
    b = scan_mod.extract_features_pallas(pts, v, interpret=True, **kw)
    assert int(b.n_lines) == 0 and int(b.n_corners) == 0

    # one clean straight wall -> exactly one line, no corners
    x = np.linspace(0.0, 2.0, 256)
    wall = np.stack([x, np.ones_like(x), np.zeros_like(x)], -1)
    a = scan_mod.extract_features(
        jnp.asarray(wall, jnp.float32), jnp.ones(256, bool), **kw
    )
    b = scan_mod.extract_features_pallas(
        jnp.asarray(wall, jnp.float32), jnp.ones(256, bool), interpret=True, **kw
    )
    assert int(a.n_lines) == int(b.n_lines) == 1
    assert int(b.n_corners) == 0
