"""fast_mode vs full-mode e2e equivalence (SURVEY §4's planned window).

``fast_mode`` is the reference BASE-config default (config/params.yaml;
liwslam config.py:122) and changes solver semantics: biases frozen at
tracking time, iteration cap, and the marginalization prior skipped
(solver.cpp:744,791-801; driver/camera_pipeline honor the same gates).
The dataset presets run fast_mode=False.  VERDICT r4 weak #4: no test
exercised the default.  These runs pin both modes end-to-end on the same
streams and bound their divergence."""

import numpy as np
import jax.numpy as jnp
import pytest

from liwslam import config
from liwslam.core import geometry as geo
from liwslam.eval import metrics
from liwslam.frontend.driver import Frontend
from liwslam.sim import world as sim


@pytest.fixture(scope="module")
def setup():
    prm = config.office().replace(
        max_points=576,
        max_lines=48,
        max_corners=16,
        ref_capacity=512,
        max_imu_per_frame=64,
        solver_max_iterations=8,
        init_solver_max_iterations=20,
    )
    streams = sim.simulate(
        sim.default_track("L"),
        sim.square_room(obstacles=True),
        prm,
        imu_hz=100,
        wheel_hz=20,
        laser_hz=5,
        n_beams=540,
        noise=False,
        seed=0,
    )
    return prm, streams


def _run(prm, streams):
    fe = Frontend(prm)
    res = fe.run(streams, chunk_size=16)
    est = np.asarray(geo.make_tf(jnp.asarray(res.p), jnp.asarray(res.q)))
    pairs = metrics.associate_by_time(res.t_us, streams.gt_t_us)
    gt = streams.gt_T_w_imu[pairs[:, 1]]
    return res, metrics.ate_rmse(est[pairs[:, 0]], gt, align=True)


def test_fast_mode_equivalence(setup):
    prm, streams = setup
    res_full, ate_full = _run(prm.replace(fast_mode=False), streams)
    res_fast, ate_fast = _run(prm.replace(fast_mode=True), streams)

    # both modes must converge to a usable trajectory (the e2e gate of
    # tests/test_frontend_e2e.py), and the divergence must stay small:
    # fast_mode drops the prior + freezes biases, which on a noise-free
    # track costs accuracy but not stability
    assert ate_full < 0.1, ate_full
    assert ate_fast < 0.1, ate_fast
    # documented equivalence bound: the two modes' trajectories agree to
    # centimeters on this track (measured r5: full ~1 mm, fast ~some mm)
    dp = np.linalg.norm(
        np.asarray(res_full.p)[:, :2] - np.asarray(res_fast.p)[:, :2], axis=1
    )
    assert np.max(dp) < 0.1, np.max(dp)
    print(
        f"ate_full={ate_full * 1e3:.2f} mm ate_fast={ate_fast * 1e3:.2f} mm "
        f"max |dp|={np.max(dp) * 1e3:.1f} mm"
    )


def test_fast_mode_skips_prior(setup):
    """Structural check: fast_mode leaves the marginalization prior
    invalid (solver.cpp:791-801 skips marginalization)."""
    prm, streams = setup
    fe = Frontend(prm.replace(fast_mode=True))
    frames, lt = fe.pack_frames(streams)
    init = fe.initialize(frames, lt)
    track = init[0]
    chunk_fn = fe._chunk_fn()
    import jax

    def pack(lo, hi):
        return jax.tree_util.tree_map(
            lambda *xs: jnp.asarray(np.stack(xs)), *frames[lo:hi]
        )

    k0 = init[1]
    track2, outs = chunk_fn(track, pack(k0, k0 + 8))
    assert not bool(track2.prior_valid)

    fe2 = Frontend(prm.replace(fast_mode=False))
    frames2, lt2 = fe2.pack_frames(streams)
    init2 = fe2.initialize(frames2, lt2)
    chunk_fn2 = fe2._chunk_fn()
    track_b, _ = chunk_fn2(
        init2[0],
        jax.tree_util.tree_map(
            lambda *xs: jnp.asarray(np.stack(xs)), *frames2[init2[1] : init2[1] + 8]
        ),
    )
    assert bool(track_b.prior_valid)
