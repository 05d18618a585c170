"""Full-dress OpenLORIS rehearsal (VERDICT r3 next-round #7).

When real OpenLORIS data lands, parity measurement must be a data swap,
not an integration project.  This test emits a simulator bag with the
REAL interface the reference consumes:

- topic names from ``config/office.yaml:1-4`` (/scan, /odom, /d400/imu0,
  /d400/color/image_raw), subscribed at ``lvio_2d_node.cpp:10-19``,
- real rates: 400 Hz IMU (d400 gyro class), 20 Hz wheel odometry,
  40 Hz laser (UTM-30LX class) with 1080 beams,
- real D435 color geometry: 848x480 images (at a reduced 3 Hz cadence —
  the office config ships ``enable_camera: false`` so the camera stream
  is ingestion-only here),

and runs ``run.py --sequence that.bag --preset office`` with ZERO
parameter overrides — the shipped preset (full 2048-point capacity,
FPS=1000 ungating, office thresholds) must ingest and track it as-is,
backend included, under the standard ATE gate.
"""

import numpy as np

from liwslam import config
from liwslam.io import openloris, tum
from liwslam.sim import world as sim


def test_full_dress_office_bag(tmp_path):
    import liwslam.run as run_mod

    prm = config.office()
    # short indoor run: static start (init gate) + two legs and a turn
    track = sim.TwistTrack(
        [
            (2.0, 0.0, 0.0, 0.0),
            (3.0, 0.4, 0.0, 0.0),
            (2.0, 0.3, 0.0, np.pi / 2 / 2.0),
            (3.0, 0.4, 0.0, 0.0),
        ]
    )
    streams = sim.simulate(
        track,
        sim.square_room(size=12.0, obstacles=True, rich=True),
        prm,
        imu_hz=400.0,
        wheel_hz=20.0,
        laser_hz=40.0,
        n_beams=1080,
        camera_hz=3.0,
        camera_wh=(848, 480),
        noise=True,
        seed=7,
    )
    assert streams.cam_images.shape[1:] == (480, 848)

    bag = str(tmp_path / "office_rehearsal.bag")
    # default save_bag topics ARE the reference office topics
    openloris.save_bag(bag, streams, compression="lz4", indexed=True)
    gt = str(tmp_path / "gt.txt")
    tum.write_tum(
        gt, streams.gt_t_us + int(1560000000.0 * 1e6), streams.gt_T_w_wheel
    )

    report = run_mod.main(
        [
            "--preset", "office",
            "--sequence", bag,
            "--gt", gt,
            "--camera-topic", "/d400/color/image_raw",
            "--out", str(tmp_path / "out"),
        ]
    )
    # 40 Hz ungated (FPS=1000): every laser frame after init is tracked
    assert report["frames"] > 200, report
    assert report["ate_frontend_m"] < 0.1, report
    assert report["keyframes"] >= 3, report
