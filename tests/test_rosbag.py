"""ROS1 bag reader/writer + OpenLORIS bag converter round-trips."""

import bz2
import os
import struct

import numpy as np
import pytest

from liwslam.io import openloris, rosbag


def test_message_serialization_roundtrip():
    scan = rosbag.serialize_laser_scan(
        12.5, [1.0, 2.0, np.nan, 4.0], -1.5, 0.01, time_increment=1e-4
    )
    m = rosbag.parse_laser_scan(scan)
    assert abs(m["stamp"] - 12.5) < 1e-6
    assert m["angle_min"] == pytest.approx(-1.5)
    assert m["angle_increment"] == pytest.approx(0.01)
    assert m["time_increment"] == pytest.approx(1e-4)
    np.testing.assert_allclose(m["ranges"][[0, 1, 3]], [1.0, 2.0, 4.0])
    assert np.isnan(m["ranges"][2])

    imu = rosbag.serialize_imu(3.25, [0.1, 0.2, 9.8], [0.01, 0.02, 0.03])
    m = rosbag.parse_imu(imu)
    np.testing.assert_allclose(m["acc"], [0.1, 0.2, 9.8])
    np.testing.assert_allclose(m["gyro"], [0.01, 0.02, 0.03])

    odom = rosbag.serialize_odometry(7.0, [1, 2, 0], [0, 0, 0.383, 0.924])
    m = rosbag.parse_odometry(odom)
    np.testing.assert_allclose(m["p"], [1, 2, 0])
    np.testing.assert_allclose(m["q_xyzw"], [0, 0, 0.383, 0.924])


def test_bag_container_roundtrip(tmp_path):
    path = str(tmp_path / "t.bag")
    with rosbag.BagWriter(path) as w:
        w.write("/d400/imu0", "sensor_msgs/Imu", 1.0,
                rosbag.serialize_imu(1.0, [0, 0, 9.8], [0, 0, 0.1]))
        w.write("/scan", "sensor_msgs/LaserScan", 1.01,
                rosbag.serialize_laser_scan(1.01, [2.0, 2.1], 0.0, 0.01))
        w.write("/odom", "nav_msgs/Odometry", 1.02,
                rosbag.serialize_odometry(1.02, [0.5, 0, 0], [0, 0, 0, 1]))
        w.write("/other", "sensor_msgs/Imu", 1.03,
                rosbag.serialize_imu(1.03, [1, 1, 1], [1, 1, 1]))
    msgs = list(rosbag.read_messages(path))
    assert [t for t, _, _ in msgs] == ["/d400/imu0", "/scan", "/odom", "/other"]
    # topic filter
    only = list(rosbag.read_messages(path, topics={"/scan"}))
    assert len(only) == 1 and only[0][0] == "/scan"


def test_bag_bz2_chunk(tmp_path):
    """Real OpenLORIS bags ship bz2-compressed chunks; re-compress our
    writer's chunk and make sure the reader decompresses it."""
    path = str(tmp_path / "t.bag")
    with rosbag.BagWriter(path) as w:
        w.write("/scan", "sensor_msgs/LaserScan", 2.0,
                rosbag.serialize_laser_scan(2.0, [1.5, 1.6, 1.7], -0.1, 0.05))
    raw = open(path, "rb").read()
    # locate the chunk record written last and re-write it as bz2
    with open(path, "rb") as f:
        assert f.read(len(rosbag.MAGIC)) == rosbag.MAGIC
        head_start = f.tell()
        # first record: bag header
        h, d = rosbag._read_record(f)
        chunk_pos = f.tell()
        h2_start = f.tell()
        (hlen,) = struct.unpack("<I", f.read(4))
        hdr = rosbag._parse_header(f.read(hlen))
        (dlen,) = struct.unpack("<I", f.read(4))
        chunk = f.read(dlen)
    comp = bz2.compress(chunk)
    new_h = rosbag._pack_header(
        {
            "op": bytes([rosbag.OP_CHUNK]),
            "compression": b"bz2",
            "size": struct.pack("<I", len(chunk)),
        }
    )
    with open(path, "wb") as f:
        f.write(raw[:chunk_pos])
        f.write(struct.pack("<I", len(new_h)) + new_h)
        f.write(struct.pack("<I", len(comp)) + comp)
    msgs = list(rosbag.read_messages(path))
    assert len(msgs) == 1
    np.testing.assert_allclose(msgs[0][2]["ranges"], [1.5, 1.6, 1.7], atol=1e-6)


@pytest.fixture(scope="module")
def sim_streams():
    from liwslam import config
    from liwslam.sim import world as sim

    prm = config.office()
    return sim.simulate(
        sim.default_track("L"),
        sim.square_room(obstacles=True),
        prm,
        imu_hz=50,
        wheel_hz=10,
        laser_hz=2,
        n_beams=180,
        noise=False,
        seed=0,
    )


def test_openloris_bag_roundtrip(tmp_path, sim_streams):
    """simulator -> .bag -> load_bag reproduces the streams (the converter
    path a real OpenLORIS bag takes)."""
    s = sim_streams
    path = str(tmp_path / "seq.bag")
    openloris.save_bag(path, s)
    out = openloris.load_bag(path)
    # timestamps survive to the microsecond
    np.testing.assert_array_equal(out.imu_t_us, s.imu_t_us)
    np.testing.assert_array_equal(out.wheel_t_us, s.wheel_t_us)
    np.testing.assert_array_equal(out.laser_t_us, s.laser_t_us)
    np.testing.assert_allclose(out.imu_acc, s.imu_acc, atol=1e-6)
    np.testing.assert_allclose(out.imu_gyro, s.imu_gyro, atol=1e-6)
    np.testing.assert_allclose(
        out.wheel_pose, s.wheel_pose, atol=2e-5
    )  # f32 quat round trip
    # laser points survive where valid
    v = s.laser_valid & out.laser_valid
    assert v.sum() > 0.9 * s.laser_valid.sum()
    np.testing.assert_allclose(
        out.laser_points[v], s.laser_points[v], atol=2e-4
    )


def test_image_message_roundtrip():
    img = np.random.default_rng(0).uniform(0, 1, (24, 32)).astype(np.float32)
    m = rosbag.parse_image(rosbag.serialize_image(5.5, img))
    assert abs(m["stamp"] - 5.5) < 1e-6
    np.testing.assert_allclose(m["image"], img, atol=1.0 / 255)
    # rgb8 path
    rgb = np.zeros((4, 4, 3), np.uint8)
    rgb[..., 1] = 255  # pure green
    import struct as _s

    data = (
        rosbag._ser_header(1.0, "cam")
        + _s.pack("<II", 4, 4)
        + _s.pack("<I", 4) + b"rgb8"
        + _s.pack("<BI", 0, 12)
        + _s.pack("<I", 48) + rgb.tobytes()
    )
    m2 = rosbag.parse_image(data)
    np.testing.assert_allclose(m2["image"], 0.587, atol=1e-3)


def test_bag_camera_stream_roundtrip(tmp_path, sim_streams):
    """Camera images flow through save_bag/load_bag (the reference's
    camera_topic ingestion, lvio_2d_node.cpp:45-48)."""
    s = sim_streams
    import dataclasses

    rng = np.random.default_rng(1)
    s2 = dataclasses.replace(
        s,
        cam_t_us=(s.laser_t_us[:4] + 777).astype(np.int64),
        cam_images=rng.uniform(0, 1, (4, 30, 40)).astype(np.float32),
    )
    path = str(tmp_path / "cam.bag")
    openloris.save_bag(path, s2)
    out = openloris.load_bag(path, camera_topic="/d400/color/image_raw")
    np.testing.assert_array_equal(out.cam_t_us, s2.cam_t_us)
    assert out.cam_images.shape == (4, 30, 40)
    np.testing.assert_allclose(out.cam_images, s2.cam_images, atol=1.0 / 255)
    # without camera_topic the camera stream is skipped
    out2 = openloris.load_bag(path)
    assert len(out2.cam_t_us) == 0


def test_convert_cli(tmp_path, sim_streams):
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bag = str(tmp_path / "seq.bag")
    openloris.save_bag(bag, sim_streams)
    out = str(tmp_path / "seq.npz")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "convert_openloris.py"), bag, out],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=repo,
    )
    assert r.returncode == 0, r.stderr
    z = openloris.load_npz(out)
    assert len(z.laser_t_us) == len(sim_streams.laser_t_us)
