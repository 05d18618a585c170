"""Reader hardening against rosbag-C++ byte features (VERDICT r2 #5):
indexed bags (0x04/0x06 records), bz2 AND lz4 chunks, multiple
connections per topic, latched connection headers, out-of-stamp-order
chunks.  The round-2 reader had only ever parsed its own writer's
single-chunk unindexed output."""

import numpy as np
import pytest

from liwslam.io import openloris, rosbag


def _mk_msgs(n=40, t0=100.0):
    """Interleaved imu/odom/laser messages with stamps."""
    msgs = []
    for k in range(n):
        t = t0 + 0.01 * k
        msgs.append(("/d400/imu0", "sensor_msgs/Imu", t,
                     rosbag.serialize_imu(t, [0, 0, 9.81], [0, 0, 0.1 * k])))
        if k % 2 == 0:
            msgs.append(("/odom", "nav_msgs/Odometry", t + 0.001,
                         rosbag.serialize_odometry(t + 0.001, [0.1 * k, 0, 0],
                                                   [0, 0, 0, 1])))
        if k % 4 == 0:
            r = np.full(90, 3.0, np.float32)
            msgs.append(("/scan", "sensor_msgs/LaserScan", t + 0.002,
                         rosbag.serialize_laser_scan(t + 0.002, r, -np.pi,
                                                     2 * np.pi / 90)))
    return msgs


@pytest.mark.parametrize("compression", ["none", "bz2", "lz4"])
def test_indexed_compressed_multichunk(tmp_path, compression):
    msgs = _mk_msgs()
    path = str(tmp_path / f"real_{compression}.bag")
    with rosbag.BagWriter(path, compression=compression, indexed=True,
                          chunk_threshold=2048) as w:
        # two connections on the laser topic, one latched (real bags
        # carry one connection per publisher)
        w.new_connection("/scan", "sensor_msgs/LaserScan", key="scan_a",
                         callerid=b"/driver_a")
        w.new_connection("/scan", "sensor_msgs/LaserScan", key="scan_b",
                         latching=b"1", callerid=b"/driver_b")
        for i, (topic, mtype, t, data) in enumerate(msgs):
            if topic == "/scan":
                w.write(topic, mtype, t, data,
                        conn_key="scan_a" if i % 2 else "scan_b")
            else:
                w.write(topic, mtype, t, data)
    # byte features really present: several chunks, index + chunk-info ops
    raw = open(path, "rb").read()
    assert raw[: len(rosbag.MAGIC)] == rosbag.MAGIC
    ops = _collect_ops(path)
    assert ops[rosbag.OP_CHUNK] >= 2, "fixture must be multi-chunk"
    assert ops[rosbag.OP_INDEX] >= 2
    assert ops[rosbag.OP_CHUNK_INFO] == ops[rosbag.OP_CHUNK]

    out = list(rosbag.read_messages(path))
    assert len(out) == len(msgs)
    by_type = {}
    for topic, mtype, m in out:
        by_type.setdefault(mtype, []).append(m)
    assert len(by_type["sensor_msgs/LaserScan"]) == 10
    assert len(by_type["sensor_msgs/Imu"]) == 40
    # payloads survive compression bit-exactly
    gz = np.asarray([m["gyro"][2] for m in by_type["sensor_msgs/Imu"]])
    np.testing.assert_allclose(gz, 0.1 * np.arange(40), atol=1e-12)


def _collect_ops(path):
    import struct
    counts = {}
    with open(path, "rb") as f:
        f.read(len(rosbag.MAGIC))
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            (hlen,) = struct.unpack("<I", head)
            header = rosbag._parse_header(f.read(hlen))
            (dlen,) = struct.unpack("<I", f.read(4))
            f.seek(dlen, 1)
            op = header.get("op", b"\x00")[0]
            counts[op] = counts.get(op, 0) + 1
    return counts


def test_out_of_order_chunks_sorted_by_load_bag(tmp_path):
    """Messages written out of stamp order across chunks (as real bags
    can be) must come out of load_bag time-sorted."""
    path = str(tmp_path / "ooo.bag")
    with rosbag.BagWriter(path, indexed=True, chunk_threshold=1) as w:
        # chunk_threshold=1 -> one chunk per message; write the second
        # half of the timeline FIRST
        msgs = _mk_msgs(n=24)
        for topic, mtype, t, data in msgs[12:] + msgs[:12]:
            w.write(topic, mtype, t, data)
    streams = openloris.load_bag(path)
    assert np.all(np.diff(streams.imu_t_us) > 0)
    assert np.all(np.diff(streams.wheel_t_us) > 0)
    assert np.all(np.diff(streams.laser_t_us) > 0)


def test_lz4_frame_roundtrip_and_xxh32():
    rng = np.random.default_rng(0)
    for n in (0, 1, 13, 1000, 70000):
        blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert rosbag.lz4_frame_decompress(
            rosbag.lz4_frame_compress(blob)
        ) == blob
    # xxh32 reference vectors (seed 0)
    assert rosbag._xxh32(b"") == 0x02CC5D05
    assert rosbag._xxh32(b"Hello World") == 0xB1FD16EE


def test_lz4_block_with_matches_decodes():
    """Hand-built compressed block with overlapping matches (the form a
    real lz4 compressor emits) — the pure-Python block decoder must
    handle matches, not just literal blocks."""
    import struct as st

    # token: literal len 4 ("abcd"), match offset 4, match len 8+4=12 —
    # an overlapping match that tiles the literal 3 more times
    block = bytes([0x48]) + b"abcd" + st.pack("<H", 4)
    out = bytearray()
    rosbag._lz4_block_decompress(block, out)
    assert bytes(out) == b"abcd" * 4


def test_e2e_run_on_indexed_lz4_bag(tmp_path):
    """Full pipeline on a rosbag-C++-shaped bag: simulate -> write an
    INDEXED lz4 multi-chunk bag (+ camera topic) -> run.py --sequence ->
    ATE gate.  Exercises reader, stream sorting, and camera ingestion on
    a realistic container in one pass."""
    import liwslam.run as run_mod
    from liwslam import config
    from liwslam.io import tum
    from liwslam.sim import world as sim

    prm = config.office().replace(
        max_points=768, max_lines=48, max_corners=16, ref_capacity=384,
        max_imu_per_frame=32, max_wheel_per_frame=8,
        solver_max_iterations=5, init_solver_max_iterations=20,
    )
    streams = sim.simulate(
        sim.default_track("L"),
        sim.square_room(size=12.0, obstacles=True, rich=True),
        prm,
        imu_hz=100, wheel_hz=20, laser_hz=4, n_beams=720,
        camera_hz=4.0, camera_wh=(80, 60), noise=True, seed=5,
    )
    bag = str(tmp_path / "seq.bag")
    openloris.save_bag(
        bag, streams, compression="lz4", indexed=True, chunk_threshold=65536
    )
    ops = _collect_ops(bag)
    assert ops[rosbag.OP_CHUNK] >= 2 and rosbag.OP_INDEX in ops
    gt = str(tmp_path / "gt.txt")
    tum.write_tum(gt, streams.gt_t_us + int(1560000000.0 * 1e6),
                  streams.gt_T_w_wheel)
    # camera frames ingest from the same bag (indexed lz4 container)
    streams2 = openloris.load_bag(bag, camera_topic="/d400/color/image_raw")
    assert len(streams2.cam_t_us) == len(streams.cam_t_us) > 0
    assert streams2.cam_images.shape[1:] == (60, 80)
    report = run_mod.main([
        "--preset", "office", "--sequence", bag, "--gt", gt,
        "--camera-topic", "/d400/color/image_raw",
        "--out", str(tmp_path / "out"), "--no-backend", "--chunk", "16",
        "--param", "max_points=768", "--param", "max_lines=48",
        "--param", "max_corners=16", "--param", "ref_capacity=384",
        "--param", "max_imu_per_frame=32", "--param", "max_wheel_per_frame=8",
        "--param", "solver_max_iterations=5",
        "--param", "init_solver_max_iterations=20",
    ])
    assert report["frames"] > 20
    assert report["ate_frontend_m"] < 0.1, report
