"""Minimal pure-Python ROS1 bag (v2.0) reader/writer — no ROS stack.

OpenLORIS-Scene distributes its sequences as ROS1 bags (reference
readme.md:33-39 plays them back through roslaunch); this module reads the
three topics the reference subscribes to (``lvio_2d_node.cpp:10-19``):
``sensor_msgs/LaserScan``, ``sensor_msgs/Imu``, ``nav_msgs/Odometry`` —
directly from the bag container, so converting real sequences needs no ROS
installation (the round-1 blocker).

Implements the documented bag v2.0 container: length-prefixed records with
``name=value`` headers; 0x03 bag header, 0x05 chunk (none/bz2
compression; lz4 gated on library availability), 0x07 connection, 0x02
message data.  Index records (0x04/0x06) are skipped on read and omitted
on write — players tolerate unindexed bags and our reader never needs the
index.  Message bodies are standard little-endian ROS serialization.

The writer exists to round-trip the reader in tests and to let the
simulator emit real .bag fixtures.
"""

from __future__ import annotations

import bz2
import struct
from dataclasses import dataclass, field

import numpy as np

MAGIC = b"#ROSBAG V2.0\n"

OP_MSG = 0x02
OP_BAG_HEADER = 0x03
OP_INDEX = 0x04
OP_CHUNK = 0x05
OP_CHUNK_INFO = 0x06
OP_CONNECTION = 0x07


# --------------------------------------------------------------------------
# record plumbing


def _pack_header(fields: dict) -> bytes:
    out = b""
    for k, v in fields.items():
        item = k.encode() + b"=" + v
        out += struct.pack("<I", len(item)) + item
    return out


def _parse_header(buf: bytes) -> dict:
    fields = {}
    off = 0
    while off < len(buf):
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        item = buf[off : off + n]
        off += n
        k, _, v = item.partition(b"=")
        fields[k.decode()] = v
    return fields


def _read_record(f):
    head = f.read(4)
    if len(head) < 4:
        return None, None
    (hlen,) = struct.unpack("<I", head)
    header = _parse_header(f.read(hlen))
    (dlen,) = struct.unpack("<I", f.read(4))
    data = f.read(dlen)
    return header, data


def _write_record(f, header: dict, data: bytes):
    h = _pack_header(header)
    f.write(struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data)


def _time(v: bytes) -> float:
    s, ns = struct.unpack("<II", v)
    return s + ns * 1e-9


def _time_bytes(t: float) -> bytes:
    s = int(t)
    return struct.pack("<II", s, int(round((t - s) * 1e9)))


# --------------------------------------------------------------------------
# message (de)serialization — only what the reference subscribes to


class _Reader:
    def __init__(self, buf):
        self.buf = buf
        self.off = 0

    def take(self, fmt):
        vals = struct.unpack_from("<" + fmt, self.buf, self.off)
        self.off += struct.calcsize("<" + fmt)
        return vals if len(vals) > 1 else vals[0]

    def string(self):
        n = self.take("I")
        s = self.buf[self.off : self.off + n].decode(errors="replace")
        self.off += n
        return s

    def f32_array(self):
        n = self.take("I")
        a = np.frombuffer(self.buf, "<f4", count=n, offset=self.off)
        self.off += 4 * n
        return a

    def header(self):
        self.take("I")  # seq
        t = self.take("II")
        frame = self.string()
        return t[0] + t[1] * 1e-9, frame


def parse_laser_scan(data: bytes):
    r = _Reader(data)
    stamp, _ = r.header()
    angle_min = r.take("f")
    r.take("f")  # angle_max
    angle_inc = r.take("f")
    time_inc = r.take("f")
    scan_time = r.take("f")
    range_min = r.take("f")
    range_max = r.take("f")
    ranges = r.f32_array()
    return dict(
        stamp=stamp,
        angle_min=float(angle_min),
        angle_increment=float(angle_inc),
        time_increment=float(time_inc),
        scan_time=float(scan_time),
        range_min=float(range_min),
        range_max=float(range_max),
        ranges=ranges,
    )


def parse_imu(data: bytes):
    r = _Reader(data)
    stamp, _ = r.header()
    r.take("4d")  # orientation
    r.take("9d")
    gyro = np.asarray(r.take("3d"))
    r.take("9d")
    acc = np.asarray(r.take("3d"))
    return dict(stamp=stamp, acc=acc, gyro=gyro)


def parse_odometry(data: bytes):
    r = _Reader(data)
    stamp, _ = r.header()
    r.string()  # child_frame_id
    px, py, pz = r.take("3d")
    qx, qy, qz, qw = r.take("4d")
    return dict(
        stamp=stamp,
        p=np.asarray([px, py, pz]),
        q_xyzw=np.asarray([qx, qy, qz, qw]),
    )


def _ser_header(stamp: float, frame: str) -> bytes:
    s = int(stamp)
    fb = frame.encode()
    return struct.pack("<III", 0, s, int(round((stamp - s) * 1e9))) + struct.pack(
        "<I", len(fb)
    ) + fb


def serialize_laser_scan(stamp, ranges, angle_min, angle_increment,
                         time_increment=0.0, frame="laser"):
    ranges = np.asarray(ranges, np.float32)
    n = len(ranges)
    return (
        _ser_header(stamp, frame)
        + struct.pack(
            "<7f",
            angle_min,
            angle_min + angle_increment * n,
            angle_increment,
            time_increment,
            time_increment * n,
            0.1,
            100.0,
        )
        + struct.pack("<I", n)
        + ranges.astype("<f4").tobytes()
        + struct.pack("<I", 0)  # intensities
    )


def serialize_imu(stamp, acc, gyro, frame="imu"):
    z9 = struct.pack("<9d", *([0.0] * 9))
    return (
        _ser_header(stamp, frame)
        + struct.pack("<4d", 0.0, 0.0, 0.0, 1.0)
        + z9
        + struct.pack("<3d", *np.asarray(gyro, np.float64))
        + z9
        + struct.pack("<3d", *np.asarray(acc, np.float64))
        + z9
    )


def serialize_odometry(stamp, p, q_xyzw, frame="odom", child="base_link"):
    cb = child.encode()
    z36 = struct.pack("<36d", *([0.0] * 36))
    return (
        _ser_header(stamp, frame)
        + struct.pack("<I", len(cb))
        + cb
        + struct.pack("<3d", *np.asarray(p, np.float64))
        + struct.pack("<4d", *np.asarray(q_xyzw, np.float64))
        + z36
        + struct.pack("<6d", *([0.0] * 6))
        + z36
    )


def parse_image(data: bytes):
    """sensor_msgs/Image -> grayscale f32 [0,1] (mono8/rgb8/bgr8; the
    reference converts to mono8 via cv_bridge, sensor.h:126-146)."""
    r = _Reader(data)
    stamp, _ = r.header()
    h = r.take("I")
    w = r.take("I")
    enc = r.string()
    r.take("B")  # is_bigendian
    step = r.take("I")
    n = r.take("I")
    raw = np.frombuffer(r.buf, np.uint8, count=n, offset=r.off)
    if enc in ("mono8", "8UC1"):
        img = raw.reshape(h, step)[:, :w].astype(np.float32) / 255.0
    elif enc in ("rgb8", "bgr8"):
        px = raw.reshape(h, step)[:, : 3 * w].reshape(h, w, 3).astype(np.float32)
        rgb = px[..., ::-1] if enc == "bgr8" else px
        img = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]) / 255.0
    else:
        raise ValueError(f"unsupported image encoding {enc!r}")
    return dict(stamp=stamp, image=img)


def serialize_image(stamp, img, frame="camera"):
    """Grayscale [0,1] f32 -> mono8 sensor_msgs/Image."""
    a = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
    h, w = a.shape
    enc = b"mono8"
    return (
        _ser_header(stamp, frame)
        + struct.pack("<II", h, w)
        + struct.pack("<I", len(enc))
        + enc
        + struct.pack("<BI", 0, w)
        + struct.pack("<I", h * w)
        + a.tobytes()
    )


MSG_TYPES = {
    "sensor_msgs/LaserScan": parse_laser_scan,
    "sensor_msgs/Imu": parse_imu,
    "nav_msgs/Odometry": parse_odometry,
    "sensor_msgs/Image": parse_image,
}


# --------------------------------------------------------------------------
# bag reading


def read_messages(path, topics=None):
    """Yield (topic, msg_type, parsed_dict) for supported message types.

    Handles none- and bz2-compressed chunks; lz4 if the lz4 package is
    importable (gated — not in this image).  Unknown types are skipped.
    """
    conns: dict = {}

    def handle_one(header, data):
        op = header.get("op", b"\x00")[0]
        if op == OP_CONNECTION:
            cid = struct.unpack("<I", header["conn"])[0]
            ch = _parse_header(data)
            conns[cid] = (
                header.get("topic", b"").decode(),
                ch.get("type", b"").decode(),
            )
        elif op == OP_MSG:
            cid = struct.unpack("<I", header["conn"])[0]
            topic, mtype = conns.get(cid, ("", ""))
            if topics is not None and topic not in topics:
                return None
            parser = MSG_TYPES.get(mtype)
            if parser is None:
                return None
            return topic, mtype, parser(data)
        return None

    def handle_records(buf):
        off = 0
        while off < len(buf):
            (hlen,) = struct.unpack_from("<I", buf, off)
            off += 4
            header = _parse_header(buf[off : off + hlen])
            off += hlen
            (dlen,) = struct.unpack_from("<I", buf, off)
            off += 4
            data = buf[off : off + dlen]
            off += dlen
            out = handle_one(header, data)
            if out is not None:
                yield out

    with open(path, "rb") as f:
        if f.read(len(MAGIC)) != MAGIC:
            raise ValueError(f"{path}: not a ROS1 v2.0 bag")
        while True:
            header, data = _read_record(f)
            if header is None:
                break
            op = header.get("op", b"\x00")[0]
            if op == OP_CHUNK:
                comp = header.get("compression", b"none").decode()
                if comp == "bz2":
                    data = bz2.decompress(data)
                elif comp == "lz4":
                    try:
                        import lz4.frame  # gated: not in this image
                    except ImportError as e:  # pragma: no cover
                        raise RuntimeError(
                            "bag uses lz4 chunks; re-record with bz2/none "
                            "or provide the lz4 package"
                        ) from e
                    data = lz4.frame.decompress(data)
                yield from handle_records(data)
            else:
                # unchunked bags: connection/message records at top level
                out = handle_one(header, data)
                if out is not None:
                    yield out


class BagWriter:
    """Writes an unindexed, uncompressed v2.0 bag (readable by rosbag and
    by :func:`read_messages`)."""

    def __init__(self, path):
        self.f = open(path, "wb")
        self.f.write(MAGIC)
        # minimal bag header record (padded to 4096 like rosbag does)
        h = _pack_header(
            {
                "op": bytes([OP_BAG_HEADER]),
                "index_pos": struct.pack("<Q", 0),
                "conn_count": struct.pack("<I", 0),
                "chunk_count": struct.pack("<I", 0),
            }
        )
        pad = 4096 - len(h) - 8
        self.f.write(struct.pack("<I", len(h)) + h)
        self.f.write(struct.pack("<I", pad) + b" " * pad)
        self._conns: dict = {}
        self._chunk = b""

    def _conn_id(self, topic, mtype):
        key = (topic, mtype)
        if key not in self._conns:
            cid = len(self._conns)
            self._conns[key] = cid
            ch = _pack_header(
                {
                    "topic": topic.encode(),
                    "type": mtype.encode(),
                    "md5sum": b"*",
                    "message_definition": b"",
                }
            )
            rec_h = _pack_header(
                {
                    "op": bytes([OP_CONNECTION]),
                    "conn": struct.pack("<I", cid),
                    "topic": topic.encode(),
                }
            )
            self._chunk += (
                struct.pack("<I", len(rec_h)) + rec_h + struct.pack("<I", len(ch)) + ch
            )
        return self._conns[key]

    def write(self, topic, mtype, stamp, data: bytes):
        cid = self._conn_id(topic, mtype)
        rec_h = _pack_header(
            {
                "op": bytes([OP_MSG]),
                "conn": struct.pack("<I", cid),
                "time": _time_bytes(stamp),
            }
        )
        self._chunk += (
            struct.pack("<I", len(rec_h))
            + rec_h
            + struct.pack("<I", len(data))
            + data
        )

    def close(self):
        ch_h = _pack_header(
            {
                "op": bytes([OP_CHUNK]),
                "compression": b"none",
                "size": struct.pack("<I", len(self._chunk)),
            }
        )
        _write_record_raw = self.f.write
        _write_record_raw(struct.pack("<I", len(ch_h)) + ch_h)
        _write_record_raw(struct.pack("<I", len(self._chunk)) + self._chunk)
        self.f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
