"""Deterministic sensor-stream dispatcher (native C++ with numpy fallback).

The compute path never sees raw message streams — this layer reproduces
the reference dispatch_queue semantics (``dispatch.h:59-258``: per-sensor
monotonicity filtering, watermark gating, strict global time order) and
hands the front end a merged schedule.  The hot implementation is C++
(``liwslam/native/dispatch.cpp``) compiled on first use and bound with
ctypes; ``merge_numpy`` is the semantically identical reference
implementation used as fallback and test oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libdispatch.so")
_lib = None


def _build_native():
    src = os.path.join(_NATIVE_DIR, "dispatch.cpp")
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", src, "-o", _SO_PATH],
        check=True,
        capture_output=True,
    )


def native_lib():
    """Load (building if needed) the native dispatcher; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(
            os.path.join(_NATIVE_DIR, "dispatch.cpp")
        ):
            _build_native()
        lib = ctypes.CDLL(_SO_PATH)
        lib.dispatch_merge.restype = ctypes.c_long
        lib.dispatch_merge.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    except Exception:
        _lib = False
    return _lib or None


def merge(sensor_times, enabled=None, watermark=40, drain=True, force_numpy=False):
    """Merge per-sensor timestamp arrays into a dispatch order.

    sensor_times: list of float64 arrays (seconds), one per sensor, in
    arrival order.  Returns (sensor_ids (N,), indices (N,))."""
    n = len(sensor_times)
    if enabled is None:
        enabled = [True] * n
    lib = None if force_numpy else native_lib()
    if lib is None:
        return merge_numpy(sensor_times, enabled, watermark, drain)
    arrs = [np.ascontiguousarray(np.asarray(t, np.float64)) for t in sensor_times]
    ptrs = (ctypes.POINTER(ctypes.c_double) * n)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) for a in arrs]
    )
    counts = (ctypes.c_long * n)(*[len(a) for a in arrs])
    en = (ctypes.c_uint8 * n)(*[1 if e else 0 for e in enabled])
    total = sum(len(a) for a in arrs)
    out_s = np.zeros(total, np.int32)
    out_i = np.zeros(total, np.int64)
    n_out = lib.dispatch_merge(
        ptrs,
        counts,
        n,
        en,
        watermark,
        1 if drain else 0,
        out_s.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out_s[:n_out], out_i[:n_out]


def merge_numpy(sensor_times, enabled, watermark=40, drain=True):
    """Pure-python oracle with identical semantics."""
    from collections import deque

    n = len(sensor_times)
    bufs = [deque() for _ in range(n)]
    last_acc = [-np.inf] * n
    nxt = [0] * n
    last_dispatch = -np.inf
    out_s, out_i = [], []

    def feed_one():
        best, best_t = -1, np.inf
        for s in range(n):
            if nxt[s] < len(sensor_times[s]) and sensor_times[s][nxt[s]] < best_t:
                best_t = sensor_times[s][nxt[s]]
                best = s
        if best < 0:
            return False
        t = sensor_times[best][nxt[best]]
        nxt[best] += 1
        if t <= last_dispatch:
            return True
        if bufs[best] and bufs[best][-1][0] >= t:
            return True
        if t <= last_acc[best]:
            return True
        last_acc[best] = t
        bufs[best].append((t, nxt[best] - 1))
        return True

    def watermark_ok():
        return all(
            not enabled[s] or len(bufs[s]) >= watermark for s in range(n)
        )

    feeding = True
    while True:
        while not watermark_ok() and feeding:
            feeding = feed_one()
        if not watermark_ok() and not drain:
            break
        oldest, oldest_t = -1, np.inf
        empty_enabled = False
        for s in range(n):
            if not enabled[s]:
                continue
            if not bufs[s]:
                empty_enabled = True
                continue
            if bufs[s][0][0] < oldest_t:
                oldest_t = bufs[s][0][0]
                oldest = s
        if empty_enabled and feeding:
            feeding = feed_one()
            if feeding:
                continue
        if oldest < 0:
            # everything enabled is empty: drain disabled-sensor leftovers
            for s in range(n):
                if bufs[s] and bufs[s][0][0] < oldest_t:
                    oldest_t = bufs[s][0][0]
                    oldest = s
            if oldest < 0 or not drain:
                break
        t, idx = bufs[oldest].popleft()
        if t <= last_dispatch:
            continue
        last_dispatch = t
        out_s.append(oldest)
        out_i.append(idx)
    return np.asarray(out_s, np.int32), np.asarray(out_i, np.int64)
