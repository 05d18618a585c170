"""Online front-end/back-end coupling: concurrent mapping + live re-basing.

Reference counterpart: the keyframe manager runs on its OWN thread
(``src/trajectory/keyframe_manager.cpp:859-881``), consuming keyframes from
a mutex'd mailbox while the front end keeps tracking; after each pose-graph
solve it publishes ``modify_delta_tf`` which re-bases the live front-end
output (``keyframe_manager.cpp:407-417, 468-473``).

liwslam's equivalent maps the thread boundary onto the chunked device
pipeline: the front end drains one ``lax.scan`` chunk at a time
(liwslam.frontend.driver.Frontend.run), and at every chunk boundary the
new keyframes are handed to a backend worker thread.  Loop detection, ICP
and the pose-graph device solve run there WHILE the next frontend chunk
computes; whatever ``modify_delta_tf`` correction has landed by the time a
chunk drains is applied to that chunk's live poses — exactly the
freshness semantics of the reference's asynchronous design (a correction
computed from keyframe k re-bases frames published after it).

``overlap=False`` processes keyframes inline at each chunk boundary
instead — fully deterministic (the test mode), same data path.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field

import numpy as np

from liwslam.backend.manager import KeyframeManager
from liwslam.frontend.driver import Frontend, FrontendResult


def _render_live_map(path, snap, resolution, Til):
    """Occupancy snapshot from (p, q, scan_lines) keyframe tuples — runs
    on the async writer thread (visualization.cpp:50-75 equivalent)."""
    from liwslam.backend.loop import densify_lines
    from liwslam.core import geometry as geo
    from liwslam.eval import occupancy

    scans_xy, origins = [], []
    for p, q, (l1, l2) in snap:
        T_wl = geo.make_tf_np(p.astype(np.float64), q.astype(np.float64)) @ Til
        pts = densify_lines(l1, l2, resolution)
        w = (T_wl[:3, :3] @ pts.T).T + T_wl[:3, 3]
        scans_xy.append(w[:, :2])
        origins.append(T_wl[:2, 3])
    if not scans_xy:
        return
    grid, _origin = occupancy.build_occupancy(
        scans_xy, np.asarray(origins), resolution=resolution
    )
    occupancy.write_pgm(path, grid)


@dataclass
class OnlineResult:
    frontend: FrontendResult
    live_T: np.ndarray  # (F,4,4) re-based live poses (IMU frame)
    live_delta_norm: np.ndarray  # (F,) |log p| of the delta applied per frame
    manager: KeyframeManager
    wall_s: float
    frontend_busy_s: float
    backend_busy_s: float
    drain_wait_s: float  # main-thread wait for the worker after the frontend

    @property
    def overlap_s(self) -> float:
        """Backend seconds that ran concurrently with frontend compute:
        worker busy time minus the post-frontend drain wait."""
        return max(0.0, self.backend_busy_s - self.drain_wait_s)


class OnlineRunner:
    """Drives Frontend and KeyframeManager concurrently."""

    def __init__(self, params, overlap=True, live_dir=None, live_every=4):
        """``live_dir``: emit DURING-RUN artifacts there at chunk
        boundaries (reference visualization-thread parity: rviz streams
        markers/occupancy while running, visualization.cpp:557-691; here
        the artifacts are files refreshed as the run progresses):
        ``live_trajectory.txt`` (TUM, re-based live poses, every chunk)
        and ``live_map.pgm`` (occupancy from loop-corrected keyframes,
        every ``live_every`` chunks).  Writes happen on the async writer
        thread — the frontend never blocks on IO."""
        self.params = params
        self.overlap = overlap
        self.fe = Frontend(params)
        self.mgr = KeyframeManager(params)
        self.live_dir = live_dir
        self.live_every = max(1, int(live_every))
        self._writer = None
        self._chunk_no = 0
        self.live_emits = 0  # trajectory refreshes submitted during the run
        if live_dir is not None:
            import os

            from liwslam.utils.asyncwriter import AsyncWriter

            os.makedirs(live_dir, exist_ok=True)
            self._writer = AsyncWriter()
        # BOUNDED mailbox (cf. utils/asyncwriter.py): a backend that falls
        # behind blocks the frontend at a chunk boundary (backpressure)
        # instead of accumulating keyframe payloads without limit — a
        # deliberate improvement over the reference's unbounded deque
        # (keyframe_manager.cpp:399-406)
        self._q: queue.Queue = queue.Queue(maxsize=256)
        self._be_busy = 0.0
        self._fe_busy = 0.0
        self._worker = None
        self._worker_exc = None  # first exception raised in the worker
        self.q_depth_max = 0  # high-water mark of the keyframe mailbox

    # -- backend worker ------------------------------------------------------

    def _process_one(self, kf):
        t0 = time.perf_counter()
        self.mgr.add_keyframe(
            t_us=kf["t_us"],
            p=kf["p"],
            q=kf["q"],
            corners=kf["corners"],
            scan_lines=kf["scan_lines"],
        )
        self._be_busy += time.perf_counter() - t0

    def _worker_loop(self):
        # keep draining on error: a backend crash must not wedge the
        # frontend against the bounded mailbox (maxsize above) — record the
        # first exception and re-raise it on the main thread at drain time
        while True:
            kf = self._q.get()
            if kf is None:
                return
            if self._worker_exc is not None:
                continue
            try:
                self._process_one(kf)
            except BaseException as e:  # noqa: BLE001
                self._worker_exc = e

    # -- main ---------------------------------------------------------------

    def run(self, streams, chunk_size=32) -> OnlineResult:
        import jax.numpy as jnp

        from liwslam.core import geometry as geo

        if self.overlap:
            self._worker = threading.Thread(target=self._worker_loop, daemon=True)
            self._worker.start()

        live_T = []
        live_dn = []
        live_ts = []

        def emit_live(info):
            import os

            from liwslam.io import tum

            self._chunk_no += 1
            self.live_emits += 1
            out = self.live_dir
            Tiw = self.params.mat_T_imu_to_wheel()
            # live trajectory: the re-based poses published so far
            self._writer.submit(
                tum.write_tum,
                os.path.join(out, "live_trajectory.txt"),
                np.asarray(live_ts),
                np.stack(live_T) @ Tiw,
            )
            if self._chunk_no % self.live_every == 0:
                # occupancy snapshot from the loop-corrected keyframes;
                # per-kf pose arrays are snapshotted here (the backend
                # worker swaps them atomically after solves)
                n = len(self.mgr.keyframes)
                snap = []
                for kf in self.mgr.keyframes[:n]:
                    if kf.scan_lines is None or len(kf.scan_lines[0]) == 0:
                        continue
                    snap.append((kf.p.copy(), kf.q.copy(), kf.scan_lines))
                self._writer.submit(
                    _render_live_map,
                    os.path.join(out, "live_map.pgm"),
                    snap,
                    2.0 * self.params.laser_resolution,
                    self.params.mat_T_imu_to_laser(),
                )

        def on_chunk(info):
            # hand this chunk's keyframes to the back end (mailbox push,
            # keyframe_manager.cpp:399-406) ...
            for kf in info["keyframes"]:
                if self.overlap:
                    self._q.put(kf)
                    self.q_depth_max = max(self.q_depth_max, self._q.qsize())
                else:
                    self._process_one(kf)
            # ... and re-base this chunk's live output with whatever
            # correction has landed (update_other_frame semantics)
            delta = self.mgr.modify_delta_tf()
            dp = np.linalg.norm(delta[:3, 3])
            for p, q in zip(info["p"], info["q"]):
                T = np.asarray(
                    geo.make_tf(jnp.asarray(p), jnp.asarray(q)), np.float64
                )
                live_T.append(delta @ T)
                live_dn.append(dp)
            live_ts.extend(info["t_us"])
            if self._writer is not None and live_T:
                emit_live(info)

        t_start = time.perf_counter()
        fe_t0 = time.perf_counter()
        res = self.fe.run(streams, chunk_size=chunk_size, chunk_callback=on_chunk)
        self._fe_busy = time.perf_counter() - fe_t0

        drain_wait = 0.0
        if self.overlap:
            t_d = time.perf_counter()
            self._q.put(None)
            self._worker.join()
            drain_wait = time.perf_counter() - t_d
            if self._worker_exc is not None:
                raise self._worker_exc
        if self._writer is not None:
            errs = self._writer.close()
            if errs:
                raise RuntimeError("live artifact writer failed: " + "; ".join(errs))
        wall = time.perf_counter() - t_start

        # init-window frames precede the first chunk: identity correction
        n_init = len(res.p) - len(live_T)
        init_T = res.T_w_imu()[:n_init]
        live = np.concatenate([init_T, np.stack(live_T)]) if live_T else init_T
        dn = np.concatenate([np.zeros(n_init), np.asarray(live_dn)])
        return OnlineResult(
            frontend=res,
            live_T=live,
            live_delta_norm=dn,
            manager=self.mgr,
            wall_s=wall,
            frontend_busy_s=self._fe_busy,
            backend_busy_s=self._be_busy,
            drain_wait_s=drain_wait,
        )
