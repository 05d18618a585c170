"""Per-frame extraction/matching overlays — real-sequence bring-up tool.

The reference debugs a failing sequence through its rviz match-line
markers and OpenCV overlays (trajectory.cpp:625-687); this renders the
same views to PNGs for N frames after initialization:

    python tools/debug_frames.py --synthetic smallloop --frames 10 --out /tmp/dbg
    python tools/debug_frames.py --sequence seq.bag --preset office ...

Per frame: raw scan points (grey), extracted lines (blue), corners
(yellow), active reference-submap lines (green), matched pairs connected
in red — all in the world frame at the current pose estimate.  With
--camera, also the tracked-feature overlay on the camera image.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="office")
    ap.add_argument("--synthetic", default=None)
    ap.add_argument("--sequence", default=None)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--out", default="/tmp/liwslam_debug")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    import liwslam  # noqa: F401
    from liwslam import config
    from liwslam.core import geometry as geo
    from liwslam.eval import debug_viz as dv
    from liwslam.frontend.driver import Frontend
    from liwslam.utils.asyncwriter import AsyncWriter

    prm = config.PRESETS[args.preset]()
    if args.synthetic:
        from liwslam.sim import world as sim

        streams = sim.simulate(
            sim.default_track(args.synthetic),
            sim.square_room(size=12.0, obstacles=True, rich=True),
            prm,
            laser_hz=10,
            n_beams=1080,
            noise=True,
            seed=1,
        )
    elif args.sequence:
        from liwslam.io import openloris

        if args.sequence.endswith(".bag"):
            streams = openloris.load_bag(args.sequence)
        else:
            streams = openloris.load_sequence(args.sequence)
    else:
        ap.error("need --synthetic or --sequence")

    os.makedirs(args.out, exist_ok=True)
    fe = Frontend(prm)
    frames, lt = fe.pack_frames(streams)
    track, k0, _, _, cam_state = fe.initialize(frames, lt)
    track = jax.tree_util.tree_map(jnp.asarray, track)
    step = fe._step_fn()
    extract = fe._extract_fn()
    match_fn = fe._match_fn()
    Til = np.asarray(prm.mat_T_imu_to_laser())
    writer = AsyncWriter()

    use_cam = prm.enable_camera
    for k in range(k0, min(k0 + args.frames, len(frames))):
        fk = frames[k]
        base = fk.base if use_cam else fk
        inp = jax.tree_util.tree_map(jnp.asarray, base)
        cur_p, cur_q = track.win.p[-1], track.win.q[-1]
        feats = extract(inp.points, inp.point_valid)
        match = match_fn(track.pair.ref, feats, cur_p, cur_q)

        T_wl = np.asarray(geo.make_tf(cur_p, cur_q)) @ Til
        T_ref = (
            np.asarray(geo.make_tf(track.pair.ref.pose_p, track.pair.ref.pose_q))
            @ Til
        )
        pts = np.asarray(inp.points)[np.asarray(inp.point_valid)]
        pts_w = (T_wl[:3, :3] @ pts.T).T[:, :2] + T_wl[:2, 3]
        lv = np.asarray(feats.line_valid)
        lp1, lp2 = dv.transform_lines(
            np.asarray(feats.p1)[lv], np.asarray(feats.p2)[lv], T_wl
        )
        cvld = np.asarray(feats.corner_valid)
        cw = dv.transform_lines(
            np.asarray(feats.corners)[cvld], np.asarray(feats.corners)[cvld], T_wl
        )[0]
        rv = np.asarray(track.pair.ref.valid)
        rp1, rp2 = dv.transform_lines(
            np.asarray(track.pair.ref.p1)[rv], np.asarray(track.pair.ref.p2)[rv], T_ref
        )
        mv = np.asarray(match.valid)
        mn1, mn2 = dv.transform_lines(
            np.asarray(match.new_p1)[mv], np.asarray(match.new_p2)[mv], T_wl
        )
        mr1, mr2 = dv.transform_lines(
            np.asarray(match.ref_p1)[mv], np.asarray(match.ref_p2)[mv], T_ref
        )
        writer.submit(
            dv.render_frame_matches,
            os.path.join(args.out, f"frame_{k:05d}.png"),
            pts_w, lp1, lp2, cw, rp1, rp2, mn1, mn2, mr1, mr2,
        )
        print(
            f"frame {k}: lines={int(lv.sum())} matches={int(mv.sum())}",
            file=sys.stderr,
        )
        track, out = step(track, inp)
    errs = writer.close()
    if errs:
        print("\n".join(errs), file=sys.stderr)
    print(f"wrote overlays for {args.frames} frames -> {args.out}")


if __name__ == "__main__":
    main()
