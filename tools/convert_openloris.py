"""Convert an OpenLORIS-Scene ROS1 bag to liwslam's loader layouts.

Usage:
    python tools/convert_openloris.py seq.bag out_dir          # text layout
    python tools/convert_openloris.py seq.bag out.npz          # npz
    python tools/convert_openloris.py seq.bag out --gt gt.txt  # attach TUM gt
    ... [--laser-topic /scan --odom-topic /odom --imu-topic /d400/imu0]

Pure Python — no ROS stack needed (liwslam.io.rosbag parses the bag
container directly; bz2 chunks supported, lz4 gated).
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bag")
    ap.add_argument("out")
    ap.add_argument("--gt", default=None)
    ap.add_argument("--laser-topic", default="/scan")
    ap.add_argument("--odom-topic", default="/odom")
    ap.add_argument("--imu-topic", default="/d400/imu0")
    ap.add_argument("--preset", default="office")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from liwslam import config
    from liwslam.io import openloris

    prm = config.PRESETS[args.preset]()
    streams = openloris.load_bag(
        args.bag,
        laser_topic=args.laser_topic,
        wheel_odom_topic=args.odom_topic,
        imu_topic=args.imu_topic,
        T_imu_to_wheel=prm.mat_T_imu_to_wheel(),
        gt_path=args.gt,
    )
    if args.out.endswith(".npz"):
        openloris.save_npz(args.out, streams)
    else:
        openloris.save_text_sequence(args.out, streams)
    print(
        f"converted: {len(streams.laser_t_us)} scans, "
        f"{len(streams.imu_t_us)} imu, {len(streams.wheel_t_us)} odom, "
        f"{len(streams.gt_t_us)} gt poses -> {args.out}"
    )


if __name__ == "__main__":
    main()
