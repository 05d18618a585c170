"""Fetch OpenLORIS-Scene rosbags and run them through liwslam in one command.

The reference validates exclusively against OpenLORIS-Scene playback
(``/root/reference/readme.md:33-39``; per-sequence launch files
``launch/lvio_2d_{office,corridor,cafe,market}.launch``).  This tool is
the missing on-ramp: it downloads the per-sequence rosbag packages
(resumable, checksum-verified), unpacks them, and can hand each bag
straight to ``liwslam.run`` for an ATE-reported run — one command from
dataset to number.

DATA ACCESS.  OpenLORIS-Scene is distributed by its authors
(https://lifelong-robotic-vision.github.io/dataset/scene) via
registration-gated Google Drive / Baidu Pan shares — there is no stable
anonymous URL, so this tool cannot embed working download links.  Two
supported paths:

1. **Manifest mode** (recommended): after registering, put your links +
   md5s in a JSON manifest and run::

       python tools/fetch_openloris.py --manifest my_manifest.json \
           --dest /data/openloris --run office1-1

   Manifest schema (md5 optional but recommended — the dataset release
   publishes md5sums next to the archives)::

       {"office1-1.bag.tar": {"url": "https://...", "md5": "..."},
        "corridor1-1.bag.tar": {"url": "https://...", "md5": "..."}}

2. **Local-archive mode**: if you already downloaded the ``*.bag.tar``
   packages by hand, point ``--dest`` at the directory that contains
   them and skip ``--manifest``; the tool unpacks and runs.

Sequence naming follows the dataset: ``{scene}{recording}-{segment}``
(e.g. office1-1 .. office1-7, corridor1-1 .. corridor1-5, cafe1-1,
cafe1-2, market1-1 .. market1-3, home1-1 .. home1-5).  Each package
ships the rosbag plus per-sensor ground-truth TUM files; liwslam reads
the bag directly (pure-Python ``liwslam.io.rosbag`` — no ROS stack) and
associates the ``gt_*.txt`` / ``groundtruth.txt`` trajectory if present.

Resume: interrupted downloads continue from the received byte count via
HTTP Range requests; finished files that fail their md5 are re-fetched.
"""

import argparse
import hashlib
import json
import os
import sys
import tarfile
import urllib.error
import urllib.request

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# The dataset's published sequence inventory (scene -> segment counts),
# used to expand e.g. "office1" into its bag list.  Source: the
# OpenLORIS-Scene paper (ICRA 2020) + dataset page tables.
SEQUENCES = {
    "office1": 7,
    "corridor1": 5,
    "home1": 5,
    "cafe1": 2,
    "market1": 3,
}

PRESET_BY_SCENE = {
    "office": "office",
    "corridor": "corridor",
    "home": "office",  # no reference config for home; office is closest
    "cafe": "cafe",
    "market": "market",
}


def expand_targets(names):
    """['office1'] -> ['office1-1', ..., 'office1-7']; pass-through for
    explicit segment names."""
    out = []
    for n in names:
        if "-" in n:
            out.append(n)
        elif n in SEQUENCES:
            out += [f"{n}-{k}" for k in range(1, SEQUENCES[n] + 1)]
        else:
            raise SystemExit(
                f"unknown sequence {n!r}; known scenes: {sorted(SEQUENCES)}"
            )
    return out


def md5_of(path, chunk=1 << 20):
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def fetch(url, dest_path, md5=None, retries=3):
    """Resumable download with optional md5 verification."""
    part = dest_path + ".part"
    for attempt in range(retries):
        have = os.path.getsize(part) if os.path.exists(part) else 0
        req = urllib.request.Request(url)
        if have:
            req.add_header("Range", f"bytes={have}-")
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                mode = "ab" if have and r.status == 206 else "wb"
                total = r.headers.get("Content-Length")
                with open(part, mode) as f:
                    got = have if mode == "ab" else 0
                    while True:
                        b = r.read(1 << 20)
                        if not b:
                            break
                        f.write(b)
                        got += len(b)
                        print(
                            f"\r  {os.path.basename(dest_path)}: "
                            f"{got / 1e6:.1f} MB"
                            + (f" / {(have + int(total)) / 1e6:.1f}" if total else ""),
                            end="",
                            flush=True,
                        )
            print()
            break
        except (urllib.error.URLError, TimeoutError, ConnectionError) as e:
            print(f"\n  retry {attempt + 1}/{retries} after error: {e}")
    else:
        raise SystemExit(f"download failed: {url}")
    if md5:
        got = md5_of(part)
        if got != md5:
            os.remove(part)
            raise SystemExit(
                f"md5 mismatch for {dest_path}: got {got}, want {md5} "
                "(partial/corrupt download removed — re-run to retry)"
            )
    os.replace(part, dest_path)


def unpack(archive, dest):
    print(f"  unpacking {os.path.basename(archive)}")
    with tarfile.open(archive) as tf:
        tf.extractall(dest, filter="data")


def find_bag(dest, seq):
    """Locate the sequence's bag + ground truth after unpacking."""
    bag, gt = None, None
    for root, _dirs, files in os.walk(dest):
        for fn in files:
            p = os.path.join(root, fn)
            if fn in (f"{seq}.bag", f"{seq}_base.bag") or (
                fn.endswith(".bag") and seq in fn
            ):
                bag = bag or p
            if fn.endswith(".txt") and (
                "groundtruth" in fn or fn.startswith("gt_")
            ) and seq in p:
                gt = gt or p
    return bag, gt


def run_sequence(seq, bag, gt, out_dir, extra):
    scene = "".join(c for c in seq.split("-")[0] if not c.isdigit())
    preset = PRESET_BY_SCENE.get(scene, "office")
    cmd = [
        sys.executable, "-m", "liwslam.run",
        "--preset", preset,
        "--sequence", bag,
        "--out", os.path.join(out_dir, seq),
    ]
    if gt:
        cmd += ["--gt", gt]
    cmd += extra
    print("  running:", " ".join(cmd))
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.call(cmd, env=env)


def main():
    ap = argparse.ArgumentParser(
        description="Fetch + run OpenLORIS-Scene sequences through liwslam"
    )
    ap.add_argument(
        "sequences",
        nargs="*",
        default=["office1"],
        help="scene (office1) or segment (office1-1) names",
    )
    ap.add_argument("--manifest", default=None, help="JSON of file->{url,md5}")
    ap.add_argument("--dest", default="/tmp/openloris", help="download/unpack dir")
    ap.add_argument(
        "--run",
        action="store_true",
        help="run each fetched bag through liwslam.run (ATE printed when gt found)",
    )
    ap.add_argument("--out", default="/tmp/liwslam_openloris")
    ap.add_argument(
        "--extra", nargs=argparse.REMAINDER, default=[],
        help="extra args forwarded to liwslam.run",
    )
    args = ap.parse_args()

    targets = expand_targets(args.sequences or ["office1"])
    os.makedirs(args.dest, exist_ok=True)
    manifest = {}
    if args.manifest:
        with open(args.manifest) as f:
            manifest = json.load(f)

    failures = 0
    for seq in targets:
        print(f"[{seq}]")
        bag, gt = find_bag(args.dest, seq)
        if bag is None:
            # look for a local archive, else fetch from the manifest
            archive = None
            for cand in (f"{seq}.bag.tar", f"{seq}.tar", f"{seq}.bag.tar.gz"):
                p = os.path.join(args.dest, cand)
                if os.path.exists(p):
                    archive = p
                    break
                if cand in manifest:
                    entry = manifest[cand]
                    fetch(entry["url"], p, md5=entry.get("md5"))
                    archive = p
                    break
            if archive is None and f"{seq}.bag" in manifest:
                entry = manifest[f"{seq}.bag"]
                fetch(
                    entry["url"],
                    os.path.join(args.dest, f"{seq}.bag"),
                    md5=entry.get("md5"),
                )
            elif archive is not None:
                unpack(archive, args.dest)
            bag, gt = find_bag(args.dest, seq)
        if bag is None:
            print(
                f"  NOT FOUND: no {seq} bag under {args.dest} and no usable "
                "manifest entry (see module docstring for manifest schema)"
            )
            failures += 1
            continue
        print(f"  bag: {bag}" + (f"\n  gt:  {gt}" if gt else "  (no gt found)"))
        if args.run:
            rc = run_sequence(seq, bag, gt, args.out, args.extra)
            failures += rc != 0
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
