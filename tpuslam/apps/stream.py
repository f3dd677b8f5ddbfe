"""Online streaming front end — the transport-agnostic analogue of the
reference's ROS nodes (Examples/ROS/ORB_SLAM2/src/ros_mono.cc, ros_rgbd.cc,
ros_stereo.cc: an ImageGrabber callback feeding System::Track* and publishing
the pose).  ROS itself is out of the TPU deployment story; this node speaks a
line protocol any process can drive:

  stdin, one frame per line:
      <frame_id> <image_path>                      (mono)
      <frame_id> <image_path> <depth_path>         (rgbd)
      <frame_id> <left_path> <right_path>          (stereo)
  stdout, one line per processed frame:
      {"frame_id": ..., "state": "OK"|"LOST"|"INIT", "pose": [16 floats] | null,
       "n_inliers": ..., "n_kf": ..., "n_pt": ...}

A blank line or EOF ends the stream; the trajectory and map artifacts are
dumped like the dataset apps (System.cc:341-549 savers).

Usage:
  ls frames/*.png | awk '{print NR" "$0}' | python -m tpuslam.apps.stream --sensor mono
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from ..core.camera import Camera
from ..core.config import SlamConfig
from ..frontend.tracking import Tracker
from ..utils.profiler import Profiler
from .common import apply_features, finish

_STATE_NAME = {0: "INIT", 1: "OK", 2: "LOST"}


def _read_gray(path: str) -> np.ndarray:
    import cv2

    im = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if im is None:
        raise FileNotFoundError(path)
    return im.astype(np.float32)


def _read_depth(path: str, depth_factor: float) -> np.ndarray:
    import cv2

    d = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if d is None:
        raise FileNotFoundError(path)
    return d.astype(np.float32) / depth_factor


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sensor", choices=("mono", "rgbd", "stereo"), default="mono")
    ap.add_argument("--fx", type=float, default=500.0)
    ap.add_argument("--fy", type=float, default=500.0)
    ap.add_argument("--cx", type=float, default=320.0)
    ap.add_argument("--cy", type=float, default=240.0)
    ap.add_argument("--bf", type=float, default=40.0)
    ap.add_argument("--depth-factor", type=float, default=5000.0,
                    help="raw depth units per metre (TUM convention)")
    ap.add_argument("--features", type=int, default=0)
    ap.add_argument("--out", default=".")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--resume", default="")
    ap.add_argument("--localization-only", action="store_true",
                    help="freeze the map and only localize against it")
    ap.add_argument("--save-kitti", action="store_true")
    ap.add_argument("--vocab", default="",
                    help="ORBvoc .txt/.bin vocabulary path ('train' is not "
                    "available in streaming mode — frames arrive online)")
    args = ap.parse_args(argv)

    cam = Camera.make(args.fx, args.fy, args.cx, args.cy, bf=args.bf)
    cfg = apply_features(SlamConfig().replace(sensor=args.sensor), args.features or 1024)
    from .common import build_vocab

    vocab, cfg = build_vocab(args, cfg)
    if args.resume:
        from ..io.checkpoint import load_tracker

        tracker = load_tracker(args.resume, cam, cfg, vocab=vocab)
    else:
        tracker = Tracker(cam, cfg, vocab=vocab)
    if args.localization_only:
        tracker.set_localization_mode(True)

    prof = Profiler()
    frame_times = []
    import time

    n_fields = {"mono": 2, "rgbd": 3, "stereo": 3}[args.sensor]
    for line in sys.stdin:
        line = line.strip()
        if not line:
            break
        parts = line.split()
        if len(parts) != n_fields:
            print(
                json.dumps(
                    {
                        "error": f"{args.sensor} frames need {n_fields} fields "
                        f"(<frame_id> <path>{' <path2>' if n_fields == 3 else ''}), got {len(parts)}",
                        "line": line,
                    }
                ),
                flush=True,
            )
            continue
        try:
            fid = int(parts[0])
        except ValueError:
            print(
                json.dumps({"error": f"frame id must be an integer, got {parts[0]!r}", "line": line}),
                flush=True,
            )
            continue
        t0 = time.perf_counter()
        with prof.section("time single frame"):
            if args.sensor == "stereo":
                tracker.process_stereo_pair(_read_gray(parts[1]), _read_gray(parts[2]), fid)
            elif args.sensor == "rgbd":
                tracker.process_image(
                    _read_gray(parts[1]), fid, depth=_read_depth(parts[2], args.depth_factor)
                )
            else:
                tracker.process_image(_read_gray(parts[1]), fid)
        frame_times.append(time.perf_counter() - t0)
        pose = (
            np.asarray(tracker.T_cur).reshape(-1).tolist()
            if tracker.state == Tracker.OK
            else None
        )
        print(
            json.dumps(
                {
                    "frame_id": fid,
                    "state": _STATE_NAME[tracker.state],
                    "pose": pose,
                    "n_inliers": int(tracker.n_inliers),
                    "n_kf": tracker.n_kf,
                    "n_pt": tracker.n_pt,
                }
            ),
            flush=True,
        )

    finish(tracker, args, frame_times, metric=args.sensor != "mono")
    # stdout carries the machine-readable per-frame JSON; human-readable
    # profiler output goes to stderr
    prof.print_aggregated(file=sys.stderr)


if __name__ == "__main__":
    main()
