"""RGB-D ICL-NUIM runner — parity with rgbd_icl_test
(Examples/RGB-D/rgbd_icl_test.cc): depth-driven metric tracking with either
offline plane txt or ONLINE plane segmentation (the PCL path,
Tracking.cc:2404-2513, here kernels/planes.py).

Usage:
  python -m tpuslam.apps.rgbd_icl <folder> [--planes {off,online,offline}]
      [--objects] [--settings ICL.yaml] [--max-frames N] [--out DIR]
"""

from __future__ import annotations

import os

import numpy as np

from ..core.camera import Camera
from ..core.config import FeatureFlags, SlamConfig
from ..io.datasets import IclDataset
from ..semantic.detect import detect_planes_online, read_offline_cuboids, read_offline_planes
from ..utils.profiler import Profiler
from . import common


def main(argv=None):
    ap = common.base_parser(__doc__)
    ap.add_argument("--planes", choices=["off", "online", "offline"], default="off")
    ap.add_argument("--objects", action="store_true")
    args = ap.parse_args(argv)
    args.settings = args.settings or "ICL.yaml"

    cam, vals = common.camera_from_args(args, Camera.make(481.2, -480.0, 319.5, 239.5, bf=40.0))
    flags = FeatureFlags(
        detect_plane=args.planes != "off",
        read_offline_planetxt=args.planes == "offline",
        detect_object=args.objects,
        read_offline_cuboidtxt=args.objects,
        optimize_with_plane_3d=args.planes != "off",
        optimize_with_cuboid_2d=args.objects,
    )
    cfg = SlamConfig().replace(sensor="rgbd", flags=flags)
    ds = IclDataset(args.folder, max_frames=args.max_frames)
    gt = ds.gt_poses() if os.path.exists(os.path.join(args.folder, ds.truth_file)) else None

    cfg = common.apply_features(cfg, args.features)
    tracker = common.make_tracker(args, cam, cfg, sample_grays=(it.gray for it in ds.frames()))
    prof = Profiler()
    # hoisted: np.asarray of a device-resident camera matrix inside the frame
    # loop costs a sync device fetch (~30 ms/frame on the tunnel)
    K_np = np.asarray(cam.K)

    def per_frame(item):
        pdet = cdet = None
        if args.planes == "online" and item.depth is not None:
            with prof.section("time plane estimation"):
                pdet = detect_planes_online(item.depth, cam, cfg.caps.max_planes_per_frame)
        elif args.planes == "offline":
            with prof.section("time plane estimation"):
                pdet = read_offline_planes(
                    os.path.join(args.folder, "plane_seg", f"{item.frame_id}_offline_plane_multiplane.txt"),
                    cfg.caps.max_planes_per_frame,
                )
        if args.objects and gt is not None:
            with prof.section("time object detection"):
                cdet = read_offline_cuboids(
                    os.path.join(args.folder, "pred_3d_obj_matched_txt", f"{item.frame_id:04d}_3d_cuboids.txt"),
                    np.linalg.inv(gt[item.frame_id]),
                    K_np,
                    cfg.caps.max_cuboids_per_frame,
                )
        return pdet, cdet

    ft = common.run_loop(tracker, ds.frames(with_depth=True), "rgbd", prof, per_frame, args=args)
    report = common.finish(tracker, args, ft, gt=gt, metric=True)
    prof.print_aggregated()
    return report


if __name__ == "__main__":
    main()
