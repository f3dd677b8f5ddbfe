"""Monocular ICL-NUIM runner — CLI parity with mono_icl_test
(Examples/Monocular/mono_icl_test.cc): dataset loop, settings YAML, offline
semantic detections (planes + cuboids), trajectory / cuboid / plane dumps,
timing report.

Usage:
  python -m tpuslam.apps.mono_icl <dataset_folder> [--settings ICL.yaml]
      [--max-frames N] [--objects] [--planes] [--out OUTDIR]
      [--features N] [--viz-every N] [--checkpoint F] [--resume F]
"""

from __future__ import annotations

import os

import numpy as np

from ..core.camera import Camera
from ..core.config import FeatureFlags, SlamConfig
from ..io.datasets import IclDataset
from ..semantic.detect import read_offline_cuboids, read_offline_planes
from ..utils.profiler import Profiler
from . import common


def main(argv=None):
    ap = common.base_parser(__doc__)
    ap.add_argument("--objects", action="store_true")
    ap.add_argument("--planes", action="store_true")
    args = ap.parse_args(argv)
    args.settings = args.settings or "ICL.yaml"

    cam, vals = common.camera_from_args(args, Camera.make(481.2, -480.0, 319.5, 239.5))
    flags = FeatureFlags(
        detect_object=args.objects,
        read_offline_cuboidtxt=args.objects,
        detect_plane=args.planes,
        read_offline_planetxt=args.planes,
        associate_cuboid_with_classname=bool(vals.get("associate_cuboid_with_classname", 1)),
        optimize_with_plane_3d=args.planes,
        optimize_with_cuboid_2d=args.objects,
        optimize_with_cuboid_3d=bool(vals.get("optimize_with_cuboid_3d", 0)),
        optimize_with_corners_2d=bool(vals.get("optimize_with_corners_2d", 0)),
        optimize_with_pt_obj_3d=bool(vals.get("optimize_with_pt_obj_3d", 0)),
        optimize_with_cuboid_plane=bool(vals.get("optimize_with_cuboid_plane", 0)),
        # metric plane measurements only cohere with a mono map after a metric
        # scale anchor (reference: enable_ground_height_scale + Camera.height,
        # Tracking.cc:271-281; here the anchor is estimated from the plane
        # detections themselves, frontend/tracking._update_metric_scale).
        # TPUSLAM_NO_RESCALE=1 disables it for A/B diagnosis.
        enable_ground_height_scale=args.planes
        and not os.environ.get("TPUSLAM_NO_RESCALE"),
    )
    cfg = SlamConfig().replace(sensor="mono", flags=flags)
    cfg = common.apply_features(cfg, args.features)
    ds = IclDataset(args.folder, max_frames=args.max_frames)
    gt = ds.gt_poses() if os.path.exists(os.path.join(args.folder, ds.truth_file)) else None

    tracker = common.make_tracker(args, cam, cfg, sample_grays=(it.gray for it in ds.frames()))
    prof = Profiler()
    # hoisted: np.asarray of a device-resident camera matrix inside the frame
    # loop costs a sync device fetch (~30 ms/frame on the tunnel)
    K_np = np.asarray(cam.K)

    def per_frame(item):
        pdet = cdet = None
        if args.planes:
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

    ft = common.run_loop(tracker, ds.frames(), "mono", prof, per_frame, args=args)
    report = common.finish(tracker, args, ft, gt=gt, metric=False)
    prof.print_aggregated()
    return report


if __name__ == "__main__":
    main()
