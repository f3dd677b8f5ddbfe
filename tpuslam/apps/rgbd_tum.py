"""TUM RGB-D runner — parity with Examples/RGB-D/rgbd_tum.cc: association
file driven RGB-D tracking, optional online plane segmentation.

Usage:
  python -m tpuslam.apps.rgbd_tum <folder> [--associations associations.txt]
      [--planes] [--settings TUM1.yaml] [--max-frames N] [--out DIR]
"""

from __future__ import annotations

import os

from ..core.camera import Camera
from ..core.config import FeatureFlags, SlamConfig
from ..io.datasets import IclDataset, TumRgbdDataset
from ..semantic.detect import detect_planes_online
from ..utils.profiler import Profiler
from . import common


def main(argv=None):
    ap = common.base_parser(__doc__)
    ap.add_argument("--associations", default="associations.txt")
    ap.add_argument("--planes", action="store_true", help="online plane segmentation")
    args = ap.parse_args(argv)

    # TUM fr1 defaults (the reference ships TUM1/2/3.yaml)
    cam, vals = common.camera_from_args(
        args, Camera.make(517.3, 516.5, 318.6, 255.3, bf=40.0)
    )
    flags = FeatureFlags(detect_plane=args.planes, optimize_with_plane_3d=args.planes)
    cfg = SlamConfig().replace(sensor="rgbd", flags=flags)
    ds = TumRgbdDataset(args.folder, associations=args.associations, max_frames=args.max_frames)
    gt_file = os.path.join(args.folder, "groundtruth.txt")
    gt = None
    if os.path.exists(gt_file):
        # TUM groundtruth.txt rows are not frame-aligned; use only if an
        # aligned odom.txt has been prepared (same convention as ICL)
        odf = os.path.join(args.folder, "odom.txt")
        if os.path.exists(odf):
            gt = IclDataset(args.folder).gt_poses()

    cfg = common.apply_features(cfg, args.features)
    tracker = common.make_tracker(args, cam, cfg, sample_grays=(it.gray for it in ds.frames()))
    prof = Profiler()

    def per_frame(item):
        pdet = None
        if args.planes and item.depth is not None:
            with prof.section("time plane estimation"):
                pdet = detect_planes_online(item.depth, cam, cfg.caps.max_planes_per_frame)
        return pdet, None

    ft = common.run_loop(tracker, ds.frames(with_depth=True), "rgbd", prof, per_frame, args=args)
    report = common.finish(tracker, args, ft, gt=gt, metric=True)
    prof.print_aggregated()
    return report


if __name__ == "__main__":
    main()
