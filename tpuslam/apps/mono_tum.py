"""Monocular TUM runner — parity with Examples/Monocular/mono_tum.cc.

Usage:
  python -m tpuslam.apps.mono_tum <folder> [--settings TUM1.yaml]
      [--max-frames N] [--out DIR]
"""

from __future__ import annotations

import os

from ..core.camera import Camera
from ..core.config import SlamConfig
from ..io.datasets import IclDataset
from ..utils.profiler import Profiler
from . import common


def main(argv=None):
    ap = common.base_parser(__doc__)
    args = ap.parse_args(argv)
    cam, _ = common.camera_from_args(args, Camera.make(517.3, 516.5, 318.6, 255.3))
    cfg = SlamConfig().replace(sensor="mono")
    ds = IclDataset(args.folder, max_frames=args.max_frames)  # rgb.txt-driven
    gt = ds.gt_poses() if os.path.exists(os.path.join(args.folder, ds.truth_file)) else None
    cfg = common.apply_features(cfg, args.features)
    tracker = common.make_tracker(args, cam, cfg, sample_grays=(it.gray for it in ds.frames()))
    prof = Profiler()
    ft = common.run_loop(tracker, ds.frames(), "mono", prof, args=args)
    report = common.finish(tracker, args, ft, gt=gt, metric=False)
    prof.print_aggregated()
    return report


if __name__ == "__main__":
    main()
