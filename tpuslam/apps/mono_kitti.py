"""Monocular KITTI odometry runner — parity with
Examples/Monocular/mono_kitti.cc.

Usage:
  python -m tpuslam.apps.mono_kitti <sequences/NN> [--settings KITTI00-02.yaml]
      [--max-frames N] [--out DIR]
"""

from __future__ import annotations

from ..core.camera import Camera
from ..core.config import SlamConfig
from ..io.datasets import KittiOdometryDataset
from ..utils.profiler import Profiler
from . import common


def main(argv=None):
    ap = common.base_parser(__doc__)
    args = ap.parse_args(argv)
    # KITTI 00-02 intrinsics
    cam, _ = common.camera_from_args(
        args, Camera.make(718.856, 718.856, 607.1928, 185.2157, width=1241, height=376)
    )
    cfg = SlamConfig().replace(sensor="mono")
    ds = KittiOdometryDataset(args.folder, max_frames=args.max_frames)
    gt = ds.gt_poses()
    cfg = common.apply_features(cfg, args.features)
    tracker = common.make_tracker(args, cam, cfg, sample_grays=(it.gray for it in ds.frames()))
    prof = Profiler()
    ft = common.run_loop(tracker, ds.frames(), "mono", prof, args=args)
    args.save_kitti = True
    report = common.finish(tracker, args, ft, gt=gt, metric=False)
    prof.print_aggregated()
    return report


if __name__ == "__main__":
    main()
