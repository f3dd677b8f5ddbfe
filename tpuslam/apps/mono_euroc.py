"""Monocular EuRoC MAV runner — parity with Examples/Monocular/mono_euroc.cc.

Usage:
  python -m tpuslam.apps.mono_euroc <sequence_root> [--settings EuRoC.yaml]
      [--max-frames N] [--out DIR]
"""

from __future__ import annotations

from ..core.camera import Camera
from ..core.config import SlamConfig
from ..io.datasets import EurocDataset
from ..utils.profiler import Profiler
from . import common


def main(argv=None):
    ap = common.base_parser(__doc__)
    args = ap.parse_args(argv)
    # EuRoC cam0 intrinsics (pre-rectified assumption; see EurocDataset)
    cam, _ = common.camera_from_args(
        args, Camera.make(458.654, 457.296, 367.215, 248.375, width=752, height=480)
    )
    cfg = SlamConfig().replace(sensor="mono")
    ds = EurocDataset(args.folder, max_frames=args.max_frames)
    gt = ds.gt_poses()
    cfg = common.apply_features(cfg, args.features)
    tracker = common.make_tracker(args, cam, cfg, sample_grays=(it.gray for it in ds.frames()))
    prof = Profiler()
    ft = common.run_loop(tracker, ds.frames(), "mono", prof, args=args)
    report = common.finish(tracker, args, ft, gt=gt, metric=False)
    prof.print_aggregated()
    return report


if __name__ == "__main__":
    main()
