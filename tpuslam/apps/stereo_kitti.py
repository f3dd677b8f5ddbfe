"""Stereo KITTI odometry runner — parity with Examples/Stereo/stereo_kitti.cc:
left/right pairs through the batched stereo matcher (kernels/stereo.py),
metric trajectory.

Usage:
  python -m tpuslam.apps.stereo_kitti <sequences/NN> [--settings KITTI00-02.yaml]
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
    # KITTI 00-02: bf = fx * 0.54 m baseline (stereo_kitti settings yaml)
    cam, _ = common.camera_from_args(
        args,
        Camera.make(718.856, 718.856, 607.1928, 185.2157, width=1241, height=376, bf=386.1448),
    )
    cfg = SlamConfig().replace(sensor="stereo")
    ds = KittiOdometryDataset(args.folder, max_frames=args.max_frames)
    gt = ds.gt_poses()
    cfg = common.apply_features(cfg, args.features)
    tracker = common.make_tracker(args, cam, cfg, sample_grays=(it.gray for it in ds.frames()))
    prof = Profiler()
    ft = common.run_loop(tracker, ds.frames(stereo=True), "stereo", prof, args=args)
    args.save_kitti = True
    report = common.finish(tracker, args, ft, gt=gt, metric=True)
    prof.print_aggregated()
    return report


if __name__ == "__main__":
    main()
