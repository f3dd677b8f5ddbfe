"""Monocular ICL-NUIM runner — CLI parity with mono_icl_test
(Examples/Monocular/mono_icl_test.cc): dataset loop, settings YAML, offline
semantic detections, trajectory / cuboid / plane dumps, timing report.

Usage:
  python -m tpuslam.apps.mono_icl <dataset_folder> [--settings ICL.yaml]
      [--max-frames N] [--objects] [--planes] [--out OUTDIR]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from ..core.camera import Camera
from ..core.config import FeatureFlags, SlamConfig
from ..core import geometry as geo
from ..frontend.tracking import Tracker
from ..io.datasets import IclDataset, load_settings_yaml
from ..io.trajectory import ate_rmse, save_cuboids, save_planes, save_tum
from ..semantic.detect import read_offline_cuboids, read_offline_planes
from ..utils.profiler import Profiler


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("folder")
    ap.add_argument("--settings", default="ICL.yaml")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--objects", action="store_true")
    ap.add_argument("--planes", action="store_true")
    ap.add_argument("--out", default=".")
    args = ap.parse_args(argv)

    settings_path = os.path.join(args.folder, args.settings)
    if os.path.exists(settings_path):
        cam, vals = load_settings_yaml(settings_path)
    else:
        cam, vals = Camera.make(481.2, -480.0, 319.5, 239.5), {}  # ICL defaults

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
    )
    cfg = SlamConfig().replace(flags=flags)
    ds = IclDataset(args.folder, max_frames=args.max_frames)
    gt = ds.gt_poses() if os.path.exists(os.path.join(args.folder, ds.truth_file)) else None

    tracker = Tracker(cam, cfg)
    prof = Profiler()
    frame_times = []
    for item in ds.frames():
        t0 = time.perf_counter()
        pdet = cdet = None
        if args.planes:
            with prof.section("time plane estimation"):
                pdet = read_offline_planes(
                    os.path.join(
                        args.folder, "plane_seg", f"{item.frame_id}_offline_plane_multiplane.txt"
                    ),
                    cfg.caps.max_planes_per_frame,
                )
        if args.objects and gt is not None:
            with prof.section("time object detection"):
                Twc = np.linalg.inv(gt[item.frame_id])
                cdet = read_offline_cuboids(
                    os.path.join(args.folder, "pred_3d_obj_matched_txt", f"{item.frame_id:04d}_3d_cuboids.txt"),
                    Twc,
                    np.asarray(cam.K),
                    cfg.caps.max_cuboids_per_frame,
                )
        with prof.section("time single frame"):
            tracker.process_image(item.gray, item.frame_id, plane_det=pdet, cuboid_det=cdet)
        frame_times.append(time.perf_counter() - t0)

    out = args.out
    os.makedirs(out, exist_ok=True)
    stamps = [fid for fid, _ in tracker.trajectory]
    poses = [p for _, p in tracker.trajectory]
    save_tum(os.path.join(out, "KeyFrameTrajectory.txt"), stamps, poses)
    if tracker.n_cub > 0:
        import jax.numpy as jnp

        minimal = [
            np.asarray(geo.cuboid_to_minimal(tracker.map.cub_pose[i], tracker.map.cub_scale[i]))
            for i in range(tracker.n_cub)
        ]
        save_cuboids(os.path.join(out, "CuboidPose.txt"), minimal)
    if tracker.n_plane > 0:
        save_planes(
            os.path.join(out, "PlanePose.txt"),
            [np.array(tracker.map.plane_coef[i]) for i in range(tracker.n_plane)],
        )

    ft = np.array(frame_times)
    report = {
        "frames": len(ft),
        "tracked": len(tracker.trajectory),
        "keyframes": tracker.n_kf,
        "points": tracker.n_pt,
        "median_frame_s": float(np.median(ft)) if len(ft) else None,
        "mean_frame_s": float(ft.mean()) if len(ft) else None,
    }
    if gt is not None and tracker.trajectory:
        est = poses
        gts = [gt[fid] for fid in stamps]
        rmse, _ = ate_rmse(est, gts, with_scale=True)
        report["ate_rmse_m"] = rmse
    print(json.dumps(report))
    prof.print_aggregated()
    return report


if __name__ == "__main__":
    main()
