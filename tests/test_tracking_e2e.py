"""End-to-end closed-loop test: synthetic sequence -> Tracker -> ATE."""

import numpy as np
import jax.numpy as jnp

from tpuslam.core.camera import Camera
from tpuslam.core.config import Capacities, SlamConfig
from tpuslam.frontend.tracking import Tracker
from tpuslam.io.synthetic import make_room_scene, render_frame
from tpuslam.io.trajectory import ate_rmse

CAM = Camera.make(500.0, 500.0, 320.0, 240.0)


def small_config():
    return SlamConfig().replace(
        caps=Capacities(
            max_keypoints=512,
            max_keyframes=64,
            max_points=8192,
            max_planes=8,
            max_cuboids=4,
            local_ba_keyframes=8,
            local_ba_fixed_keyframes=8,
            local_ba_points=2048,
        )
    )


def test_tracker_follows_synthetic_sequence():
    scene = make_room_scene(n_points=800, n_frames=40, seed=0)
    cfg = small_config()
    tracker = Tracker(CAM, cfg)
    n_tracked = 0
    for i in range(40):
        frame = render_frame(scene, i, CAM, n_features=512, pix_noise=0.3)
        pose = tracker.process_frame(frame, i)
        if pose is not None:
            n_tracked += 1
    assert tracker.state == Tracker.OK, f"tracker lost (state={tracker.state})"
    assert n_tracked >= 30, f"only {n_tracked} frames tracked"
    assert tracker.n_kf >= 2

    est = [p for _, p in tracker.trajectory]
    frame_ids = [fid for fid, _ in tracker.trajectory]
    gt = [scene.poses[i] for i in frame_ids]
    rmse, err = ate_rmse(est, gt, with_scale=True)
    # trajectory spans ~2.2 m; demand centimetre-class ATE after Sim3 align.
    # 0.065: the reference-faithful NeedNewKeyFrame policy (min-observation
    # filtered nRefMatches, Tracking.cc:1227-1272) creates ~4 KFs on this
    # easy clip where the old all-tracked heuristic created ~10, thinning
    # the BA anchor set by a few mm of ATE
    assert rmse < 0.065, f"ATE RMSE {rmse:.4f} m"
