"""RGB-D pipeline test: single-keyframe init, metric map, depth densification."""

import numpy as np

from tpuslam.core.camera import Camera
from tpuslam.core.config import Capacities, SlamConfig
from tpuslam.frontend.tracking import Tracker
from tpuslam.io.synthetic import make_room_scene, render_frame
from tpuslam.io.trajectory import ate_rmse

CAM = Camera.make(500.0, 500.0, 320.0, 240.0, bf=40.0)


def test_rgbd_tracker_metric_trajectory():
    import dataclasses

    scene = make_room_scene(n_points=800, n_frames=30, seed=4)
    cfg = SlamConfig().replace(
        sensor="rgbd",
        caps=Capacities(
            max_keypoints=512,
            max_keyframes=64,
            max_points=8192,
            local_ba_keyframes=8,
            local_ba_fixed_keyframes=8,
            local_ba_points=2048,
        ),
    )
    # force a dense keyframe cadence (the mMaxFrames dataset knob): the
    # reference-faithful NeedNewKeyFrame never fires on this synthetic room —
    # single-observer init points give nRefMatches=0 and the bf=40 camera's
    # 3.2 m close threshold leaves too few free close points to densify
    cfg = cfg.replace(tracking=dataclasses.replace(cfg.tracking, max_frames_between_kf=3))
    tracker = Tracker(CAM, cfg)
    for i in range(30):
        frame = render_frame(scene, i, CAM, n_features=512, pix_noise=0.3, with_depth=True)
        tracker.process_frame(frame, i)
    assert tracker.state == Tracker.OK
    assert tracker.n_kf >= 1
    # RGBD map is metric: evaluate WITHOUT scale alignment
    est = [p for _, p in tracker.trajectory]
    gt = [scene.poses[i] for i, _ in tracker.trajectory]
    rmse, _ = ate_rmse(est, gt, with_scale=False)
    # 0.1: this room has a hard mid-sequence matching window (frames 15-19);
    # with a 3-frame keyframe cadence the tracker rides it out at ~0.09 m
    assert rmse < 0.1, f"metric ATE RMSE {rmse:.4f} m"
    assert len(tracker.trajectory) >= 29  # tracks from frame 0 (no 2-view init)
