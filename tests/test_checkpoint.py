"""Checkpoint/resume: save a mid-run tracker, restore, relocalize, continue.

(The reference has no map persistence — System.h:119-121 TODO; this is a
new capability the survey calls for, SURVEY.md §5.)
"""

import numpy as np

from tpuslam.core.camera import Camera
from tpuslam.core.config import Capacities, SlamConfig
from tpuslam.frontend.tracking import Tracker
from tpuslam.io.checkpoint import load_map, load_tracker, save_map, save_tracker
from tpuslam.io.synthetic import make_room_scene, render_frame
from tpuslam.map import mapstate as ms

CAM = Camera.make(500.0, 500.0, 320.0, 240.0, bf=40.0)


def _small_cfg():
    import dataclasses

    cfg = SlamConfig().replace(
        sensor="rgbd",
        caps=Capacities(
            max_keypoints=512, max_keyframes=64, max_points=8192,
            local_ba_keyframes=8, local_ba_fixed_keyframes=8, local_ba_points=2048,
        ),
    )
    # force a dense keyframe cadence (mMaxFrames analogue): relocalization
    # after resume needs a keyframe near the cut, and the reference-faithful
    # NeedNewKeyFrame creates few KFs on this easy synthetic clip
    return cfg.replace(
        tracking=dataclasses.replace(cfg.tracking, max_frames_between_kf=5)
    )


def test_map_roundtrip(tmp_path):
    cfg = _small_cfg()
    m = ms.empty_map(cfg.caps)
    p = str(tmp_path / "map.npz")
    save_map(p, m, extra={"note": "empty"})
    m2, extra = load_map(p)
    assert extra["note"] == "empty"
    for name, a, b in zip(ms.MapState._fields, m, m2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


def test_tracker_resume_continues_tracking(tmp_path):
    scene = make_room_scene(n_points=800, n_frames=30, seed=4)
    cfg = _small_cfg()
    tracker = Tracker(CAM, cfg)
    for i in range(18):
        tracker.process_frame(render_frame(scene, i, CAM, n_features=512, with_depth=True), i)
    assert tracker.state == Tracker.OK
    n_kf_before, n_pt_before = tracker.n_kf, tracker.n_pt
    p = str(tmp_path / "ckpt.npz")
    save_tracker(p, tracker)

    restored = load_tracker(p, CAM, cfg)
    assert restored.n_kf == n_kf_before and restored.n_pt == n_pt_before
    assert restored.state == Tracker.LOST  # must relocalize on resume
    assert len(restored.trajectory) == len(tracker.trajectory)
    # continue the sequence: relocalization against the restored map
    for i in range(18, 30):
        restored.process_frame(render_frame(scene, i, CAM, n_features=512, with_depth=True), i)
    assert restored.state == Tracker.OK, "tracker failed to resume from checkpoint"
    # resumed poses stay consistent with GT (metric map, no alignment)
    fid, T = restored.trajectory[-1]
    gt = scene.poses[fid]
    t_err = np.linalg.norm(np.asarray(T)[:3, 3] - gt[:3, 3])
    assert t_err < 0.1, f"resumed pose error {t_err:.3f} m"


def test_localization_only_mode_freezes_map(tmp_path):
    """System::ActivateLocalizationMode parity: a tracker in localization
    mode localizes against a restored map without mutating it."""
    scene = make_room_scene(n_points=800, n_frames=30, seed=4)
    cfg = _small_cfg()
    tracker = Tracker(CAM, cfg)
    for i in range(18):
        tracker.process_frame(render_frame(scene, i, CAM, n_features=512, with_depth=True), i)
    p = str(tmp_path / "ckpt.npz")
    save_tracker(p, tracker)

    loc = load_tracker(p, CAM, cfg)
    loc.set_localization_mode(True)
    n_kf, n_pt = loc.n_kf, loc.n_pt
    poses_before = np.array(loc.map.kf_pose)
    pts_before = np.array(loc.map.pt_pos)
    for i in range(18, 30):
        loc.process_frame(render_frame(scene, i, CAM, n_features=512, with_depth=True), i)
    assert loc.state == Tracker.OK, "localization-only tracker lost"
    # the map is frozen: no new keyframes/points, geometry untouched
    assert loc.n_kf == n_kf and loc.n_pt == n_pt
    np.testing.assert_array_equal(np.array(loc.map.kf_pose), poses_before)
    np.testing.assert_array_equal(np.array(loc.map.pt_pos), pts_before)
    # and poses are still metric-accurate
    fid, T = loc.trajectory[-1]
    t_err = np.linalg.norm(np.asarray(T)[:3, 3] - scene.poses[fid][:3, 3])
    assert t_err < 0.1, f"localization-only pose error {t_err:.3f} m"
