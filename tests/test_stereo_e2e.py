"""End-to-end stereo pipeline: image pairs -> ORB -> stereo depth -> metric
trajectory (System::TrackStereo analogue via Tracker.process_stereo_pair)."""

import numpy as np

from tpuslam.core.camera import Camera
from tpuslam.core.config import Capacities, OrbConfig, SlamConfig
from tpuslam.frontend.tracking import Tracker
from tpuslam.io.trajectory import ate_rmse

H, W = 240, 320
FX = 320.0
BF = 40.0
Z_WALL = 4.0  # wall depth -> stereo disparity bf/Z = 10 px exactly
DISP = int(BF / Z_WALL)


def _texture(margin, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (H, W + margin)).astype(np.float32)
    k = np.ones((3, 3), np.float32) / 9.0
    for _ in range(2):
        p = np.pad(base, 1, mode="edge")
        base = sum(k[i, j] * p[i : i + H, j : j + W + margin] for i in range(3) for j in range(3))
    return base


def test_stereo_pair_tracking_metric():
    n_frames = 16
    px_step = 4  # camera moves so the image shifts 4 px/frame
    dx = px_step * Z_WALL / FX  # metric lateral step (0.05 m)
    margin = DISP + px_step * n_frames + 8
    base = _texture(margin)

    cam = Camera.make(FX, FX, W / 2.0, H / 2.0, bf=BF, width=W, height=H)
    cfg = SlamConfig().replace(
        sensor="stereo",
        orb=OrbConfig(n_features=512, n_levels=4),
        caps=Capacities(
            max_keypoints=512, max_keyframes=32, max_points=8192,
            local_ba_keyframes=8, local_ba_fixed_keyframes=8, local_ba_points=2048,
        ),
    )
    tracker = Tracker(cam, cfg)
    gt = []
    for i in range(n_frames):
        off = i * px_step
        left = base[:, off : off + W]
        right = base[:, off + DISP : off + DISP + W]
        tracker.process_stereo_pair(left, right, i)
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -i * dx  # Tcw for camera at world x = i*dx
        gt.append(T)

    assert tracker.state == Tracker.OK
    est = [p for _, p in tracker.trajectory]
    gt_used = [gt[i] for i, _ in tracker.trajectory]
    assert len(est) >= n_frames - 1
    rmse, _ = ate_rmse(est, gt_used, with_scale=False)  # metric: no scale align
    assert rmse < 0.05, f"stereo metric ATE RMSE {rmse:.4f} m"
