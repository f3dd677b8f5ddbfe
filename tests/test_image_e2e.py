"""Image-level closed loop: real ORB extraction -> matching -> tracking.

The other e2e tests feed synthetic FEATURES (render_frame); this one feeds
synthetic IMAGES through the full kernel stack (pyramid, FAST, BRIEF,
Hamming matching) exactly as a dataset app would — a textured wall viewed by
a laterally translating camera, so ground-truth motion is known in pixels.
"""

import numpy as np

from tpuslam.core.camera import Camera
from tpuslam.core.config import Capacities, OrbConfig, SlamConfig
from tpuslam.frontend.tracking import Tracker

H, W = 480, 640
N = 512
PX_STEP = 3  # pixels of lateral shift per frame
Z_WALL = 5.0
FX = 500.0


def _make_frames(n_frames, seed=0):
    rng = np.random.RandomState(seed)
    margin = PX_STEP * n_frames + 8
    base = rng.uniform(0, 255, (H, W + margin)).astype(np.float32)
    k = np.ones((3, 3), np.float32) / 9.0
    for _ in range(2):
        p = np.pad(base, 1, mode="edge")
        base = sum(k[i, j] * p[i : i + H, j : j + W + margin] for i in range(3) for j in range(3))
    return [base[:, i * PX_STEP : i * PX_STEP + W] for i in range(n_frames)]


def _cfg():
    return SlamConfig().replace(
        caps=Capacities(
            max_keypoints=N, max_keyframes=32, max_points=4096,
            local_ba_keyframes=6, local_ba_fixed_keyframes=6, local_ba_points=1024,
        ),
        orb=OrbConfig(n_features=N),
    )


def test_image_level_mono_tracking():
    frames = _make_frames(12)
    cam = Camera.make(FX, FX, 320.0, 240.0, width=W, height=H)
    tracker = Tracker(cam, _cfg())
    for i, im in enumerate(frames):
        tracker.process_image(im, i)
    assert tracker.state == Tracker.OK
    assert len(tracker.trajectory) >= 8

    # the camera translates +x by PX_STEP * Z/f per frame (up to mono scale);
    # check the direction and per-frame consistency of the recovered motion
    fids = [f for f, _ in tracker.trajectory]
    xs = [float(np.linalg.inv(T)[0, 3]) for _, T in tracker.trajectory]
    assert xs[-1] > 0, "camera should move +x"
    steps = np.diff(xs) / np.diff(fids)
    assert np.all(steps > 0), f"non-monotone motion: {steps}"
    # every per-frame step within a factor 2 of the median: catches gross
    # scale jumps or stalls while tolerating the un-refined early scale and
    # local-BA adjustments (mono scale is free, so only ratios are testable)
    med = float(np.median(steps))
    assert np.all((steps > 0.4 * med) & (steps < 2.5 * med)), f"step outlier: {steps}"


def test_image_level_textureless_never_initializes():
    cam = Camera.make(FX, FX, 320.0, 240.0, width=W, height=H)
    tracker = Tracker(cam, _cfg())
    flat = np.full((H, W), 128.0, np.float32)
    for i in range(4):
        tracker.process_image(flat, i)
    assert tracker.state == Tracker.NOT_INITIALIZED
