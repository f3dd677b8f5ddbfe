"""App-level tests: synthesize a tiny ICL-style dataset on disk and drive the
CLI mains end-to-end (dataset read -> track -> trajectory dump -> report)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

H, W = 240, 320
FX = 320.0
BF = 40.0
Z_WALL = 4.0


def _write_icl_dataset(root, n_frames=10, px_step=4):
    """Textured wall at Z_WALL, camera translating laterally px_step px/frame.
    Writes rgb/*.png, depth/*.png, rgb.txt, depth.txt, odom.txt, ICL.yaml."""
    rng = np.random.default_rng(0)
    margin = px_step * n_frames + 16
    base = rng.uniform(0, 255, (H, W + margin)).astype(np.float32)
    k = np.ones((3, 3), np.float32) / 9.0
    for _ in range(2):
        p = np.pad(base, 1, mode="edge")
        base = sum(k[i, j] * p[i : i + H, j : j + W + margin] for i in range(3) for j in range(3))
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    rgb_rows, depth_rows, odom_rows = [], [], []
    dx = px_step * Z_WALL / FX
    depth_img = np.full((H, W), Z_WALL * 5000.0, np.uint16)  # factor 5000
    for i in range(n_frames):
        img = base[:, i * px_step : i * px_step + W].astype(np.uint8)
        cv2.imwrite(os.path.join(root, "rgb", f"{i:04d}.png"), img)
        cv2.imwrite(os.path.join(root, "depth", f"{i:04d}.png"), depth_img)
        rgb_rows.append(f"{float(i):.4f} rgb/{i:04d}.png")
        depth_rows.append(f"{float(i):.4f} depth/{i:04d}.png")
        # odom rows: [t x y z qx qy qz qw] of camera-in-world
        odom_rows.append(f"{float(i):.4f} {i * dx:.6f} 0 0 0 0 0 1")
    for name, rows in (("rgb.txt", rgb_rows), ("depth.txt", depth_rows), ("odom.txt", odom_rows)):
        with open(os.path.join(root, name), "w") as f:
            f.write("\n".join(rows) + "\n")
    with open(os.path.join(root, "ICL.yaml"), "w") as f:
        f.write(
            "%YAML:1.0\n"
            f"Camera.fx: {FX}\nCamera.fy: {FX}\nCamera.cx: {W/2.0}\nCamera.cy: {H/2.0}\n"
            f"Camera.width: {W}\nCamera.height: {H}\nCamera.bf: {BF}\n"
        )
    return dx


def test_rgbd_icl_app_online_planes(tmp_path, capsys):
    from tpuslam.apps import rgbd_icl

    root = str(tmp_path / "icl")
    os.makedirs(root)
    _write_icl_dataset(root)
    report = rgbd_icl.main([root, "--planes", "online", "--features", "512",
                            "--max-kf-gap", "3", "--out", str(tmp_path / "out")])
    assert report["tracked"] >= 8
    assert report["keyframes"] >= 1
    assert report["planes"] >= 1, "online segmentation should find the wall plane"
    assert report["ate_rmse_m"] < 0.05
    assert os.path.exists(tmp_path / "out" / "KeyFrameTrajectory.txt")
    assert os.path.exists(tmp_path / "out" / "PlanePose.txt")


def test_rgbd_icl_app_checkpoint_roundtrip(tmp_path):
    from tpuslam.apps import rgbd_icl

    root = str(tmp_path / "icl")
    os.makedirs(root)
    _write_icl_dataset(root)
    ck = str(tmp_path / "map.npz")
    r1 = rgbd_icl.main([root, "--features", "512", "--out", str(tmp_path / "o1"), "--checkpoint", ck])
    assert os.path.exists(ck)
    r2 = rgbd_icl.main([root, "--features", "512", "--out", str(tmp_path / "o2"), "--resume", ck])
    assert r2["keyframes"] >= r1["keyframes"]  # resumed map retains keyframes
