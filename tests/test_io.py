"""I/O tests: native prefetch loader, trajectory round trips, ATE metric."""

import os

import numpy as np
import pytest

from tpuslam.io import native_loader
from tpuslam.io.trajectory import ate_rmse, save_tum, umeyama_alignment


def _make_dataset(tmp_path, n=6, h=48, w=64):
    import cv2

    rgb_dir = tmp_path / "rgb"
    rgb_dir.mkdir()
    frames = []
    lines = []
    rng = np.random.RandomState(0)
    for i in range(n):
        img = (rng.rand(h, w) * 255).astype(np.uint8)
        name = f"rgb/{i:04d}.png"
        cv2.imwrite(str(tmp_path / name), img)
        frames.append(img)
        lines.append(f"{i * 0.1:.4f} {name}")
    (tmp_path / "rgb.txt").write_text("\n".join(lines) + "\n")
    return frames


@pytest.mark.skipif(not native_loader.available(), reason="native loader not built")
def test_native_loader_roundtrip(tmp_path):
    frames = _make_dataset(tmp_path)
    seq = native_loader.NativeSequence(
        str(tmp_path), n_threads=3, prefetch=4, max_hw=(48, 64)
    )
    assert len(seq) == 6
    got = list(seq)
    assert [it.frame_id for it in got] == list(range(6))  # strictly in order
    for it, ref in zip(got, frames):
        np.testing.assert_allclose(it.gray, ref.astype(np.float32), atol=0)
        assert it.gray.shape == (48, 64)
    seq.close()


def test_umeyama_recovers_similarity():
    rng = np.random.RandomState(1)
    src = rng.randn(50, 3)
    from tpuslam.core import geometry as geo
    import jax.numpy as jnp

    R = np.asarray(geo.so3_exp(jnp.array([0.2, -0.1, 0.4])))
    s, t = 1.7, np.array([1.0, -2.0, 0.5])
    dst = s * src @ R.T + t
    s2, R2, t2 = umeyama_alignment(src, dst)
    assert abs(s2 - s) < 1e-5
    np.testing.assert_allclose(R2, R, atol=1e-5)
    np.testing.assert_allclose(t2, t, atol=1e-5)


def test_save_tum_format(tmp_path):
    import jax.numpy as jnp

    from tpuslam.core import geometry as geo

    poses = [np.asarray(geo.se3_exp(jnp.array([0.1 * i, 0, 0, 0.2 * i, 0, 0]))) for i in range(3)]
    path = tmp_path / "traj.txt"
    save_tum(str(path), [0.0, 0.1, 0.2], poses)
    rows = np.loadtxt(str(path))
    assert rows.shape == (3, 8)
    # quaternions normalized
    np.testing.assert_allclose(np.linalg.norm(rows[:, 4:], axis=1), 1.0, atol=1e-5)
