"""Viz subsystem smoke tests (MapDrawer/FrameDrawer analogues)."""

import numpy as np
import pytest

from tpuslam.core.config import Capacities
from tpuslam.map import mapstate as ms


def test_draw_frame_overlay_shapes():
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from tpuslam.viz import draw_frame_overlay

    gray = np.random.default_rng(0).uniform(0, 255, (120, 160)).astype(np.float32)
    uv = np.array([[10.0, 10.0], [150.0, 110.0], [500.0, 500.0]], np.float32)
    valid = np.array([True, True, True])
    bound = np.array([True, False, False])
    bboxes = np.array([[80.0, 60.0, 40.0, 30.0]])
    corners = np.tile(np.array([20, 20, 40, 20, 40, 40, 20, 40] * 2, np.float32), (1, 1))
    out = draw_frame_overlay(gray, uv, valid, bound, state=1, n_kf=3, n_pt=42,
                             bboxes=bboxes, corners2d=corners)
    assert out.shape == (120 + 22, 160, 3) and out.dtype == np.uint8
    assert (out[:120] != np.stack([gray.astype(np.uint8)] * 3, -1)).any()  # drew something


def test_save_map_png(tmp_path):
    pytest.importorskip("matplotlib")
    import jax.numpy as jnp

    from tpuslam.viz import save_map_png

    caps = Capacities(max_keyframes=8, max_keypoints=64, max_points=256)
    m = ms.empty_map(caps)
    m = m._replace(
        pt_pos=m.pt_pos.at[:10].set(jnp.asarray(np.random.randn(10, 3), jnp.float32)),
        pt_valid=m.pt_valid.at[:10].set(True),
        kf_valid=m.kf_valid.at[:2].set(True),
        plane_coef=m.plane_coef.at[0].set(jnp.array([0, 0, 1.0, 2.0])),
        plane_valid=m.plane_valid.at[0].set(True),
        cub_valid=m.cub_valid.at[0].set(True),
        cub_scale=m.cub_scale.at[0].set(jnp.array([0.3, 0.2, 0.1])),
    )
    p = str(tmp_path / "map.png")
    save_map_png(p, m, n_kf=2, show_covisibility=True)
    import os

    assert os.path.getsize(p) > 5000
