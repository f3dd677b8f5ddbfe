"""Tests for the synthetic golden-sequence generator (io/synth.py): renderer
parity (XLA batch renderer vs the numpy oracle), fixture-file correctness
against the core geometry, and reader round-trips.

The fixtures feed the golden-replay harness — the TPU-side analogue of the
reference's ICL replay validation (README.md:33-41, mono_icl_test.cc:139).
"""

import os

import numpy as np
import jax.numpy as jnp

from tpuslam.core import geometry as geo
from tpuslam.io import synth

CAM_SMALL = synth.CameraSpec(width=160, height=120, fx=130.0, fy=130.0,
                             cx=79.5, cy=59.5)


def test_batch_renderer_matches_numpy_oracle():
    spec = synth.SceneSpec()
    poses = synth.trajectory(8, spec)
    render = synth.make_batch_renderer(CAM_SMALL, spec)
    g_b, t_b, id_b = (np.asarray(x) for x in render(poses[:2]))
    for j in range(2):
        g0, t0, id0, _ = synth.render_frame(poses[j], CAM_SMALL, spec)
        same_id = id0 == id_b[j]
        # ray/primitive assignment identical except texture-cell boundary px
        assert same_id.mean() > 0.995, same_id.mean()
        assert np.abs(t0 - t_b[j])[same_id].max() < 1e-3
        # intensities equal except pixels whose hash cell flips at f32 eps
        frac_equal = (np.abs(g0 - g_b[j])[same_id] < 0.5).mean()
        assert frac_equal > 0.99, frac_equal


def test_plane_fixture_rows_match_geometry():
    """Camera-frame plane rows must equal geo.plane_transform of the world
    plane by Tcw, and the centroid must lie on the plane."""
    spec = synth.SceneSpec()
    poses = synth.trajectory(10, spec)
    T_wc = poses[4]
    gray, depth, pid, pcam = synth.render_frame(T_wc, CAM_SMALL, spec)
    rows = synth._plane_rows_for_frame(T_wc, pid, pcam, spec, min_pix=200)
    assert len(rows) >= 2
    Tcw = np.linalg.inv(T_wc).astype(np.float32)
    world = synth.room_planes(spec)
    for r in rows:
        coef = np.array(r[1:5], np.float32)
        cen = np.array(r[5:8], np.float32)
        # on-plane centroid
        assert abs(coef[:3] @ cen + coef[3]) < 1e-3
        # matches one of the room planes transformed by Tcw
        cand = np.asarray(
            geo.plane_transform(jnp.asarray(Tcw), jnp.asarray(world))
        )
        d = np.abs(cand - coef).sum(axis=-1).min()
        assert d < 1e-3, (coef, cand)


def test_cuboid_fixture_reader_roundtrip(tmp_path):
    """write_sequence emits global-frame cuboid txts; read_offline_cuboids
    must reproduce the local measurement Tcw @ pose_g and a finite bbox."""
    from tpuslam.semantic.detect import read_offline_cuboids

    folder = str(tmp_path / "seq")
    spec = synth.SceneSpec()
    synth.write_sequence(folder, n_frames=6, cam=CAM_SMALL, spec=spec,
                         total_angle_deg=12.0, min_plane_pix=200,
                         min_cuboid_pix=50)
    assert os.path.exists(os.path.join(folder, "rgb", "0000.png"))
    gt = np.loadtxt(os.path.join(folder, "odom.txt"), ndmin=2)
    K = np.array([[CAM_SMALL.fx, 0, CAM_SMALL.cx],
                  [0, CAM_SMALL.fy, CAM_SMALL.cy], [0, 0, 1]], np.float32)
    found = 0
    poses = synth.trajectory(6, spec, total_angle_deg=12.0)
    for f in range(6):
        path = os.path.join(folder, "pred_3d_obj_matched_txt", f"{f:04d}_3d_cuboids.txt")
        det = read_offline_cuboids(path, poses[f], K, cap=8)
        n = int(np.asarray(det.valid).sum())
        if n == 0:
            continue
        found += n
        Tcw = np.linalg.inv(poses[f])
        for i in range(n):
            lp = np.asarray(det.local_pose[i])
            gp = np.asarray(det.global_pose[i])
            np.testing.assert_allclose(lp, Tcw @ gp, atol=1e-4)
            # cuboid center must be in front of the camera
            assert lp[2, 3] > 0.5
            bbox = np.asarray(det.bbox[i])
            assert np.all(np.isfinite(bbox)) and bbox[2] > 0 and bbox[3] > 0
    assert found > 0, "no cuboid fixture was visible in any frame"
    # odom rows reproduce the trajectory poses (quat -> R round trip)
    q = gt[0, 4:]
    R = np.asarray(geo.quat_to_R(jnp.asarray(q, jnp.float32)))
    np.testing.assert_allclose(R, poses[0][:3, :3], atol=1e-5)


def test_golden_replay_short(tmp_path):
    """Closed-loop golden replay through the REAL mono_icl app path:
    synthetic room sequence with plane + cuboid fixtures on disk, all
    semantic flags on.  This is the miniature of the bench.py ate_rmse_m
    measurement (full-scale: 560 frames at 640x480 on TPU)."""
    from tpuslam.apps import mono_icl

    folder = str(tmp_path / "golden")
    cam = synth.CameraSpec(width=320, height=240, fx=260.0, fy=260.0,
                           cx=159.5, cy=119.5)
    synth.write_sequence(folder, n_frames=60, cam=cam, total_angle_deg=60.0,
                         min_plane_pix=800, min_cuboid_pix=150)
    report = mono_icl.main([
        folder, "--planes", "--objects", "--features", "512",
        "--out", str(tmp_path / "out"),
    ])
    assert report["tracked"] >= 25, report
    assert report["keyframes"] >= 4, report
    assert report["planes"] >= 2, report
    assert report["cuboids"] >= 1, report
    assert report["ate_rmse_m"] is not None and report["ate_rmse_m"] < 0.2, report
    assert os.path.exists(str(tmp_path / "out" / "KeyFrameTrajectory.txt"))
    assert os.path.exists(str(tmp_path / "out" / "PlanePose.txt"))
