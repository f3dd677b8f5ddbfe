"""Semantic layer tests: plane/cuboid association + heterogeneous local BA
in the full pipeline."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from tpuslam.core import geometry as geo
from tpuslam.core.camera import Camera
from tpuslam.core.config import (
    Capacities,
    FeatureFlags,
    SemanticConfig,
    SlamConfig,
    TrackingConfig,
)
from tpuslam.frontend.tracking import Tracker
from tpuslam.io.synthetic import (
    make_room_scene,
    render_cuboid_detections,
    render_frame,
    render_plane_detections,
)
from tpuslam.io.trajectory import ate_rmse

CAM = Camera.make(500.0, 500.0, 320.0, 240.0)


def semantic_config():
    return SlamConfig().replace(
        caps=Capacities(
            max_keypoints=512,
            max_keyframes=64,
            max_points=8192,
            max_planes=16,
            max_cuboids=8,
            max_planes_per_frame=8,
            max_cuboids_per_frame=4,
            local_ba_keyframes=8,
            local_ba_fixed_keyframes=8,
            local_ba_points=2048,
        ),
        flags=FeatureFlags(
            detect_plane=True,
            detect_object=True,
            associate_cuboid_with_classname=True,
            optimize_with_plane_3d=True,
            optimize_with_cuboid_2d=True,
            optimize_with_cuboid_3d=True,
            optimize_with_pt_obj_3d=False,
            optimize_with_cuboid_plane=False,
            # the dist path is covered by test_dist/test_shard/
            # test_multiprocess; running the heavy heterogeneous BA as an
            # 8-virtual-device collective on a 2-core CI host intermittently
            # trips XLA's 40 s all-reduce rendezvous timeout (a hard abort)
            distributed_ba=False,
                    ),
        # test scene has 512 features vs the reference's 1000+: scale the
        # owned-point candidate gate accordingly (reference value 20)
        semantic=SemanticConfig(cuboid_min_own_points=8),
        # metric anchor (the reference uses GT ground height,
        # Tracking.cc:1335-1393): median depth of the synthetic room ~6.56 m.
        # max_frames_between_kf=4: semantic detections are consumed at
        # keyframes only (Tracking.cc:1313-1334), and the reference-faithful
        # NeedNewKeyFrame creates few KFs on easy synthetic clips — force the
        # dense cadence a 30 fps dataset would have (mMaxFrames analogue)
        tracking=TrackingConfig(init_median_depth=6.56, max_frames_between_kf=4),
        # soften the plane-distance information vs the reference default
        # (100 -> 10): monocular scale drift makes metric plane distances
        # systematically off by ~1%, and at disInfo=1e4 those residuals
        # out-pull the reprojection terms (verified: ATE 0.076 -> 0.039)
        ba=dataclasses.replace(SlamConfig().ba, plane_dist_info=10.0),
    )


def test_full_pipeline_with_planes_and_cuboids():
    scene = make_room_scene(n_points=800, n_frames=40, seed=0, with_planes=True, with_cuboids=True)
    cfg = semantic_config()
    tracker = Tracker(CAM, cfg)
    for i in range(40):
        frame = render_frame(scene, i, CAM, n_features=512, pix_noise=0.3)
        pdet = render_plane_detections(scene, i, cfg.caps.max_planes_per_frame)
        cdet = render_cuboid_detections(scene, i, CAM, cfg.caps.max_cuboids_per_frame)
        tracker.process_frame(frame, i, plane_det=pdet, cuboid_det=cdet)
    assert tracker.state == Tracker.OK

    # trajectory still centimetre-class with semantic factors in the BA
    est = [p for _, p in tracker.trajectory]
    gt = [scene.poses[i] for i, _ in tracker.trajectory]
    rmse, _ = ate_rmse(est, gt, with_scale=True)
    assert rmse < 0.06, f"ATE RMSE {rmse:.4f} m with semantics"

    # planes: the 3 GT planes should exist in the map (up to mono scale)
    assert tracker.n_plane >= 3, f"only {tracker.n_plane} planes mapped"
    gt_n = scene.planes[:, :3] / np.linalg.norm(scene.planes[:, :3], axis=1, keepdims=True)
    got = np.array(tracker.map.plane_coef[: tracker.n_plane])
    matched = 0
    for g in gt_n:
        cos = np.abs(got[:, :3] @ g)
        if cos.max() > 0.99:
            matched += 1
    assert matched >= 3, f"only {matched} GT plane normals recovered: {got}"

    # cuboids: both GT objects associated into landmarks with >= 3 obs
    assert tracker.n_cub >= 2, f"only {tracker.n_cub} cuboids mapped"
    obs = np.array(tracker.map.cub_obs_count[: tracker.n_cub])
    assert (obs >= 3).sum() >= 2, f"cuboid obs counts {obs}"


def test_combined_cuboid_terms_with_fixed_scale():
    """Combining the 2D bbox and 3D SE3 cuboid terms is degenerate when the
    scale is free (a bbox cannot separate yaw from scale: rotating ~45 deg
    and growing the box reproduces the same bbox), so without dataset-tuned
    weights the landmark collapses and drags the camera poses.  With the
    reference's dormant ObjectFixScale variant (VertexCuboidFixScale,
    Optimizer.cc:2147-2150) enabled, both landmarks stay near ground truth
    and the trajectory stays sane on a scene where the free-scale combined
    mode degrades to ~0.29 m ATE."""
    scene = make_room_scene(n_points=800, n_frames=40, seed=1, with_planes=True, with_cuboids=True)
    cfg = semantic_config()
    cfg = cfg.replace(ba=dataclasses.replace(cfg.ba, cuboid_fix_scale=True))
    tracker = Tracker(CAM, cfg)
    for i in range(40):
        frame = render_frame(scene, i, CAM, n_features=512, pix_noise=0.3)
        pdet = render_plane_detections(scene, i, cfg.caps.max_planes_per_frame)
        cdet = render_cuboid_detections(scene, i, CAM, cfg.caps.max_cuboids_per_frame)
        tracker.process_frame(frame, i, plane_det=pdet, cuboid_det=cdet)
    assert tracker.state == Tracker.OK

    est = [p for _, p in tracker.trajectory]
    gt = [scene.poses[i] for i, _ in tracker.trajectory]
    rmse, _ = ate_rmse(est, gt, with_scale=True)
    # sanity bound only — the discriminating assertions are the landmark
    # integrity checks below (free-scale collapse shows ~50 deg yaw error
    # and 0.4+ scale error, an order of magnitude beyond these bounds)
    assert rmse < 0.3, f"ATE RMSE {rmse:.4f} m with fixed-scale cuboids"

    # both landmarks keep their detector scale and a sane yaw
    assert tracker.n_cub >= 2
    for c in range(2):
        gp, gs = geo.cuboid_from_minimal(jnp.asarray(scene.cuboids[c], jnp.float32))
        s_err = float(jnp.linalg.norm(tracker.map.cub_scale[c] - gs))
        assert s_err < 0.05, f"cuboid {c} scale drifted {s_err:.3f} despite fix_scale"
        R = np.array(tracker.map.cub_pose[c][:3, :3])
        Rg = np.array(gp[:3, :3])
        dyaw = np.degrees(np.arctan2(R[1, 0], R[0, 0]) - np.arctan2(Rg[1, 0], Rg[0, 0]))
        dyaw = abs(((dyaw + 180.0) % 360.0) - 180.0)
        assert dyaw < 20.0, f"cuboid {c} yaw off by {dyaw:.1f} deg"


def test_plane_association_gates():
    from tpuslam.map import mapstate as ms
    from tpuslam.semantic import associate as sa
    from tpuslam.semantic.detect import PlaneDetections

    cfg = semantic_config()
    m = ms.empty_map(cfg.caps)
    # seed one map plane: z-normal, d=5
    m = m._replace(
        plane_coef=m.plane_coef.at[0].set(jnp.array([0.0, 0.0, 1.0, 5.0])),
        plane_valid=m.plane_valid.at[0].set(True),
    )
    # camera at identity: local coeffs == world coeffs
    L = cfg.caps.max_planes_per_frame
    coef = np.tile(np.array([0.0, 0.0, 1.0, 1.0], np.float32), (L, 1))
    coef[0] = [0.0, 0.0, 1.0, 5.1]  # direct match (dist 0.1 < 0.4)
    coef[1] = [1.0, 0.0, 0.0, 2.0]  # vertical to plane 0
    coef[2] = [0.0, 0.0, 1.0, 9.0]  # parallel but too far -> new plane
    valid = np.zeros(L, bool)
    valid[:3] = True
    det = PlaneDetections(
        coef=jnp.asarray(coef), centroid=jnp.zeros((L, 3)), valid=jnp.asarray(valid)
    )
    m2, n_planes = sa.associate_planes(m, 0, det, 1)
    kmap = np.array(m2.kf_plane_map[0])
    kver = np.array(m2.kf_plane_ver[0])
    kpar = np.array(m2.kf_plane_par[0])
    assert kmap[0] == 0  # direct
    assert kver[1] == 0  # vertical relation to plane 0
    # unmatched detections always become new landmarks (Tracking.cc:2672-2679)
    assert kmap[1] == 1
    assert kmap[2] == 2 and n_planes == 3
    assert kpar[2] == 0  # also parallel to plane 0
    assert kmap[3] == -1
