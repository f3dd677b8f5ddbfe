"""Tests for the LM engine: Jacobians vs finite differences, pose
optimization, and full heterogeneous local BA on synthetic scenes."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.core import geometry as geo
from tpuslam.core.camera import Camera
from tpuslam.graph import factors as fac
from tpuslam.graph import lm

CAM = Camera.make(500.0, 500.0, 320.0, 240.0)


def make_scene(key, n_points=200, n_kf=5, noise=0.5):
    """Points in a box in front of cameras on a small arc looking at +z."""
    kp, kt = jax.random.split(key)
    points = jax.random.uniform(
        kp, (n_points, 3), minval=jnp.array([-3.0, -2.0, 4.0]), maxval=jnp.array([3.0, 2.0, 10.0])
    )
    poses = []
    for i in range(n_kf):
        t = jnp.array([0.3 * i, 0.05 * i, 0.1 * i])
        w = jnp.array([0.01 * i, 0.02 * i, 0.005 * i])
        T_wc = geo.se3_from_Rt(geo.so3_exp(w), t)  # camera in world
        poses.append(geo.se3_inv(T_wc))  # world->camera
    poses = jnp.stack(poses)
    # observations with pixel noise
    obs_uv = []
    for i in range(n_kf):
        pc = geo.se3_apply(poses[i], points)
        uv = jnp.stack(
            [500.0 * pc[:, 0] / pc[:, 2] + 320.0, 500.0 * pc[:, 1] / pc[:, 2] + 240.0], axis=-1
        )
        obs_uv.append(uv)
    obs_uv = jnp.stack(obs_uv)  # (K, N, 2)
    noise_arr = jax.random.normal(kt, obs_uv.shape) * noise
    return points, poses, obs_uv + noise_arr


def test_mono_jacobian_matches_finite_difference():
    T = geo.se3_exp(jnp.array([0.1, -0.2, 0.05, 0.3, 0.1, -0.4]))
    X = jnp.array([0.5, -0.3, 5.0])
    uv = jnp.array([300.0, 200.0])
    args = (uv, CAM.fx, CAM.fy, CAM.cx, CAM.cy)
    r, (Jp, Jx) = fac.linearize(
        fac.mono_residual, ((fac.retract_pose, 6), (fac.retract_point, 3)), (T, X), *args
    )
    eps = 1e-3
    for k in range(6):
        d = jnp.zeros(6).at[k].set(eps)
        rp = fac.mono_residual(fac.retract_pose(T, d), X, *args)
        rm = fac.mono_residual(fac.retract_pose(T, -d), X, *args)
        fd = (rp - rm) / (2 * eps)
        np.testing.assert_allclose(np.asarray(Jp[:, k]), np.asarray(fd), rtol=2e-2, atol=2e-2)
    for k in range(3):
        d = jnp.zeros(3).at[k].set(eps)
        fd = (fac.mono_residual(T, X + d, *args) - fac.mono_residual(T, X - d, *args)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(Jx[:, k]), np.asarray(fd), rtol=2e-2, atol=2e-2)


def test_plane_jacobian_matches_finite_difference():
    T = geo.se3_exp(jnp.array([0.05, -0.1, 0.02, 0.2, 0.0, -0.1]))
    plane_w = geo.plane_normalize(jnp.array([0.2, -0.4, 0.9, 1.5]))
    meas = geo.plane_transform(T, geo.plane_normalize(jnp.array([0.25, -0.35, 0.9, 1.4])))
    r, (Jp, Jq) = fac.linearize(
        fac.plane_residual, ((fac.retract_pose, 6), (fac.retract_plane, 3)), (T, plane_w), meas
    )
    eps = 1e-4
    for k in range(3):
        d = jnp.zeros(3).at[k].set(eps)
        fd = (
            fac.plane_residual(T, fac.retract_plane(plane_w, d), meas)
            - fac.plane_residual(T, fac.retract_plane(plane_w, -d), meas)
        ) / (2 * eps)
        np.testing.assert_allclose(np.asarray(Jq[:, k]), np.asarray(fd), rtol=5e-2, atol=5e-2)


def test_optimize_pose_recovers_perturbation():
    key = jax.random.PRNGKey(0)
    points, poses, obs = make_scene(key, n_points=256, n_kf=1, noise=0.0)
    T_true = poses[0]
    T_bad = geo.se3_exp(jnp.array([0.03, -0.02, 0.04, 0.2, -0.1, 0.15])) @ T_true
    valid = jnp.ones(256, bool)
    T_opt, inliers, n_in = lm.optimize_pose(
        T_bad, points, obs[0], jnp.ones(256), valid, CAM.fx, CAM.fy, CAM.cx, CAM.cy
    )
    err = geo.se3_log(geo.se3_inv(T_true) @ T_opt)
    assert float(jnp.linalg.norm(err)) < 1e-3, np.asarray(err)
    assert int(n_in) > 250


def test_optimize_pose_rejects_outliers():
    key = jax.random.PRNGKey(1)
    points, poses, obs = make_scene(key, n_points=256, n_kf=1, noise=0.3)
    uv = obs[0]
    # corrupt 20% of observations
    n_bad = 50
    uv = uv.at[:n_bad].add(jax.random.normal(jax.random.PRNGKey(2), (n_bad, 2)) * 80.0 + 40.0)
    T_bad = geo.se3_exp(jnp.array([0.02, 0.01, -0.03, 0.1, 0.05, -0.1])) @ poses[0]
    T_opt, inliers, n_in = lm.optimize_pose(
        T_bad, points, uv, jnp.ones(256), jnp.ones(256, bool), CAM.fx, CAM.fy, CAM.cx, CAM.cy
    )
    err = geo.se3_log(geo.se3_inv(poses[0]) @ T_opt)
    assert float(jnp.linalg.norm(err)) < 5e-3, np.asarray(err)
    # most corrupted obs classified outlier
    assert int(inliers[:n_bad].sum()) < 10
    assert int(inliers[n_bad:].sum()) > 190


def _point_ba_problem(key, n_kf=5, n_points=200, pose_noise=0.02, pix_noise=0.5):
    points, poses, obs = make_scene(key, n_points=n_points, n_kf=n_kf, noise=pix_noise)
    K, P = n_kf, n_points
    kf_idx = jnp.repeat(jnp.arange(K), P)
    pt_idx = jnp.tile(jnp.arange(P), K)
    uv = obs.reshape(-1, 2)
    mono = lm.MonoFactors(
        kf=kf_idx.astype(jnp.int32),
        pt=pt_idx.astype(jnp.int32),
        uv=uv,
        inv_sigma2=jnp.ones(K * P),
        valid=jnp.ones(K * P, bool),
    )
    # perturb everything except the first (gauge) pose
    kp, kx = jax.random.split(jax.random.PRNGKey(7))
    dpose = jax.random.normal(kp, (K, 6)) * pose_noise
    dpose = dpose.at[0].set(0.0).at[1].set(0.0)
    poses_bad = jax.vmap(lambda T, d: geo.se3_exp(d) @ T)(poses, dpose)
    points_bad = points + jax.random.normal(kx, (P, 3)) * 0.05
    state = lm.BAState(
        poses=poses_bad,
        points=points_bad,
        planes=jnp.tile(jnp.array([[0.0, 0.0, 1.0, 1.0]]), (1, 1)),
        cuboid_pose=jnp.tile(jnp.eye(4)[None], (1, 1, 1)),
        cuboid_scale=jnp.ones((1, 3)),
    )
    # fix the first TWO poses: pins the monocular scale gauge as well
    data = lm.make_ba_data(
        K, P, 1, 1, CAM, mono=mono, pose_fixed=jnp.arange(K) <= 1
    )
    return state, data, poses, points


def test_local_ba_converges_points_only():
    state, data, poses_true, points_true = _point_ba_problem(
        jax.random.PRNGKey(3), pix_noise=0.0
    )
    w = lm.BAWeights()
    state_opt, data_out, chi2s = lm.local_ba(state, data, w)
    pose_err = jnp.stack(
        [
            jnp.linalg.norm(geo.se3_log(geo.se3_inv(poses_true[i]) @ state_opt.poses[i]))
            for i in range(5)
        ]
    )
    # chi2 decreased a lot and poses are close to truth
    assert float(chi2s[-1]) < float(chi2s[0])
    assert float(pose_err.max()) < 2e-3, np.asarray(pose_err)
    pt_err = jnp.linalg.norm(state_opt.points - points_true, axis=-1)
    assert float(jnp.median(pt_err)) < 0.005


def test_local_ba_with_plane_factors():
    """A plane landmark observed by 3 cameras converges to truth."""
    plane_true = geo.plane_normalize(jnp.array([0.1, 0.2, 0.97, 2.0]))
    poses = []
    meas = []
    for i in range(3):
        T = geo.se3_exp(jnp.array([0.02 * i, -0.01 * i, 0.0, 0.3 * i, 0.0, 0.05 * i]))
        poses.append(T)
        meas.append(geo.plane_transform(T, plane_true))
    poses = jnp.stack(poses)
    meas = jnp.stack(meas)
    plane_bad = geo.plane_normalize(plane_true + jnp.array([0.05, -0.04, 0.02, 0.15]))
    state = lm.BAState(
        poses=poses,
        points=jnp.ones((2, 3)),
        planes=plane_bad[None],
        cuboid_pose=jnp.eye(4)[None],
        cuboid_scale=jnp.ones((1, 3)),
    )
    plane_obs = lm.PlaneFactors(
        kf=jnp.arange(3, dtype=jnp.int32),
        plane=jnp.zeros(3, jnp.int32),
        meas=meas,
        kind=jnp.zeros(3, jnp.int32),
        valid=jnp.ones(3, bool),
    )
    data = lm.make_ba_data(
        3, 2, 1, 1, CAM,
        plane_obs=plane_obs,
        pose_fixed=jnp.ones(3, bool),  # planes only
        point_active=jnp.zeros(2, bool),
        plane_active=jnp.ones(1, bool),
    )
    w = lm.BAWeights()
    state_opt, _, chi2s = lm.local_ba(state, data, w)
    got = np.asarray(state_opt.planes[0])
    want = np.asarray(plane_true)
    assert abs(np.dot(got[:3], want[:3])) > 0.9999, (got, want)
    assert abs(got[3] - want[3]) < 0.01


def test_local_ba_with_cuboid_bbox_factors():
    """A cuboid observed via 2D bboxes from several cameras improves."""
    cub_pose_true, cub_scale_true = geo.cuboid_from_minimal(
        jnp.array([0.5, 0.2, 6.0, 0.0, 0.0, 0.4, 0.6, 0.5, 0.8])
    )
    poses = []
    bboxes = []
    for i in range(4):
        T = geo.se3_exp(jnp.array([0.0, 0.03 * i, 0.0, 0.4 * i, 0.0, 0.0]))
        poses.append(T)
        bboxes.append(geo.cuboid_project_bbox(cub_pose_true, cub_scale_true, T, CAM.K))
    poses = jnp.stack(poses)
    bboxes = jnp.stack(bboxes)
    # perturb cuboid: yaw + translation + scale (respecting fixed height dims)
    cub_pose_bad, cub_scale_bad = geo.cuboid_oplus(
        cub_pose_true, cub_scale_true,
        jnp.array([0.0, 0.0, 0.1, 0.15, 0.0, -0.2, 0.05, -0.05, 0.08]),
    )
    state = lm.BAState(
        poses=poses,
        points=jnp.ones((2, 3)),
        planes=jnp.array([[0.0, 0.0, 1.0, 1.0]]),
        cuboid_pose=cub_pose_bad[None],
        cuboid_scale=cub_scale_bad[None],
    )
    cub_bbox = lm.CuboidBBoxFactors(
        kf=jnp.arange(4, dtype=jnp.int32),
        cub=jnp.zeros(4, jnp.int32),
        bbox=bboxes,
        weight=jnp.ones(4),
        valid=jnp.ones(4, bool),
    )
    data = lm.make_ba_data(
        4, 2, 1, 1, CAM,
        cub_bbox=cub_bbox,
        pose_fixed=jnp.ones(4, bool),
        point_active=jnp.zeros(2, bool),
        cuboid_active=jnp.ones(1, bool),
    )
    w = lm.BAWeights()
    state_opt, _, chi2s = lm.local_ba(state, data, w, phase1_iters=8, phase2_iters=12)
    bbox_err_before = jnp.abs(
        jax.vmap(lambda T, b: geo.cuboid_project_bbox(cub_pose_bad, cub_scale_bad, T, CAM.K) - b)(
            poses, bboxes
        )
    ).mean()
    bbox_err_after = jnp.abs(
        jax.vmap(
            lambda T, b: geo.cuboid_project_bbox(
                state_opt.cuboid_pose[0], state_opt.cuboid_scale[0], T, CAM.K
            )
            - b
        )(poses, bboxes)
    ).mean()
    assert float(bbox_err_after) < 0.2 * float(bbox_err_before), (
        float(bbox_err_before),
        float(bbox_err_after),
    )
