"""Unit tests for core geometry: exp/log roundtrips and reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.core import geometry as geo

KEY = jax.random.PRNGKey(0)


def random_se3(key, batch=()):
    k1, k2 = jax.random.split(key)
    w = jax.random.normal(k1, batch + (3,)) * 0.5
    t = jax.random.normal(k2, batch + (3,))
    return geo.se3_from_Rt(geo.so3_exp(w), t)


def test_so3_exp_log_roundtrip():
    k1, k2 = jax.random.split(KEY)
    direction = jax.random.normal(k1, (64, 3))
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    mag = jax.random.uniform(k2, (64, 1), minval=0.0, maxval=3.0)  # < pi
    w = direction * mag
    R = geo.so3_exp(w)
    w2 = geo.so3_log(R)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=2e-4)


def test_so3_exp_small_angle():
    w = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
    R = geo.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)
    assert np.all(np.isfinite(np.asarray(geo.so3_log(R))))


def test_so3_log_near_pi():
    axis = jnp.array([0.0, 1.0, 0.0])
    w = axis * (np.pi - 1e-4)
    R = geo.so3_exp(w)
    w2 = geo.so3_log(R)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=1e-3)


def test_se3_exp_log_roundtrip():
    xi = jax.random.normal(KEY, (32, 6)) * 0.7
    T = geo.se3_exp(xi)
    xi2 = geo.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=3e-4)


def test_se3_inv_compose():
    T = random_se3(KEY, (8,))
    eye = T @ geo.se3_inv(T)
    np.testing.assert_allclose(
        np.asarray(eye), np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5
    )


def test_quat_roundtrip():
    w = jax.random.normal(KEY, (32, 3))
    R = geo.so3_exp(w)
    R2 = geo.quat_to_R(geo.R_to_quat(R))
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)


def test_euler_zyx_roundtrip():
    rpy = jax.random.uniform(KEY, (16, 3), minval=-1.0, maxval=1.0)
    R = geo.euler_zyx_to_R(rpy[:, 0], rpy[:, 1], rpy[:, 2])
    r, p, y = geo.R_to_euler_zyx(R)
    np.testing.assert_allclose(np.asarray(rpy[:, 0]), np.asarray(r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rpy[:, 1]), np.asarray(p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rpy[:, 2]), np.asarray(y), atol=1e-5)


def test_sim3_exp_log_roundtrip():
    k1, k2 = jax.random.split(KEY)
    xi = jnp.concatenate(
        [
            jax.random.normal(k1, (16, 6)) * 0.5,
            jax.random.uniform(k2, (16, 1), minval=-0.4, maxval=0.4),
        ],
        axis=-1,
    )
    S = geo.sim3_exp(xi)
    xi2 = geo.sim3_log(S)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-3)


def test_sim3_inv():
    xi = jnp.array([[0.1, -0.2, 0.3, 1.0, 2.0, -1.0, 0.3]])
    S = geo.sim3_exp(xi)
    eye = S @ geo.sim3_inv(S)
    np.testing.assert_allclose(np.asarray(eye[0]), np.eye(4), atol=1e-5)


# ---------------------------------------------------------------------------
# Planes (reference semantics: G2O_Plane3D.h)
# ---------------------------------------------------------------------------


def test_plane_normalize_sign():
    c = jnp.array([0.0, 0.0, -2.0, -4.0])
    n = geo.plane_normalize(c)
    np.testing.assert_allclose(np.asarray(n), [0.0, 0.0, 1.0, 2.0], atol=1e-6)


def test_plane_transform_preserves_incidence():
    """Points on a plane stay on the transformed plane."""
    T = random_se3(KEY)
    c = geo.plane_normalize(jnp.array([0.3, -0.5, 0.8, 1.7]))
    # sample points on the plane: x with n.x + d = 0
    k = jax.random.split(KEY)[0]
    p = jax.random.normal(k, (10, 3))
    n, d = c[:3], c[3]
    p = p - (jnp.einsum("ij,j->i", p, n) + d)[:, None] * n[None, :]
    c2 = geo.plane_transform(T, c)
    p2 = geo.se3_apply(T, p)
    residual = jnp.einsum("ij,j->i", p2, c2[:3]) + c2[3]
    np.testing.assert_allclose(np.asarray(residual), 0.0, atol=1e-5)


def test_plane_ominus_zero_for_identical():
    c = geo.plane_normalize(jnp.array([0.3, -0.5, 0.8, 1.7]))
    err = geo.plane_ominus(c, c)
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-6)


def test_plane_ominus_distance_component():
    c1 = geo.plane_normalize(jnp.array([0.0, 0.0, 1.0, 2.0]))
    c2 = geo.plane_normalize(jnp.array([0.0, 0.0, 1.0, 2.5]))
    err = geo.plane_ominus(c1, c2)
    # distance() = -d, so distance difference = (-2.0) - (-2.5) = 0.5
    np.testing.assert_allclose(np.asarray(err[2]), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(err[:2]), 0.0, atol=1e-6)


def test_plane_ominus_ver_zero_for_perpendicular():
    c1 = geo.plane_normalize(jnp.array([1.0, 0.0, 0.0, 1.0]))
    c2 = geo.plane_normalize(jnp.array([0.0, 1.0, 0.0, 3.0]))
    err = geo.plane_ominus_ver(c1, c2)
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-5)


def test_plane_ominus_par_zero_for_parallel():
    c1 = geo.plane_normalize(jnp.array([0.5, 0.5, 0.7071, 1.0]))
    c2 = geo.plane_normalize(jnp.array([-0.5, -0.5, -0.7071, 3.0]))
    err = geo.plane_ominus_par(c1, c2)
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-5)


# ---------------------------------------------------------------------------
# Cuboids (reference semantics: g2o_cuboid.h/.cc)
# ---------------------------------------------------------------------------


def test_cuboid_corners_axis_aligned():
    pose = geo.se3_identity()
    scale = jnp.array([1.0, 2.0, 3.0])
    corners = geo.cuboid_corners(pose, scale)
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(np.asarray(corners[0]), [1.0, 2.0, -3.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(corners[6]), [-1.0, -2.0, 3.0], atol=1e-6)


def test_cuboid_minimal_roundtrip():
    v = jnp.array([1.0, -2.0, 0.5, 0.1, -0.2, 0.9, 0.5, 0.6, 0.7])
    pose, scale = geo.cuboid_from_minimal(v)
    v2 = geo.cuboid_to_minimal(pose, scale)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v2), atol=1e-5)


def test_cuboid_min_log_error_handles_yaw_ambiguity():
    """A cuboid rotated 90deg with swapped extents is the same cuboid -> ~0."""
    v = jnp.array([1.0, -2.0, 0.5, 0.0, 0.0, 0.3, 0.5, 0.8, 0.7])
    pose, scale = geo.cuboid_from_minimal(v)
    pose_b, scale_b = geo.cuboid_rotate(pose, scale, jnp.array(1))
    err_plain = geo.cuboid_log_error(pose, scale, pose_b, scale_b)
    err_min = geo.cuboid_min_log_error(pose, scale, pose_b, scale_b)
    assert np.linalg.norm(np.asarray(err_plain)) > 0.5
    np.testing.assert_allclose(np.asarray(err_min), 0.0, atol=1e-4)


def test_cuboid_point_boundary_error():
    pose = geo.se3_identity()
    scale = jnp.array([1.0, 1.0, 1.0])
    inside = geo.cuboid_point_boundary_error(pose, scale, jnp.array([0.5, 0.0, 0.0]), 1.0)
    np.testing.assert_allclose(np.asarray(inside), 0.0, atol=1e-6)
    near = geo.cuboid_point_boundary_error(pose, scale, jnp.array([1.5, 0.0, 0.0]), 1.0)
    np.testing.assert_allclose(np.asarray(near), [0.5, 0.0, 0.0], atol=1e-6)
    far = geo.cuboid_point_boundary_error(pose, scale, jnp.array([5.0, 0.0, 0.0]), 1.0)
    # capped at max_outside_margin_ratio * scale
    np.testing.assert_allclose(np.asarray(far), [1.0, 0.0, 0.0], atol=1e-6)


def test_cuboid_project_bbox():
    from tpuslam.core.camera import Camera

    cam = Camera.make(500.0, 500.0, 320.0, 240.0)
    pose, scale = geo.cuboid_from_minimal(
        jnp.array([0.0, 0.0, 5.0, 0.0, 0.0, 0.0, 0.5, 0.5, 0.5])
    )
    Tcw = geo.se3_identity()
    bbox = geo.cuboid_project_bbox(pose, scale, Tcw, cam.K)
    # symmetric cube ahead of camera: centered at principal point
    np.testing.assert_allclose(np.asarray(bbox[:2]), [320.0, 240.0], atol=1e-3)
    assert bbox[2] > 0 and bbox[3] > 0


def test_cuboid_oplus_fixheight():
    v = jnp.array([1.0, -2.0, 0.5, 0.0, 0.0, 0.3, 0.5, 0.8, 0.7])
    pose, scale = geo.cuboid_from_minimal(v)
    delta = jnp.array([0.3, -0.2, 0.1, 0.2, 0.5, -0.1, 0.01, 0.02, 0.03])
    new_pose, new_scale = geo.cuboid_oplus(pose, scale, delta, True, True)
    # world y (height in the reference's camera-ground convention) frozen
    np.testing.assert_allclose(float(new_pose[1, 3]), float(pose[1, 3]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_scale), np.asarray(scale + delta[6:]), atol=1e-6)
    # roll/pitch of the body z axis preserved relative to pose (yaw-only update)
    z_old = np.asarray(pose[:3, 2])
    z_new = np.asarray(new_pose[:3, 2])
    np.testing.assert_allclose(z_old, z_new, atol=1e-5)


def test_cuboid_face_planes_contain_faces():
    v = jnp.array([1.0, -2.0, 0.5, 0.1, -0.2, 0.9, 0.5, 0.6, 0.7])
    pose, scale = geo.cuboid_from_minimal(v)
    planes = geo.cuboid_face_planes(pose, scale)
    corners = geo.cuboid_corners(pose, scale)
    # every corner lies on exactly 3 of the 6 face planes
    dists = np.abs(
        np.asarray(corners) @ np.asarray(planes[:, :3]).T + np.asarray(planes[:, 3])
    )  # (8, 6)
    on_plane = (dists < 1e-4).sum(axis=1)
    np.testing.assert_array_equal(on_plane, np.full(8, 3))
