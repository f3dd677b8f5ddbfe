"""Two-view initialization tests: general (F path) and planar (H path)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.core import geometry as geo
from tpuslam.frontend import initializer as ini

K = jnp.array([[500.0, 0.0, 320.0], [0.0, 500.0, 240.0], [0.0, 0.0, 1.0]])


def project(T, pts):
    pc = geo.se3_apply(T, pts)
    return jnp.stack([500.0 * pc[:, 0] / pc[:, 2] + 320.0, 500.0 * pc[:, 1] / pc[:, 2] + 240.0], -1)


def run_case(points, T2, noise=0.3, key=0):
    uv1 = project(geo.se3_identity(), points)
    uv2 = project(T2, points)
    k = jax.random.PRNGKey(key)
    uv1 = uv1 + jax.random.normal(k, uv1.shape) * noise
    uv2 = uv2 + jax.random.normal(jax.random.fold_in(k, 1), uv2.shape) * noise
    valid = jnp.ones(points.shape[0], bool)
    return ini.initialize_two_view(uv1, uv2, valid, K, jax.random.PRNGKey(42))


def check_pose(res, T2_true):
    R_est = np.asarray(res.T_21[:3, :3])
    R_true = np.asarray(T2_true[:3, :3])
    ang = np.degrees(
        np.arccos(np.clip((np.trace(R_est.T @ R_true) - 1) / 2, -1, 1))
    )
    t_est = np.array(res.T_21[:3, 3])
    t_true = np.array(T2_true[:3, 3])
    t_est = t_est / (np.linalg.norm(t_est) + 1e-12)
    t_true = t_true / (np.linalg.norm(t_true) + 1e-12)
    return ang, float(np.dot(t_est, t_true))


def test_general_scene_initializes():
    key = jax.random.PRNGKey(0)
    points = jax.random.uniform(
        key, (300, 3), minval=jnp.array([-3.0, -2.0, 4.0]), maxval=jnp.array([3.0, 2.0, 12.0])
    )
    T2 = geo.se3_inv(geo.se3_from_Rt(geo.so3_exp(jnp.array([0.02, 0.1, 0.01])), jnp.array([0.8, 0.05, 0.1])))
    res = run_case(points, T2)
    assert bool(res.ok), "initialization failed on general scene"
    ang, tdot = check_pose(res, T2)
    assert ang < 1.0, f"rotation error {ang} deg"
    assert tdot > 0.99, f"translation direction dot {tdot}"
    assert int(res.good.sum()) > 150


def test_planar_scene_uses_homography():
    """All points on one plane: F is degenerate, H path must win."""
    key = jax.random.PRNGKey(1)
    xy = jax.random.uniform(key, (300, 2), minval=-4.0, maxval=4.0)
    # plane z = 6 + 0.3x + 0.1y
    z = 6.0 + 0.3 * xy[:, 0] + 0.1 * xy[:, 1]
    points = jnp.concatenate([xy, z[:, None]], axis=-1)
    T2 = geo.se3_inv(geo.se3_from_Rt(geo.so3_exp(jnp.array([0.03, 0.08, 0.0])), jnp.array([0.7, 0.1, 0.05])))
    res = run_case(points, T2)
    assert bool(res.used_h), "homography path not selected on planar scene"
    assert bool(res.ok), "initialization failed on planar scene"
    ang, tdot = check_pose(res, T2)
    assert ang < 1.5, f"rotation error {ang} deg"
    assert tdot > 0.98, f"translation direction dot {tdot}"


def test_pure_rotation_rejected():
    """No translation -> no parallax -> init must be rejected."""
    key = jax.random.PRNGKey(2)
    points = jax.random.uniform(
        key, (300, 3), minval=jnp.array([-3.0, -2.0, 4.0]), maxval=jnp.array([3.0, 2.0, 12.0])
    )
    T2 = geo.se3_from_Rt(geo.so3_exp(jnp.array([0.0, 0.05, 0.0])), jnp.zeros(3))
    res = run_case(points, T2, noise=0.5)
    assert not bool(res.ok), "pure rotation should not initialize"
