"""Batched Lie-group / landmark geometry for the TPU SLAM engine.

Everything is plain ``jnp`` arrays with leading batch dimensions so it can be
``vmap``-ed and jitted; there are no Python objects on the hot path.

Conventions
-----------
* SE3 is stored as a homogeneous ``(..., 4, 4)`` matrix ``T`` mapping points
  from the "source" into the "destination" frame (``Tcw`` maps world->camera).
* se3 tangent vectors are ``[omega(3), upsilon(3)]`` — rotation first — the
  same ordering as g2o's ``SE3Quat::exp`` which the reference optimizer uses
  (reference: Thirdparty/g2o types_six_dof_expmap / g2o_cuboid.cc:6-36).
* Planes are Hessian-form 4-vectors ``[nx, ny, nz, d]`` with unit normal and
  sign convention ``d >= 0`` (reference: G2O_Plane3D.h:120-125
  ``Plane3D::normalize``; the scalar "distance" is ``-d``,
  G2O_Plane3D.h:58-60).
* Cuboids are a 9-DoF landmark: object-to-world SE3 pose plus per-axis half
  extents (reference: g2o_cuboid.h:30-35).
* Sim3 is ``(s, R, t)`` packed as a ``(..., 4, 4)`` matrix with ``sR`` in the
  top-left block, used only by loop closing.

All math is float32 — TPU native.  f64 would be emulated and slow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# SO3
# ---------------------------------------------------------------------------


def so3_hat(w):
    """Skew-symmetric matrix of ``w`` (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w):
    """Rodrigues' formula, numerically safe around theta = 0."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    W = so3_hat(w)
    W2 = W @ W
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks.
    a = jnp.where(theta2 > 1e-12, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(theta2 > 1e-12, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R):
    """Inverse of :func:`so3_exp`; safe at theta = 0 and robust near pi.

    theta is computed as arctan2(|antisym|, trace) rather than arccos so the
    function stays DIFFERENTIABLE at theta = 0 — arccos has an infinite
    derivative at 1 which poisons jacfwd-based factor linearization
    (graph/factors.py) with NaNs.
    """
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # Antisymmetric part -> axis * sin(theta)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = 0.5 * jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-24)  # grad-safe at 0
    theta = jnp.arctan2(sin_t, cos_t)
    small = theta < 1e-5
    near_pi = theta > jnp.pi - 1e-3
    sin_t_safe = jnp.where(small | near_pi, 1.0, sin_t)
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * sin_t_safe))
    w_generic = scale[..., None] * v
    # Near pi the antisymmetric part vanishes; recover axis from symmetric part.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.clip((diag - cos_t[..., None]) / (1.0 - cos_t[..., None] + 1e-32), 0.0, None)
    axis = jnp.sqrt(axis2 + 1e-12)  # eps keeps the gradient finite at 0
    # fix signs using off-diagonal sums
    sx = jnp.where(v[..., 0] >= 0, 1.0, -1.0)
    sy = jnp.where((R[..., 0, 1] + R[..., 1, 0]) * sx >= 0, sx, -sx)
    sz = jnp.where((R[..., 0, 2] + R[..., 2, 0]) * sx >= 0, sx, -sx)
    axis = axis * jnp.stack([sx, sy, sz], axis=-1)
    w_pi = theta[..., None] * axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-32)
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def _so3_left_jacobian(w):
    """V such that exp([w, u]) has translation V @ u (rotation-first se3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    W = so3_hat(w)
    W2 = W @ W
    b = jnp.where(theta2 > 1e-12, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0)
    c = jnp.where(
        theta2 > 1e-12, (theta - jnp.sin(theta)) / (theta2 * theta), 1.0 / 6.0 - theta2 / 120.0
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def _so3_left_jacobian_inv(w):
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    W = so3_hat(w)
    W2 = W @ W
    half = theta * 0.5
    cot = jnp.where(
        theta2 > 1e-12,
        (1.0 - half * jnp.cos(half) / (jnp.sin(half) + 1e-32)) / (theta2 + 1e-32),
        1.0 / 12.0 + theta2 / 720.0,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot[..., None, None] * W2


# ---------------------------------------------------------------------------
# SE3
# ---------------------------------------------------------------------------


def se3_from_Rt(R, t):
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_identity(batch=(), dtype=jnp.float32):
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), batch + (4, 4))


def se3_R(T):
    return T[..., :3, :3]


def se3_t(T):
    return T[..., :3, 3]


def se3_exp(xi):
    """se3 exp with tangent ``[omega, upsilon]`` (rotation first, g2o order)."""
    w, u = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    V = _so3_left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, u)
    return se3_from_Rt(R, t)


def se3_log(T):
    """Inverse of :func:`se3_exp` -> ``[omega, upsilon]``."""
    w = so3_log(se3_R(T))
    Vinv = _so3_left_jacobian_inv(w)
    u = jnp.einsum("...ij,...j->...i", Vinv, se3_t(T))
    return jnp.concatenate([w, u], axis=-1)


def se3_inv(T):
    R = se3_R(T)
    t = se3_t(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return se3_from_Rt(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def se3_renorm(T):
    """Project the rotation block back onto SO(3) (row-wise Gram-Schmidt).

    Monocular reprojection is invariant to a uniform scaling of [R|t], so a
    det(R) != 1 drift is INVISIBLE to pose optimization — and the velocity
    model T_pred = (T_t inv(T_{t-1})) T_t amplifies any such drift
    exponentially (log-det obeys an unstable second-order recurrence) until
    the pose matrix collapses.  g2o never hits this because SE3Quat stores
    rotations as unit quaternions (Thirdparty/g2o se3quat.h); this is the
    matrix-form equivalent, applied wherever a pose enters an optimizer."""
    R = se3_R(T)
    r0 = R[..., 0, :]
    r0 = r0 / (jnp.linalg.norm(r0, axis=-1, keepdims=True) + 1e-12)
    r1 = R[..., 1, :]
    r1 = r1 - jnp.sum(r0 * r1, axis=-1, keepdims=True) * r0
    r1 = r1 / (jnp.linalg.norm(r1, axis=-1, keepdims=True) + 1e-12)
    r2 = jnp.cross(r0, r1)
    Rn = jnp.stack([r0, r1, r2], axis=-2)
    return se3_from_Rt(Rn, se3_t(T))


def se3_apply(T, p):
    """Transform points ``p`` (..., 3) by ``T`` (..., 4, 4)."""
    return jnp.einsum("...ij,...j->...i", se3_R(T), p) + se3_t(T)


def se3_exp_norollpitch(xi):
    """g2o ``exptwist_norollpitch``: yaw-only rotation but the full-SE3 V(omega).

    Used by the cuboid vertex update when roll/pitch are fixed
    (reference: g2o_cuboid.cc:6-36; caller zeroes omega_x, omega_y,
    g2o_cuboid.cc:48-53).
    """
    w, u = xi[..., :3], xi[..., 3:]
    yaw = w[..., 2]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(yaw)
    o = jnp.ones_like(yaw)
    R = jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )
    V = _so3_left_jacobian(w)
    # NOTE: the reference uses V=R when theta ~ 0 (g2o_cuboid.cc:24-27); V -> I
    # there as well so the smooth left-Jacobian is equivalent.
    t = jnp.einsum("...ij,...j->...i", V, u)
    return se3_from_Rt(R, t)


def quat_to_R(q):
    """Quaternion (x, y, z, w) -> rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0, 2.0 / (n + 1e-32), 0.0)
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def R_to_quat(R):
    """Rotation matrix -> quaternion (x, y, z, w), branch-free (Shepperd)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    qw = 0.5 * jnp.sqrt(jnp.clip(1.0 + tr, 1e-12, None))
    qx = 0.5 * jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-12, None))
    qy = 0.5 * jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, 1e-12, None))
    qz = 0.5 * jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, 1e-12, None))
    qx = qx * jnp.sign(jnp.where(m21 - m12 == 0, 1.0, m21 - m12))
    qy = qy * jnp.sign(jnp.where(m02 - m20 == 0, 1.0, m02 - m20))
    qz = qz * jnp.sign(jnp.where(m10 - m01 == 0, 1.0, m10 - m01))
    q = jnp.stack([qx, qy, qz, qw], axis=-1)
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-32)


def euler_zyx_to_R(roll, pitch, yaw):
    """ZYX euler (applied as Rz(yaw) Ry(pitch) Rx(roll)) -> rotation matrix.

    Matches ``zyx_euler_to_quat`` used by ``cuboid::fromMinimalVector``
    (reference: g2o_cuboid.h:43-48, matrix_utils.cc).
    """
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1),
            jnp.stack([-sp, cp * sr, cp * cr], axis=-1),
        ],
        axis=-2,
    )


def R_to_euler_zyx(R):
    """Rotation matrix -> (roll, pitch, yaw), matching g2o_cuboid.h:149-159."""
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return roll, pitch, yaw


# ---------------------------------------------------------------------------
# Sim3  (loop closing).  Stored as (..., 4, 4) with sR top-left.
# ---------------------------------------------------------------------------


def sim3_from_sRt(s, R, t):
    return se3_from_Rt(s[..., None, None] * R, t)


def sim3_scale(S):
    return jnp.linalg.norm(S[..., :3, 0], axis=-1)


def sim3_R(S):
    return S[..., :3, :3] / sim3_scale(S)[..., None, None]


def sim3_inv(S):
    s = sim3_scale(S)
    R = sim3_R(S)
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    t_inv = -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, S[..., :3, 3])
    return sim3_from_sRt(s_inv, Rt, t_inv)


def sim3_apply(S, p):
    return jnp.einsum("...ij,...j->...i", S[..., :3, :3], p) + S[..., :3, 3]


def sim3_log(S):
    """Sim3 log -> ``[omega(3), upsilon(3), sigma(1)]`` (7,)."""
    s = sim3_scale(S)
    sigma = jnp.log(s)
    R = sim3_R(S)
    w = so3_log(R)
    # W = integral of exp(sigma a) exp(w a) da, solved via the closed form in
    # Strasdat's thesis; here a cheap, accurate series/quadrature hybrid:
    t = S[..., :3, 3]
    W = _sim3_W(w, sigma)
    u = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([w, u, sigma[..., None]], axis=-1)


def sim3_exp(xi):
    """Inverse of :func:`sim3_log`."""
    w, u, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(w)
    W = _sim3_W(w, sigma)
    t = jnp.einsum("...ij,...j->...i", W, u)
    return sim3_from_sRt(jnp.exp(sigma), R, t)


def _sim3_W(w, sigma):
    """Sim3 translation matrix: W = C*I + A*hat(w) + B*hat(w)^2.

    Closed form per Strasdat's thesis (the same one g2o's sim3 uses); all four
    small-angle / small-scale branches handled with ``where`` so it is
    batch- and jit-safe.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    s = jnp.exp(sigma)
    Wm = so3_hat(w)
    W2 = Wm @ Wm
    eps = 1e-5
    small_sigma = jnp.abs(sigma) < eps
    small_theta = theta < eps
    sigma_safe = jnp.where(small_sigma, 1.0, sigma)
    theta_safe = jnp.where(small_theta, 1.0, theta)
    theta2_safe = jnp.where(small_theta, 1.0, theta2)

    # sigma ~ 0 (pure SE3 left-Jacobian coefficients)
    A_s0 = jnp.where(small_theta, 0.5, (1.0 - jnp.cos(theta_safe)) / theta2_safe)
    B_s0 = jnp.where(
        small_theta, 1.0 / 6.0, (theta_safe - jnp.sin(theta_safe)) / (theta2_safe * theta_safe)
    )
    C_s0 = jnp.ones_like(sigma)

    # generic sigma
    C_g = (s - 1.0) / sigma_safe
    # theta ~ 0
    A_t0 = ((sigma_safe - 1.0) * s + 1.0) / (sigma_safe * sigma_safe)
    B_t0 = ((0.5 * sigma_safe * sigma_safe - sigma_safe + 1.0) * s - 1.0) / (sigma_safe ** 3)
    # generic theta
    a_ = s * jnp.sin(theta_safe)
    b_ = s * jnp.cos(theta_safe)
    c_ = theta2_safe + sigma_safe * sigma_safe
    A_g = (a_ * sigma_safe + (1.0 - b_) * theta_safe) / (theta_safe * c_)
    B_g = (C_g - ((b_ - 1.0) * sigma_safe + a_ * theta_safe) / c_) / theta2_safe

    A = jnp.where(small_sigma, A_s0, jnp.where(small_theta, A_t0, A_g))
    B = jnp.where(small_sigma, B_s0, jnp.where(small_theta, B_t0, B_g))
    C = jnp.where(small_sigma, C_s0, C_g)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), Wm.shape)
    return C[..., None, None] * eye + A[..., None, None] * Wm + B[..., None, None] * W2


# ---------------------------------------------------------------------------
# Planes — Hessian form [n, d], unit n, d >= 0.
# ---------------------------------------------------------------------------


def plane_normalize(c):
    """Scale to unit normal, flip so c[3] >= 0 (G2O_Plane3D.h:120-125)."""
    n = jnp.linalg.norm(c[..., :3], axis=-1, keepdims=True)
    c = c / (n + 1e-32)
    return jnp.where(c[..., 3:4] < 0.0, -c, c)


def plane_transform(T, c):
    """Transform plane coefficients by point-transform ``T``.

    Matches ``Isometry3D * Plane3D`` (G2O_Plane3D.h:131-140): n' = R n,
    d' = d - t . n', sign-normalized.  If ``T`` maps world->camera then a
    world plane becomes a camera-frame plane.
    """
    n2 = jnp.einsum("...ij,...j->...i", se3_R(T), c[..., :3])
    d2 = c[..., 3] - jnp.sum(se3_t(T) * n2, axis=-1)
    c2 = jnp.concatenate([n2, d2[..., None]], axis=-1)
    return jnp.where(c2[..., 3:4] < 0.0, -c2, c2)


def _azimuth(v):
    return jnp.arctan2(v[..., 1], v[..., 0])


def _elevation(v):
    return jnp.arctan2(v[..., 2], jnp.linalg.norm(v[..., :2], axis=-1))


def plane_rotation(v):
    """Rotation sending (1,0,0) to direction ``v`` (G2O_Plane3D.h:66-72)."""
    az = _azimuth(v)
    el = _elevation(v)
    cz, sz = jnp.cos(az), jnp.sin(az)
    cy, sy = jnp.cos(-el), jnp.sin(-el)
    z = jnp.zeros_like(az)
    o = jnp.ones_like(az)
    Rz = jnp.stack(
        [
            jnp.stack([cz, -sz, z], axis=-1),
            jnp.stack([sz, cz, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )
    Ry = jnp.stack(
        [
            jnp.stack([cy, z, sy], axis=-1),
            jnp.stack([z, o, z], axis=-1),
            jnp.stack([-sy, z, cy], axis=-1),
        ],
        axis=-2,
    )
    return Rz @ Ry


def plane_ominus(c_self, c_other):
    """3-DoF residual between two planes (G2O_Plane3D.h:89-95).

    Rotates ``other``'s normal into the frame whose x-axis is ``self``'s
    normal and returns ``[azimuth, elevation, distance_self - distance_other]``
    where distance = -d (G2O_Plane3D.h:58-60).
    """
    R = jnp.swapaxes(plane_rotation(c_self[..., :3]), -1, -2)
    n = jnp.einsum("...ij,...j->...i", R, c_other[..., :3])
    d = (-c_self[..., 3]) - (-c_other[..., 3])
    return jnp.stack([_azimuth(n), _elevation(n), d], axis=-1)


def plane_ominus_ver(c_self, c_other):
    """2-DoF residual for perpendicular planes (G2O_Plane3D.h:97-106).

    Rotates self's normal 90 deg about the mutual cross axis, then measures
    other's normal in that frame; zero when the planes are exactly vertical.
    """
    n_self = c_self[..., :3]
    n_other = c_other[..., :3]
    v = jnp.cross(n_self, n_other)
    axis = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-32)
    half = jnp.pi / 4.0
    q = jnp.concatenate(
        [jnp.sin(half) * axis, jnp.broadcast_to(jnp.cos(half), axis[..., :1].shape)], axis=-1
    )
    b = jnp.einsum("...ij,...j->...i", quat_to_R(q), n_self)
    R = jnp.swapaxes(plane_rotation(b), -1, -2)
    n = jnp.einsum("...ij,...j->...i", R, n_other)
    return jnp.stack([_azimuth(n), _elevation(n)], axis=-1)


def plane_ominus_par(c_self, c_other):
    """2-DoF residual for parallel planes (G2O_Plane3D.h:108-117)."""
    n_self = c_self[..., :3]
    n_other = c_other[..., :3]
    dot = jnp.sum(n_self * n_other, axis=-1, keepdims=True)
    nor = jnp.where(dot < 0, -n_self, n_self)
    R = jnp.swapaxes(plane_rotation(nor), -1, -2)
    n = jnp.einsum("...ij,...j->...i", R, n_other)
    return jnp.stack([_azimuth(n), _elevation(n)], axis=-1)


# ---------------------------------------------------------------------------
# Cuboids — 9 DoF: object-to-world SE3 pose + half extents (3,)
# Packed as a 13-vector [T.flatten-free]: we keep (pose(4,4), scale(3)) pairs.
# ---------------------------------------------------------------------------

_CORNER_SIGNS = jnp.array(
    # columns of g2o_cuboid.h:200-204 (x; y; z signs per corner), transposed
    [
        [1, 1, -1],
        [1, -1, -1],
        [-1, -1, -1],
        [-1, 1, -1],
        [1, 1, 1],
        [1, -1, 1],
        [-1, -1, 1],
        [-1, 1, 1],
    ],
    dtype=jnp.float32,
)


def cuboid_corners(pose, scale):
    """8 corners in world frame, (..., 8, 3) (g2o_cuboid.h:198-207)."""
    local = _CORNER_SIGNS * scale[..., None, :]
    return se3_apply(pose[..., None, :, :], local)


def cuboid_from_minimal(v9):
    """[x y z roll pitch yaw sx sy sz] -> (pose, scale) (g2o_cuboid.h:43-48)."""
    R = euler_zyx_to_R(v9[..., 3], v9[..., 4], v9[..., 5])
    return se3_from_Rt(R, v9[..., :3]), v9[..., 6:9]


def cuboid_to_minimal(pose, scale):
    roll, pitch, yaw = R_to_euler_zyx(se3_R(pose))
    return jnp.concatenate(
        [se3_t(pose), jnp.stack([roll, pitch, yaw], axis=-1), scale], axis=-1
    )


def cuboid_rotate(pose, scale, k):
    """Rotate the cuboid front face by ``k * 90deg`` about body z.

    Swaps x/y half extents for odd ``k`` (g2o_cuboid.h:112-122).  ``k`` is a
    traced int array in {-1, 0, 1, 2}.
    """
    yaw = k.astype(pose.dtype) * (jnp.pi / 2.0)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(yaw)
    o = jnp.ones_like(yaw)
    Rz = jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )
    rot = se3_from_Rt(Rz, jnp.zeros(yaw.shape + (3,), dtype=pose.dtype))
    new_pose = pose @ rot
    odd = (jnp.abs(k) % 2 == 1)[..., None]
    new_scale = jnp.where(
        odd, jnp.stack([scale[..., 1], scale[..., 0], scale[..., 2]], axis=-1), scale
    )
    return new_pose, new_scale


def cuboid_log_error(pose_a, scale_a, pose_b, scale_b):
    """9-vector [se3 log of pose_b^-1 pose_a, scale_a - scale_b]
    (g2o_cuboid.h:73-80)."""
    pose_diff = se3_inv(pose_b) @ pose_a
    return jnp.concatenate([se3_log(pose_diff), scale_a - scale_b], axis=-1)


def cuboid_min_log_error(pose_a, scale_a, pose_b, scale_b):
    """Min-over-4-yaw-rotations log error (g2o_cuboid.h:83-109).

    Rotates cuboid ``b`` by {-90, 0, 90, 180} deg about its z axis and returns
    the error vector with the smallest norm, resolving front-face ambiguity.
    """
    ks = jnp.array([-1, 0, 1, 2], dtype=jnp.int32)

    def err_for(k):
        pb, sb = cuboid_rotate(pose_b, scale_b, k)
        return cuboid_log_error(pose_a, scale_a, pb, sb)

    errs = jax.vmap(err_for)(ks)  # (4, ..., 9)
    norms = jnp.linalg.norm(errs, axis=-1)
    best = jnp.argmin(norms, axis=0)
    return jnp.take_along_axis(errs, best[None, ..., None], axis=0)[0]


def cuboid_project_corners(pose, scale, Tcw, K):
    """Project the 8 corners into the image, (..., 8, 2)
    (g2o_cuboid.h:210-215)."""
    corners_w = cuboid_corners(pose, scale)
    cam = se3_apply(Tcw[..., None, :, :], corners_w)
    uvw = jnp.einsum("...ij,...kj->...ki", K, cam)
    return uvw[..., :2] / (uvw[..., 2:3] + 1e-32)


def cuboid_project_bbox(pose, scale, Tcw, K):
    """Projected bbox as [cx, cy, w, h] (g2o_cuboid.h:218-234)."""
    pts = cuboid_project_corners(pose, scale, Tcw, K)
    topleft = jnp.min(pts, axis=-2)
    bottomright = jnp.max(pts, axis=-2)
    center = 0.5 * (topleft + bottomright)
    wh = bottomright - topleft
    return jnp.concatenate([center, wh], axis=-1)


def cuboid_point_boundary_error(pose, scale, point, max_outside_margin_ratio):
    """Hinge penalty for a point outside the cuboid (g2o_cuboid.h:237-255)."""
    local = jnp.abs(se3_apply(se3_inv(pose), point))
    over = local - scale
    capped = jnp.minimum(over, max_outside_margin_ratio * scale)
    return jnp.where(local < scale, 0.0, capped)


def cuboid_oplus(pose, scale, delta9, fixrollpitch=True, fixheight=True):
    """Right-multiplicative cuboid update (g2o_cuboid.cc:39-67).

    With ``fixrollpitch`` the rotation update is yaw-only
    (``exptwist_norollpitch`` with omega_xy zeroed); with ``fixheight`` the
    world-frame y translation is frozen (the reference's ground plane is y-up
    in camera coords, g2o_cuboid.cc:58-59).
    """
    if fixrollpitch:
        d = delta9.at[..., 0].set(0.0).at[..., 1].set(0.0)
        new_pose = pose @ se3_exp_norollpitch(d[..., :6])
    else:
        new_pose = pose @ se3_exp(delta9[..., :6])
    if fixheight:
        t = new_pose[..., :3, 3].at[..., 1].set(pose[..., 1, 3])
        new_pose = new_pose.at[..., :3, 3].set(t)
    new_scale = scale + delta9[..., 6:9]
    return new_pose, new_scale


def cuboid_face_planes(pose, scale):
    """The 6 face planes of a cuboid in Hessian form, (..., 6, 4).

    Re-derivation of the face-plane construction the reference uses for
    cuboid-plane association (Tracking.cc:2719-2734, G2O_Plane3D.h:365-390):
    face normals are the body axes of the pose rotation; each axis yields two
    opposite faces through corners 0 and 6.
    """
    R = se3_R(pose)  # columns are body axes
    corners = cuboid_corners(pose, scale)
    c0 = corners[..., 0, :]
    c6 = corners[..., 6, :]
    planes = []
    for k in range(6):
        axis = R[..., :, k % 3]
        anchor = c0 if k < 3 else c6
        d = -jnp.sum(axis * anchor, axis=-1)
        planes.append(jnp.concatenate([axis, d[..., None]], axis=-1))
    return plane_normalize(jnp.stack(planes, axis=-2))
