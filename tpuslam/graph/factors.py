"""Factor library: residuals + Jacobians for the heterogeneous SLAM graph.

Each factor type in the reference's g2o graph becomes a *batched array of
factors* with a vmapped residual closure; Jacobians come from ``jax.jacfwd``
of the residual with respect to local tangent deltas evaluated at zero —
exact, and immune to the sign/convention bugs hand-derived Jacobians invite.

Factor types (reference citation for semantics):
  mono / stereo reprojection   EdgeSE3ProjectXYZ[OnlyPose], stereo variants
                               (Optimizer.cc:46-245, g2o types_six_dof_expmap)
  camera-plane                 EdgePlane / EdgeVerticalPlane / EdgeParallelPlane
                               (G2O_Plane3D.h:176-310)
  camera-cuboid 2D bbox        EdgeSE3CuboidProj (g2o_cuboid.cc:70-91)
  camera-cuboid corners        EdgeSE3CuboidCornerProj (g2o_cuboid.cc:103-120)
  camera-cuboid 3D             EdgeSE3Cuboid (g2o_cuboid.h:322-352)
  point-in-cuboid              EdgePointCuboidOnlyObject (g2o_cuboid.cc:132-160)
  cuboid-plane                 geometric residual the reference left dead at
                               G2O_Plane3D.h:348-400 (its live computeError is
                               the constant association measurement; we
                               implement the real face-plane ominus)

Update conventions (must match lm.py's retraction):
  pose:   T' = exp(delta) @ T        (left-multiplicative, 6-dim [w, v])
  point:  X' = X + delta             (3-dim)
  plane:  azimuth/elevation/distance oplus (3-dim, G2O_Plane3D.h:74-87)
  cuboid: right-multiplicative yaw-constrained twist + additive scale
          (9-dim, g2o_cuboid.cc:39-67)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import geometry as geo

# ---------------------------------------------------------------------------
# Local-parameterization retractions (shared with lm.py)
# ---------------------------------------------------------------------------


def retract_pose(T, delta6):
    return geo.se3_exp(delta6) @ T


def retract_point(X, delta3):
    return X + delta3


def retract_plane(c, delta3):
    """azimuth/elevation/distance update (G2O_Plane3D.h:74-87)."""
    az, el, dd = delta3[0], delta3[1], delta3[2]
    s, co = jnp.sin(el), jnp.cos(el)
    n_local = jnp.stack([co * jnp.cos(az), co * jnp.sin(az), s])
    R = geo.plane_rotation(c[:3])
    d = (-c[3]) + dd  # distance() = -coeffs(3)
    n_new = R @ n_local
    return geo.plane_normalize(jnp.concatenate([n_new, -d[None]]))


def retract_cuboid(pose, scale, delta9, fixrollpitch=True, fixheight=True):
    return geo.cuboid_oplus(pose, scale, delta9, fixrollpitch, fixheight)


# ---------------------------------------------------------------------------
# Residuals.  All are single-factor closures; callers vmap them.
# ---------------------------------------------------------------------------


def mono_residual(T_cw, X, uv, fx, fy, cx, cy):
    """Pixel reprojection residual (2,) — EdgeSE3ProjectXYZ semantics."""
    p = geo.se3_apply(T_cw, X)
    z = jnp.where(jnp.abs(p[2]) < 1e-6, 1e-6, p[2])
    u = fx * p[0] / z + cx
    v = fy * p[1] / z + cy
    return jnp.stack([u - uv[0], v - uv[1]])


def stereo_residual(T_cw, X, uvr, fx, fy, cx, cy, bf):
    """(u, v, u_right) residual (3,) — EdgeStereoSE3ProjectXYZ semantics."""
    p = geo.se3_apply(T_cw, X)
    z = jnp.where(jnp.abs(p[2]) < 1e-6, 1e-6, p[2])
    u = fx * p[0] / z + cx
    v = fy * p[1] / z + cy
    ur = u - bf / z
    return jnp.stack([u - uvr[0], v - uvr[1], ur - uvr[2]])


def plane_residual(T_cw, plane_w, meas_c):
    """(world plane seen from camera) ominus measured local plane (3,)
    — EdgePlane::computeError (G2O_Plane3D.h:181-192)."""
    local = geo.plane_transform(T_cw, plane_w)
    return geo.plane_ominus(local, meas_c)


def plane_ver_residual(T_cw, plane_w, meas_c):
    """2-dim vertical-relation residual (G2O_Plane3D.h:220-231)."""
    local = geo.plane_transform(T_cw, plane_w)
    return geo.plane_ominus_ver(local, meas_c)


def plane_par_residual(T_cw, plane_w, meas_c):
    """2-dim parallel-relation residual (G2O_Plane3D.h:279-290)."""
    local = geo.plane_transform(T_cw, plane_w)
    return geo.plane_ominus_par(local, meas_c)


def cuboid_bbox_residual(T_cw, cub_pose, cub_scale, bbox_meas, K):
    """Projected [cx, cy, w, h] minus measured bbox (4,)
    — EdgeSE3CuboidProj (g2o_cuboid.cc:70-91)."""
    return geo.cuboid_project_bbox(cub_pose, cub_scale, T_cw, K) - bbox_meas


def cuboid_corner_residual(T_cw, cub_pose, cub_scale, corners_meas16, K):
    """8 projected corners minus measurement (16,)
    — EdgeSE3CuboidCornerProj (g2o_cuboid.cc:103-120)."""
    pts = geo.cuboid_project_corners(cub_pose, cub_scale, T_cw, K)  # (8, 2)
    return pts.reshape(16) - corners_meas16


def cuboid_se3_residual(T_cw, cub_pose, cub_scale, meas_pose_c, meas_scale_c):
    """9-dim camera-cuboid 3D residual — EdgeSE3Cuboid (g2o_cuboid.h:331-340).

    The measurement is the cuboid in the *camera* frame; transform it into
    the world with Twc and take the yaw-ambiguity-minimal log error.
    """
    Twc = geo.se3_inv(T_cw)
    est_pose = Twc @ meas_pose_c
    return geo.cuboid_min_log_error(cub_pose, cub_scale, est_pose, meas_scale_c)


def point_cuboid_residual(
    cub_pose, cub_scale, points, points_mask, max_outside_margin_ratio, prior_weight
):
    """Mean hinge error of owned points vs the cuboid + scale prior (3,)
    — EdgePointCuboidOnlyObject (g2o_cuboid.cc:132-160).  ``points`` is a
    padded (P, 3) block; masked entries contribute zero."""
    errs = jax.vmap(
        lambda p: geo.cuboid_point_boundary_error(cub_pose, cub_scale, p, max_outside_margin_ratio)
    )(points)
    errs = jnp.abs(errs) * points_mask[:, None]
    count = jnp.maximum(jnp.sum(points_mask), 1.0)
    mean_err = jnp.sum(errs, axis=0) / count
    mean_err = mean_err / jnp.maximum(cub_scale, 1e-6)
    return mean_err + prior_weight * cub_scale


def cuboid_plane_residual(cub_pose, cub_scale, plane_w, face_idx):
    """Plane ominus the matched cuboid face plane (3,).

    The reference's live EdgeCuboidPlane::computeError returns the fixed
    association measurement (G2O_Plane3D.h:470-473 — dead-code residual at
    :348-400).  We implement the geometric version: the face is chosen at
    association time (semantic/associate.py) and stays fixed during the
    solve, matching the dead-code's gating."""
    faces = geo.cuboid_face_planes(cub_pose, cub_scale)  # (6, 4)
    face = faces[face_idx]
    return geo.plane_ominus(plane_w, face)


def se3_prior_residual(T_cw, meas_T_cw):
    """6-dim pose-graph / odometry prior: log(meas^-1 T)."""
    return geo.se3_log(geo.se3_inv(meas_T_cw) @ T_cw)


# ---------------------------------------------------------------------------
# Linearization helper
# ---------------------------------------------------------------------------


def linearize(res_fn, retractions, estimates, *args):
    """Residual + Jacobians of ``res_fn`` wrt tangent deltas at zero.

    ``retractions``: tuple of (retraction_fn, dim) per variable.
    ``estimates``: tuple of current variable values (may be tuples themselves
    for composite variables like cuboids — the retraction receives them
    splatted).

    Returns ``(r, jacs)`` where ``jacs[i]`` has shape ``r.shape + (dim_i,)``.
    """
    dims = [d for (_, d) in retractions]
    total = sum(dims)

    def at_delta(dz):
        vals = []
        off = 0
        for (ret, d), est in zip(retractions, estimates):
            delta = dz[off : off + d]
            off += d
            if isinstance(est, tuple):
                vals.append(ret(*est, delta))
            else:
                vals.append(ret(est, delta))
        flat_vals = []
        for v in vals:
            if isinstance(v, tuple):
                flat_vals.extend(v)
            else:
                flat_vals.append(v)
        return res_fn(*flat_vals, *args)

    zeros = jnp.zeros(total, dtype=jnp.float32)
    r = at_delta(zeros)
    J = jax.jacfwd(at_delta)(zeros)
    jacs = []
    off = 0
    for d in dims:
        jacs.append(J[..., off : off + d])
        off += d
    return r, jacs


def huber_weight(chi2, delta2):
    """IRLS weight for the Huber kernel with squared threshold ``delta2``
    (g2o RobustKernelHuber: quadratic below delta, linear above)."""
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
