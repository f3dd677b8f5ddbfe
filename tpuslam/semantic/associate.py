"""Plane / cuboid association and map updates.

Re-design of Tracking::AssociatePlanes (world-frame coefficient gating,
Tracking.cc:2586-2683), Tracking::AssociateCuboids (candidate gating by owned
map points, association by classname or shared-point voting, outlier cull,
Tracking.cc:2127-2343) and Tracking::AssociatePlanesAndCuboids (cuboid
face-plane matching, Tracking.cc:2685-2773).

Gating cores are jitted; the (tiny, <= 8-detection) allocation loops run on
host against pulled masks, mirroring how the reference mutates the map.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core import geometry as geo
from ..map import mapstate as ms
from .detect import CuboidDetections, PlaneDetections


# ---------------------------------------------------------------------------
# Planes
# ---------------------------------------------------------------------------


@jax.jit
def plane_association_scores(m: ms.MapState, Tcw, det: PlaneDetections):
    """World-frame gating of detections vs map planes (Tracking.cc:2597-2637).

    Returns (world_coefs (L, 4), direct (L,), ver (L,), par (L,)) where the
    id arrays hold the best-matching map plane per relation or -1.
    """
    world = geo.plane_transform(geo.se3_inv(Tcw), det.coef)  # (L, 4)
    world = jnp.where(world[..., 3:4] < 0, -world, world)
    n_f = world[:, None, :3]
    n_m = m.plane_coef[None, :, :3]
    angle = jnp.sum(n_f * n_m, axis=-1)  # (L, Q)
    dist = world[:, None, 3] - m.plane_coef[None, :, 3]
    valid_pair = det.valid[:, None] & m.plane_valid[None, :]

    direct_ok = valid_pair & (jnp.abs(dist) < 0.4) & (jnp.abs(angle) > 0.8)
    direct_cost = jnp.where(direct_ok, jnp.abs(dist), jnp.inf)
    direct = jnp.where(
        jnp.any(direct_ok, axis=1), jnp.argmin(direct_cost, axis=1), -1
    ).astype(jnp.int32)

    ver_ok = valid_pair & (jnp.abs(angle) < 0.08716)  # cos 85 deg
    ver_cost = jnp.where(ver_ok, jnp.abs(angle), jnp.inf)
    ver = jnp.where(jnp.any(ver_ok, axis=1), jnp.argmin(ver_cost, axis=1), -1).astype(jnp.int32)

    par_ok = valid_pair & (jnp.abs(angle) > 0.9962)  # cos 5 deg
    par_cost = jnp.where(par_ok, jnp.abs(angle), -jnp.inf)
    par = jnp.where(jnp.any(par_ok, axis=1), jnp.argmax(par_cost, axis=1), -1).astype(jnp.int32)
    # a direct match supersedes the structural relations for the same plane
    ver = jnp.where(direct >= 0, -1, ver)
    par = jnp.where(direct >= 0, -1, par)
    return world, direct, ver, par


def associate_planes(m: ms.MapState, kf_slot: int, det: PlaneDetections, n_planes: int):
    """Associate detections of ``kf_slot``; allocate new map planes for
    unmatched ones (Tracking.cc:2654-2680).  Returns (map, n_planes)."""
    L = det.coef.shape[0]
    Q = m.plane_coef.shape[0]
    world, direct, ver, par = plane_association_scores(m, m.kf_pose[kf_slot], det)
    direct_np = np.array(direct)
    valid_np = np.array(det.valid)
    world_np = np.array(world)
    for i in range(L):
        if valid_np[i] and direct_np[i] < 0 and n_planes < Q:
            # new plane landmark with the world coefficients of this view
            m = m._replace(
                plane_coef=m.plane_coef.at[n_planes].set(jnp.asarray(world_np[i])),
                plane_valid=m.plane_valid.at[n_planes].set(True),
            )
            direct_np[i] = n_planes
            n_planes += 1
    direct = jnp.asarray(direct_np)
    obs_add = jnp.zeros((Q + 1,), jnp.int32).at[
        jnp.where(det.valid & (direct >= 0), direct, Q)
    ].add(1)[:Q]
    m = m._replace(
        kf_plane_coef=m.kf_plane_coef.at[kf_slot].set(det.coef),
        kf_plane_valid=m.kf_plane_valid.at[kf_slot].set(det.valid),
        kf_plane_map=m.kf_plane_map.at[kf_slot].set(direct),
        kf_plane_ver=m.kf_plane_ver.at[kf_slot].set(ver),
        kf_plane_par=m.kf_plane_par.at[kf_slot].set(par),
        plane_obs_count=m.plane_obs_count + obs_add,
    )
    return m, n_planes


# ---------------------------------------------------------------------------
# Cuboids
# ---------------------------------------------------------------------------


@jax.jit
def keypoints_in_bboxes(uv, kp_valid, bboxes, bbox_valid):
    """(N,) frame-local cuboid index per keypoint; -1 if none or ambiguous
    (Tracking.cc:2072-2100: exactly one containing bbox)."""
    cx, cy, w, h = bboxes[:, 0], bboxes[:, 1], bboxes[:, 2], bboxes[:, 3]
    x1, y1 = cx - w / 2, cy - h / 2
    inside = (
        (uv[:, None, 0] >= x1[None])
        & (uv[:, None, 0] <= (x1 + w)[None])
        & (uv[:, None, 1] >= y1[None])
        & (uv[:, None, 1] <= (y1 + h)[None])
        & kp_valid[:, None]
        & bbox_valid[None, :]
    )
    count = jnp.sum(inside, axis=1)
    first = jnp.argmax(inside, axis=1).astype(jnp.int32)
    return jnp.where(count == 1, first, -1)


@jax.jit
def cuboid_point_votes(m: ms.MapState, kp_pt, kp_cub, n_dets: jnp.ndarray):
    """Per-detection owned-point count + per-landmark shared-point votes.

    owned[o] = # keypoints with a map point inside bbox o
    (MapCuboid::check_enough_map_points); votes[o, c] = # of those points
    already owned by landmark c (shared-point association,
    Tracking.cc:2219-2283)."""
    O = m.kf_cub_valid.shape[1]
    C = m.cub_valid.shape[0]
    has_pt = (kp_pt >= 0) & (kp_cub >= 0)
    owned = jnp.zeros((O + 1,), jnp.int32).at[jnp.where(has_pt, kp_cub, O)].add(1)[:O]
    pt_owner = jnp.where(has_pt, m.pt_cub[jnp.clip(kp_pt, 0)], -1)
    pair = jnp.where((pt_owner >= 0) & (kp_cub >= 0), kp_cub * C + pt_owner, O * C)
    votes = jnp.zeros((O * C + 1,), jnp.int32).at[pair].add(1)[: O * C].reshape(O, C)
    return owned, votes


def associate_cuboids(
    m: ms.MapState,
    kf_slot: int,
    det: CuboidDetections,
    kp_pt,
    n_cubs: int,
    cfg,
):
    """Full cuboid association for a new keyframe.  Returns (map, n_cubs).

    Mirrors Tracking.cc:2127-2343: candidate gate by >= 20 owned points, then
    classname match (flags.associate_cuboid_with_classname) or shared-point
    voting (>= 5 shared), else a new landmark; finally the outlier cull
    (< 3 observations once 15 KFs stale)."""
    sem = cfg.semantic
    C = m.cub_valid.shape[0]
    O = det.bbox.shape[0]
    kp_cub = keypoints_in_bboxes(
        m.kf_uv[kf_slot], m.kf_kp_valid[kf_slot], det.bbox, det.valid
    )
    owned, votes = cuboid_point_votes(m, kp_pt, kp_cub, det.valid.sum())
    owned_np = np.array(owned)
    votes_np = np.array(votes)
    det_valid = np.array(det.valid)
    det_class = np.array(det.classid)
    cub_class = np.array(m.cub_class)
    cub_valid = np.array(m.cub_valid)

    assoc = np.full(O, -1, np.int32)
    for o in range(O):
        if not det_valid[o] or owned_np[o] < sem.cuboid_min_own_points:
            continue
        target = -1
        if cfg.flags.associate_cuboid_with_classname:
            matches = np.where(cub_valid & (cub_class == det_class[o]))[0]
            if len(matches) > 0:
                target = int(matches[0])
        else:
            best = votes_np[o].copy()
            best[~cub_valid] = 0
            if best.max() >= sem.cuboid_shared_point_votes:
                target = int(best.argmax())
        if target < 0 and n_cubs < C:
            # new landmark initialized from the global detection
            target = n_cubs
            m = m._replace(
                cub_pose=m.cub_pose.at[target].set(det.global_pose[o]),
                cub_scale=m.cub_scale.at[target].set(det.global_scale[o]),
                cub_valid=m.cub_valid.at[target].set(True),
                cub_class=m.cub_class.at[target].set(det.classid[o]),
                cub_first_kf=m.cub_first_kf.at[target].set(kf_slot),
            )
            cub_valid[target] = True
            cub_class[target] = det_class[o]
            n_cubs += 1
        if target >= 0:
            assoc[o] = target
            m = m._replace(
                cub_obs_count=m.cub_obs_count.at[target].add(1),
                cub_last_kf=m.cub_last_kf.at[target].set(kf_slot),
            )

    # write per-KF detection storage
    assoc_j = jnp.asarray(assoc)
    m = m._replace(
        kf_cub_local_pose=m.kf_cub_local_pose.at[kf_slot].set(det.local_pose),
        kf_cub_local_scale=m.kf_cub_local_scale.at[kf_slot].set(det.local_scale),
        kf_cub_bbox=m.kf_cub_bbox.at[kf_slot].set(det.bbox),
        kf_cub_corners=m.kf_cub_corners.at[kf_slot].set(det.corners),
        kf_cub_quality=m.kf_cub_quality.at[kf_slot].set(det.quality),
        kf_cub_valid=m.kf_cub_valid.at[kf_slot].set(det.valid & (assoc_j >= 0)),
        kf_cub_map=m.kf_cub_map.at[kf_slot].set(assoc_j),
        kf_kp_cub=m.kf_kp_cub.at[kf_slot].set(kp_cub),
    )
    # point ownership: keypoints with map points inside an associated bbox
    # adopt that landmark (SetAsLandmark / MergeIntoLandmark potential->unique,
    # MapCuboid.cc:277-299; simplified to direct ownership + vote count)
    kp_pt_j = jnp.asarray(kp_pt)
    lm_of_kp = jnp.where(kp_cub >= 0, assoc_j[jnp.clip(kp_cub, 0)], -1)
    ok = (kp_pt_j >= 0) & (lm_of_kp >= 0)
    P = m.pt_cub.shape[0]
    tgt = jnp.where(ok, kp_pt_j, P)
    pt_cub = jnp.concatenate([m.pt_cub, jnp.zeros(1, jnp.int32)]).at[tgt].set(
        jnp.where(ok, lm_of_kp, -1)
    )[:P]
    same = pt_cub == m.pt_cub
    votes_new = jnp.where(same, m.pt_cub_votes, 0)
    votes_new = jnp.concatenate([votes_new, jnp.zeros(1, jnp.int32)]).at[tgt].add(1)[:P]
    m = m._replace(pt_cub=pt_cub, pt_cub_votes=votes_new)

    # outlier cull (Tracking.cc:2286-2313)
    stale = (~m.cub_good) & m.cub_valid & (
        m.cub_first_kf < kf_slot - sem.cuboid_cull_after_kfs
    )
    kill = stale & (m.cub_obs_count < sem.cuboid_cull_min_obs)
    promote = stale & ~kill
    m = m._replace(
        cub_valid=m.cub_valid & ~kill,
        cub_good=m.cub_good | promote,
        pt_cub=jnp.where(kill[jnp.clip(m.pt_cub, 0)] & (m.pt_cub >= 0), -1, m.pt_cub),
    )
    return m, n_cubs


# ---------------------------------------------------------------------------
# Cuboid-plane association (for the EdgeCuboidPlane analogue)
# ---------------------------------------------------------------------------


@jax.jit
def cuboid_plane_pairs(m: ms.MapState):
    """(C, Q) face index of the matched cuboid face per (cuboid, plane) pair,
    or -1.  Gate: |dist| < 0.2 and |cos| > 0.9397 (Tracking.cc:2736-2757)."""
    faces = jax.vmap(geo.cuboid_face_planes)(m.cub_pose, m.cub_scale)  # (C, 6, 4)
    n_f = faces[:, :, None, :3]
    n_p = m.plane_coef[None, None, :, :3]
    angle = jnp.sum(n_f * n_p, axis=-1)  # (C, 6, Q)
    dist = faces[:, :, None, 3] - m.plane_coef[None, None, :, 3]
    ok = (
        (jnp.abs(dist) < 0.2)
        & (jnp.abs(angle) > 0.9397)
        & m.cub_valid[:, None, None]
        & m.plane_valid[None, None, :]
    )
    cost = jnp.where(ok, jnp.abs(dist), jnp.inf)
    best_face = jnp.argmin(cost, axis=1).astype(jnp.int32)  # (C, Q)
    any_ok = jnp.any(ok, axis=1)
    return jnp.where(any_ok, best_face, -1)
