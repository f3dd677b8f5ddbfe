"""Structure-of-arrays map state — the TPU replacement for the reference's
pointer graph (Map / KeyFrame / MapPoint / MapPlane / MapCuboid, Map.h:73-97).

Everything lives in fixed-capacity device arrays with validity masks; the
host orchestrator owns scalar allocation counters (slots are allocated
monotonically, culling marks slots invalid).  There are no locks: the map is
a value — each pipeline stage takes a snapshot and returns a new one, which
replaces ``Map::mMutexMapUpdate`` (Map.h:67) with functional versioning.

Covisibility (KeyFrame::UpdateConnections, KeyFrame.cc:289-350) is never
stored: it is a rank-k matmul over the keyframe/point incidence matrix,
recomputed on demand — cheaper on the MXU than maintaining adjacency lists.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import Capacities


class MapState(NamedTuple):
    """The whole map as one pytree of padded arrays."""

    # keyframes ---------------------------------------------------------
    kf_pose: jnp.ndarray  # (K, 4, 4) world->camera
    kf_valid: jnp.ndarray  # (K,) bool
    kf_frame_id: jnp.ndarray  # (K,) int32 source frame index
    kf_uv: jnp.ndarray  # (K, N, 2) undistorted keypoints
    kf_octave: jnp.ndarray  # (K, N) int32
    kf_angle: jnp.ndarray  # (K, N)
    kf_desc: jnp.ndarray  # (K, N, 8) uint32
    kf_kp_valid: jnp.ndarray  # (K, N) bool
    kf_pt: jnp.ndarray  # (K, N) int32 map-point id per keypoint, -1 none
    kf_ur: jnp.ndarray  # (K, N) right-image u coord (stereo/RGBD), -1 mono
    kf_depth: jnp.ndarray  # (K, N) keypoint depth, -1 unknown
    # points ------------------------------------------------------------
    pt_pos: jnp.ndarray  # (P, 3)
    pt_valid: jnp.ndarray  # (P,) bool
    pt_desc: jnp.ndarray  # (P, 8) uint32 representative descriptor
    pt_normal: jnp.ndarray  # (P, 3) mean viewing direction
    pt_min_dist: jnp.ndarray  # (P,) scale-invariance band
    pt_max_dist: jnp.ndarray  # (P,)
    pt_first_kf: jnp.ndarray  # (P,) int32 creating KF SLOT (anchor lookups)
    pt_first_fid: jnp.ndarray  # (P,) int32 creating FRAME id (-1 unknown) —
    # the monotonic creation stamp for MapPointCulling's age gates; slot ids
    # are reused by the freelist and must never feed temporal logic
    pt_found: jnp.ndarray  # (P,) int32 times matched after prediction
    pt_visible: jnp.ndarray  # (P,) int32 times predicted visible
    # planes (MapPlane.h) -------------------------------------------------
    plane_coef: jnp.ndarray  # (Q, 4) world Hessian form
    plane_valid: jnp.ndarray  # (Q,) bool
    plane_obs_count: jnp.ndarray  # (Q,) int32
    # cuboids (MapCuboid.h) ------------------------------------------------
    cub_pose: jnp.ndarray  # (C, 4, 4) object->world (optimized estimate)
    cub_scale: jnp.ndarray  # (C, 3)
    cub_valid: jnp.ndarray  # (C,) bool
    cub_class: jnp.ndarray  # (C,) int32 semantic class id
    cub_obs_count: jnp.ndarray  # (C,) int32
    cub_first_kf: jnp.ndarray  # (C,) int32
    cub_last_kf: jnp.ndarray  # (C,) int32 most recent observing KF
    cub_good: jnp.ndarray  # (C,) bool survived the outlier check
    # per-KF plane detections (KeyFrame::mvPlaneCoefficients and the
    # direct / vertical / parallel association slots, KeyFrame.h:231-247)
    kf_plane_coef: jnp.ndarray  # (K, L, 4) camera-frame measurements
    kf_plane_valid: jnp.ndarray  # (K, L) bool
    kf_plane_map: jnp.ndarray  # (K, L) int32 direct map-plane id, -1 none
    kf_plane_ver: jnp.ndarray  # (K, L) int32 vertical-relation plane id
    kf_plane_par: jnp.ndarray  # (K, L) int32 parallel-relation plane id
    # per-KF cuboid detections (KeyFrame::local_cuboids, KeyFrame.h:221-227)
    kf_cub_local_pose: jnp.ndarray  # (K, O, 4, 4) measurement, camera frame
    kf_cub_local_scale: jnp.ndarray  # (K, O, 3)
    kf_cub_bbox: jnp.ndarray  # (K, O, 4) [cx, cy, w, h]
    kf_cub_corners: jnp.ndarray  # (K, O, 16) projected corners
    kf_cub_quality: jnp.ndarray  # (K, O) meas_quality
    kf_cub_valid: jnp.ndarray  # (K, O) bool
    kf_cub_map: jnp.ndarray  # (K, O) int32 associated cuboid landmark id
    kf_kp_cub: jnp.ndarray  # (K, N) int32 frame-local cuboid idx per keypoint
    # point -> cuboid landmark ownership (MapPoint::best_cuboid analogue)
    pt_cub: jnp.ndarray  # (P,) int32 owning cuboid landmark, -1 none
    pt_cub_votes: jnp.ndarray  # (P,) int32 vote count for that cuboid
    # place recognition (KeyFrameDatabase inverted file analogue)
    kf_bow: jnp.ndarray  # (K, W) tf-normalized BoW vectors


def empty_map(caps: Capacities) -> MapState:
    K, N, P, Q, C = (
        caps.max_keyframes,
        caps.max_keypoints,
        caps.max_points,
        caps.max_planes,
        caps.max_cuboids,
    )
    L = caps.max_planes_per_frame
    O = caps.max_cuboids_per_frame
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (K, 4, 4))
    return MapState(
        kf_pose=eye,
        kf_valid=jnp.zeros(K, bool),
        kf_frame_id=jnp.zeros(K, jnp.int32),
        kf_uv=jnp.zeros((K, N, 2), jnp.float32),
        kf_octave=jnp.zeros((K, N), jnp.int32),
        kf_angle=jnp.zeros((K, N), jnp.float32),
        kf_desc=jnp.zeros((K, N, 8), jnp.uint32),
        kf_kp_valid=jnp.zeros((K, N), bool),
        kf_pt=jnp.full((K, N), -1, jnp.int32),
        kf_ur=jnp.full((K, N), -1.0, jnp.float32),
        kf_depth=jnp.full((K, N), -1.0, jnp.float32),
        pt_pos=jnp.zeros((P, 3), jnp.float32),
        pt_valid=jnp.zeros(P, bool),
        pt_desc=jnp.zeros((P, 8), jnp.uint32),
        pt_normal=jnp.zeros((P, 3), jnp.float32),
        pt_min_dist=jnp.zeros(P, jnp.float32),
        pt_max_dist=jnp.full(P, 1e9, jnp.float32),
        pt_first_kf=jnp.zeros(P, jnp.int32),
        pt_first_fid=jnp.full(P, -1, jnp.int32),
        pt_found=jnp.ones(P, jnp.int32),
        pt_visible=jnp.ones(P, jnp.int32),
        plane_coef=jnp.tile(jnp.array([[0.0, 0.0, 1.0, 1.0]], jnp.float32), (Q, 1)),
        plane_valid=jnp.zeros(Q, bool),
        plane_obs_count=jnp.zeros(Q, jnp.int32),
        cub_pose=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (C, 4, 4)),
        cub_scale=jnp.ones((C, 3), jnp.float32),
        cub_valid=jnp.zeros(C, bool),
        cub_class=jnp.full(C, -1, jnp.int32),
        cub_obs_count=jnp.zeros(C, jnp.int32),
        cub_first_kf=jnp.zeros(C, jnp.int32),
        cub_last_kf=jnp.zeros(C, jnp.int32),
        cub_good=jnp.zeros(C, bool),
        kf_plane_coef=jnp.tile(jnp.array([[[0.0, 0.0, 1.0, 1.0]]], jnp.float32), (K, L, 1)),
        kf_plane_valid=jnp.zeros((K, L), bool),
        kf_plane_map=jnp.full((K, L), -1, jnp.int32),
        kf_plane_ver=jnp.full((K, L), -1, jnp.int32),
        kf_plane_par=jnp.full((K, L), -1, jnp.int32),
        kf_cub_local_pose=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (K, O, 4, 4)),
        kf_cub_local_scale=jnp.ones((K, O, 3), jnp.float32),
        kf_cub_bbox=jnp.zeros((K, O, 4), jnp.float32),
        kf_cub_corners=jnp.zeros((K, O, 16), jnp.float32),
        kf_cub_quality=jnp.full((K, O), 0.7, jnp.float32),
        kf_cub_valid=jnp.zeros((K, O), bool),
        kf_cub_map=jnp.full((K, O), -1, jnp.int32),
        kf_kp_cub=jnp.full((K, N), -1, jnp.int32),
        pt_cub=jnp.full(P, -1, jnp.int32),
        pt_cub_votes=jnp.zeros(P, jnp.int32),
        kf_bow=jnp.zeros((K, caps.vocab_words), jnp.float32),
    )


# ---------------------------------------------------------------------------
# Derived structure
# ---------------------------------------------------------------------------


def incidence(m: MapState):
    """(K, P) float32 observation incidence matrix from kf_pt."""
    K, N = m.kf_pt.shape
    P = m.pt_pos.shape[0]
    obs = jnp.zeros((K, P), jnp.float32)
    kf_rows = jnp.arange(K)[:, None] * jnp.ones((1, N), jnp.int32)
    pt_cols = jnp.where(m.kf_pt >= 0, m.kf_pt, P)  # invalid -> overflow col
    obs = jnp.pad(obs, ((0, 0), (0, 1))).at[kf_rows, pt_cols].add(1.0)[:, :P]
    return obs * m.kf_valid[:, None].astype(jnp.float32)


def covisibility(m: MapState):
    """(K, K) shared-map-point counts (KeyFrame::UpdateConnections weight)."""
    obs = incidence(m)
    cov = jnp.dot(obs, obs.T, preferred_element_type=jnp.float32)
    return cov - jnp.diag(jnp.diag(cov))


def point_obs_counts(m: MapState):
    """(P,) number of keyframes observing each point."""
    return jnp.sum(incidence(m) > 0, axis=0).astype(jnp.int32)


@jax.jit
def scene_median_depth(m: MapState, kf):
    """Median depth of keyframe ``kf``'s tracked points in its camera frame
    (KeyFrame::ComputeSceneMedianDepth(2), KeyFrame.cc:630-663) — feeds the
    baseline/medianDepth triangulation precondition (LocalMapping.cc:288-296).
    Returns +inf when the keyframe tracks no valid points."""
    row = m.kf_pt[kf]
    has = (row >= 0) & m.kf_kp_valid[kf] & m.pt_valid[jnp.clip(row, 0)]
    X = m.pt_pos[jnp.clip(row, 0)]
    T = m.kf_pose[kf]
    z = X @ T[2, :3] + T[2, 3]
    z = jnp.where(has, z, jnp.nan)
    med = jnp.nanmedian(z)
    return jnp.where(jnp.isnan(med), jnp.inf, med)


def local_window(m: MapState, center_kf: int, max_kfs: int, min_weight: float = 15.0):
    """Covisibility window around ``center_kf``: top ``max_kfs`` neighbours
    by shared points (weight >= min_weight, KeyFrame.cc:289-350 edge rule).

    Returns (kf_ids (max_kfs,), mask) with the center always first.
    """
    cov = covisibility(m)
    weights = cov[center_kf]
    weights = jnp.where(m.kf_valid, weights, -1.0)
    weights = weights.at[center_kf].set(jnp.inf)  # center first
    top_w, top_i = jax.lax.top_k(weights, max_kfs)
    mask = (top_w >= min_weight) | (jnp.arange(max_kfs) == 0)
    return top_i.astype(jnp.int32), mask


# ---------------------------------------------------------------------------
# Mutations (functional; slot indices supplied by the host orchestrator)
# ---------------------------------------------------------------------------


def add_keyframe(m: MapState, slot, pose, frame_id, uv, octave, angle, desc, kp_valid, pt_ids, ur, depth):
    return m._replace(
        kf_pose=m.kf_pose.at[slot].set(pose),
        kf_valid=m.kf_valid.at[slot].set(True),
        kf_frame_id=m.kf_frame_id.at[slot].set(frame_id),
        kf_uv=m.kf_uv.at[slot].set(uv),
        kf_octave=m.kf_octave.at[slot].set(octave),
        kf_angle=m.kf_angle.at[slot].set(angle),
        kf_desc=m.kf_desc.at[slot].set(desc),
        kf_kp_valid=m.kf_kp_valid.at[slot].set(kp_valid),
        kf_pt=m.kf_pt.at[slot].set(pt_ids),
        kf_ur=m.kf_ur.at[slot].set(ur),
        kf_depth=m.kf_depth.at[slot].set(depth),
    )


def add_points(m: MapState, slots, pos, desc, normal, min_dist, max_dist, first_kf, valid,
               first_fid=None):
    """Write a batch of new points at ``slots`` (invalid lanes write to a
    scratch slot ``P-1``... callers must pass slots < capacity and mask).

    ``first_fid``: the creating FRAME id per lane (monotonic creation stamp
    for MapPointCulling's age gates); defaults to -1 = "ancient, never
    age-culled" for callers that do not run the culling path."""
    P = m.pt_pos.shape[0]
    slots = jnp.where(valid, slots, P)  # out-of-range drops the write
    if first_fid is None:
        first_fid = jnp.full_like(first_kf, -1)
    return m._replace(
        pt_pos=_padset(m.pt_pos, slots, pos),
        pt_valid=_padset(m.pt_valid, slots, valid),
        pt_desc=_padset(m.pt_desc, slots, desc),
        pt_normal=_padset(m.pt_normal, slots, normal),
        pt_min_dist=_padset(m.pt_min_dist, slots, min_dist),
        pt_max_dist=_padset(m.pt_max_dist, slots, max_dist),
        pt_first_kf=_padset(m.pt_first_kf, slots, first_kf),
        pt_first_fid=_padset(m.pt_first_fid, slots, first_fid),
    )


def _padset(arr, idx, vals):
    """Scatter-set that silently drops out-of-range rows."""
    padded = jnp.concatenate([arr, jnp.zeros_like(arr[:1])], axis=0)
    return padded.at[idx].set(vals)[:-1]


def assign_observations(m: MapState, kf_slot, kp_idx, pt_ids, ok):
    """Set kf_pt[kf_slot, kp_idx] = pt_ids where ok (feature -> point links)."""
    N = m.kf_pt.shape[1]
    kp_idx = jnp.where(ok, kp_idx, N)
    row = jnp.pad(m.kf_pt[kf_slot], (0, 1)).at[kp_idx].set(pt_ids)[:-1]
    return m._replace(kf_pt=m.kf_pt.at[kf_slot].set(row))


def assign_observations_flat(m: MapState, kf_rows, kp_idx, pt_ids, ok):
    """Batched feature->point binding across MANY keyframes in one scatter:
    kf_pt[kf_rows[i], kp_idx[i]] = pt_ids[i] where ok[i].  All args flat and
    same length; out-of-range writes are dropped."""
    K, N = m.kf_pt.shape
    flat_idx = jnp.where(ok, kf_rows * N + kp_idx, K * N)
    flat = jnp.concatenate([m.kf_pt.reshape(-1), jnp.zeros(1, jnp.int32)])
    flat = flat.at[flat_idx].set(pt_ids)[:-1]
    return m._replace(kf_pt=flat.reshape(K, N))


def cull_points(m: MapState, kill_mask):
    """Mark points invalid and unlink them from every keyframe."""
    kill_of_obs = jnp.where(m.kf_pt >= 0, kill_mask[jnp.clip(m.kf_pt, 0)], False)
    return m._replace(
        pt_valid=m.pt_valid & ~kill_mask,
        kf_pt=jnp.where(kill_of_obs, -1, m.kf_pt),
    )


def keyframe_redundancy(m: MapState, th_obs: int = 3, scale_slack: int = 1,
                        n_octaves: int = 8):
    """(K,) fraction of each keyframe's tracked points that are redundant.

    A point is redundant for keyframe k when at least ``th_obs`` OTHER
    keyframes observe it at the same or finer scale (octave <= octave_k +
    ``scale_slack``) — LocalMapping::KeyFrameCulling's 90%% rule
    (LocalMapping.cc:672-736), batched: one per-octave observer histogram
    scatter + cumulative sum replaces the reference's per-point nested loop.
    """
    P = m.pt_pos.shape[0]
    pt = jnp.clip(m.kf_pt, 0)
    obs = (m.kf_pt >= 0) & m.kf_kp_valid & m.kf_valid[:, None] & m.pt_valid[pt]
    octv = jnp.clip(m.kf_octave, 0, n_octaves - 1)
    # hist[o, p] = number of keyframes observing p at octave o
    hist = jnp.zeros((n_octaves, P + 1), jnp.float32)
    hist = hist.at[octv.reshape(-1), jnp.where(obs, pt, P).reshape(-1)].add(1.0)
    cnt_le = jnp.cumsum(hist[:, :P], axis=0)  # observers at octave <= o
    o_idx = jnp.clip(octv + scale_slack, 0, n_octaves - 1)
    others = cnt_le[o_idx, pt] - 1.0  # exclude the keyframe's own observation
    red = obs & (others >= th_obs)
    n_obs = jnp.sum(obs.astype(jnp.float32), axis=1)
    n_red = jnp.sum(red.astype(jnp.float32), axis=1)
    return jnp.where(n_obs > 0, n_red / jnp.maximum(n_obs, 1.0), 0.0)


@functools.partial(jax.jit, static_argnames=("th_obs", "max_passes"))
def cull_keyframes_sequential(m: MapState, center_kf, redundancy_th,
                              th_obs: int = 3, max_passes: int = 3):
    """Up to ``max_passes`` SEQUENTIAL KeyFrameCulling passes in ONE device
    program (LocalMapping.cc:672-736): each pass recomputes redundancy (the
    reference's SetBadFlag updates observation counts mid-loop, so culling
    one keyframe lowers the others' redundancy), kills the single most
    redundant eligible keyframe, and stops early when none qualifies.
    Returns (map, n_culled)."""
    K = m.kf_pose.shape[0]

    def body(carry, _):
        m, done, n = carry
        red = keyframe_redundancy(m, th_obs=th_obs)
        cov_row = covisibility(m)[center_kf]
        elig = (
            (red >= redundancy_th) & (cov_row >= 15.0) & m.kf_valid
        )
        elig = elig.at[0].set(False).at[center_kf].set(False)
        any_elig = jnp.any(elig) & ~done
        victim = jnp.argmax(jnp.where(elig, red, -1.0))
        kill = jnp.zeros(K, bool).at[victim].set(any_elig)
        m2 = cull_keyframes(m, kill)
        m = jax.tree.map(lambda a, b: jnp.where(any_elig, b, a), m, m2)
        return (m, done | ~any_elig, n + any_elig.astype(jnp.int32)), None

    (m, _, n), _ = jax.lax.scan(
        body, (m, jnp.asarray(False), jnp.int32(0)), None, length=max_passes
    )
    return m, n


def cull_keyframes(m: MapState, kill_mask):
    """Remove keyframes (KeyFrame::SetBadFlag analogue): invalidate the rows
    and drop their point observations.  Points keep their positions —
    surviving observers still anchor them (the reference erases per-KF
    observations the same way; spanning-tree reparenting has no analogue here
    because covisibility is recomputed from the incidence matrix).

    A point that LOSES an observation here and is left with <= 2 observers
    dies with it — MapPoint::EraseObservation's kill rule (MapPoint.cc:
    nObs <= 2 -> SetBadFlag).  Without it, keyframe culling strands points
    with a single observer, and a 1-observation point is depth-unconstrained
    in BA: it slides freely along its ray, poisoning the map region (measured
    on the golden replay: the first keyframe's surviving points spread +-16 m
    along their rays in a 6 m room, which killed every loop-closure Sim3).

    Plane/cuboid landmark observation counters are NOT decremented: the
    reference's SetBadFlag (KeyFrame.cc:469-471) erases only MapPoint
    observations, so ``MapPlane``/``MapCuboid`` counters are lifetime
    statistics that feed the semantic cull gates monotonically — decrementing
    them here let keyframe culling starve cuboids below the <3-observation
    cull threshold (Tracking.cc:2286-2313) in redundant scenes.  The per-KF
    measurement links ARE cleared so a culled keyframe's plane/cuboid
    measurements never feed BA."""
    kill_col = kill_mask[:, None]
    P = m.pt_pos.shape[0]
    pt = jnp.clip(m.kf_pt, 0)
    lost_rows = kill_col & (m.kf_pt >= 0) & m.kf_kp_valid
    lost = jnp.zeros((P + 1,), bool).at[
        jnp.where(lost_rows, pt, P)
    ].set(True)[:P]
    m = m._replace(
        kf_valid=m.kf_valid & ~kill_mask,
        kf_kp_valid=m.kf_kp_valid & ~kill_col,
        kf_pt=jnp.where(kill_col, -1, m.kf_pt),
        kf_plane_valid=m.kf_plane_valid & ~kill_col,
        kf_plane_map=jnp.where(kill_col, -1, m.kf_plane_map),
        kf_plane_ver=jnp.where(kill_col, -1, m.kf_plane_ver),
        kf_plane_par=jnp.where(kill_col, -1, m.kf_plane_par),
        kf_cub_valid=m.kf_cub_valid & ~kill_col,
        kf_cub_map=jnp.where(kill_col, -1, m.kf_cub_map),
        kf_kp_cub=jnp.where(kill_col, -1, m.kf_kp_cub),
    )
    obs_after = point_obs_counts(m)
    return cull_points(m, lost & m.pt_valid & (obs_after <= 2))


def replace_point(m: MapState, old_id, new_id):
    """MapPoint::Replace — redirect all keyframe links old -> new."""
    return m._replace(
        kf_pt=jnp.where(m.kf_pt == old_id, new_id, m.kf_pt),
        pt_valid=m.pt_valid.at[old_id].set(False),
    )


def rescale_map(m: MapState, s):
    """Multiply every world-unit quantity by ``s`` — the TPU analogue of the
    reference's ground-height map rescaling (Tracking.cc:1335-1393, which
    rescales poses and points to metric every 10 KFs using a known camera
    height).  Here the scale comes from metric plane/cuboid measurements
    (frontend/tracking.py _update_metric_scale)."""
    new_pose = m.kf_pose.at[:, :3, 3].mul(s)
    return m._replace(
        kf_pose=new_pose,
        pt_pos=m.pt_pos * s,
        plane_coef=m.plane_coef.at[:, 3].mul(s),
        cub_pose=m.cub_pose.at[:, :3, 3].mul(s),
        cub_scale=m.cub_scale * s,
        pt_min_dist=m.pt_min_dist * s,
        pt_max_dist=m.pt_max_dist * s,
    )


def keypoint_of_point(m: MapState):
    """(K, P) int32: the keypoint index in keyframe k observing point p,
    -1 when k does not observe p — the inverse of ``kf_pt`` built with one
    scatter (replaces MapPoint::GetIndexInKeyFrame's per-point hash map)."""
    K, N = m.kf_pt.shape
    P = m.pt_pos.shape[0]
    linked = (m.kf_pt >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    cols = jnp.where(linked, m.kf_pt, P)
    kp_of = jnp.full((K, P + 1), -1, jnp.int32)
    kp_of = kp_of.at[
        jnp.arange(K)[:, None] * jnp.ones((1, N), jnp.int32), cols
    ].set(jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (K, N)))
    return kp_of[:, :P]


@functools.partial(jax.jit, static_argnames=("max_obs", "n_levels", "scale_factor"))
def update_point_stats(m: MapState, max_obs: int = 8, n_levels: int = 8,
                       scale_factor: float = 1.2):
    """Refresh representative descriptors, normals, and scale-invariance
    distance bands from the current observation links — batched over the
    whole map.

    * **Distinctive descriptor** (MapPoint::ComputeDistinctiveDescriptors,
      MapPoint.cc): gather up to ``max_obs`` observing keyframes per point,
      compute the pairwise Hamming matrix with XOR+popcount, and pick the
      observation whose MEDIAN distance to the others is smallest.
    * **Normal** (MapPoint::UpdateNormalAndDepth): mean unit direction from
      observing camera centers to the point.
    * **Scale band** (UpdateNormalAndDepth): from the anchor observation
      (``pt_first_kf`` when it still observes the point, else the strongest
      observer), ``max_dist = |X - C_ref| * s^octave_ref`` and
      ``min_dist = max_dist / s^(n_levels-1)`` — consumed by the
      predicted-octave search radius (ORBmatcher.cc:45-157 semantics).
    """
    K, N = m.kf_pt.shape
    P = m.pt_pos.shape[0]
    obs = incidence(m) > 0  # (K, P)
    centers = -jnp.einsum("kij,kj->ki", m.kf_pose[:, :3, :3].transpose(0, 2, 1), m.kf_pose[:, :3, 3])

    # normals: mean direction point -> camera center
    diff = m.pt_pos[None, :, :] - centers[:, None, :]  # (K, P, 3)
    dirs = diff / (jnp.linalg.norm(diff, axis=-1, keepdims=True) + 1e-9)
    w = obs.astype(jnp.float32)
    normal = jnp.einsum("kp,kpd->pd", w, dirs)
    nrm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = jnp.where(nrm > 1e-6, normal / nrm, m.pt_normal)

    # per-point observation gather: top max_obs observing keyframes
    M = min(max_obs, K)
    kp_of = keypoint_of_point(m)  # (K, P)
    val, kf_ids = jax.lax.top_k(obs.T.astype(jnp.float32), M)  # (P, M)
    obs_mask = val > 0
    p_idx = jnp.arange(P, dtype=jnp.int32)
    kp_ids = kp_of[kf_ids, p_idx[:, None]]  # (P, M)
    obs_mask = obs_mask & (kp_ids >= 0)
    cnt = jnp.sum(obs_mask, axis=1)  # (P,)

    # distinctive descriptor: median-Hamming argmin over the gathered set
    descs = m.kf_desc[kf_ids, jnp.clip(kp_ids, 0)]  # (P, M, 8) uint32
    x = descs[:, :, None, :] ^ descs[:, None, :, :]  # (P, M, M, 8)
    ham = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.float32)
    ham = jnp.where(obs_mask[:, None, :], ham, jnp.inf)  # invalid columns out
    srt = jnp.sort(ham, axis=-1)  # per row: valid distances first
    med_idx = jnp.maximum(cnt - 1, 0) // 2  # reference: idx = 0.5*(N-1)
    med = jnp.take_along_axis(
        srt, med_idx[:, None, None] * jnp.ones((1, M, 1), med_idx.dtype), axis=-1
    )[..., 0]  # (P, M)
    med = jnp.where(obs_mask, med, jnp.inf)
    best = jnp.argmin(med, axis=-1)  # (P,)
    new_desc = jnp.take_along_axis(descs, best[:, None, None], axis=1)[:, 0]
    has_obs = cnt > 0
    pt_desc = jnp.where(has_obs[:, None], new_desc, m.pt_desc)

    # scale band from the anchor observation
    ref_kf = jnp.clip(m.pt_first_kf, 0, K - 1)
    ref_kp = kp_of[ref_kf, p_idx]
    ref_ok = m.kf_valid[ref_kf] & (ref_kp >= 0)
    ref_kf = jnp.where(ref_ok, ref_kf, kf_ids[:, 0])
    ref_kp = jnp.where(ref_ok, ref_kp, kp_ids[:, 0])
    dist = jnp.linalg.norm(m.pt_pos - centers[ref_kf], axis=-1)
    level = m.kf_octave[ref_kf, jnp.clip(ref_kp, 0)].astype(jnp.float32)
    max_d = dist * scale_factor**level
    min_d = max_d / scale_factor ** float(n_levels - 1)
    pt_max = jnp.where(has_obs, max_d, m.pt_max_dist)
    pt_min = jnp.where(has_obs, min_d, m.pt_min_dist)

    return m._replace(
        pt_normal=normal, pt_desc=pt_desc, pt_min_dist=pt_min, pt_max_dist=pt_max
    )


def predict_scale_level(dist, max_dist, n_levels: int = 8, scale_factor: float = 1.2):
    """Predicted pyramid octave of a map point seen from distance ``dist``
    (MapPoint::PredictScale, MapPoint.cc: ceil(log(maxDist/dist)/log(s))).
    Points without a computed band (max_dist >= 1e8) predict level 0."""
    ratio = jnp.maximum(max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
    lvl = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / jnp.log(scale_factor))
    lvl = jnp.clip(lvl, 0, n_levels - 1)
    return jnp.where(max_dist >= 1e8, 0.0, lvl)
