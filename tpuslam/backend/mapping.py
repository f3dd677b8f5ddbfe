"""Local mapping device programs: triangulation of new points, duplicate
fusion, and point culling.

Re-design of LocalMapping.cc: ``CreateNewMapPoints`` (epipolar search +
SVD triangulation + cheirality/reproj/scale checks, LocalMapping.cc:244-492),
``MapPointCulling`` (found/visible ratio + observation minimums,
LocalMapping.cc:207-242), ``SearchInNeighbors`` fuse (LocalMapping.cc:494-574).
Each is one jitted static-shape program per keyframe pair; the host
orchestrator allocates slots.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import geometry as geo
from ..kernels import match as km
from ..frontend.initializer import triangulate
from ..map import mapstate as ms


class TriangulationResult(NamedTuple):
    pos: jnp.ndarray  # (N, 3) new point positions (world)
    kp1: jnp.ndarray  # (N,) keypoint index in kf1
    kp2: jnp.ndarray  # (N,) keypoint index in kf2
    ok: jnp.ndarray  # (N,) bool


def fundamental_between(T1, T2, K):
    """F12 such that x1^T F12 x2 = 0, i.e. the epipolar line of a view-1
    point in image 2 is F12^T x1 (LocalMapping::ComputeF12,
    LocalMapping.cc:576-593; same convention as CheckDistEpipolarLine,
    ORBmatcher.cc:640-654)."""
    T12 = T1 @ geo.se3_inv(T2)  # frame2 -> frame1 (camera coords)
    # NOTE: ORB-SLAM2 computes F12 with R12 = R1 R2^T, t12 = -R12 t2 + t1
    R12 = T12[:3, :3]
    t12 = T12[:3, 3]
    E = geo.so3_hat(t12) @ R12
    Kinv = jnp.linalg.inv(K)
    return Kinv.T @ E @ Kinv


@functools.partial(jax.jit, static_argnames=("scale_factor",))
def create_new_map_points(
    m: ms.MapState, kf1, kf2, K, scale_factor: float = 1.2
):
    """Triangulate new points between keyframes ``kf1`` (new) and ``kf2``.

    Only keypoints not yet bound to a map point participate.  Checks follow
    LocalMapping.cc:244-492: positive depth in both views, parallax,
    chi2 < 5.991 sigma^2 reprojection in both views, scale consistency.
    """
    N = m.kf_pt.shape[1]
    T1 = m.kf_pose[kf1]
    T2 = m.kf_pose[kf2]
    free1 = m.kf_kp_valid[kf1] & (m.kf_pt[kf1] < 0)
    free2 = m.kf_kp_valid[kf2] & (m.kf_pt[kf2] < 0)

    # baseline check vs scene depth is the caller's job (host has medianDepth)
    F12 = fundamental_between(T1, T2, K)
    sigma2 = scale_factor ** (2.0 * m.kf_octave[kf2].astype(jnp.float32))
    # NOTE the argument is F12 itself: epipolar_gate builds the line in image
    # 2 as F^T x1, matching fundamental_between's x1^T F12 x2 = 0 convention
    # (a .T here silently voids the gate — wrong lines admit only the
    # near-zero-baseline pairs where the gate is vacuous)
    gate = km.epipolar_gate(m.kf_uv[kf1], m.kf_uv[kf2], F12, jnp.sqrt(sigma2))
    gate = gate & km.octave_gate(m.kf_octave[kf1], m.kf_octave[kf2], -2, 2)
    # epipole-distance gate (SearchForTriangulation, ORBmatcher.cc:688-700):
    # a kf2 keypoint within 10*scale px of kf1's camera center projected into
    # kf2 has ~zero parallax along the dominant (forward) motion direction —
    # such "matches" are the main source of behind-camera triangulations
    c1w = -T1[:3, :3].T @ T1[:3, 3]
    c_in2 = T2[:3, :3] @ c1w + T2[:3, 3]
    safe_z = jnp.where(jnp.abs(c_in2[2]) < 1e-6, 1e-6, c_in2[2])
    ep = jnp.stack([K[0, 0] * c_in2[0] / safe_z + K[0, 2],
                    K[1, 1] * c_in2[1] / safe_z + K[1, 2]])
    dist_ep2 = jnp.sum((m.kf_uv[kf2] - ep[None, :]) ** 2, axis=-1)
    scale2 = scale_factor ** m.kf_octave[kf2].astype(jnp.float32)
    far_from_epipole = dist_ep2 >= 100.0 * scale2
    # behind-camera epipoles (c_in2.z < 0) never project into the image
    far_from_epipole = far_from_epipole | (c_in2[2] < 0)
    gate = gate & far_from_epipole[None, :]
    idx, dist, ok = km.match_descriptors(
        m.kf_desc[kf1], m.kf_desc[kf2], free1, free2, gate_mask=gate,
        max_dist=50.0, ratio=0.8, mutual=True,
    )
    ok = km.rotation_consistency(m.kf_angle[kf1], m.kf_angle[kf2], idx, ok)
    # mutual best in the gated sense
    uv1 = m.kf_uv[kf1]
    uv2 = m.kf_uv[kf2][idx]

    pts = triangulate(T1, T2, uv1, uv2, K)
    finite = jnp.all(jnp.isfinite(pts), axis=-1)
    pc1 = geo.se3_apply(T1, pts)
    pc2 = geo.se3_apply(T2, pts)
    # parallax between viewing rays
    c1 = -T1[:3, :3].T @ T1[:3, 3]
    c2 = -T2[:3, :3].T @ T2[:3, 3]
    r1 = pts - c1
    r2 = pts - c2
    d1 = jnp.linalg.norm(r1, axis=-1)
    d2 = jnp.linalg.norm(r2, axis=-1)
    cosp = jnp.sum(r1 * r2, axis=-1) / (d1 * d2 + 1e-12)

    def reproj_err(pc, uv):
        q = (K @ pc.T).T
        q = q[:, :2] / jnp.where(jnp.abs(q[:, 2:3]) < 1e-12, 1e-12, q[:, 2:3])
        return jnp.sum((q - uv) ** 2, axis=-1)

    e1 = reproj_err(pc1, uv1)
    e2 = reproj_err(pc2, uv2)
    s2_1 = scale_factor ** (2.0 * m.kf_octave[kf1].astype(jnp.float32))
    s2_2 = scale_factor ** (2.0 * m.kf_octave[kf2][idx].astype(jnp.float32))
    # scale consistency (LocalMapping.cc:458-470)
    ratio_dist = d1 / jnp.maximum(d2, 1e-9)
    ratio_octave = (
        scale_factor ** (m.kf_octave[kf1].astype(jnp.float32))
        / scale_factor ** (m.kf_octave[kf2][idx].astype(jnp.float32))
    )
    ratio_factor = 1.5 * scale_factor
    scale_ok = (ratio_dist < ratio_octave * ratio_factor) & (
        ratio_dist * ratio_factor > ratio_octave
    )
    good = (
        ok
        & finite
        & (pc1[:, 2] > 0)
        & (pc2[:, 2] > 0)
        & (cosp < 0.9998)
        & (e1 < 5.991 * s2_1)
        & (e2 < 5.991 * s2_2)
        & scale_ok
    )
    return TriangulationResult(pos=pts, kp1=jnp.arange(N, dtype=jnp.int32), kp2=idx, ok=good)


@functools.partial(jax.jit, static_argnames=("scale_factor", "mono", "n_nb"))
def triangulate_with_neighbors(
    m: ms.MapState, kf1, K, min_baseline,
    scale_factor: float = 1.2, mono: bool = True, n_nb: int = 10,
):
    """CreateNewMapPoints against ALL covisible neighbours in ONE device
    program (vmap over the neighbour lane) instead of one dispatch per
    neighbour (VERDICT r03 task 4: the keyframe step was a chain of ~10
    host-synced dispatches).

    Per-lane gating mirrors LocalMapping.cc:276-296: mono requires
    baseline/medianSceneDepth(nb) >= 0.01, stereo/RGBD requires the baseline
    to exceed the rig baseline (``min_baseline``).  A keypoint that
    triangulates in several lanes keeps only its best-covisibility lane
    (lanes are ordered by weight; the reference avoids duplicates by
    checking bindings between sequential searches).

    Neighbour selection happens ON DEVICE (top-``n_nb`` covisibility
    weights >= 15, KeyFrame::GetBestCovisibilityKeyFrames semantics) so the
    host never fetches the covisibility matrix for this step.

    Returns (pos (L, N, 3), kp2 (L, N), chosen (L, N) bool, nb_ids (L,)).
    """
    cov = ms.covisibility(m)
    weights = jnp.where(m.kf_valid, cov[kf1], -1.0).at[kf1].set(-1.0)
    top_w, nb_ids = jax.lax.top_k(weights, n_nb)
    nb_mask = top_w >= 15.0
    T1 = m.kf_pose[kf1]
    C1 = -T1[:3, :3].T @ T1[:3, 3]

    def per_nb(nb):
        T2 = m.kf_pose[nb]
        C2 = -T2[:3, :3].T @ T2[:3, 3]
        base = jnp.linalg.norm(C1 - C2)
        if mono:
            med = ms.scene_median_depth(m, nb)
            good_nb = (med > 0) & jnp.isfinite(med) & (base / jnp.maximum(med, 1e-9) >= 0.01)
        else:
            good_nb = base >= min_baseline
        tri = create_new_map_points(m, kf1, nb, K, scale_factor=scale_factor)
        return tri.pos, tri.kp2, tri.ok & good_nb

    pos, kp2, ok = jax.vmap(per_nb)(nb_ids)
    ok = ok & nb_mask[:, None]
    lane = jnp.argmax(ok, axis=0)  # first True lane = best covisibility
    chosen = ok & (jnp.arange(ok.shape[0])[:, None] == lane[None, :])
    return pos, kp2, chosen, nb_ids


@jax.jit
def insert_triangulated(m: ms.MapState, kf1, pos, kp2, chosen, nb_ids, avail, cap,
                        fid=None):
    """Insert the chosen triangulations into the map in ONE device program:
    slots are assigned by lane rank from the host-provided ``avail``
    candidate list (freelist first, fresh slots after; sentinel >= ``cap``
    lanes drop), the new points are written, and both keyframes' feature
    bindings are scattered.  Returns (map, n_inserted) — the count comes
    back to the host asynchronously (Tracker._alloc_end).

    ``fid``: the creating frame id (MapPointCulling age stamp)."""
    L_nb, N = chosen.shape
    flat_good = chosen.reshape(-1)
    rank = jnp.cumsum(flat_good) - 1
    slot = avail[jnp.clip(rank, 0, avail.shape[0] - 1)].astype(jnp.int32)
    good = flat_good & (slot < cap)
    L = L_nb * N
    desc = jnp.broadcast_to(m.kf_desc[kf1][None], (L_nb, N, 8)).reshape(-1, 8)
    m = ms.add_points(
        m, slot, pos.reshape(-1, 3), desc,
        jnp.zeros((L, 3)), jnp.zeros(L), jnp.full(L, 1e9),
        jnp.full(L, kf1, jnp.int32), good,
        first_fid=None if fid is None else jnp.full(L, fid, jnp.int32),
    )
    kp1_flat = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (L_nb, N)).reshape(-1)
    m = ms.assign_observations_flat(m, jnp.full(L, kf1, jnp.int32), kp1_flat, slot, good)
    nb_rows = jnp.broadcast_to(nb_ids[:, None], (L_nb, N)).reshape(-1)
    m = ms.assign_observations_flat(m, nb_rows, kp2.reshape(-1), slot, good)
    return m, jnp.sum(good).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("radius",))
def fuse_into_keyframe(m: ms.MapState, kf, K, src_mask=None, radius: float = 3.0):
    """Project the map points selected by ``src_mask`` into keyframe ``kf``
    and fuse with its keypoints — full ORBmatcher::Fuse semantics
    (ORBmatcher.cc:825-975):

    * a FREE matching keypoint adopts the projected point (AddObservation);
    * a matching keypoint already BOUND to a different point triggers a
      landmark MERGE (MapPoint::Replace): the point with more observations
      wins, every keyframe link of the loser is redirected to the winner,
      the loser is invalidated, and its found/visible counters transfer.

    Returns the updated map.
    """
    P = m.pt_pos.shape[0]
    T = m.kf_pose[kf]
    pc = geo.se3_apply(T, m.pt_pos)
    q = (K @ pc.T).T
    uv = q[:, :2] / jnp.where(jnp.abs(q[:, 2:3]) < 1e-9, 1e-9, q[:, 2:3])
    visible = m.pt_valid & (pc[:, 2] > 0)
    if src_mask is not None:
        visible = visible & src_mask
    # points already bound in this keyframe must not re-match elsewhere
    kf_row = m.kf_pt[kf]
    bound_here = jnp.zeros((P + 1,), bool).at[jnp.where(kf_row >= 0, kf_row, P)].set(True)[:P]
    visible = visible & ~bound_here
    gate = km.window_gate(m.kf_uv[kf], uv, radius)
    idx, dist, ok = km.match_descriptors(
        m.kf_desc[kf], m.pt_desc, m.kf_kp_valid[kf], visible,
        gate_mask=gate, max_dist=50.0, ratio=0.9,
    )
    src = idx.astype(jnp.int32)  # matched map point per keypoint
    # free keypoints: bind directly
    free = kf_row < 0
    new_row = jnp.where(ok & free, src, kf_row)
    m = m._replace(kf_pt=m.kf_pt.at[kf].set(new_row))
    # bound keypoints: merge src with the existing point (better-observed wins)
    merge = ok & ~free & (src != kf_row)
    obs_count = ms.point_obs_counts(m)
    dst = jnp.clip(kf_row, 0)
    src_wins = obs_count[src] >= obs_count[dst]
    winner = jnp.where(src_wins, src, dst)
    loser = jnp.where(src_wins, dst, src)
    winner = jnp.where(merge, winner, 0)
    loser = jnp.where(merge, loser, P)  # out-of-range drops the write
    rep = jnp.arange(P + 1, dtype=jnp.int32).at[loser].set(winner)
    rep = rep[rep]  # collapse 2-chains (a->b, b->c)
    kf_pt = jnp.where(m.kf_pt >= 0, rep[jnp.clip(m.kf_pt, 0)], m.kf_pt)
    dead = rep[:P] != jnp.arange(P)
    # transfer found/visible counters to the winner (MapPoint::Replace)
    fnd = jnp.zeros(P + 1, jnp.int32).at[rep[:P]].add(jnp.where(dead, m.pt_found, 0))[:P]
    vis = jnp.zeros(P + 1, jnp.int32).at[rep[:P]].add(jnp.where(dead, m.pt_visible, 0))[:P]
    return m._replace(
        kf_pt=kf_pt,
        pt_valid=m.pt_valid & ~dead,
        pt_found=m.pt_found + fnd,
        pt_visible=m.pt_visible + vis,
    )


@jax.jit
def fuse_duplicates(m: ms.MapState, kf, K):
    """Project all map points into ``kf`` and fuse (SearchInNeighbors step,
    LocalMapping.cc:494-574) — bind free keypoints, merge duplicates."""
    return fuse_into_keyframe(m, kf, K)


@jax.jit
def point_cull_mask(m: ms.MapState, fid_recent_min, fid_old_max):
    """Mark bad points (MapPointCulling, LocalMapping.cc:207-242).

    The reference culls only RECENTLY CREATED points: candidates live in
    ``mlpRecentAddedMapPoints`` and are erased from it (kept forever) once
    they are 3 keyframes old (LocalMapping.cc:236-238).  Both rules —
    found/visible ratio < 0.25 and too few observers at age >= 2 — therefore
    apply only while age <= 3.  Applying the ratio rule to the whole map
    (as a naive batching would) mass-culls mature points whenever tracking
    quality dips, collapsing the map.

    Age is measured by CREATION FRAME id (``pt_first_fid``) against two host
    thresholds — KF slot ids are reused by the freelist and are not temporal
    (ADVICE r04: slot-based age went negative after reuse and mass-culled
    mature points):

    * ``fid_recent_min``: frame id of the 4th-newest keyframe — a point
      created at or after it has age <= 3 (still a cull candidate);
    * ``fid_old_max``: frame id of the 3rd-newest keyframe — a point created
      at or before it has age >= 2 (subject to the min-observers rule).
    """
    obs_count = ms.point_obs_counts(m)
    ratio = m.pt_found.astype(jnp.float32) / jnp.maximum(m.pt_visible, 1).astype(jnp.float32)
    recent = (m.pt_first_fid >= fid_recent_min) & (m.pt_first_fid >= 0)
    old2 = m.pt_first_fid <= fid_old_max
    bad = m.pt_valid & recent & (
        (ratio < 0.25)
        | (old2 & (obs_count <= 2))
    )
    return bad
