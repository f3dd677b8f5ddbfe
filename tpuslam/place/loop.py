"""Loop detection and correction.

Re-design of LoopClosing.cc + KeyFrameDatabase.cc:

  DetectLoop      BoW scoring of the new KF against all non-covisible KFs
                  (inverted-file walk -> one matvec, place/vocab.py), with
                  the min-covisible-score gate (LoopClosing.cc:119-150),
                  the 0.8*maxCommonWords shared-word gate + accumulated
                  covisibility-group scoring (KeyFrameDatabase.cc:55-130),
                  and covisibility-GROUP consistency across 3 consecutive
                  keyframes (LoopClosing.cc:152-211).
  ComputeSim3     dense descriptor matching of map points between the two
                  KFs + batched Horn RANSAC (backend/sim3solver.py),
                  >= 20 inliers (LoopClosing.cc:274-330), then guided
                  SearchByProjection of the loop-neighbourhood points into
                  the current KF with the corrected pose, accepted only with
                  >= 40 total matched keypoints (LoopClosing.cc:375-391).
  CorrectLoop     Sim3 propagation to the current KF's covisible neighbours
                  with map-point correction (LoopClosing.cc:443-516),
                  loop-point fusion with landmark MERGING (SearchAndFuse,
                  LoopClosing.cc:542,587-613 + MapPoint::Replace), Sim3
                  essential-graph optimization over all KFs
                  (backend/posegraph.py) + point re-anchoring, then an
                  interruption-free global BA (the reference runs GBA in a
                  transient thread, LoopClosing.cc:645-749; here it is a
                  synchronous call on the functional map snapshot).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

_DEBUG_PATH = os.environ.get("TPUSLAM_LOOP_DEBUG", "")


def _dbg(msg: str) -> None:
    if _DEBUG_PATH:
        with open(_DEBUG_PATH, "a") as f:
            f.write(msg + "\n")

from ..core import geometry as geo
from ..kernels import match as km
from ..map import mapstate as ms
from ..backend.sim3solver import optimize_sim3, solve_sim3
from ..backend.posegraph import (
    Sim3Edges,
    optimize_essential_graph,
    sim3_to_se3,
    correct_points_for_sim3,
)
from . import vocab as vb


@jax.jit
def _loop_candidate_stats(m: ms.MapState, bow, kf_slot):
    """Device-side batch of everything the loop detector's gating needs:
    (bow scores (K,), shared-word counts (K,), covisibility row of the new
    KF (K,), kf_valid, kf_frame_id) — one dispatch, one small fetch."""
    cov = ms.covisibility(m)
    scores = vb.bow_scores(bow, m.kf_bow, m.kf_valid)
    common = jnp.sum((m.kf_bow > 0) & (bow > 0)[None, :], axis=1).astype(jnp.float32)
    return scores, common, cov[kf_slot], m.kf_valid, m.kf_frame_id


_jitted_covisibility = jax.jit(ms.covisibility)


class LoopCloser:
    """Host-side loop-closing stage; call :meth:`on_keyframe` after each
    keyframe insertion with the current map snapshot."""

    def __init__(self, vocab: vb.Vocabulary, cam, cfg):
        self.vocab = vocab
        self.cam = cam
        self.cfg = cfg
        # previous consistent groups: list of (covisibility mask (K,), streak)
        # — LoopClosing::mvConsistentGroups (LoopClosing.cc:152-211)
        self.prev_groups: list = []
        self.last_loop_fid = -1000  # FRAME id of the last closed loop
        # monotonic count of keyframes seen by this detector — the refractory
        # window counts KEYFRAMES like the reference (LoopClosing.cc:
        # mnId < mLastLoopKFid + 10 compares monotonic KF ids); frame-id
        # distance would shrink the window by the KF cadence (ADVICE r04)
        self.kf_seen = 0
        self.last_loop_kf_seen = -1000
        self.n_loops_closed = 0
        self.stage_ms = {}  # cumulative wall ms per loop-closer sub-stage

    def on_keyframe(self, m: ms.MapState, kf_slot: int, n_kf: int,
                    frame_id: int = -1):
        """Returns (map, loop_closed: bool).  ``frame_id``: the new KF's
        source frame id (saves a device fetch; read from the map if -1)."""
        import time as _time

        _t = [_time.perf_counter()]

        def _lap(name):
            _t.append(_time.perf_counter())
            self.stage_ms[name] = (
                self.stage_ms.get(name, 0.0) + (_t[-1] - _t[-2]) * 1e3
            )

        cfg = self.cfg
        m, bow = vb.update_kf_bow(self.vocab, m, kf_slot)
        _lap("bow")
        cur_fid = int(m.kf_frame_id[kf_slot]) if frame_id < 0 else int(frame_id)
        # refractory window in KEYFRAMES processed (monotonic; slot ids are
        # not temporal once the freelist reuses holes, and frame ids would
        # shrink the reference's 10-KF window by the KF cadence)
        self.kf_seen += 1
        if n_kf < 10 or self.kf_seen - self.last_loop_kf_seen < 10:
            return m, False

        # ONE device program + ONE small fetch for all gating statistics
        # (host-side kf_bow/covisibility pulls cost ~150 ms/KF on the device
        # tunnel); the full covisibility matrix is fetched only when
        # candidates survive the gates below
        scores, common_raw, cov_row, kf_valid, fids = (
            np.asarray(x)
            for x in jax.device_get(_loop_candidate_stats(m, bow, jnp.int32(kf_slot)))
        )
        _lap("stats")
        covisible = cov_row >= 15
        # min score among covisible neighbours (LoopClosing.cc:119-134)
        if covisible.sum() == 0:
            self.prev_groups = []
            return m, False
        min_score = float(scores[covisible].min())
        # candidate pool: every valid NON-COVISIBLE keyframe — the
        # reference's only structural exclusion (KeyFrameDatabase::
        # DetectLoopCandidates skips spConnectedKeyFrames, KeyFrameDatabase
        # .cc:55-80; there is no temporal-distance gate — the 10-KF rule is
        # the post-closure refractory handled above).  An extra temporal gate
        # emptied the pool whenever keyframe culling kept the live set small
        pool = ~covisible & kf_valid
        pool[kf_slot] = False
        if _DEBUG_PATH:
            pool_scores = np.where(pool, scores, -1.0)
            best = int(np.argmax(pool_scores))
            _dbg(
                f"fid={cur_fid} kf_seen={self.kf_seen} pool={int(pool.sum())} "
                f"min_score={min_score:.5f} best_pool_score={pool_scores.max():.5f} "
                f"best_slot={best} best_fid={int(fids[best]) if pool.any() else -1} "
                f"common_best={float(np.where(pool, common_raw, 0).max()):.0f}"
            )

        # shared-word gating (KeyFrameDatabase::DetectLoopCandidates):
        # candidates must share > 0.8 * maxCommonWords words with the query
        # candidate-less detections CLEAR the consistency groups
        # (LoopClosing.cc:160-166: vpCandidateKFs.empty() -> mvConsistentGroups
        # .clear()); keeping them lets stale streaks span arbitrary gaps and
        # promotes sporadic false matches to "consistent" candidates
        common = np.where(pool, common_raw, 0.0)
        if common.max() <= 0:
            self.prev_groups = []
            return m, False
        # NO absolute score floor: the reference gates only on minScore from
        # covisible neighbours (LoopClosing.cc:119-150, KeyFrameDatabase.cc:
        # 55-130).  An absolute floor is unreachable at a trained vocabulary's
        # score scale and silently kills every candidate (VERDICT r04 #1).
        min_common = 0.8 * common.max()
        score_and_match = pool & (common > min_common) & (scores >= min_score)
        _dbg(f"  gate2 n_score_and_match={int(score_and_match.sum())}")
        if not score_and_match.any():
            self.prev_groups = []
            return m, False
        cov = np.array(_jitted_covisibility(m))

        # accumulated covisibility-group scoring (KeyFrameDatabase.cc:90-130):
        # each candidate's score is summed with its top-10 covisible
        # neighbours that are also candidates; groups below 0.75 * best
        # accumulated score are dropped, keeping each group's best member
        cand_idx = np.where(score_and_match)[0]
        acc_scores = np.empty(len(cand_idx), np.float32)
        best_in_group = np.empty(len(cand_idx), np.int64)
        for n, c in enumerate(cand_idx):
            nbrs = np.argsort(-cov[c])[:10]
            group = np.concatenate([[c], nbrs[cov[c][nbrs] > 0]])
            in_match = score_and_match[group]
            acc_scores[n] = scores[group][in_match].sum()
            gm = group[in_match]
            best_in_group[n] = gm[np.argmax(scores[gm])]
        best_acc = acc_scores.max()
        keep = acc_scores > 0.75 * best_acc
        candidates = np.unique(best_in_group[keep])

        # covisibility-GROUP consistency over consecutive keyframes
        # (LoopClosing.cc:152-211): a candidate's group (itself + covisible
        # KFs) must intersect a group from the previous keyframe's detection,
        # for covisibility_consistency_th consecutive keyframes
        new_groups: list = []
        consistent_enough = []
        for c in candidates:
            group_mask = (cov[c] > 0) & kf_valid
            group_mask[c] = True
            streak = 1
            for prev_mask, prev_streak in self.prev_groups:
                if (group_mask & prev_mask).any():
                    streak = max(streak, prev_streak + 1)
            new_groups.append((group_mask, streak))
            if streak >= cfg.loop.covisibility_consistency_th:
                consistent_enough.append(int(c))
        self.prev_groups = new_groups
        _dbg(
            f"  gate3 candidates={candidates.tolist()} "
            f"streaks={[s for _, s in new_groups]} consistent={consistent_enough}"
        )
        if not consistent_enough:
            return m, False

        # try the best-scoring consistent candidate
        consistent_enough.sort(key=lambda c: -scores[c])
        _lap("gates")
        for loop_kf in consistent_enough[:3]:
            res = self._compute_sim3(m, kf_slot, loop_kf)
            _dbg(f"  sim3 cand={loop_kf} ok={res is not None}")
            _lap("sim3")
            if res is None:
                continue
            S_cl, loop_pts = res
            m = self._correct_loop(m, kf_slot, loop_kf, S_cl, loop_pts, n_kf)
            _lap("correct")
            self.last_loop_fid = cur_fid
            self.last_loop_kf_seen = self.kf_seen
            self.prev_groups = []
            self.n_loops_closed += 1
            return m, True
        return m, False

    # ------------------------------------------------------------------

    def _loop_neighbourhood_points(self, m: ms.MapState, kf_loop: int):
        """(P,) bool: points observed by the loop KF or its covisible
        neighbours (mvpLoopMapPoints, LoopClosing.cc:360-373)."""
        cov = ms.covisibility(m)
        nbh = ((cov[kf_loop] >= 15) & m.kf_valid).at[kf_loop].set(True)
        obs = ms.incidence(m)
        return (jnp.sum(obs * nbh[:, None], axis=0) > 0) & m.pt_valid

    def _compute_sim3(self, m: ms.MapState, kf_cur: int, kf_loop: int):
        """Match bound keypoints between the KFs and solve Sim3 (camera
        frames): returns (S_cl (4,4) mapping loop-frame to current-frame,
        loop-neighbourhood point mask) or None."""
        cfg = self.cfg
        has_cur = (m.kf_pt[kf_cur] >= 0) & m.kf_kp_valid[kf_cur]
        has_loop = (m.kf_pt[kf_loop] >= 0) & m.kf_kp_valid[kf_loop]
        idx, dist, ok = km.match_descriptors(
            m.kf_desc[kf_cur], m.kf_desc[kf_loop], has_cur, has_loop,
            max_dist=50.0, ratio=0.75, mutual=True,
        )
        n_matches = int(ok.sum())
        _dbg(f"    sim3: desc_matches={n_matches} (need {cfg.loop.min_bow_matches})")
        if n_matches < cfg.loop.min_bow_matches:
            return None
        pt_cur = m.kf_pt[kf_cur]
        pt_loop = m.kf_pt[kf_loop][idx]
        X_cur = m.pt_pos[jnp.clip(pt_cur, 0)]
        X_loop = m.pt_pos[jnp.clip(pt_loop, 0)]
        P1 = geo.se3_apply(m.kf_pose[kf_cur], X_cur)  # current-camera frame
        P2 = geo.se3_apply(m.kf_pose[kf_loop], X_loop)  # loop-camera frame
        uv1 = m.kf_uv[kf_cur]
        uv2 = m.kf_uv[kf_loop][idx]
        res = solve_sim3(
            P1, P2, ok, uv1, uv2, self.cam.K, jax.random.PRNGKey(kf_cur),
            n_iters=cfg.loop.sim3_ransac_max_iters,
        )
        _dbg(f"    sim3: ransac ok={bool(res.ok)} inliers={int(res.n_inliers)}")
        if _DEBUG_PATH:
            np.savez(
                _DEBUG_PATH + f".sim3_{int(m.kf_frame_id[kf_cur])}_{kf_loop}.npz",
                P1=np.asarray(P1), P2=np.asarray(P2), ok=np.asarray(ok),
                uv1=np.asarray(uv1), uv2=np.asarray(uv2),
                K=np.asarray(self.cam.K),
                T_cur=np.asarray(m.kf_pose[kf_cur]),
                T_loop=np.asarray(m.kf_pose[kf_loop]),
            )
        if not bool(res.ok) or int(res.n_inliers) < cfg.loop.min_sim3_inliers:
            return None
        S_cl = jnp.zeros((4, 4))
        S_cl = S_cl.at[:3, :3].set(res.s * res.R).at[:3, 3].set(res.t).at[3, 3].set(1.0)
        # Gauss-Newton refinement with bidirectional reprojection residuals
        # and chi2 pruning (Optimizer::OptimizeSim3; accepted with >= the
        # same inlier floor, LoopClosing.cc:326-330)
        S_ref, inl, n_in = optimize_sim3(
            S_cl, P1, P2, uv1, uv2, self.cam.K, res.inliers,
            fix_scale=bool(cfg.sensor != "mono"),
        )
        _dbg(f"    sim3: gn inliers={int(n_in)}")
        if int(n_in) < cfg.loop.min_sim3_inliers:
            return None
        # guided matching: project the loop-neighbourhood map points into the
        # current KF with the Sim3-corrected pose and require >= 40 total
        # matched keypoints before accepting (LoopClosing.cc:375-391) — the
        # gate that keeps false loops from welding the map
        loop_pts = self._loop_neighbourhood_points(m, kf_loop)
        S_cw = S_ref @ m.kf_pose[kf_loop]  # Sim3 world -> current camera
        kp_proj, idx_g = _project_and_match(
            m, jnp.int32(kf_cur), loop_pts, S_cw, self.cam.K, radius=10.0
        )
        sim3_kp = inl & ok & (pt_cur >= 0)
        total = int(jnp.sum(kp_proj | sim3_kp))
        _dbg(f"    sim3: guided total={total} (need {cfg.loop.min_total_matches})")
        if total < cfg.loop.min_total_matches:
            return None
        # NOTE: a second refinement over the guided (keypoint -> map point)
        # matches was tried here as the analogue of the reference's
        # SearchBySim3 -> OptimizeSim3 pass (LoopClosing.cc:318-330) and
        # measured WORSE on the golden loop (keyframe ATE 0.34 -> 1.38):
        # guided pairs carry no independent loop-side pixel observation, so
        # the bidirectional residual's reverse direction is vacuous and the
        # radius-10 ungated matches drag the estimate.  The descriptor-match
        # GN refinement above remains the weld estimate.
        return S_ref, loop_pts

    def _correct_loop(self, m: ms.MapState, kf_cur: int, kf_loop: int, S_cl,
                      loop_pts, n_kf: int):
        """Sim3 propagation + fusion + essential-graph optimization
        (LoopClosing::CorrectLoop, LoopClosing.cc:402-585)."""
        K = m.kf_pose.shape[0]
        S_old = m.kf_pose  # scale-1 sim3 == se3, PRE-correction snapshot
        cov_np = np.array(ms.covisibility(m))
        kf_valid = np.array(m.kf_valid)

        # 1. propagate the corrected Sim3 to the current KF's covisible
        #    neighbourhood (LoopClosing.cc:443-470): S_iw' = (T_i T_c^-1) S_cw'
        nbh_np = (cov_np[kf_cur] >= 15) & kf_valid
        nbh_np[kf_cur] = True
        nbh = jnp.asarray(nbh_np)
        T_c_inv = geo.se3_inv(S_old[kf_cur])
        S_cw_corr = S_cl @ S_old[kf_loop]
        S_corr = jax.vmap(lambda T: (T @ T_c_inv) @ S_cw_corr)(S_old)
        S_start = jnp.where(nbh[:, None, None], S_corr, S_old)

        # 2. per-point anchor (LoopClosing.cc:470-516): current-side points
        #    anchor to their first current-neighbourhood observer so their
        #    world coords move with the correction; loop-neighbourhood points
        #    are the reference frame of the weld and anchor to a LOOP-side
        #    observer (preferring one outside the current neighbourhood,
        #    whose pose does not move in this step).  Computed BEFORE fusion
        #    so merged points keep anchors consistent with their coordinates.
        lnbh_np = (cov_np[kf_loop] >= 15) & kf_valid
        lnbh_np[kf_loop] = True
        lnbh = jnp.asarray(lnbh_np)
        obs = ms.incidence(m) > 0
        pref = obs & lnbh[:, None] & ~nbh[:, None]
        fall = obs & lnbh[:, None]
        anchor_loop = jnp.where(
            jnp.any(pref, axis=0), jnp.argmax(pref, axis=0), jnp.argmax(fall, axis=0)
        ).astype(jnp.int32)
        nbh_obs = obs & nbh[:, None]
        has_nbh = jnp.any(nbh_obs, axis=0)
        anchor_cur = jnp.where(
            has_nbh, jnp.argmax(nbh_obs, axis=0).astype(jnp.int32),
            jnp.clip(m.pt_first_kf, 0, K - 1),
        )
        anchor = jnp.where(loop_pts, anchor_loop, anchor_cur)
        pts = correct_points_for_sim3(m.pt_pos, anchor, S_old, S_start)
        pts = jnp.where(m.pt_valid[:, None], pts, m.pt_pos)
        poses_corr = jnp.where(nbh[:, None, None], sim3_to_se3(S_start), m.kf_pose)
        m = m._replace(kf_pose=poses_corr, pt_pos=pts)

        # 3. fuse the loop-neighbourhood points into the corrected current
        #    neighbourhood with landmark MERGING (SearchAndFuse,
        #    LoopClosing.cc:542,587-613; better-observed point wins)
        from ..backend.mapping import fuse_into_keyframe

        fuse_kfs = [kf_cur] + [
            int(k) for k in np.argsort(-cov_np[kf_cur])[:15] if nbh_np[k] and k != kf_cur
        ]
        for k in fuse_kfs:
            m = fuse_into_keyframe(m, jnp.int32(k), self.cam.K, src_mask=loop_pts, radius=4.0)

        # 4. essential graph over all KFs: measurements from PRE-correction
        #    relative poses, initialized at the propagated poses, loop KF
        #    fixed (Optimizer::OptimizeEssentialGraph, Optimizer.cc:789-1052)
        strong = np.array((cov_np >= self.cfg.loop.essential_graph_min_feat))
        # temporal chain edges (spanning-tree analogue) + strong covisibility
        # edges + the loop edge, built with vectorized numpy (no O(K^2) loop).
        # The chain follows FRAME-id order of the valid slots (slot numbers
        # are not temporal once the keyframe-slot freelist reuses holes).
        fids_np = np.asarray(m.kf_frame_id)
        valid_slots = np.flatnonzero(kf_valid)
        valid_slots = valid_slots[np.argsort(fids_np[valid_slots])]
        ca, cb = valid_slots[:-1], valid_slots[1:]
        off = ~np.eye(len(kf_valid), dtype=bool)
        su = np.argwhere(np.triu(strong & kf_valid[:, None] & kf_valid[None, :] & off, 1))
        # deduplicate chain/covisibility pairs (a temporal-chain pair that is
        # also strongly covisible would otherwise appear twice and be
        # double-weighted in the pose-graph solve, ADVICE r04)
        K_all = len(kf_valid)
        pairs = np.stack([np.concatenate([ca, su[:, 0]]),
                          np.concatenate([cb, su[:, 1]])], axis=1)
        packed = np.unique(pairs.min(1) * K_all + pairs.max(1))
        ii = np.concatenate([packed // K_all, [kf_loop]]).astype(np.int32)
        jj = np.concatenate([packed % K_all, [kf_cur]]).astype(np.int32)
        E = len(ii)
        ii = jnp.asarray(ii)
        jj = jnp.asarray(jj)
        # measurements from pre-loop relative poses, except the loop edge:
        # S_cur_loop = S_cl  => meas M_ji with i=loop, j=cur is S_cl
        meas = jax.vmap(lambda p, q: S_old[q] @ geo.se3_inv(S_old[p]))(ii, jj)
        meas = meas.at[E - 1].set(S_cl)
        weight = jnp.ones(E)
        weight = weight.at[E - 1].set(5.0)
        edges = Sim3Edges(
            i=ii, j=jj, meas=meas, weight=weight, valid=jnp.ones(E, bool)
        )
        fixed = jnp.zeros(K, bool).at[kf_loop].set(True) | ~m.kf_valid
        S_new, costs = optimize_essential_graph(
            S_start, fixed, edges, n_iters=self.cfg.loop.essential_graph_iters
        )
        # write back: poses (scale folded), points re-anchored through the
        # same per-point anchor, from the propagated to the optimized poses
        new_poses = sim3_to_se3(S_new)
        new_poses = jnp.where(m.kf_valid[:, None, None], new_poses, m.kf_pose)
        pts = correct_points_for_sim3(m.pt_pos, anchor, S_start, S_new)
        pts = jnp.where(m.pt_valid[:, None], pts, m.pt_pos)
        # planes/cuboids follow their latest observer through the TOTAL
        # correction (pre-loop S_old -> optimized S_new)
        plane_coef, cub_pose, cub_scale = _correct_semantics_for_sim3(
            m, S_old, S_new
        )
        m = m._replace(
            kf_pose=new_poses, pt_pos=pts,
            plane_coef=plane_coef, cub_pose=cub_pose, cub_scale=cub_scale,
        )
        # refresh descriptors/normals/scale bands after the merge+correction
        return ms.update_point_stats(m)


@jax.jit
def _correct_semantics_for_sim3(m: ms.MapState, S_old, S_new):
    """Planes and cuboids follow their most recent valid observer keyframe
    through the loop correction — the semantic analogue of
    correct_points_for_sim3.  The reference corrects only MapPoints in
    CorrectLoop (LoopClosing.cc:470-516) and leaves planes/cuboids to the
    post-loop optimization (Optimizer.cc:1994-2967); initializing them
    consistently with the corrected trajectory keeps that optimization in
    the right basin instead of fighting a welded-map-sized residual.

    Returns (plane_coef, cub_pose, cub_scale)."""
    K = m.kf_valid.shape[0]
    rows = jnp.arange(K)

    def latest_observer(link, link_valid, n_landmarks):
        def per_landmark(q):
            seen = jnp.any((link == q) & link_valid, axis=1) & m.kf_valid
            return jnp.where(jnp.any(seen), jnp.argmax(jnp.where(seen, rows, -1)), -1)

        return jax.vmap(per_landmark)(jnp.arange(n_landmarks))

    def delta_for(anchor):
        a = jnp.clip(anchor, 0)
        return geo.sim3_inv(S_new[a]) @ S_old[a]  # world -> world correction

    # planes: n' = R n,  d' = s d - n'.t  (for x' = sR x + t)
    pa = latest_observer(m.kf_plane_map, m.kf_plane_valid, m.plane_coef.shape[0])
    Dp = jax.vmap(delta_for)(pa)
    sp, Rp, tp = geo.sim3_scale(Dp), geo.sim3_R(Dp), Dp[:, :3, 3]
    n_new = jnp.einsum("qij,qj->qi", Rp, m.plane_coef[:, :3])
    d_new = sp * m.plane_coef[:, 3] - jnp.einsum("qi,qi->q", n_new, tp)
    coef_new = jnp.concatenate([n_new, d_new[:, None]], axis=1)
    use_p = (m.plane_valid & (pa >= 0))[:, None]
    plane_coef = jnp.where(use_p, coef_new, m.plane_coef)

    # cuboids: R' = R_d R_o,  t' = sR_d t_o + t_d,  scale' = s * scale
    ca = latest_observer(m.kf_cub_map, m.kf_cub_valid, m.cub_pose.shape[0])
    Dc = jax.vmap(delta_for)(ca)
    sc, Rc = geo.sim3_scale(Dc), geo.sim3_R(Dc)
    R_new = jnp.einsum("cij,cjk->cik", Rc, m.cub_pose[:, :3, :3])
    t_new = (
        jnp.einsum("cij,cj->ci", Dc[:, :3, :3], m.cub_pose[:, :3, 3]) + Dc[:, :3, 3]
    )
    pose_new = geo.se3_from_Rt(R_new, t_new)
    use_c = m.cub_valid & (ca >= 0)
    cub_pose = jnp.where(use_c[:, None, None], pose_new, m.cub_pose)
    cub_scale = jnp.where(use_c[:, None], sc[:, None] * m.cub_scale, m.cub_scale)
    return plane_coef, cub_pose, cub_scale


@jax.jit
def _project_and_match(m: ms.MapState, kf, src_mask, S_cw, K, radius: float = 10.0):
    """Project the points in ``src_mask`` through the Sim3 ``S_cw`` into
    keyframe ``kf`` and descriptor-match against its keypoints — the guided
    SearchByProjection of LoopClosing::ComputeSim3 (ORBmatcher.cc:290 variant,
    no ratio test, TH_LOW).  Returns (N,) bool per current keypoint."""
    pc = geo.sim3_apply(S_cw, m.pt_pos)
    q = (K @ pc.T).T
    uv = q[:, :2] / jnp.where(jnp.abs(q[:, 2:3]) < 1e-9, 1e-9, q[:, 2:3])
    visible = src_mask & (pc[:, 2] > 0.05)
    gate = km.window_gate(m.kf_uv[kf], uv, radius)
    idx, dist, ok = km.match_descriptors(
        m.kf_desc[kf], m.pt_desc, m.kf_kp_valid[kf], visible,
        gate_mask=gate, max_dist=50.0,
    )
    return ok, idx
