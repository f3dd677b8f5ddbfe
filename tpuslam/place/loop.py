"""Loop detection and correction.

Re-design of LoopClosing.cc + KeyFrameDatabase.cc:

  DetectLoop      BoW scoring of the new KF against all non-covisible KFs
                  (inverted-file walk -> one matvec, place/vocab.py), with
                  the min-covisible-score gate (LoopClosing.cc:119-150) and
                  the 3-consecutive-KF consistency check (LoopClosing.cc:
                  152-211, host-side group tracking).
  ComputeSim3     dense descriptor matching of map points between the two
                  KFs + batched Horn RANSAC (backend/sim3solver.py),
                  >= 20 inliers (LoopClosing.cc:274-330).
  CorrectLoop     Sim3 essential-graph optimization over all KFs
                  (backend/posegraph.py) + point re-anchoring, then an
                  interruption-free global BA (the reference runs GBA in a
                  transient thread, LoopClosing.cc:645-749; here it is a
                  synchronous call on the functional map snapshot).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

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


class LoopCloser:
    """Host-side loop-closing stage; call :meth:`on_keyframe` after each
    keyframe insertion with the current map snapshot."""

    def __init__(self, vocab: vb.Vocabulary, cam, cfg):
        self.vocab = vocab
        self.cam = cam
        self.cfg = cfg
        self.consistency: dict = {}  # candidate kf -> consecutive hits
        self.last_loop_kf = -1000
        self.n_loops_closed = 0

    def on_keyframe(self, m: ms.MapState, kf_slot: int, n_kf: int):
        """Returns (map, loop_closed: bool)."""
        cfg = self.cfg
        m, bow = vb.update_kf_bow(self.vocab, m, kf_slot)
        if n_kf < 10 or kf_slot - self.last_loop_kf < 10:
            return m, False

        cov = ms.covisibility(m)
        cov_row = np.array(cov[kf_slot])
        scores = np.array(vb.bow_scores(bow, m.kf_bow, m.kf_valid))
        covisible = cov_row >= 15
        # min score among covisible neighbours (LoopClosing.cc:119-134)
        if covisible.sum() == 0:
            return m, False
        min_score = float(scores[covisible].min())
        K = scores.shape[0]
        cand_mask = (
            (scores >= max(min_score, 0.01))
            & ~covisible
            & np.array(m.kf_valid)
            & (np.arange(K) < kf_slot - 10)  # temporally distant
        )
        cand_mask[kf_slot] = False
        candidates = np.where(cand_mask)[0]

        # consistency over consecutive keyframes (LoopClosing.cc:152-211)
        new_consistency: dict = {}
        consistent_enough = []
        for c in candidates:
            streak = 1 + max(
                (v for k, v in self.consistency.items() if abs(k - c) <= 3), default=0
            )
            new_consistency[int(c)] = streak
            if streak >= cfg.loop.covisibility_consistency_th:
                consistent_enough.append(int(c))
        self.consistency = new_consistency
        if not consistent_enough:
            return m, False

        # try the best-scoring consistent candidate
        consistent_enough.sort(key=lambda c: -scores[c])
        for loop_kf in consistent_enough[:3]:
            res = self._compute_sim3(m, kf_slot, loop_kf)
            if res is None:
                continue
            S_cl = res
            m = self._correct_loop(m, kf_slot, loop_kf, S_cl, n_kf)
            self.last_loop_kf = kf_slot
            self.consistency = {}
            self.n_loops_closed += 1
            return m, True
        return m, False

    # ------------------------------------------------------------------

    def _compute_sim3(self, m: ms.MapState, kf_cur: int, kf_loop: int):
        """Match bound keypoints between the KFs and solve Sim3 (camera
        frames): returns (4, 4) Sim3 S_cl mapping loop-frame to current-frame,
        or None."""
        cfg = self.cfg
        has_cur = (m.kf_pt[kf_cur] >= 0) & m.kf_kp_valid[kf_cur]
        has_loop = (m.kf_pt[kf_loop] >= 0) & m.kf_kp_valid[kf_loop]
        idx, dist, ok = km.match_descriptors(
            m.kf_desc[kf_cur], m.kf_desc[kf_loop], has_cur, has_loop,
            max_dist=50.0, ratio=0.75, mutual=True,
        )
        n_matches = int(ok.sum())
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
        if int(n_in) < cfg.loop.min_sim3_inliers:
            return None
        return S_ref

    def _correct_loop(self, m: ms.MapState, kf_cur: int, kf_loop: int, S_cl, n_kf: int):
        """Essential-graph optimization + point re-anchoring
        (LoopClosing::CorrectLoop, LoopClosing.cc:402-585)."""
        K = m.kf_pose.shape[0]
        S_old = m.kf_pose  # scale-1 sim3 == se3
        # edges: temporal chain + strong covisibility + the loop edge
        cov = ms.covisibility(m)
        strong = np.array((cov >= self.cfg.loop.essential_graph_min_feat))
        kf_valid = np.array(m.kf_valid)
        ii, jj = [], []
        for a in range(n_kf - 1):
            if kf_valid[a] and kf_valid[a + 1]:
                ii.append(a)
                jj.append(a + 1)
        su = np.argwhere(np.triu(strong, 2))
        for a, b in su:
            if kf_valid[a] and kf_valid[b]:
                ii.append(int(a))
                jj.append(int(b))
        ii.append(kf_loop)
        jj.append(kf_cur)
        E = len(ii)
        ii = jnp.asarray(np.array(ii, np.int32))
        jj = jnp.asarray(np.array(jj, np.int32))
        # measurements from pre-loop relative poses, except the loop edge:
        # S_cur_loop = S_cl  => meas M_ji with i=loop, j=cur is S_cl
        meas = jax.vmap(lambda a, b: S_old[b] @ geo.se3_inv(S_old[a]))(ii, jj)
        meas = meas.at[E - 1].set(S_cl)
        weight = jnp.ones(E)
        weight = weight.at[E - 1].set(5.0)
        edges = Sim3Edges(
            i=ii, j=jj, meas=meas, weight=weight, valid=jnp.ones(E, bool)
        )
        fixed = jnp.zeros(K, bool).at[kf_loop].set(True) | ~m.kf_valid
        S_new, costs = optimize_essential_graph(
            S_old, fixed, edges, n_iters=self.cfg.loop.essential_graph_iters
        )
        # write back: poses (scale folded), points re-anchored via first KF
        new_poses = sim3_to_se3(S_new)
        new_poses = jnp.where(m.kf_valid[:, None, None], new_poses, m.kf_pose)
        pts = correct_points_for_sim3(m.pt_pos, jnp.clip(m.pt_first_kf, 0, K - 1), S_old, S_new)
        pts = jnp.where(m.pt_valid[:, None], pts, m.pt_pos)
        m = m._replace(kf_pose=new_poses, pt_pos=pts)
        # fuse duplicate landmarks around the weld: after correction the
        # current KF and the loop KF see the same structure twice
        # (LoopClosing::SearchAndFuse, LoopClosing.cc:542, 587-613)
        from ..backend.mapping import fuse_duplicates

        m = fuse_duplicates(m, jnp.int32(kf_cur), self.cam.K)
        m = fuse_duplicates(m, jnp.int32(kf_loop), self.cam.K)
        return m
