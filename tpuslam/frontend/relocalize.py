"""Relocalization after tracking loss.

Mirrors Tracking::Relocalization (Tracking.cc:1663-1824): BoW candidate
keyframes from the database, descriptor matching against each candidate's
bound map points (>= 15 matches), RANSAC PnP, then motion-only pose
optimization requiring >= 50 inliers — with the reference's widened
re-search rounds when the first optimization lands short (Tracking.cc:
1762-1801): a coarse SearchByProjection (th=10 window, TH_HIGH=100) binds
additional candidate-KF points at the estimated pose and re-optimizes; if
that lands between 30 and 50 inliers, a final narrow round (th=3, distance
64) decides.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core import geometry as geo
from ..graph import lm
from ..kernels import match as km
from ..map import mapstate as ms
from ..place import vocab as vb
from .pnp import ransac_pnp


@functools.partial(jax.jit, static_argnames=("radius", "max_dist"))
def research_by_projection(m: ms.MapState, frame, cand, T_est, kp_pt, cam,
                           radius: float = 10.0, max_dist: float = 100.0):
    """Widened SearchByProjection round (ORBmatcher.cc:1472 reloc variant):
    project the candidate keyframe's bound map points at the current pose
    estimate, bind additional free keypoints within ``radius * s^octave``,
    and re-run motion-only pose optimization.

    Returns (T_opt, kp_pt_out, n_inliers)."""
    N = frame.uv.shape[0]
    P = m.pt_pos.shape[0]
    cand_pt = m.kf_pt[cand]
    has = (cand_pt >= 0) & m.kf_kp_valid[cand] & m.pt_valid[jnp.clip(cand_pt, 0)]
    X = m.pt_pos[jnp.clip(cand_pt, 0)]
    pc = geo.se3_apply(T_est, X)
    uv_pred = jnp.stack(
        [
            cam.fx * pc[:, 0] / jnp.maximum(pc[:, 2], 1e-6) + cam.cx,
            cam.fy * pc[:, 1] / jnp.maximum(pc[:, 2], 1e-6) + cam.cy,
        ],
        axis=-1,
    )
    # points already bound to a keypoint must not double-bind
    already = jnp.zeros((P + 1,), bool).at[jnp.where(kp_pt >= 0, kp_pt, P)].set(True)[:P]
    vis = has & (pc[:, 2] > 0) & ~already[jnp.clip(cand_pt, 0)]
    radius_row = radius * 1.2 ** m.kf_octave[cand].astype(jnp.float32)
    gate = km.window_gate(uv_pred, frame.uv, radius_row)
    idx, dist, ok = km.match_descriptors(
        m.pt_desc[jnp.clip(cand_pt, 0)], frame.desc, vis, frame.valid & (kp_pt < 0),
        gate_mask=gate, max_dist=max_dist,
    )
    tgt = jnp.where(ok, idx, N)
    add = jnp.concatenate([jnp.full((N,), -1, jnp.int32), jnp.zeros(1, jnp.int32)]).at[tgt].set(
        jnp.where(ok, cand_pt, -1)
    )[:N]
    kp2 = jnp.where(kp_pt >= 0, kp_pt, add)
    X_all = m.pt_pos[jnp.clip(kp2, 0)]
    inv_s2 = 1.0 / (1.2 ** (2.0 * frame.octave.astype(jnp.float32)))
    T_opt, inl, n_in = lm.optimize_pose(
        T_est, X_all, frame.uv, inv_s2, kp2 >= 0, cam.fx, cam.fy, cam.cx, cam.cy,
        ur=frame.ur, bf=cam.bf,
    )
    kp_out = jnp.where((kp2 >= 0) & inl, kp2, -1)
    return T_opt, kp_out, n_in


def detect_reloc_candidates(m: ms.MapState, bow, max_candidates: int = 10):
    """KeyFrameDatabase::DetectRelocalizationCandidates
    (KeyFrameDatabase.cc:199-310): shared-word gating (candidates must share
    > 0.8 * maxCommonWords with the query), then ACCUMULATED covisibility-
    group scoring — each candidate's BoW score is summed with its top-10
    covisible neighbours that are also candidates, groups below 0.75 * best
    accumulated score are dropped, and each surviving group is represented
    by its best-scoring member.  Unlike loop detection there is no temporal
    or covisibility exclusion.  Returns candidate slot ids, best first."""
    kf_valid = np.asarray(m.kf_valid)
    if not kf_valid.any():
        return []
    scores = np.array(vb.bow_scores(bow, m.kf_bow, m.kf_valid))
    pres_q = np.asarray(bow) > 0
    pres_db = np.asarray(m.kf_bow) > 0
    common = (pres_db & pres_q[None, :]).sum(axis=1).astype(np.float32)
    common = np.where(kf_valid, common, 0.0)
    if common.max() <= 0:
        return []
    pool = kf_valid & (common > 0.8 * common.max())
    cand_idx = np.flatnonzero(pool)
    if len(cand_idx) == 0:
        return []
    cov = np.array(ms.covisibility(m))
    acc = np.empty(len(cand_idx), np.float32)
    best_in_group = np.empty(len(cand_idx), np.int64)
    best_score_in_group = np.empty(len(cand_idx), np.float32)
    for n, c in enumerate(cand_idx):
        nbrs = np.argsort(-cov[c])[:10]
        group = np.concatenate([[c], nbrs[cov[c][nbrs] > 0]])
        in_pool = pool[group]
        gm = group[in_pool]
        acc[n] = scores[gm].sum()
        best_in_group[n] = gm[np.argmax(scores[gm])]
        best_score_in_group[n] = scores[gm].max()
    keep = acc > 0.75 * acc.max()
    reps, order_keys = {}, {}
    for n in np.flatnonzero(keep):
        r = int(best_in_group[n])
        order_keys[r] = max(order_keys.get(r, -1.0), float(acc[n]))
    ranked = sorted(order_keys, key=lambda r: -order_keys[r])
    return ranked[:max_candidates]


def relocalize(m: ms.MapState, frame, cam, vocab: vb.Vocabulary, cfg, n_kf: int):
    """Returns (T_cw, kp_pt, n_inliers) or None."""
    bow = vb.bow_vector(vocab, frame.desc, frame.valid)
    order = detect_reloc_candidates(m, bow)
    reloc_min = cfg.tracking.reloc_min_inliers
    for cand in order:
        cand = int(cand)
        has_pt = (m.kf_pt[cand] >= 0) & m.kf_kp_valid[cand]
        idx, dist, ok = km.match_descriptors(
            frame.desc, m.kf_desc[cand], frame.valid, has_pt, max_dist=50.0, ratio=0.75
        )
        ok = km.rotation_consistency(frame.angle, m.kf_angle[cand], idx, ok)
        if int(ok.sum()) < 15:  # Tracking.cc:1699
            continue
        pt_ids = jnp.where(ok, m.kf_pt[cand][idx], -1)
        X = m.pt_pos[jnp.clip(pt_ids, 0)]
        res = ransac_pnp(
            X, frame.uv, ok & (pt_ids >= 0), cam.fx, cam.fy, cam.cx, cam.cy,
            jax.random.PRNGKey(cand),
        )
        if not bool(res.ok):
            continue
        inv_s2 = 1.0 / (1.2 ** (2.0 * frame.octave.astype(jnp.float32)))
        T_opt, inl, n_in = lm.optimize_pose(
            res.T_cw, X, frame.uv, inv_s2, ok & (pt_ids >= 0),
            cam.fx, cam.fy, cam.cx, cam.cy,
        )
        n_in = int(n_in)
        kp_pt = jnp.where((pt_ids >= 0) & inl, pt_ids, -1)
        if 10 <= n_in < reloc_min:
            # coarse re-search at the estimated pose (Tracking.cc:1762-1786)
            T_opt, kp_pt, n_in = research_by_projection(
                m, frame, jnp.int32(cand), T_opt, kp_pt, cam,
                radius=10.0, max_dist=100.0,
            )
            n_in = int(n_in)
            if 30 < n_in < reloc_min:
                # final narrow round (Tracking.cc:1787-1801)
                T_opt, kp_pt, n_in = research_by_projection(
                    m, frame, jnp.int32(cand), T_opt, kp_pt, cam,
                    radius=3.0, max_dist=64.0,
                )
                n_in = int(n_in)
        if n_in >= reloc_min:
            return T_opt, kp_pt, n_in
    return None
