"""Relocalization after tracking loss.

Mirrors Tracking::Relocalization (Tracking.cc:1663-1824): BoW candidate
keyframes from the database, descriptor matching against each candidate's
bound map points (>= 15 matches), RANSAC PnP, then motion-only pose
optimization requiring >= 50 inliers.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..graph import lm
from ..kernels import match as km
from ..map import mapstate as ms
from ..place import vocab as vb
from .pnp import ransac_pnp


def relocalize(m: ms.MapState, frame, cam, vocab: vb.Vocabulary, cfg, n_kf: int):
    """Returns (T_cw, kp_pt, n_inliers) or None."""
    bow = vb.bow_vector(vocab, frame.desc, frame.valid)
    scores = np.array(vb.bow_scores(bow, m.kf_bow, m.kf_valid))
    order = np.argsort(-scores)[: min(5, n_kf)]
    for cand in order:
        if scores[cand] <= 0:
            break
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
        if int(n_in) >= cfg.tracking.reloc_min_inliers:
            kp_pt = jnp.where((pt_ids >= 0) & inl, pt_ids, -1)
            return T_opt, kp_pt, int(n_in)
    return None
