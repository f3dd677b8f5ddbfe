"""PnP RANSAC and relocalization tests."""

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.core import geometry as geo
from tpuslam.core.camera import Camera
from tpuslam.core.config import SlamConfig, Capacities
from tpuslam.frontend.pnp import ransac_pnp
from tpuslam.frontend.relocalize import relocalize
from tpuslam.frontend.tracking import Frame
from tpuslam.kernels import match as km
from tpuslam.map import mapstate as ms
from tpuslam.place import vocab as vb


def test_ransac_pnp_recovers_pose_with_outliers():
    rng = np.random.RandomState(0)
    N = 200
    X = jnp.asarray(rng.uniform([-3, -2, 4], [3, 2, 10], (N, 3)).astype(np.float32))
    T_true = geo.se3_exp(jnp.array([0.1, -0.05, 0.2, 0.4, 0.1, -0.3]))
    pc = geo.se3_apply(T_true, X)
    uv = jnp.stack([500 * pc[:, 0] / pc[:, 2] + 320, 500 * pc[:, 1] / pc[:, 2] + 240], -1)
    uv = uv + jnp.asarray(rng.randn(N, 2).astype(np.float32) * 0.5)
    # 25% outliers
    uv = uv.at[:50].add(jnp.asarray(rng.randn(50, 2).astype(np.float32) * 100 + 30))
    res = ransac_pnp(
        X, uv, jnp.ones(N, bool), 500.0, 500.0, 320.0, 240.0, jax.random.PRNGKey(1)
    )
    assert bool(res.ok)
    err = geo.se3_log(geo.se3_inv(T_true) @ res.T_cw)
    assert float(jnp.linalg.norm(err)) < 0.05, np.asarray(err)  # raw DLT, LM polish happens in relocalize()
    assert int(res.n_inliers) > 100


def test_relocalize_widened_research_round():
    """Relocalization must succeed through the WIDENED SearchByProjection
    round (Tracking.cc:1762-1801): the first BoW-style pass is starved below
    50 inliers by rotation-inconsistent keypoint angles, and only the
    projection re-search (which binds the candidate KF's remaining points at
    the estimated pose) reaches the acceptance threshold."""
    rng = np.random.RandomState(3)
    NKP = 160
    NPT = 130
    FX = FY = 400.0
    CX, CY = 320.0, 240.0
    cam = Camera.make(FX, FY, CX, CY)
    caps = Capacities(
        max_keypoints=NKP, max_keyframes=8, max_points=256,
        max_planes=4, max_cuboids=2, vocab_words=64,
    )
    cfg = SlamConfig(caps=caps)
    vocab = vb.random_vocabulary(caps.vocab_words, seed=1)

    pts = rng.uniform([-3, -2, 4], [3, 2, 10], (NPT, 3)).astype(np.float32)
    desc = rng.randint(0, 1 << 32, (NPT, 8), dtype=np.uint64).astype(np.uint32)

    def proj(T, P):
        pc = (T[:3, :3] @ P.T).T + T[:3, 3]
        return np.stack(
            [FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1
        ).astype(np.float32)

    m = ms.empty_map(caps)
    T0 = np.eye(4, dtype=np.float32)
    uv0 = np.zeros((NKP, 2), np.float32)
    uv0[:NPT] = proj(T0, pts)
    kp_valid = np.zeros(NKP, bool); kp_valid[:NPT] = True
    pt_ids = -np.ones(NKP, np.int32); pt_ids[:NPT] = np.arange(NPT)
    dsc = np.zeros((NKP, 8), np.uint32); dsc[:NPT] = desc
    m = ms.add_keyframe(
        m, jnp.int32(0), jnp.asarray(T0), jnp.int32(0), jnp.asarray(uv0),
        jnp.zeros(NKP, jnp.int32), jnp.zeros(NKP), jnp.asarray(dsc),
        jnp.asarray(kp_valid), jnp.asarray(pt_ids), -jnp.ones(NKP), -jnp.ones(NKP),
    )
    m = ms.add_points(
        m, jnp.arange(NPT), jnp.asarray(pts), jnp.asarray(desc),
        jnp.zeros((NPT, 3)), jnp.zeros(NPT), jnp.full(NPT, 1e9),
        jnp.zeros(NPT, jnp.int32), jnp.ones(NPT, bool),
    )
    m, _ = vb.update_kf_bow(vocab, m, 0)

    # query frame at a slightly offset pose; keypoint ANGLES are rotation-
    # consistent for only the first 35 keypoints, scrambled for the rest, so
    # the first-pass rotation histogram admits < 50 matches
    T_true = np.asarray(geo.se3_exp(jnp.asarray([0.02, -0.01, 0.01, 0.1, -0.05, 0.05])))
    uv = np.zeros((NKP, 2), np.float32)
    uv[:NPT] = proj(T_true, pts) + rng.randn(NPT, 2).astype(np.float32) * 0.3
    angles = np.zeros(NKP, np.float32)
    angles[35:NPT] = rng.uniform(0.3, 2 * np.pi - 0.3, NPT - 35).astype(np.float32)
    frame = Frame(
        uv=jnp.asarray(uv), octave=jnp.zeros(NKP, jnp.int32),
        angle=jnp.asarray(angles), desc=jnp.asarray(dsc),
        valid=jnp.asarray(kp_valid), ur=-jnp.ones(NKP), depth=-jnp.ones(NKP),
    )

    # first-pass evidence: the rotation-gated match count is below 50
    has_pt = (m.kf_pt[0] >= 0) & m.kf_kp_valid[0]
    idx, dist, ok = km.match_descriptors(
        frame.desc, m.kf_desc[0], frame.valid, has_pt, max_dist=50.0, ratio=0.75
    )
    ok = km.rotation_consistency(frame.angle, m.kf_angle[0], idx, ok)
    n_first = int(ok.sum())
    print(f"first-pass matches: {n_first}")
    assert 15 <= n_first < 50, "fixture no longer starves the first pass"

    res = relocalize(m, frame, cam, vocab, cfg, n_kf=1)
    assert res is not None, "relocalization failed despite the widened round"
    T_opt, kp_pt, n_in = res
    print(f"reloc inliers after widened round: {n_in}")
    assert n_in >= 50
    err = np.linalg.norm(np.asarray(T_opt)[:3, 3] - T_true[:3, 3])
    assert err < 0.02, err
