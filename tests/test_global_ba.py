"""Global BA covers the WHOLE trajectory (VERDICT r2 item 3): with >= 128
valid keyframes, run_global_ba must bucket the keyframe window up past the
64-slot base and measurably refine keyframes above slot 64; points beyond the
point budget are re-anchored through their reference keyframes."""

import numpy as np
import jax.numpy as jnp

from tpuslam.core.camera import Camera
from tpuslam.core.config import SlamConfig, Capacities
from tpuslam.map import mapstate as ms
from tpuslam.backend.local_ba import run_global_ba, _ba_bucket

NKF = 128
NPT = 1500
NKP = 64  # keypoints per keyframe

FX = FY = 300.0
CX, CY = 160.0, 120.0
CAM = Camera.make(FX, FY, CX, CY, width=320, height=240)


def build(seed=0, pose_noise=0.03):
    rng = np.random.RandomState(seed)
    caps = Capacities(
        max_keypoints=NKP, max_keyframes=NKF, max_points=2048,
        max_planes=4, max_cuboids=2, vocab_words=16,
        global_ba_keyframes=16, global_ba_points=256,
        local_ba_keyframes=8, local_ba_fixed_keyframes=8, local_ba_points=2048,
    )
    cfg = SlamConfig(caps=caps)
    pts = rng.uniform([-4, -3, 4], [4, 3, 12], (NPT, 3)).astype(np.float32)
    m = ms.empty_map(caps)

    gt_poses = []
    for k in range(NKF):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.02 * k, 0.002 * k, 0.0]
        gt_poses.append(T)
    gt_poses = np.stack(gt_poses)

    # each keyframe observes NKP points (sliding window over the cloud so
    # consecutive keyframes share most of them)
    first_kf = np.full(NPT, NKF, np.int32)
    for k in range(NKF):
        sel = (np.arange(NKP) * 11 + k * 9) % NPT
        first_kf[sel] = np.minimum(first_kf[sel], k)
        pc = (gt_poses[k][:3, :3] @ pts[sel].T).T + gt_poses[k][:3, 3]
        uv = np.stack(
            [FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1
        ).astype(np.float32)
        uv += rng.randn(NKP, 2).astype(np.float32) * 0.2
        m = ms.add_keyframe(
            m, jnp.int32(k), jnp.asarray(gt_poses[k]), jnp.int32(k),
            jnp.asarray(uv), jnp.zeros(NKP, jnp.int32), jnp.zeros(NKP),
            jnp.zeros((NKP, 8), jnp.uint32), jnp.ones(NKP, bool),
            jnp.asarray(sel.astype(np.int32)), -jnp.ones(NKP), -jnp.ones(NKP),
        )
    first_kf = np.where(first_kf == NKF, 0, first_kf)
    m = ms.add_points(
        m, jnp.arange(NPT), jnp.asarray(pts), jnp.zeros((NPT, 8), jnp.uint32),
        jnp.zeros((NPT, 3)), jnp.zeros(NPT), jnp.full(NPT, 1e9),
        jnp.asarray(first_kf), jnp.ones(NPT, bool),
    )

    # perturb every pose except the gauge (slot 0), growing with index so the
    # tail (slots > 64) carries the most error
    noisy = gt_poses.copy()
    for k in range(1, NKF):
        noisy[k][:3, 3] += rng.randn(3).astype(np.float32) * pose_noise * (0.3 + k / NKF)
    m = m._replace(kf_pose=jnp.asarray(noisy))
    # perturb points too
    noise = np.zeros((m.pt_pos.shape[0], 3), np.float32)
    noise[:NPT] = rng.randn(NPT, 3).astype(np.float32) * 0.01
    m = m._replace(pt_pos=m.pt_pos + jnp.asarray(noise))
    return cfg, m, gt_poses, noisy


def test_bucket_helper():
    assert _ba_bucket(10, 16, 512) == 16
    assert _ba_bucket(65, 64, 512) == 128
    assert _ba_bucket(128, 64, 512) == 128
    assert _ba_bucket(129, 64, 512) == 256
    assert _ba_bucket(9999, 64, 512) == 512


def test_global_ba_refines_keyframes_above_slot_64():
    cfg, m, gt, noisy = build()
    err_before = np.linalg.norm(noisy[64:, :3, 3] - gt[64:, :3, 3], axis=1)
    m2, chi2s = run_global_ba(m, CAM, cfg, n_iters=10, n_kf=NKF)
    poses = np.asarray(m2.kf_pose)
    err_after = np.linalg.norm(poses[64:, :3, 3] - gt[64:, :3, 3], axis=1)
    print(
        f"tail-KF err: before mean {err_before.mean():.4f} "
        f"after mean {err_after.mean():.4f}"
    )
    # slots 64..127 must be REFINED, not left frozen at their packed values
    # (the residual is the 0.2 px observation-noise floor, not truncation)
    assert err_after.mean() < 0.55 * err_before.mean()
    # the head improves as well (its injected noise is smaller — it starts
    # closer to the observation-noise floor, so only require improvement)
    err0 = np.linalg.norm(noisy[1:64, :3, 3] - gt[1:64, :3, 3], axis=1).mean()
    err1 = np.linalg.norm(poses[1:64, :3, 3] - gt[1:64, :3, 3], axis=1).mean()
    assert err1 < err0


def test_reanchor_moves_out_of_budget_points():
    """Points excluded from the GBA point set must move with their reference
    keyframe (X' = T_new^-1 T_old X) instead of staying at stale coordinates
    — the safety net for a truncating point budget."""
    from tpuslam.backend.local_ba import _reanchor_points

    cfg, m, gt, noisy = build()
    # pretend GBA shifted every pose by +0.5 in x: out-of-budget points must
    # shift by the same world-frame correction
    T_old = m.kf_pose
    shift = np.asarray(T_old).copy()
    shift[:, 0, 3] += 0.5  # t_x of Tcw
    m_shift = m._replace(kf_pose=jnp.asarray(shift))
    skip = jnp.zeros(m.pt_pos.shape[0], bool).at[:100].set(True)  # "optimized"
    m2 = _reanchor_points(m_shift, T_old, skip)
    delta = np.asarray(m2.pt_pos) - np.asarray(m.pt_pos)
    # Tcw t_x += 0.5 means camera center moves -0.5 in world x; re-anchored
    # points follow: X' = R^T (R X + t_old) - R^T t_new = X - R^T [0.5,0,0]
    np.testing.assert_allclose(delta[100:NPT, 0], -0.5, atol=1e-4)
    np.testing.assert_allclose(delta[:100], 0.0, atol=1e-6)  # optimized: untouched


def test_global_ba_abort_between_chunks():
    """The mbStopGBA analogue (LoopClosing.cc:410-429): ``should_abort`` is
    polled between iteration chunks; an abort after the first chunk stops
    early and still writes back the partially optimized state."""
    cfg, m, gt, noisy = build()
    calls = []

    def abort_after_first():
        calls.append(1)
        return True

    m2, chi2s = run_global_ba(
        m, CAM, cfg, n_iters=10, n_kf=NKF,
        should_abort=abort_after_first, chunk=2,
    )
    # polled exactly once (after the first chunk), so only one chunk ran
    assert len(calls) == 1
    assert np.asarray(chi2s).shape[0] == 2
    # the partial result was applied: poses moved toward ground truth
    err0 = np.linalg.norm(np.asarray(m.kf_pose)[1:, :3, 3] - gt[1:, :3, 3], axis=1).mean()
    err1 = np.linalg.norm(np.asarray(m2.kf_pose)[1:, :3, 3] - gt[1:, :3, 3], axis=1).mean()
    assert err1 < err0

    # no abort -> all chunks run, should_abort polled between each
    calls2 = []
    m3, chi2s3 = run_global_ba(
        m, CAM, cfg, n_iters=10, n_kf=NKF,
        should_abort=lambda: (calls2.append(1), False)[1], chunk=2,
    )
    assert np.asarray(chi2s3).shape[0] == 10
    assert len(calls2) == 4
