"""Trajectory I/O and evaluation.

Writers match the reference's output formats (System.cc:341-436:
SaveKeyFrameTrajectoryTUM / SaveTrajectoryKITTI; cuboid/plane dumps
System.cc:439-494) so downstream evo/TUM tooling works unchanged.
ATE evaluation (Umeyama Sim3 alignment + RMSE) replaces the external
scripts the reference leaves to the user (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np

from ..core import geometry as geo


def save_tum(path, stamps, poses_cw):
    """TUM format: ``stamp tx ty tz qx qy qz qw`` of the camera-to-world pose
    (System::SaveKeyFrameTrajectoryTUM writes Twc, System.cc:341-380)."""
    import jax.numpy as jnp

    with open(path, "w") as f:
        for stamp, T_cw in zip(stamps, poses_cw):
            T_wc = np.asarray(geo.se3_inv(jnp.asarray(T_cw)))
            q = np.asarray(geo.R_to_quat(jnp.asarray(T_wc[:3, :3])))
            t = T_wc[:3, 3]
            f.write(
                f"{stamp} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
            )


def save_kitti(path, poses_cw):
    """KITTI format: 12 numbers per row of Twc (System.cc:496-549)."""
    import jax.numpy as jnp

    with open(path, "w") as f:
        for T_cw in poses_cw:
            T_wc = np.asarray(geo.se3_inv(jnp.asarray(T_cw)))
            row = T_wc[:3, :4].reshape(-1)
            f.write(" ".join(f"{v:.9e}" for v in row) + "\n")


def save_cuboids(path, minimal_vectors):
    """9-DoF minimal cuboid rows (System::SaveCuboidOptimized, System.cc:439-467)."""
    with open(path, "w") as f:
        for i, v in enumerate(minimal_vectors):
            f.write(str(i) + " " + " ".join(f"{x:.6f}" for x in np.asarray(v)) + "\n")


def save_planes(path, coeffs):
    """4-vector plane rows (System::SavePlaneOptimized, System.cc:469-494)."""
    with open(path, "w") as f:
        for i, c in enumerate(coeffs):
            f.write(str(i) + " " + " ".join(f"{x:.6f}" for x in np.asarray(c)) + "\n")


def umeyama_alignment(src, dst, with_scale=True):
    """Least-squares similarity transform aligning ``src`` -> ``dst``.

    Returns (s, R, t) with dst ~= s * R @ src + t (Umeyama 1991)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / src.shape[0]
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_s = (xs**2).sum() / src.shape[0]
    s = (D * S.diagonal()).sum() / var_s if with_scale else 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(est_cw, gt_cw, with_scale=True):
    """ATE RMSE after Sim3 (mono) or SE3 alignment of camera centers."""
    import jax.numpy as jnp

    def centers(poses):
        out = []
        for T in poses:
            T = np.asarray(T, np.float64)
            out.append(-T[:3, :3].T @ T[:3, 3])
        return np.stack(out)

    c_est = centers(est_cw)
    c_gt = centers(gt_cw)
    # a stray non-finite pose (diverged BA on a to-be-culled keyframe) must
    # not abort the whole evaluation: drop those pairs
    keep = np.isfinite(c_est).all(axis=1) & np.isfinite(c_gt).all(axis=1)
    c_est, c_gt = c_est[keep], c_gt[keep]
    s, R, t = umeyama_alignment(c_est, c_gt, with_scale)
    aligned = (s * (R @ c_est.T)).T + t
    err = np.linalg.norm(aligned - c_gt, axis=1)
    return float(np.sqrt((err**2).mean())), err
