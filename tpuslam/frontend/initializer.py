"""Monocular two-view bootstrap: batched H/F RANSAC + model selection.

Re-design of Initializer.cc (200 RANSAC iterations on 8-point sets computed
in two parallel threads, model choice by score ratio RH > 0.40, Faugeras
homography decomposition / essential-matrix decomposition, cheirality check
— Initializer.cc:56-937).  On TPU all 200 hypotheses for BOTH models are
evaluated simultaneously as one batched program: the reference's thread-level
parallelism becomes vmap.

All linear systems are solved with ``eigh`` of the normal matrix (TPU-native;
avoids unsupported general SVD shapes where possible).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import geometry as geo


class InitResult(NamedTuple):
    ok: jnp.ndarray  # () bool
    T_21: jnp.ndarray  # (4, 4) pose of frame 2 wrt frame 1 (world=frame1)
    points: jnp.ndarray  # (N, 3) triangulated points in frame-1 coords
    good: jnp.ndarray  # (N,) bool triangulation inlier mask
    used_h: jnp.ndarray  # () bool which model won


def _normalize(pts, valid):
    """Mean / mean-abs-dev normalization (Initializer::Normalize)."""
    w = valid.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    mean = jnp.sum(pts * w[:, None], axis=0) / n
    dev = jnp.sum(jnp.abs(pts - mean) * w[:, None], axis=0) / n
    s = 1.0 / jnp.maximum(dev, 1e-6)
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]], [0.0, 0.0, 1.0]]
    )
    return (pts - mean) * s, T


def _smallest_eigvec(A):
    """Unit vector minimizing |A x| via eigh(A^T A)."""
    M = A.T @ A
    _, vecs = jnp.linalg.eigh(M)
    return vecs[:, 0]


def _fundamental_from_8(p1, p2):
    """(8, 2) x 2 normalized points -> F (3, 3), rank-2 enforced."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, jnp.ones_like(x1)], axis=-1
    )
    f = _smallest_eigvec(A)
    F = f.reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return U @ jnp.diag(S) @ Vt


def _homography_from_8(p1, p2):
    """(8, 2) x 2 normalized points -> H (3, 3) via DLT."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=-1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)
    h = _smallest_eigvec(A)
    return h.reshape(3, 3)


def _check_fundamental(F, p1, p2, valid, sigma: float = 1.0):
    """Symmetric epipolar score (Initializer::CheckFundamental):
    chi2 > 3.841 -> outlier, else score += 5.991 - chi2 per direction."""
    th, th_score = 3.841, 5.991
    inv_s2 = 1.0 / sigma**2
    ones = jnp.ones_like(p1[:, :1])
    h1 = jnp.concatenate([p1, ones], axis=-1)
    h2 = jnp.concatenate([p2, ones], axis=-1)
    l2 = h1 @ F.T  # epipolar lines in image 2
    d2 = (jnp.sum(l2 * h2, axis=-1)) ** 2 / (l2[:, 0] ** 2 + l2[:, 1] ** 2 + 1e-12)
    l1 = h2 @ F
    d1 = (jnp.sum(l1 * h1, axis=-1)) ** 2 / (l1[:, 0] ** 2 + l1[:, 1] ** 2 + 1e-12)
    c1, c2 = d1 * inv_s2, d2 * inv_s2
    inlier = (c1 <= th) & (c2 <= th) & valid
    score = jnp.sum(
        jnp.where(valid & (c1 <= th), th_score - c1, 0.0)
        + jnp.where(valid & (c2 <= th), th_score - c2, 0.0)
    )
    return score, inlier


def _check_homography(H, p1, p2, valid, sigma: float = 1.0):
    """Symmetric transfer score (Initializer::CheckHomography), th 5.991."""
    th = 5.991
    inv_s2 = 1.0 / sigma**2
    Hinv = jnp.linalg.inv(H)

    def transfer(M, src, dst):
        ones = jnp.ones_like(src[:, :1])
        q = jnp.concatenate([src, ones], axis=-1) @ M.T
        q = q[:, :2] / (q[:, 2:3] + 1e-12)
        return jnp.sum((q - dst) ** 2, axis=-1)

    c1 = transfer(Hinv, p2, p1) * inv_s2
    c2 = transfer(H, p1, p2) * inv_s2
    inlier = (c1 <= th) & (c2 <= th) & valid
    score = jnp.sum(
        jnp.where(valid & (c1 <= th), th - c1, 0.0) + jnp.where(valid & (c2 <= th), th - c2, 0.0)
    )
    return score, inlier


def triangulate(T1, T2, uv1, uv2, K):
    """Linear DLT triangulation, batched over matches.

    Builds the 4x4 system from two projection matrices and solves via eigh
    (Initializer::Triangulate uses SVD of the same system).
    """
    P1 = K @ T1[:3, :]
    P2 = K @ T2[:3, :]

    def tri(uva, uvb):
        A = jnp.stack(
            [
                uva[0] * P1[2] - P1[0],
                uva[1] * P1[2] - P1[1],
                uvb[0] * P2[2] - P2[0],
                uvb[1] * P2[2] - P2[1],
            ]
        )
        x = _smallest_eigvec(A)
        return x[:3] / jnp.where(jnp.abs(x[3]) < 1e-12, 1e-12, x[3])

    return jax.vmap(tri)(uv1, uv2)


def _check_rt(R, t, uv1, uv2, valid, K, sigma2: float = 1.0):
    """Cheirality + reprojection + parallax check (Initializer::CheckRT).

    Returns (n_good, good_mask, points, median_parallax_ok).
    """
    T1 = jnp.eye(4)
    T2 = geo.se3_from_Rt(R, t)
    pts = triangulate(T1, T2, uv1, uv2, K)
    finite = jnp.all(jnp.isfinite(pts), axis=-1)
    # parallax between rays
    c1 = jnp.zeros(3)
    c2 = -R.T @ t
    r1 = pts - c1
    r2 = pts - c2
    cosp = jnp.sum(r1 * r2, axis=-1) / (
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1) + 1e-12
    )
    z1 = pts[:, 2]
    pc2 = geo.se3_apply(T2, pts)
    z2 = pc2[:, 2]
    # reprojection errors
    def reproj(p_cam, uv):
        q = K @ p_cam
        q = q[:2] / jnp.where(jnp.abs(q[2]) < 1e-12, 1e-12, q[2])
        return jnp.sum((q - uv) ** 2)

    e1 = jax.vmap(reproj)(pts, uv1)
    e2 = jax.vmap(reproj)(pc2, uv2)
    th2 = 4.0 * sigma2
    good = (
        valid
        & finite
        & (z1 > 0)
        & (z2 > 0)
        & (cosp < 0.99998)
        & (e1 < th2)
        & (e2 < th2)
    )
    # median parallax of good points (degrees check done by caller)
    cosp_good = jnp.where(good, cosp, 1.0)
    n_good = jnp.sum(good)
    k = jnp.minimum(50, jnp.maximum(n_good, 1))
    sorted_cos = jnp.sort(cosp_good)  # ascending: smallest cos = largest parallax
    idx = jnp.clip(k - 1, 0, cosp_good.shape[0] - 1)
    parallax_cos = sorted_cos[idx]
    return n_good, good, pts, parallax_cos


def _decompose_essential(E):
    """E -> (R1, R2, t) (Initializer::DecomposeE)."""
    U, S, Vt = jnp.linalg.svd(E)
    t = U[:, 2]
    t = t / (jnp.linalg.norm(t) + 1e-12)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    return R1, R2, t


def _decompose_homography(H, K):
    """Faugeras SVD decomposition -> 8 (R, t) hypotheses
    (Initializer::ReconstructH, following Faugeras & Lustman 1988)."""
    A = jnp.linalg.inv(K) @ H @ K
    U, S, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = S[0], S[1], S[2]

    aux1 = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3 + 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3 + 1e-12), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    # case d' > 0
    aux_stheta = jnp.sqrt(
        jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / ((d1 + d3) * d2 + 1e-12)
    ctheta = (d2 * d2 + d1 * d3) / ((d1 + d3) * d2 + 1e-12)
    sthetas = jnp.array([1.0, -1.0, -1.0, 1.0]) * aux_stheta

    def case_pos(i):
        st, ct = sthetas[i], ctheta
        Rp = jnp.array([[ct, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, ct]])
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        t = U @ tp
        return R, t / (jnp.linalg.norm(t) + 1e-12)

    # case d' < 0
    aux_sphi = jnp.sqrt(
        jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / ((d1 - d3) * d2 + 1e-12)
    cphi = (d1 * d3 - d2 * d2) / ((d1 - d3) * d2 + 1e-12)
    sphis = jnp.array([1.0, -1.0, -1.0, 1.0]) * aux_sphi

    def case_neg(i):
        sp, cp = sphis[i], cphi
        Rp = jnp.array([[cp, 0.0, sp], [0.0, -1.0, 0.0], [sp, 0.0, -cp]])
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        t = U @ tp
        return R, t / (jnp.linalg.norm(t) + 1e-12)

    Rs, ts = [], []
    for i in range(4):
        R, t = case_pos(i)
        Rs.append(R)
        ts.append(t)
    for i in range(4):
        R, t = case_neg(i)
        Rs.append(R)
        ts.append(t)
    return jnp.stack(Rs), jnp.stack(ts)


@functools.partial(jax.jit, static_argnames=("n_iters",))
def initialize_two_view(uv1, uv2, valid, K, key, n_iters: int = 200, sigma: float = 1.0):
    """Full two-view bootstrap from padded match arrays.

    Args:
      uv1, uv2: (N, 2) matched undistorted pixels in frames 1 / 2.
      valid: (N,) bool.
      K: (3, 3) intrinsics.
      key: PRNG key for RANSAC sampling (reference seeds DUtils::Random once,
           Initializer.cc:92 — determinism preserved by passing a fixed key).

    Returns InitResult.
    """
    N = uv1.shape[0]
    n1, T1n = _normalize(uv1, valid)
    n2, T2n = _normalize(uv2, valid)

    # --- sample: prefer valid indices (sampling over valid-only via gumbel) --
    def sample_one(k):
        # weighted random choice of 8 distinct valid indices
        g = jax.random.gumbel(k, (N,)) + jnp.where(valid, 0.0, -1e9)
        return jax.lax.top_k(g, 8)[1]

    keys = jax.random.split(key, n_iters)
    samples = jax.vmap(sample_one)(keys)  # (iters, 8)

    # --- fit + score both models for every sample ---------------------------
    def fit_f(idx):
        F = _fundamental_from_8(n1[idx], n2[idx])
        return T2n.T @ F @ T1n  # denormalize

    def fit_h(idx):
        Hn = _homography_from_8(n1[idx], n2[idx])
        return jnp.linalg.inv(T2n) @ Hn @ T1n

    Fs = jax.vmap(fit_f)(samples)
    Hs = jax.vmap(fit_h)(samples)
    f_scores, f_inliers = jax.vmap(lambda F: _check_fundamental(F, uv1, uv2, valid, sigma))(Fs)
    h_scores, h_inliers = jax.vmap(lambda H: _check_homography(H, uv1, uv2, valid, sigma))(Hs)

    bf = jnp.argmax(f_scores)
    bh = jnp.argmax(h_scores)
    SF, SH = f_scores[bf], h_scores[bh]
    F_best, F_in = Fs[bf], f_inliers[bf]
    H_best, H_in = Hs[bh], h_inliers[bh]
    use_h = SH / (SH + SF + 1e-12) > 0.40  # Initializer.cc:112-115

    # --- reconstruct motion hypotheses --------------------------------------
    E = K.T @ F_best @ K
    R1, R2, tE = _decompose_essential(E)
    f_Rs = jnp.stack([R1, R1, R2, R2])
    f_ts = jnp.stack([tE, -tE, tE, -tE])
    h_Rs, h_ts = _decompose_homography(H_best, K)
    # pad F hypotheses to 8 so both branches have identical shapes; the
    # duplicated half is masked out of the winner-uniqueness check
    Rs = jnp.where(use_h, h_Rs, jnp.concatenate([f_Rs, f_Rs], axis=0))
    ts = jnp.where(use_h, h_ts, jnp.concatenate([f_ts, f_ts], axis=0))
    hyp_valid = jnp.where(use_h, jnp.ones(8, bool), jnp.arange(8) < 4)
    inl = jnp.where(use_h, H_in, F_in)

    n_goods, goods, ptss, par_cos = jax.vmap(
        lambda R, t: _check_rt(R, t, uv1, uv2, inl, K, sigma**2)
    )(Rs, ts)
    n_goods = jnp.where(hyp_valid, n_goods, -1)
    best = jnp.argmax(n_goods)
    n_best = n_goods[best]
    n_inl = jnp.sum(inl)
    # winner must be clear (no second hypothesis close), enough support,
    # enough parallax (cos < cos(1deg)  ≈ 0.99985) — Initializer::ReconstructF
    second = jnp.sort(n_goods)[-2]
    ok = (
        (n_best > 0.7 * jnp.maximum(n_inl, 1))
        & (n_best >= 50)
        & (second < 0.75 * n_best)
        & (par_cos[best] < 0.99985)
    )
    T_21 = geo.se3_from_Rt(Rs[best], ts[best])
    return InitResult(ok=ok, T_21=T_21, points=ptss[best], good=goods[best], used_h=use_h)
