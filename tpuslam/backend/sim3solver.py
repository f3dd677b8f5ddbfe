"""Batched Sim3 RANSAC via Horn's closed-form alignment.

Replaces Sim3Solver.cc (3-point RANSAC, Horn 1987 quaternion method,
symmetric reprojection inlier check).  All hypotheses are evaluated at once:
sample (iters, 3) triples, compute Horn alignments with vmap, score every
hypothesis against every match in one batched projection.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import geometry as geo


class Sim3Result(NamedTuple):
    ok: jnp.ndarray  # () bool
    s: jnp.ndarray  # () scale (2 -> 1)
    R: jnp.ndarray  # (3, 3)
    t: jnp.ndarray  # (3,)
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray  # () int32


def horn_alignment(P1, P2, fix_scale: bool = False):
    """Closed-form s, R, t with P1 ~= s R P2 + t for (M, 3) point sets
    (Sim3Solver::ComputeSim3, Horn 1987; SVD variant for batch-safety)."""
    c1 = P1.mean(axis=0)
    c2 = P2.mean(axis=0)
    x1 = P1 - c1
    x2 = P2 - c2
    M = x1.T @ x2  # (3, 3)
    U, D, Vt = jnp.linalg.svd(M)
    S = jnp.eye(3, dtype=P1.dtype)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = S.at[2, 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = U @ S @ Vt
    if fix_scale:
        s = jnp.float32(1.0)
    else:
        num = jnp.sum(x1 * (x2 @ R.T))
        den = jnp.sum(x2 * x2)
        s = num / jnp.maximum(den, 1e-12)
    t = c1 - s * (R @ c2)
    return s, R, t


@functools.partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def solve_sim3(
    P1,
    P2,
    valid,
    uv1,
    uv2,
    K,
    key,
    n_iters: int = 200,
    fix_scale: bool = False,
    th_chi2: float = 9.210,
):
    """RANSAC Sim3 between matched 3D point sets with symmetric reprojection
    inlier check (Sim3Solver::CheckInliers; chi2 9.21 at 2 DoF 99%).

    P1/P2: (N, 3) camera-frame points in KF1 / KF2; uv1/uv2 their pixels.
    Returns the transform S12 mapping frame-2 points into frame 1.
    """
    N = P1.shape[0]

    def sample_one(k):
        g = jax.random.gumbel(k, (N,)) + jnp.where(valid, 0.0, -1e9)
        return jax.lax.top_k(g, 3)[1]

    keys = jax.random.split(key, n_iters)
    samples = jax.vmap(sample_one)(keys)  # (iters, 3)

    def fit(idx):
        return horn_alignment(P1[idx], P2[idx], fix_scale)

    ss, Rs, ts = jax.vmap(fit)(samples)

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    def project(p):
        z = jnp.maximum(p[..., 2], 1e-6)
        return jnp.stack([fx * p[..., 0] / z + cx, fy * p[..., 1] / z + cy], axis=-1)

    def score(s, R, t):
        p2_in_1 = s * (P2 @ R.T) + t
        e1 = jnp.sum((project(p2_in_1) - uv1) ** 2, axis=-1)
        s_inv = 1.0 / jnp.maximum(s, 1e-12)
        p1_in_2 = s_inv * ((P1 - t) @ R)
        e2 = jnp.sum((project(p1_in_2) - uv2) ** 2, axis=-1)
        inl = valid & (e1 < th_chi2) & (e2 < th_chi2)
        return jnp.sum(inl), inl

    n_inls, inls = jax.vmap(score)(ss, Rs, ts)
    best = jnp.argmax(n_inls)
    s, R, t = ss[best], Rs[best], ts[best]
    # refit on inliers of the best hypothesis (weighted Horn)
    w = inls[best].astype(jnp.float32)[:, None]
    nw = jnp.maximum(w.sum(), 3.0)
    c1 = jnp.sum(P1 * w, axis=0) / nw
    c2 = jnp.sum(P2 * w, axis=0) / nw
    x1 = (P1 - c1) * w
    x2 = (P2 - c2) * w
    M = x1.T @ (P2 - c2)
    U, D, Vt = jnp.linalg.svd(M)
    Sm = jnp.eye(3)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    Sm = Sm.at[2, 2].set(jnp.where(det < 0, -1.0, 1.0))
    R2 = U @ Sm @ Vt
    if fix_scale:
        s2 = jnp.float32(1.0)
    else:
        num = jnp.sum(x1 * ((P2 - c2) @ R2.T))
        den = jnp.sum(((P2 - c2) * w) * (P2 - c2))
        s2 = num / jnp.maximum(den, 1e-12)
    t2 = c1 - s2 * (R2 @ c2)
    n2, inl2 = score(s2, R2, t2)
    better = n2 >= n_inls[best]
    s = jnp.where(better, s2, s)
    R = jnp.where(better, R2, R)
    t = jnp.where(better, t2, t)
    inl = jnp.where(better, inl2, inls[best])
    n = jnp.where(better, n2, n_inls[best])
    return Sim3Result(ok=n >= 20, s=s, R=R, t=t, inliers=inl, n_inliers=n.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def optimize_sim3(S, P1, P2, uv1, uv2, K, valid, n_iters: int = 10,
                  th2: float = 10.0, fix_scale: bool = False, huber2: float = 10.0):
    """Gauss-Newton refinement of a Sim3 with bidirectional reprojection
    residuals — the Optimizer::OptimizeSim3 analogue (Optimizer.cc:1054-1249:
    one Sim3 vertex, EdgeSim3ProjectXYZ both directions, Huber sqrt(10),
    chi2 > 10 outlier pruning between rounds).

    S: (4, 4) Sim3 mapping frame-2 points into frame 1; P1/P2: (N, 3) points
    in their own camera frames; uv1/uv2: (N, 2) observed pixels (uv2[i]
    observes P1[i] in frame 2, uv1[i] observes P2[i] in frame 1).  Returns
    (S_refined, inliers (N,) bool, n_inliers).
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    def project(p):
        z = jnp.maximum(p[..., 2], 1e-6)
        return jnp.stack([fx * p[..., 0] / z + cx, fy * p[..., 1] / z + cy], -1)

    def residuals(S_):
        r1 = project(geo.sim3_apply(S_, P2)) - uv1
        r2 = project(geo.sim3_apply(geo.sim3_inv(S_), P1)) - uv2
        return r1, r2

    def chi2(S_):
        r1, r2 = residuals(S_)
        return jnp.sum(r1**2, -1), jnp.sum(r2**2, -1)

    def step(S_, active):
        def local_res(d):
            # left-multiplied local update exp(d) * S_; d = (omega, upsilon, sigma)
            Sd = geo.sim3_exp(d) @ S_
            r1, r2 = residuals(Sd)
            return jnp.concatenate([r1, r2], axis=0)  # (2N, 2)

        d0 = jnp.zeros(7)
        r0 = local_res(d0)
        J = jax.jacfwd(local_res)(d0)  # (2N, 2, 7)
        w = jnp.concatenate([active, active]).astype(jnp.float32)
        # Huber weights (delta^2 = huber2)
        e2 = jnp.sum(r0**2, -1)
        hw = jnp.where(e2 > huber2, jnp.sqrt(huber2 / jnp.maximum(e2, 1e-12)), 1.0)
        w = w * hw
        Jw = J * w[:, None, None]
        H = jnp.einsum("nij,nik->jk", Jw, J) + 1e-6 * jnp.eye(7)
        g = jnp.einsum("nij,ni->j", Jw, r0)
        if fix_scale:
            H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
            g = g.at[6].set(0.0)
        d = -jnp.linalg.solve(H, g)
        S_new = geo.sim3_exp(d) @ S_
        # keep the update only if the active-set robust cost improves
        def cost(Sx):
            c1, c2 = chi2(Sx)
            rho = lambda c: jnp.where(c > huber2, 2 * jnp.sqrt(huber2 * c) - huber2, c)
            return jnp.sum(jnp.where(active, rho(c1) + rho(c2), 0.0))

        return jnp.where(cost(S_new) < cost(S_), S_new, S_)

    active = valid
    # two rounds like the reference: optimize, prune chi2 > th2, re-optimize
    for _ in range(2):
        S = jax.lax.fori_loop(0, n_iters // 2, lambda _, s: step(s, active), S)
        c1, c2 = chi2(S)
        active = valid & (c1 < th2) & (c2 < th2)
    n_in = jnp.sum(active.astype(jnp.int32))
    return S, active, n_in
