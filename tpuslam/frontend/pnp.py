"""Batched RANSAC PnP for relocalization.

Fills the role of PnPsolver.cc (EPnP + RANSAC, used only by
Tracking::Relocalization, Tracking.cc:1707-1733).  TPU-native formulation:
instead of EPnP's control-point machinery, every RANSAC hypothesis is a
6-point DLT estimate of the full projection matrix (solved as one batched
eigh), orthonormalized to SE3; all hypotheses are scored against all
correspondences in one pass, and the winner is polished by the standard
motion-only LM (graph/lm.optimize_pose), mirroring the reference's
PnP -> PoseOptimization chain.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import geometry as geo


class PnPResult(NamedTuple):
    ok: jnp.ndarray
    T_cw: jnp.ndarray  # (4, 4)
    inliers: jnp.ndarray  # (N,)
    n_inliers: jnp.ndarray


def _dlt_pose(X, uv, fx, fy, cx, cy):
    """6+ point DLT for P = K [R|t]; returns T_cw via orthonormalization."""
    # normalize pixels to camera coords
    xn = (uv[:, 0] - cx) / fx
    yn = (uv[:, 1] - cy) / fy
    zeros = jnp.zeros_like(X[:, 0])
    ones = jnp.ones_like(X[:, 0])
    Xh = jnp.concatenate([X, ones[:, None]], axis=1)  # (M, 4)
    r1 = jnp.concatenate([Xh, jnp.zeros_like(Xh), -xn[:, None] * Xh], axis=1)
    r2 = jnp.concatenate([jnp.zeros_like(Xh), Xh, -yn[:, None] * Xh], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2M, 12)
    M = A.T @ A
    _, vecs = jnp.linalg.eigh(M)
    p = vecs[:, 0].reshape(3, 4)
    R_raw = p[:, :3]
    # sign: points must be in front
    depth_sign = jnp.sign(jnp.sum(Xh @ p[2])) * jnp.sign(jnp.linalg.det(R_raw))
    det_cbrt = jnp.sign(jnp.linalg.det(R_raw)) * jnp.abs(jnp.linalg.det(R_raw)) ** (1.0 / 3.0)
    p = p / jnp.where(jnp.abs(det_cbrt) < 1e-12, 1e-12, det_cbrt)
    p = p * jnp.sign(jnp.sum(Xh @ p[2]) + 1e-12)
    R_raw = p[:, :3]
    U, _, Vt = jnp.linalg.svd(R_raw)
    R = U @ Vt
    R = R * jnp.sign(jnp.linalg.det(R))
    t = p[:, 3]
    return geo.se3_from_Rt(R, t)


@functools.partial(jax.jit, static_argnames=("n_iters",))
def ransac_pnp(X, uv, valid, fx, fy, cx, cy, key, n_iters: int = 200, th_chi2: float = 5.991):
    """All-hypotheses-at-once PnP RANSAC over 6-point samples."""
    N = X.shape[0]

    def sample_one(k):
        g = jax.random.gumbel(k, (N,)) + jnp.where(valid, 0.0, -1e9)
        return jax.lax.top_k(g, 6)[1]

    keys = jax.random.split(key, n_iters)
    samples = jax.vmap(sample_one)(keys)

    Ts = jax.vmap(lambda idx: _dlt_pose(X[idx], uv[idx], fx, fy, cx, cy))(samples)

    def score(T):
        pc = geo.se3_apply(T, X)
        z = jnp.maximum(pc[:, 2], 1e-6)
        u = fx * pc[:, 0] / z + cx
        v = fy * pc[:, 1] / z + cy
        e = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
        inl = valid & (e < th_chi2) & (pc[:, 2] > 0)
        return jnp.sum(inl), inl

    n_inls, inls = jax.vmap(score)(Ts)
    best = jnp.argmax(n_inls)
    return PnPResult(
        ok=n_inls[best] >= 10,
        T_cw=Ts[best],
        inliers=inls[best],
        n_inliers=n_inls[best].astype(jnp.int32),
    )
