"""Sim3 essential-graph optimization (loop closing back end).

Replaces Optimizer::OptimizeEssentialGraph (Optimizer.cc:789-1052): vertices
are per-keyframe Sim3 poses (world->camera, scale 1 before the loop), edges
are relative Sim3 measurements from the covisibility graph / spanning tree /
loop edges.  Dense batched GN: residual r = log(M_ji . S_i . S_j^-1) via
jacfwd over left-multiplicative tangents, scatter-assembled normal equations,
one (7K x 7K) solve per iteration — the whole graph is one XLA program.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import geometry as geo


class Sim3Edges(NamedTuple):
    i: jnp.ndarray  # (E,) int32 from-vertex
    j: jnp.ndarray  # (E,) int32 to-vertex
    meas: jnp.ndarray  # (E, 4, 4) measured S_ji = S_j S_i^-1
    weight: jnp.ndarray  # (E,)
    valid: jnp.ndarray  # (E,) bool


def edge_residual(S_i, S_j, M_ji):
    """(7,) Sim3 log of M_ji . S_i . S_j^-1 (zero when consistent)."""
    return geo.sim3_log(M_ji @ S_i @ geo.sim3_inv(S_j))


def assemble_sim3_system(S, edges: Sim3Edges, D: int):
    """Linearize one edge bundle and scatter-add its (D, D) normal-equation
    contribution.  Shared by the single-device optimizer below and the
    edge-sharded distributed one (dist/ba.py — it psums these outputs).

    Returns (H, b, cost)."""

    def lin_edge(Si, Sj, M):
        def res(d):
            di, dj = d[:7], d[7:]
            return edge_residual(geo.sim3_exp(di) @ Si, geo.sim3_exp(dj) @ Sj, M)

        z = jnp.zeros(14)
        r = res(z)
        J = jax.jacfwd(res)(z)
        return r, J[:, :7], J[:, 7:]

    r, Ji, Jj = jax.vmap(lin_edge)(S[edges.i], S[edges.j], edges.meas)
    w = edges.weight * edges.valid
    r = jnp.where(edges.valid[:, None], r, 0.0)
    Ji = jnp.where(edges.valid[:, None, None], Ji, 0.0)
    Jj = jnp.where(edges.valid[:, None, None], Jj, 0.0)
    H = jnp.zeros((D, D))
    b = jnp.zeros((D,))

    def rows(idx):
        return 7 * idx[:, None, None] + jnp.arange(7)[None, :, None]

    def cols(idx):
        return 7 * idx[:, None, None] + jnp.arange(7)[None, None, :]

    JiW = Ji * w[:, None, None]
    JjW = Jj * w[:, None, None]
    H = H.at[rows(edges.i), cols(edges.i)].add(jnp.einsum("fdi,fdj->fij", JiW, Ji))
    H = H.at[rows(edges.j), cols(edges.j)].add(jnp.einsum("fdi,fdj->fij", JjW, Jj))
    Hij = jnp.einsum("fdi,fdj->fij", JiW, Jj)
    H = H.at[rows(edges.i), cols(edges.j)].add(Hij)
    H = H.at[rows(edges.j), cols(edges.i)].add(jnp.swapaxes(Hij, -1, -2))
    b = b.at[(7 * edges.i[:, None] + jnp.arange(7)[None, :])].add(
        -jnp.einsum("fdi,fd->fi", JiW, r)
    )
    b = b.at[(7 * edges.j[:, None] + jnp.arange(7)[None, :])].add(
        -jnp.einsum("fdi,fd->fi", JjW, r)
    )
    return H, b, jnp.sum(r * r * w[:, None])


def solve_sim3_step(S, H, b, free, lam: float):
    """Gauge-mask, damp, solve, retract — shared with the distributed path."""
    K = S.shape[0]
    D = 7 * K
    mask2 = free[:, None] * free[None, :]
    H = H * mask2 + jnp.diag(1.0 - free)
    b = b * free
    H = H + (lam + 1e-6) * jnp.eye(D)
    delta = jnp.linalg.solve(H, b) * free
    return jax.vmap(lambda dd, s: geo.sim3_exp(dd) @ s)(delta.reshape(K, 7), S)


@functools.partial(jax.jit, static_argnames=("n_iters",))
def optimize_essential_graph(S, fixed, edges: Sim3Edges, n_iters: int = 20, lam: float = 1e-6):
    """GN over Sim3 vertices.  ``S``: (K, 4, 4) sim3 world->camera;
    ``fixed``: (K,) bool (the loop KF is fixed, Optimizer.cc:828-842).

    Returns optimized (K, 4, 4) sim3 poses.
    """
    K = S.shape[0]
    D = 7 * K
    free = jnp.repeat((~fixed).astype(jnp.float32), 7, total_repeat_length=D)

    def body(S, _):
        H, b, cost = assemble_sim3_system(S, edges, D)
        return solve_sim3_step(S, H, b, free, lam), cost

    S, costs = jax.lax.scan(body, S, None, length=n_iters)
    return S, costs


def se3_to_sim3(T):
    """SE3 (..., 4, 4) -> Sim3 with scale 1 (same matrix)."""
    return T


def sim3_to_se3(S):
    """Sim3 -> SE3 with the scale folded into translation:
    Tcw = [R | t/s] (LoopClosing::CorrectLoop, LoopClosing.cc:488-494)."""
    s = geo.sim3_scale(S)
    R = geo.sim3_R(S)
    t = S[..., :3, 3] / s[..., None]
    return geo.se3_from_Rt(R, t)


def correct_points_for_sim3(points, first_kf, old_S, new_S):
    """Re-anchor points through their reference keyframe's correction:
    X' = S_new_kf^-1 ( S_old_kf ( X ) )  (LoopClosing.cc:443-516)."""
    S_old = old_S[first_kf]
    S_new = new_S[first_kf]
    p_cam = geo.sim3_apply(S_old, points)
    return geo.sim3_apply(geo.sim3_inv(S_new), p_cam)
