"""Dense-blocked Schur complement solver for the reduced camera system.

The reference relies on g2o's sparse block solver with marginalized landmark
vertices (BlockSolver_6_3 + LinearSolverEigen, Optimizer.cc:56-63).  On TPU
the window sizes of local BA are small enough that the reduced (non-landmark)
system is a tiny dense matrix, while the landmark blocks are a batched array
of 3x3s — so the whole Schur elimination is three MXU matmuls and one batched
3x3 inverse, no sparsity bookkeeping at all.

Layout: the "c" (camera-like) vector stacks every non-eliminated variable's
tangent — poses (6 each), cuboids (9), planes (3).  Points are eliminated.
"""

from __future__ import annotations

import jax.numpy as jnp


def inv3x3(M):
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def schur_solve(H_cc, H_cl, H_ll, b_c, b_l, lam, free_c, point_active):
    """Solve the damped normal equations by eliminating the point blocks.

    Args:
      H_cc: (D, D) reduced-variable Hessian.
      H_cl: (D, P, 3) cross blocks.
      H_ll: (P, 3, 3) point blocks.
      b_c: (D,) gradient for reduced variables.
      b_l: (P, 3) gradient for points.
      lam: scalar LM damping (multiplicative on the diagonal).
      free_c: (D,) 1.0 for free reduced dims, 0.0 for fixed.
      point_active: (P,) 1.0 for points that are being optimized.

    Returns:
      delta_c (D,), delta_l (P, 3)
    """
    D = H_cc.shape[0]
    P = H_ll.shape[0]

    # Fixed reduced dims: zero row/col, unit diagonal.
    mask2 = free_c[:, None] * free_c[None, :]
    H_cc = H_cc * mask2 + jnp.diag(1.0 - free_c)
    b_c = b_c * free_c
    H_cl = H_cl * free_c[:, None, None] * point_active[None, :, None]

    # Landmark damping + inactive-point neutralization.
    eye3 = jnp.eye(3, dtype=H_ll.dtype)
    diag_ll = H_ll * eye3
    H_ll_damped = H_ll + lam * diag_ll + (1.0 - point_active)[:, None, None] * eye3 + 1e-6 * eye3
    b_l = b_l * point_active[:, None]
    Hll_inv = inv3x3(H_ll_damped)  # (P, 3, 3)

    # LM damping on the reduced diagonal.
    H_cc_damped = H_cc + lam * jnp.diag(jnp.diag(H_cc)) + 1e-6 * jnp.eye(D, dtype=H_cc.dtype)

    # Schur: S = Hcc - Hcl Hll^-1 Hlc ; rhs = bc - Hcl Hll^-1 bl.
    # The (p, j) contraction is reshaped into ONE (D, 3P) x (3P, D) matmul so
    # it lands on the MXU instead of a VPU-bound 3-deep einsum.
    tmp = jnp.einsum("dpi,pij->dpj", H_cl, Hll_inv)  # (D, P, 3)
    tmp2 = tmp.reshape(D, P * 3)
    Hcl2 = H_cl.reshape(D, P * 3)
    S = H_cc_damped - jnp.dot(tmp2, Hcl2.T, preferred_element_type=jnp.float32)
    rhs = b_c - tmp2 @ b_l.reshape(P * 3)

    delta_c = jnp.linalg.solve(S, rhs) * free_c

    # Back-substitute points: dl = Hll^-1 (bl - Hlc dc)
    Hlc_dc = (delta_c @ Hcl2).reshape(P, 3)
    delta_l = jnp.einsum("pij,pj->pi", Hll_inv, b_l - Hlc_dc) * point_active[:, None]
    return delta_c, delta_l
