"""Batched Levenberg-Marquardt over the heterogeneous SLAM factor graph.

Replaces g2o's SparseOptimizer + BlockSolver + OptimizationAlgorithmLevenberg
(the reference's Optimizer.cc builds a pointer graph per solve; we assemble
dense normal equations from padded factor arrays and eliminate points with
graph/schur.py).  One LM iteration is:

  vmapped linearize (jacfwd) -> scatter-add into (H_cc, H_cl, H_ll, b)
  -> Schur solve -> retract -> robust-chi2 accept/reject -> adapt lambda.

The two-phase outlier gating of the reference (5 iters, chi2 cut, 10 iters —
Optimizer.cc:700-786 and 2727-2838) is mirrored by ``local_ba``.

All factor bundles are fixed-capacity NamedTuples with validity masks; the
whole solve jits with static shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import geometry as geo
from . import factors as fac
from .schur import schur_solve

# ---------------------------------------------------------------------------
# Variable state and factor bundles
# ---------------------------------------------------------------------------


class BAState(NamedTuple):
    """All optimization variables, SoA, padded."""

    poses: jnp.ndarray  # (K, 4, 4) world->camera
    points: jnp.ndarray  # (P, 3)
    planes: jnp.ndarray  # (Q, 4) Hessian form, world frame
    cuboid_pose: jnp.ndarray  # (C, 4, 4) object->world
    cuboid_scale: jnp.ndarray  # (C, 3)


class MonoFactors(NamedTuple):
    kf: jnp.ndarray  # (F,) int32
    pt: jnp.ndarray  # (F,) int32
    uv: jnp.ndarray  # (F, 2)
    inv_sigma2: jnp.ndarray  # (F,)
    valid: jnp.ndarray  # (F,) bool

    @staticmethod
    def empty(n):
        return MonoFactors(
            kf=jnp.zeros(n, jnp.int32),
            pt=jnp.zeros(n, jnp.int32),
            uv=jnp.zeros((n, 2), jnp.float32),
            inv_sigma2=jnp.ones(n, jnp.float32),
            valid=jnp.zeros(n, bool),
        )


class StereoFactors(NamedTuple):
    kf: jnp.ndarray
    pt: jnp.ndarray
    uvr: jnp.ndarray  # (F, 3) u, v, u_right
    inv_sigma2: jnp.ndarray
    valid: jnp.ndarray

    @staticmethod
    def empty(n):
        return StereoFactors(
            kf=jnp.zeros(n, jnp.int32),
            pt=jnp.zeros(n, jnp.int32),
            uvr=jnp.zeros((n, 3), jnp.float32),
            inv_sigma2=jnp.ones(n, jnp.float32),
            valid=jnp.zeros(n, bool),
        )


class PlaneFactors(NamedTuple):
    """Camera-plane observations; ``kind``: 0 direct (3d), 1 vertical (2d),
    2 parallel (2d) — EdgePlane / EdgeVerticalPlane / EdgeParallelPlane."""

    kf: jnp.ndarray
    plane: jnp.ndarray
    meas: jnp.ndarray  # (F, 4) local-frame plane coefficients
    kind: jnp.ndarray  # (F,) int32
    valid: jnp.ndarray

    @staticmethod
    def empty(n):
        return PlaneFactors(
            kf=jnp.zeros(n, jnp.int32),
            plane=jnp.zeros(n, jnp.int32),
            meas=jnp.tile(jnp.array([[0.0, 0.0, 1.0, 1.0]], jnp.float32), (n, 1)),
            kind=jnp.zeros(n, jnp.int32),
            valid=jnp.zeros(n, bool),
        )


class CuboidBBoxFactors(NamedTuple):
    kf: jnp.ndarray
    cub: jnp.ndarray
    bbox: jnp.ndarray  # (F, 4) [cx, cy, w, h]
    weight: jnp.ndarray  # (F,) ba_weight_bbox * meas_quality
    valid: jnp.ndarray

    @staticmethod
    def empty(n):
        return CuboidBBoxFactors(
            kf=jnp.zeros(n, jnp.int32),
            cub=jnp.zeros(n, jnp.int32),
            bbox=jnp.zeros((n, 4), jnp.float32),
            weight=jnp.ones(n, jnp.float32),
            valid=jnp.zeros(n, bool),
        )


class CuboidCornerFactors(NamedTuple):
    kf: jnp.ndarray
    cub: jnp.ndarray
    corners: jnp.ndarray  # (F, 16)
    weight: jnp.ndarray
    valid: jnp.ndarray

    @staticmethod
    def empty(n):
        return CuboidCornerFactors(
            kf=jnp.zeros(n, jnp.int32),
            cub=jnp.zeros(n, jnp.int32),
            corners=jnp.zeros((n, 16), jnp.float32),
            weight=jnp.ones(n, jnp.float32),
            valid=jnp.zeros(n, bool),
        )


class CuboidSE3Factors(NamedTuple):
    kf: jnp.ndarray
    cub: jnp.ndarray
    meas_pose: jnp.ndarray  # (F, 4, 4) cuboid in camera frame
    meas_scale: jnp.ndarray  # (F, 3)
    weight: jnp.ndarray
    valid: jnp.ndarray

    @staticmethod
    def empty(n):
        return CuboidSE3Factors(
            kf=jnp.zeros(n, jnp.int32),
            cub=jnp.zeros(n, jnp.int32),
            meas_pose=jnp.tile(jnp.eye(4, dtype=jnp.float32), (n, 1, 1)),
            meas_scale=jnp.ones((n, 3), jnp.float32),
            weight=jnp.ones(n, jnp.float32),
            valid=jnp.zeros(n, bool),
        )


class PointCuboidFactors(NamedTuple):
    """One factor per cuboid: mean hinge of its owned (fixed) points
    (EdgePointCuboidOnlyObject, Optimizer.cc:2556-2655)."""

    cub: jnp.ndarray  # (F,) int32
    pts: jnp.ndarray  # (F, M) int32 indices into state.points
    pts_mask: jnp.ndarray  # (F, M) float
    weight: jnp.ndarray  # (F,)
    valid: jnp.ndarray

    @staticmethod
    def empty(n, m):
        return PointCuboidFactors(
            cub=jnp.zeros(n, jnp.int32),
            pts=jnp.zeros((n, m), jnp.int32),
            pts_mask=jnp.zeros((n, m), jnp.float32),
            weight=jnp.ones(n, jnp.float32),
            valid=jnp.zeros(n, bool),
        )


class CuboidPlaneFactors(NamedTuple):
    cub: jnp.ndarray
    plane: jnp.ndarray
    face: jnp.ndarray  # (F,) int32 matched face index 0..5
    valid: jnp.ndarray

    @staticmethod
    def empty(n):
        return CuboidPlaneFactors(
            cub=jnp.zeros(n, jnp.int32),
            plane=jnp.zeros(n, jnp.int32),
            face=jnp.zeros(n, jnp.int32),
            valid=jnp.zeros(n, bool),
        )


class BAData(NamedTuple):
    """Everything but the variables: factors, gauges, camera."""

    pose_fixed: jnp.ndarray  # (K,) bool
    point_active: jnp.ndarray  # (P,) bool
    plane_active: jnp.ndarray  # (Q,) bool
    cuboid_active: jnp.ndarray  # (C,) bool
    mono: MonoFactors
    stereo: StereoFactors
    plane_obs: PlaneFactors
    cub_bbox: CuboidBBoxFactors
    cub_corner: CuboidCornerFactors
    cub_se3: CuboidSE3Factors
    pt_cub: PointCuboidFactors
    cub_plane: CuboidPlaneFactors
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    bf: jnp.ndarray
    # 1.0 freezes cuboid scale dims in the solve (VertexCuboidFixScale — the
    # reference's dormant ObjectFixScale path, Optimizer.cc:2147-2150)
    cuboid_fix_scale: float = 0.0


def make_ba_data(
    poses_k,
    points_p,
    planes_q,
    cuboids_c,
    cam,
    *,
    mono=None,
    stereo=None,
    plane_obs=None,
    cub_bbox=None,
    cub_corner=None,
    cub_se3=None,
    pt_cub=None,
    cub_plane=None,
    pose_fixed=None,
    point_active=None,
    plane_active=None,
    cuboid_active=None,
    pt_cub_m: int = 64,
    cuboid_fix_scale: float = 0.0,
):
    """Convenience constructor filling absent factor types with empties."""
    return BAData(
        pose_fixed=pose_fixed if pose_fixed is not None else jnp.zeros(poses_k, bool),
        point_active=point_active if point_active is not None else jnp.ones(points_p, bool),
        plane_active=plane_active if plane_active is not None else jnp.zeros(planes_q, bool),
        cuboid_active=cuboid_active if cuboid_active is not None else jnp.zeros(cuboids_c, bool),
        mono=mono if mono is not None else MonoFactors.empty(1),
        stereo=stereo if stereo is not None else StereoFactors.empty(1),
        plane_obs=plane_obs if plane_obs is not None else PlaneFactors.empty(1),
        cub_bbox=cub_bbox if cub_bbox is not None else CuboidBBoxFactors.empty(1),
        cub_corner=cub_corner if cub_corner is not None else CuboidCornerFactors.empty(1),
        cub_se3=cub_se3 if cub_se3 is not None else CuboidSE3Factors.empty(1),
        pt_cub=pt_cub if pt_cub is not None else PointCuboidFactors.empty(1, pt_cub_m),
        cub_plane=cub_plane if cub_plane is not None else CuboidPlaneFactors.empty(1),
        fx=cam.fx,
        fy=cam.fy,
        cx=cam.cx,
        cy=cam.cy,
        bf=cam.bf,
        cuboid_fix_scale=cuboid_fix_scale,
    )


class BAWeights(NamedTuple):
    """Information-matrix scalars and Huber chi2 thresholds, from BAConfig
    (defaults: Parameters.cc:55-75, Optimizer.cc:2194-2206)."""

    chi2_mono: float = 5.991
    chi2_stereo: float = 7.815
    plane_angle_info: float = 3282.8  # already divided: 3282.8 / sigma^2
    plane_dist_info: float = 10000.0  # sigma_dist^2 with sigma=100
    plane_chi: float = 500.0
    plane_vp_info: float = 13131.2  # 3282.8 / 0.5^2
    plane_vp_chi: float = 200.0
    bbox_chi: float = 80.0
    corner_chi: float = 10.0
    se3_chi: float = 900.0
    se3_weight: float = 1.0
    pt_obj_chi: float = 10.0
    pt_obj_weight: float = 1.0
    max_outside_margin_ratio: float = 1.0
    pt_obj_prior_weight: float = 0.2  # g2o_cuboid.cc:150
    cub_plane_angle_info: float = 820.7  # 3282.8 / 2.0^2
    cub_plane_dist_info: float = 10000.0
    cub_plane_chi: float = 500.0

    @staticmethod
    def from_config(ba):
        return BAWeights(
            chi2_mono=ba.chi2_mono,
            chi2_stereo=ba.chi2_stereo,
            plane_angle_info=3282.8 / ba.plane_angle_info**2,
            plane_dist_info=ba.plane_dist_info**2,
            plane_chi=ba.plane_chi,
            plane_vp_info=3282.8 / ba.plane_par_sigma**2,
            plane_vp_chi=ba.plane_vp_chi,
            bbox_chi=ba.th_huber_bbox_2d,
            corner_chi=ba.th_huber_corner_2d,
            se3_chi=ba.th_huber_se3,
            se3_weight=ba.ba_weight_se3,
            pt_obj_chi=ba.th_huber_pt_obj,
            pt_obj_weight=ba.ba_weight_pt_obj,
            max_outside_margin_ratio=ba.max_outside_margin_ratio,
            cub_plane_angle_info=3282.8 / ba.cuboid_plane_angle_info**2,
            cub_plane_dist_info=ba.cuboid_plane_dist_info**2,
            cub_plane_chi=ba.cuboid_plane_chi,
        )


# ---------------------------------------------------------------------------
# Assembly
# ---------------------------------------------------------------------------


def _layout(state: BAState):
    K = state.poses.shape[0]
    C = state.cuboid_pose.shape[0]
    Q = state.planes.shape[0]
    return K, C, Q, 6 * K + 9 * C + 3 * Q


def _add_cc(H, rows0, cols0, blocks):
    di, dj = blocks.shape[-2], blocks.shape[-1]
    rows = rows0[:, None, None] + jnp.arange(di)[None, :, None]
    cols = cols0[:, None, None] + jnp.arange(dj)[None, None, :]
    return H.at[rows, cols].add(blocks)


def _add_b(b, rows0, vecs):
    d = vecs.shape[-1]
    rows = rows0[:, None] + jnp.arange(d)[None, :]
    return b.at[rows].add(vecs)


def _rho_huber(chi2, delta2):
    """Robustified chi2 (g2o RobustKernelHuber::robustify)."""
    return jnp.where(
        chi2 <= delta2, chi2, 2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 0.0)) - delta2
    )


def _mask_lin(valid, r, *jacs):
    """Zero residuals/Jacobians of invalid (padded) factors BEFORE weighting.

    Padded factor slots can produce NaN (e.g. degenerate plane/cuboid math on
    placeholder data); ``NaN * 0`` would poison the scatter-adds, so invalid
    lanes are where-selected away instead of multiplied.
    """
    v = valid
    r = jnp.where(v[:, None], r, 0.0)
    out = [jnp.where(v[:, None, None], J, 0.0) for J in jacs]
    return (r, *out)


def _rho_sum(chi2, delta2, valid):
    """Robust total chi2 with NaN-safe masking of invalid factors."""
    rho = _rho_huber(chi2, delta2)
    return jnp.sum(jnp.where(valid & jnp.isfinite(rho), rho, 0.0))



def _assemble_reproj_blocked(H_cc, H_cl, H_ll, b_c, b_l, r, Jp, Jx, info, wf, pt, n_per_kf, K, P):
    """Scatter-free normal-equation assembly for KF-MAJOR reprojection lanes.

    When the factor bundle is packed as ``kf = repeat(arange(K), N)`` (how
    pack_local_ba and the bench lay lanes out), every Hessian contribution has
    a static home: pose blocks reduce over the N axis with no scatter, and
    the per-point blocks (H_ll, b_l, H_cl) become one one-hot matmul per
    keyframe (a keyframe observes each point at most once, so the one-hot is
    a permutation — MXU work instead of the giant element scatter that
    dominated the r03 BA profile at ~4.4 ms/iteration on a v5e).
    """
    F, R = r.shape
    W = F // n_per_kf
    rw = r.reshape(W, n_per_kf, R)
    Jpw = Jp.reshape(W, n_per_kf, R, 6)
    Jxw = Jx.reshape(W, n_per_kf, R, 3)
    iw = (info * wf[:, None]).reshape(W, n_per_kf, R)
    JpW = Jpw * iw[..., None]
    JxW = Jxw * iw[..., None]
    rows6 = 6 * jnp.arange(W)
    H_cc = _add_cc(H_cc, rows6, rows6, jnp.einsum("wnri,wnrj->wij", JpW, Jpw))
    b_c = _add_b(b_c, rows6, -jnp.einsum("wnri,wnr->wi", JpW, rw))
    Hll_blk = jnp.einsum("wnri,wnrj->wnij", JxW, Jxw)  # (W, N, 3, 3)
    bl_blk = -jnp.einsum("wnri,wnr->wni", JxW, rw)
    cross = jnp.einsum("wnri,wnrj->wnij", JpW, Jxw)  # (W, N, 6, 3)
    ptw = jnp.where(wf.reshape(W, n_per_kf) > 0, pt.reshape(W, n_per_kf), P)
    arangeP = jnp.arange(P)
    # one (P, N) x (N, 30) matmul per keyframe: [H_ll | b_l | H_cl] payloads
    # ride the same one-hot so the MXU sees a single contraction
    payload = jnp.concatenate(
        [
            Hll_blk.reshape(W, n_per_kf, 9),
            bl_blk,
            cross.reshape(W, n_per_kf, 18),
        ],
        axis=-1,
    )  # (W, N, 30)

    def body(carry, xs):
        H_ll, b_l = carry
        pt_n, pay_n = xs
        oh = (pt_n[:, None] == arangeP[None, :]).astype(jnp.float32)  # (N, P)
        out = jnp.einsum("np,nc->pc", oh, pay_n)  # (P, 30)
        H_ll = H_ll + out[:, :9].reshape(P, 3, 3)
        b_l = b_l + out[:, 9:12]
        Hcl_w = out[:, 12:].reshape(P, 6, 3).transpose(1, 0, 2)  # (6, P, 3)
        return (H_ll, b_l), Hcl_w

    (H_ll, b_l), Hcl_stack = jax.lax.scan(body, (H_ll, b_l), (ptw, payload))
    H_cl = H_cl.at[: 6 * W].add(Hcl_stack.reshape(6 * W, P, 3))
    return H_cc, H_cl, H_ll, b_c, b_l


def build_system(state: BAState, data: BAData, w: BAWeights, reproj_n: int = 0):
    """Assemble damped-less normal equations and total robust chi2.

    ``reproj_n > 0`` is an EXPLICIT claim that the mono/stereo factor lanes
    are kf-major — exactly ``reproj_n`` lanes per keyframe in
    ``repeat(arange(K), reproj_n)`` order, as produced by
    ``backend.local_ba.pack_local_ba`` — which selects the scatter-free
    blocked assembly.  A caller whose lane count does not match gets a hard
    error rather than a silent fall-back (a coincidentally-divisible
    non-kf-major layout would corrupt the normal equations, ADVICE r04).

    Returns (H_cc, H_cl, H_ll, b_c, b_l, chi2_total).
    """
    K, C, Q, D = _layout(state)
    P = state.points.shape[0]
    H_cc = jnp.zeros((D, D), jnp.float32)
    H_cl = jnp.zeros((D, P, 3), jnp.float32)
    H_ll = jnp.zeros((P, 3, 3), jnp.float32)
    b_c = jnp.zeros((D,), jnp.float32)
    b_l = jnp.zeros((P, 3), jnp.float32)
    chi2_total = 0.0

    pose_row = lambda kf: 6 * kf
    cub_row = lambda c: 6 * K + 9 * c
    plane_row = lambda q: 6 * K + 9 * C + 3 * q

    # ---- mono reprojection -------------------------------------------------
    m = data.mono

    def lin_mono(T, X, uv):
        return fac.linearize(
            fac.mono_residual,
            ((fac.retract_pose, 6), (fac.retract_point, 3)),
            (T, X),
            uv,
            data.fx,
            data.fy,
            data.cx,
            data.cy,
        )

    (r, (Jp, Jx)) = jax.vmap(lin_mono)(state.poses[m.kf], state.points[m.pt], m.uv)
    r, Jp, Jx = _mask_lin(m.valid, r, Jp, Jx)
    info = m.inv_sigma2[:, None] * jnp.ones((1, 2))
    chi2 = jnp.sum(r * r * info, axis=-1)
    w_rob = fac.huber_weight(chi2, w.chi2_mono)
    wf = w_rob * m.valid
    chi2_total += _rho_sum(chi2, w.chi2_mono, m.valid)
    if reproj_n and m.kf.shape[0] > 1:  # 1 lane == the .empty() placeholder
        if m.kf.shape[0] != reproj_n * K:
            raise ValueError(
                f"reproj_n={reproj_n} claims kf-major mono lanes but "
                f"{m.kf.shape[0]} != {reproj_n}*{K}"
            )
        H_cc, H_cl, H_ll, b_c, b_l = _assemble_reproj_blocked(
            H_cc, H_cl, H_ll, b_c, b_l, r, Jp, Jx, info, wf, m.pt, reproj_n, K, P
        )
    else:
        # generic scatter path (arbitrary lane layout)
        JpW = Jp * (info * wf[:, None])[:, :, None]
        H_cc = _add_cc(H_cc, pose_row(m.kf), pose_row(m.kf), jnp.einsum("fdi,fdj->fij", JpW, Jp))
        b_c = _add_b(b_c, pose_row(m.kf), -jnp.einsum("fdi,fd->fi", JpW, r))
        JxW = Jx * (info * wf[:, None])[:, :, None]
        H_ll = H_ll.at[m.pt].add(jnp.einsum("fdi,fdj->fij", JxW, Jx))
        b_l = b_l.at[m.pt].add(-jnp.einsum("fdi,fd->fi", JxW, r))
        cross = jnp.einsum("fdi,fdj->fij", JpW, Jx)
        rows = pose_row(m.kf)[:, None, None] + jnp.arange(6)[None, :, None]
        pts = m.pt[:, None, None] * jnp.ones((1, 6, 3), jnp.int32)
        cols3 = jnp.arange(3)[None, None, :] * jnp.ones((1, 6, 1), jnp.int32)
        H_cl = H_cl.at[rows, pts, cols3].add(cross)

    # ---- stereo reprojection ----------------------------------------------
    s = data.stereo

    def lin_stereo(T, X, uvr):
        return fac.linearize(
            fac.stereo_residual,
            ((fac.retract_pose, 6), (fac.retract_point, 3)),
            (T, X),
            uvr,
            data.fx,
            data.fy,
            data.cx,
            data.cy,
            data.bf,
        )

    (r, (Jp, Jx)) = jax.vmap(lin_stereo)(state.poses[s.kf], state.points[s.pt], s.uvr)
    r, Jp, Jx = _mask_lin(s.valid, r, Jp, Jx)
    info = s.inv_sigma2[:, None] * jnp.ones((1, 3))
    chi2 = jnp.sum(r * r * info, axis=-1)
    w_rob = fac.huber_weight(chi2, w.chi2_stereo)
    wf = w_rob * s.valid
    chi2_total += _rho_sum(chi2, w.chi2_stereo, s.valid)
    if reproj_n and s.kf.shape[0] > 1:  # 1 lane == the .empty() placeholder
        if s.kf.shape[0] != reproj_n * K:
            raise ValueError(
                f"reproj_n={reproj_n} claims kf-major stereo lanes but "
                f"{s.kf.shape[0]} != {reproj_n}*{K}"
            )
        H_cc, H_cl, H_ll, b_c, b_l = _assemble_reproj_blocked(
            H_cc, H_cl, H_ll, b_c, b_l, r, Jp, Jx, info, wf, s.pt, reproj_n, K, P
        )
    else:
        JpW = Jp * (info * wf[:, None])[:, :, None]
        H_cc = _add_cc(H_cc, pose_row(s.kf), pose_row(s.kf), jnp.einsum("fdi,fdj->fij", JpW, Jp))
        b_c = _add_b(b_c, pose_row(s.kf), -jnp.einsum("fdi,fd->fi", JpW, r))
        JxW = Jx * (info * wf[:, None])[:, :, None]
        H_ll = H_ll.at[s.pt].add(jnp.einsum("fdi,fdj->fij", JxW, Jx))
        b_l = b_l.at[s.pt].add(-jnp.einsum("fdi,fd->fi", JxW, r))
        cross = jnp.einsum("fdi,fdj->fij", JpW, Jx)
        rows = pose_row(s.kf)[:, None, None] + jnp.arange(6)[None, :, None]
        pts = s.pt[:, None, None] * jnp.ones((1, 6, 3), jnp.int32)
        cols3 = jnp.arange(3)[None, None, :] * jnp.ones((1, 6, 1), jnp.int32)
        H_cl = H_cl.at[rows, pts, cols3].add(cross)

    # ---- camera-plane (direct / vertical / parallel share one bundle) -----
    po = data.plane_obs

    def lin_plane(T, plane_w, meas, kind):
        def run(res3, res2_ver, res2_par):
            r3, j3 = res3
            rv, jv = res2_ver
            rp, jp_ = res2_par
            r2 = jnp.where(kind == 1, rv, rp)
            j2p = jnp.where(kind == 1, jv[0], jp_[0])
            j2q = jnp.where(kind == 1, jv[1], jp_[1])
            # embed 2-dim residual in 3 dims with zero third component
            r = jnp.where(kind == 0, r3, jnp.concatenate([r2, jnp.zeros(1)]))
            Jp_ = jnp.where(kind == 0, j3[0], jnp.concatenate([j2p, jnp.zeros((1, 6))], 0))
            Jq_ = jnp.where(kind == 0, j3[1], jnp.concatenate([j2q, jnp.zeros((1, 3))], 0))
            return r, Jp_, Jq_

        rets = ((fac.retract_pose, 6), (fac.retract_plane, 3))
        res3 = fac.linearize(fac.plane_residual, rets, (T, plane_w), meas)
        resv = fac.linearize(fac.plane_ver_residual, rets, (T, plane_w), meas)
        resp = fac.linearize(fac.plane_par_residual, rets, (T, plane_w), meas)
        return run(res3, resv, resp)

    r, Jp, Jq = jax.vmap(lin_plane)(state.poses[po.kf], state.planes[po.plane], po.meas, po.kind)
    r, Jp, Jq = _mask_lin(po.valid, r, Jp, Jq)
    info_dir = jnp.stack(
        [
            jnp.full_like(po.kind, w.plane_angle_info, dtype=jnp.float32),
            jnp.full_like(po.kind, w.plane_angle_info, dtype=jnp.float32),
            jnp.full_like(po.kind, w.plane_dist_info, dtype=jnp.float32),
        ],
        axis=-1,
    )
    info_vp = jnp.stack(
        [
            jnp.full_like(po.kind, w.plane_vp_info, dtype=jnp.float32),
            jnp.full_like(po.kind, w.plane_vp_info, dtype=jnp.float32),
            jnp.zeros_like(po.kind, dtype=jnp.float32),
        ],
        axis=-1,
    )
    info = jnp.where((po.kind == 0)[:, None], info_dir, info_vp)
    delta2 = jnp.where(po.kind == 0, w.plane_chi, w.plane_vp_chi)
    chi2 = jnp.sum(r * r * info, axis=-1)
    w_rob = fac.huber_weight(chi2, delta2)
    wf = w_rob * po.valid
    chi2_total += _rho_sum(chi2, delta2, po.valid)
    Wr = info * r * wf[:, None]
    JpW = Jp * (info * wf[:, None])[:, :, None]
    JqW = Jq * (info * wf[:, None])[:, :, None]
    H_cc = _add_cc(H_cc, pose_row(po.kf), pose_row(po.kf), jnp.einsum("fdi,fdj->fij", JpW, Jp))
    H_cc = _add_cc(H_cc, plane_row(po.plane), plane_row(po.plane), jnp.einsum("fdi,fdj->fij", JqW, Jq))
    Hpq = jnp.einsum("fdi,fdj->fij", JpW, Jq)
    H_cc = _add_cc(H_cc, pose_row(po.kf), plane_row(po.plane), Hpq)
    H_cc = _add_cc(H_cc, plane_row(po.plane), pose_row(po.kf), jnp.swapaxes(Hpq, -1, -2))
    b_c = _add_b(b_c, pose_row(po.kf), -jnp.einsum("fdi,fd->fi", Jp, Wr))
    b_c = _add_b(b_c, plane_row(po.plane), -jnp.einsum("fdi,fd->fi", Jq, Wr))

    # ---- camera-cuboid 2D bbox --------------------------------------------
    cb = data.cub_bbox
    Kmat = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32
    )
    Kmat = Kmat.at[0, 0].set(data.fx).at[1, 1].set(data.fy).at[0, 2].set(data.cx).at[1, 2].set(data.cy)

    def lin_bbox(T, cp, cs, bbox):
        return fac.linearize(
            fac.cuboid_bbox_residual,
            ((fac.retract_pose, 6), (fac.retract_cuboid, 9)),
            (T, (cp, cs)),
            bbox,
            Kmat,
        )

    (r, (Jp, Jc)) = jax.vmap(lin_bbox)(
        state.poses[cb.kf], state.cuboid_pose[cb.cub], state.cuboid_scale[cb.cub], cb.bbox
    )
    r, Jp, Jc = _mask_lin(cb.valid, r, Jp, Jc)
    info = (cb.weight**2)[:, None] * jnp.ones((1, 4))
    chi2 = jnp.sum(r * r * info, axis=-1)
    w_rob = fac.huber_weight(chi2, w.bbox_chi)
    wf = w_rob * cb.valid
    chi2_total += _rho_sum(chi2, w.bbox_chi, cb.valid)
    H_cc, b_c = _binary_cc(
        H_cc, b_c, r, Jp, Jc, wf, pose_row(cb.kf), cub_row(cb.cub), info
    )

    # ---- camera-cuboid corners ---------------------------------------------
    cc = data.cub_corner

    def lin_corner(T, cp, cs, corners):
        return fac.linearize(
            fac.cuboid_corner_residual,
            ((fac.retract_pose, 6), (fac.retract_cuboid, 9)),
            (T, (cp, cs)),
            corners,
            Kmat,
        )

    (r, (Jp, Jc)) = jax.vmap(lin_corner)(
        state.poses[cc.kf], state.cuboid_pose[cc.cub], state.cuboid_scale[cc.cub], cc.corners
    )
    r, Jp, Jc = _mask_lin(cc.valid, r, Jp, Jc)
    info = (cc.weight**2)[:, None] * jnp.ones((1, 16))
    chi2 = jnp.sum(r * r * info, axis=-1)
    w_rob = fac.huber_weight(chi2, w.corner_chi)
    wf = w_rob * cc.valid
    chi2_total += _rho_sum(chi2, w.corner_chi, cc.valid)
    H_cc, b_c = _binary_cc(
        H_cc, b_c, r, Jp, Jc, wf, pose_row(cc.kf), cub_row(cc.cub), info
    )

    # ---- camera-cuboid 3D (SE3 + scale log error) ---------------------------
    c3 = data.cub_se3

    def lin_cse3(T, cp, cs, mp, ms):
        return fac.linearize(
            fac.cuboid_se3_residual,
            ((fac.retract_pose, 6), (fac.retract_cuboid, 9)),
            (T, (cp, cs)),
            mp,
            ms,
        )

    (r, (Jp, Jc)) = jax.vmap(lin_cse3)(
        state.poses[c3.kf],
        state.cuboid_pose[c3.cub],
        state.cuboid_scale[c3.cub],
        c3.meas_pose,
        c3.meas_scale,
    )
    r, Jp, Jc = _mask_lin(c3.valid, r, Jp, Jc)
    info = (c3.weight**2 * w.se3_weight**2)[:, None] * jnp.ones((1, 9))
    chi2 = jnp.sum(r * r * info, axis=-1)
    w_rob = fac.huber_weight(chi2, w.se3_chi)
    wf = w_rob * c3.valid
    chi2_total += _rho_sum(chi2, w.se3_chi, c3.valid)
    H_cc, b_c = _binary_cc(
        H_cc, b_c, r, Jp, Jc, wf, pose_row(c3.kf), cub_row(c3.cub), info
    )

    # ---- point-in-cuboid (unary on cuboid; points fixed) --------------------
    pc = data.pt_cub

    def lin_ptcub(cp, cs, pts_idx, pts_mask):
        pts = state.points[pts_idx]
        return fac.linearize(
            fac.point_cuboid_residual,
            ((fac.retract_cuboid, 9),),
            ((cp, cs),),
            pts,
            pts_mask,
            w.max_outside_margin_ratio,
            w.pt_obj_prior_weight,
        )

    (r, (Jc,)) = jax.vmap(lin_ptcub)(
        state.cuboid_pose[pc.cub], state.cuboid_scale[pc.cub], pc.pts, pc.pts_mask
    )
    r, Jc = _mask_lin(pc.valid, r, Jc)
    info = (pc.weight**2 * w.pt_obj_weight**2)[:, None] * jnp.ones((1, 3))
    chi2 = jnp.sum(r * r * info, axis=-1)
    w_rob = fac.huber_weight(chi2, w.pt_obj_chi)
    wf = w_rob * pc.valid
    chi2_total += _rho_sum(chi2, w.pt_obj_chi, pc.valid)
    JcW = Jc * (info * wf[:, None])[:, :, None]
    H_cc = _add_cc(H_cc, cub_row(pc.cub), cub_row(pc.cub), jnp.einsum("fdi,fdj->fij", JcW, Jc))
    b_c = _add_b(b_c, cub_row(pc.cub), -jnp.einsum("fdi,fd->fi", JcW, r))

    # ---- cuboid-plane (geometric face residual) ------------------------------
    cpQ = data.cub_plane

    def lin_cubplane(cp, cs, plane_w, face):
        return fac.linearize(
            fac.cuboid_plane_residual,
            ((fac.retract_cuboid, 9), (fac.retract_plane, 3)),
            ((cp, cs), plane_w),
            face,
        )

    (r, (Jc, Jq)) = jax.vmap(lin_cubplane)(
        state.cuboid_pose[cpQ.cub], state.cuboid_scale[cpQ.cub], state.planes[cpQ.plane], cpQ.face
    )
    r, Jc, Jq = _mask_lin(cpQ.valid, r, Jc, Jq)
    info = jnp.stack(
        [
            jnp.full(r.shape[0], w.cub_plane_angle_info, jnp.float32),
            jnp.full(r.shape[0], w.cub_plane_angle_info, jnp.float32),
            jnp.full(r.shape[0], w.cub_plane_dist_info, jnp.float32),
        ],
        axis=-1,
    )
    chi2 = jnp.sum(r * r * info, axis=-1)
    w_rob = fac.huber_weight(chi2, w.cub_plane_chi)
    wf = w_rob * cpQ.valid
    chi2_total += _rho_sum(chi2, w.cub_plane_chi, cpQ.valid)
    H_cc, b_c = _binary_cc(
        H_cc, b_c, r, Jc, Jq, wf, cub_row(cpQ.cub), plane_row(cpQ.plane), info
    )

    return H_cc, H_cl, H_ll, b_c, b_l, chi2_total


def _binary_cc(H_cc, b_c, r, J_i, J_j, wf, row_i, row_j, info):
    """Contribution of a binary factor whose two variables both live in the
    reduced block (pose-cuboid, pose-plane, cuboid-plane)."""
    JiW = J_i * (info * wf[:, None])[:, :, None]
    JjW = J_j * (info * wf[:, None])[:, :, None]
    Wr = info * r * wf[:, None]
    H_cc = _add_cc(H_cc, row_i, row_i, jnp.einsum("fdi,fdj->fij", JiW, J_i))
    H_cc = _add_cc(H_cc, row_j, row_j, jnp.einsum("fdi,fdj->fij", JjW, J_j))
    Hij = jnp.einsum("fdi,fdj->fij", JiW, J_j)
    H_cc = _add_cc(H_cc, row_i, row_j, Hij)
    H_cc = _add_cc(H_cc, row_j, row_i, jnp.swapaxes(Hij, -1, -2))
    b_c = _add_b(b_c, row_i, -jnp.einsum("fdi,fd->fi", J_i, Wr))
    b_c = _add_b(b_c, row_j, -jnp.einsum("fdi,fd->fi", J_j, Wr))
    return H_cc, b_c


def total_chi2(state: BAState, data: BAData, w: BAWeights):
    """Robust total chi2 only (for LM accept/reject) — cheap re-evaluation."""
    chi2 = 0.0
    m = data.mono
    r = jax.vmap(fac.mono_residual, in_axes=(0, 0, 0, None, None, None, None))(
        state.poses[m.kf], state.points[m.pt], m.uv, data.fx, data.fy, data.cx, data.cy
    )
    c = jnp.sum(r * r, axis=-1) * m.inv_sigma2
    chi2 += _rho_sum(c, w.chi2_mono, m.valid)
    s = data.stereo
    r = jax.vmap(fac.stereo_residual, in_axes=(0, 0, 0, None, None, None, None, None))(
        state.poses[s.kf], state.points[s.pt], s.uvr, data.fx, data.fy, data.cx, data.cy, data.bf
    )
    c = jnp.sum(r * r, axis=-1) * s.inv_sigma2
    chi2 += _rho_sum(c, w.chi2_stereo, s.valid)

    po = data.plane_obs
    T = state.poses[po.kf]
    pw = state.planes[po.plane]
    r3 = jax.vmap(fac.plane_residual)(T, pw, po.meas)
    rv = jax.vmap(fac.plane_ver_residual)(T, pw, po.meas)
    rp = jax.vmap(fac.plane_par_residual)(T, pw, po.meas)
    c3 = (r3[:, 0] ** 2 + r3[:, 1] ** 2) * w.plane_angle_info + r3[:, 2] ** 2 * w.plane_dist_info
    cv = (rv[:, 0] ** 2 + rv[:, 1] ** 2) * w.plane_vp_info
    cp_ = (rp[:, 0] ** 2 + rp[:, 1] ** 2) * w.plane_vp_info
    c = jnp.where(po.kind == 0, c3, jnp.where(po.kind == 1, cv, cp_))
    delta2 = jnp.where(po.kind == 0, w.plane_chi, w.plane_vp_chi)
    chi2 += _rho_sum(c, delta2, po.valid)

    Kmat = jnp.eye(3, dtype=jnp.float32)
    Kmat = Kmat.at[0, 0].set(data.fx).at[1, 1].set(data.fy).at[0, 2].set(data.cx).at[1, 2].set(data.cy)
    cb = data.cub_bbox
    r = jax.vmap(fac.cuboid_bbox_residual, in_axes=(0, 0, 0, 0, None))(
        state.poses[cb.kf], state.cuboid_pose[cb.cub], state.cuboid_scale[cb.cub], cb.bbox, Kmat
    )
    c = jnp.sum(r * r, axis=-1) * cb.weight**2
    chi2 += _rho_sum(c, w.bbox_chi, cb.valid)
    cc = data.cub_corner
    r = jax.vmap(fac.cuboid_corner_residual, in_axes=(0, 0, 0, 0, None))(
        state.poses[cc.kf], state.cuboid_pose[cc.cub], state.cuboid_scale[cc.cub], cc.corners, Kmat
    )
    c = jnp.sum(r * r, axis=-1) * cc.weight**2
    chi2 += _rho_sum(c, w.corner_chi, cc.valid)
    c3f = data.cub_se3
    r = jax.vmap(fac.cuboid_se3_residual)(
        state.poses[c3f.kf],
        state.cuboid_pose[c3f.cub],
        state.cuboid_scale[c3f.cub],
        c3f.meas_pose,
        c3f.meas_scale,
    )
    c = jnp.sum(r * r, axis=-1) * (c3f.weight**2 * w.se3_weight**2)
    chi2 += _rho_sum(c, w.se3_chi, c3f.valid)
    pc = data.pt_cub
    r = jax.vmap(
        lambda cp, cs, pi, pm: fac.point_cuboid_residual(
            cp, cs, state.points[pi], pm, w.max_outside_margin_ratio, w.pt_obj_prior_weight
        )
    )(state.cuboid_pose[pc.cub], state.cuboid_scale[pc.cub], pc.pts, pc.pts_mask)
    c = jnp.sum(r * r, axis=-1) * (pc.weight**2 * w.pt_obj_weight**2)
    chi2 += _rho_sum(c, w.pt_obj_chi, pc.valid)
    cpq = data.cub_plane
    r = jax.vmap(fac.cuboid_plane_residual)(
        state.cuboid_pose[cpq.cub], state.cuboid_scale[cpq.cub], state.planes[cpq.plane], cpq.face
    )
    c = (r[:, 0] ** 2 + r[:, 1] ** 2) * w.cub_plane_angle_info + r[:, 2] ** 2 * w.cub_plane_dist_info
    chi2 += _rho_sum(c, w.cub_plane_chi, cpq.valid)
    return chi2


# ---------------------------------------------------------------------------
# Retraction + LM loop
# ---------------------------------------------------------------------------


def retract_state(state: BAState, data: BAData, delta_c, delta_l, fixrollpitch=True, fixheight=True):
    K, C, Q, D = _layout(state)
    dp = delta_c[: 6 * K].reshape(K, 6)
    dc = delta_c[6 * K : 6 * K + 9 * C].reshape(C, 9)
    dq = delta_c[6 * K + 9 * C :].reshape(Q, 3)
    free = (~data.pose_fixed)[:, None].astype(jnp.float32)
    new_poses = jax.vmap(fac.retract_pose)(state.poses, dp * free)
    cub_free = data.cuboid_active[:, None].astype(jnp.float32)
    new_cp, new_cs = jax.vmap(
        lambda p, s_, d: fac.retract_cuboid(p, s_, d, fixrollpitch, fixheight)
    )(state.cuboid_pose, state.cuboid_scale, dc * cub_free)
    plane_free = data.plane_active[:, None].astype(jnp.float32)
    new_planes = jax.vmap(fac.retract_plane)(state.planes, dq * plane_free)
    new_points = state.points + delta_l * data.point_active[:, None]
    return BAState(
        poses=new_poses,
        points=new_points,
        planes=new_planes,
        cuboid_pose=new_cp,
        cuboid_scale=new_cs,
    )


def _free_mask(state: BAState, data: BAData):
    K, C, Q, D = _layout(state)
    pose_free = jnp.repeat((~data.pose_fixed).astype(jnp.float32), 6, total_repeat_length=6 * K)
    cub_free = jnp.repeat(data.cuboid_active.astype(jnp.float32), 9, total_repeat_length=9 * C)
    # optionally pin the 3 scale dims of every cuboid (VertexCuboidFixScale)
    dim9 = jnp.tile(jnp.arange(9), C)
    cub_free = cub_free * jnp.where(
        (dim9 >= 6) & (jnp.asarray(data.cuboid_fix_scale) > 0), 0.0, 1.0
    )
    plane_free = jnp.repeat(data.plane_active.astype(jnp.float32), 3, total_repeat_length=3 * Q)
    return jnp.concatenate([pose_free, cub_free, plane_free])


def lm_iterations(state: BAState, data: BAData, w: BAWeights, n_iters: int, lam0: float = 1e-4,
                  reproj_n: int = 0):
    """Run ``n_iters`` LM iterations with accept/reject and adaptive damping.

    ``reproj_n``: static lanes-per-keyframe of the mono/stereo bundles when
    they are packed kf-major — enables the scatter-free blocked assembly."""
    free_c = _free_mask(state, data)
    point_active = data.point_active.astype(jnp.float32)

    def body(carry, _):
        st, lam = carry
        H_cc, H_cl, H_ll, b_c, b_l, chi2_cur = build_system(st, data, w, reproj_n=reproj_n)
        delta_c, delta_l = schur_solve(H_cc, H_cl, H_ll, b_c, b_l, lam, free_c, point_active)
        trial = retract_state(st, data, delta_c, delta_l)
        chi2_new = total_chi2(trial, data, w)
        ok = (chi2_new < chi2_cur) & jnp.isfinite(chi2_new)
        st = jax.tree.map(lambda a, b_: jnp.where(ok, b_, a), st, trial)
        lam = jnp.where(ok, jnp.maximum(lam * 0.3, 1e-7), jnp.minimum(lam * 8.0, 1e4))
        return (st, lam), chi2_new

    (state, _), chi2s = jax.lax.scan(body, (state, jnp.float32(lam0)), None, length=n_iters)
    return state, chi2s


# ---------------------------------------------------------------------------
# Outlier gating between phases (Optimizer.cc:700-786 / :2727-2838)
# ---------------------------------------------------------------------------


def gate_observations(state: BAState, data: BAData, w: BAWeights):
    """Disable observations whose chi2 exceeds the per-type threshold or that
    see the landmark behind the camera (pDepth check in the reference).

    Cuboid edges are gated on raw error NORM, not chi2, like the reference:
    bbox > thHuberBbox2d (80), corners > thHuberConer2d (10), cuboid-plane
    > planeChi (Optimizer.cc:2771-2833).  The SE3 cuboid edge is left
    ungated, also like the reference (no gate between its two phases)."""
    m = data.mono
    r = jax.vmap(fac.mono_residual, in_axes=(0, 0, 0, None, None, None, None))(
        state.poses[m.kf], state.points[m.pt], m.uv, data.fx, data.fy, data.cx, data.cy
    )
    chi2 = jnp.sum(r * r, axis=-1) * m.inv_sigma2
    z = jax.vmap(lambda T, X: geo.se3_apply(T, X)[2])(state.poses[m.kf], state.points[m.pt])
    mono_ok = m.valid & (chi2 <= w.chi2_mono) & (z > 0)
    s = data.stereo
    r = jax.vmap(fac.stereo_residual, in_axes=(0, 0, 0, None, None, None, None, None))(
        state.poses[s.kf], state.points[s.pt], s.uvr, data.fx, data.fy, data.cx, data.cy, data.bf
    )
    chi2 = jnp.sum(r * r, axis=-1) * s.inv_sigma2
    z = jax.vmap(lambda T, X: geo.se3_apply(T, X)[2])(state.poses[s.kf], state.points[s.pt])
    stereo_ok = s.valid & (chi2 <= w.chi2_stereo) & (z > 0)

    po = data.plane_obs
    T = state.poses[po.kf]
    pw = state.planes[po.plane]
    r3 = jax.vmap(fac.plane_residual)(T, pw, po.meas)
    rv = jax.vmap(fac.plane_ver_residual)(T, pw, po.meas)
    rp = jax.vmap(fac.plane_par_residual)(T, pw, po.meas)
    c3 = (r3[:, 0] ** 2 + r3[:, 1] ** 2) * w.plane_angle_info + r3[:, 2] ** 2 * w.plane_dist_info
    cv = (rv[:, 0] ** 2 + rv[:, 1] ** 2) * w.plane_vp_info
    cp_ = (rp[:, 0] ** 2 + rp[:, 1] ** 2) * w.plane_vp_info
    chi2 = jnp.where(po.kind == 0, c3, jnp.where(po.kind == 1, cv, cp_))
    delta2 = jnp.where(po.kind == 0, w.plane_chi, w.plane_vp_chi)
    plane_ok = po.valid & (chi2 <= delta2)

    Kmat = jnp.eye(3, dtype=jnp.float32)
    Kmat = Kmat.at[0, 0].set(data.fx).at[1, 1].set(data.fy).at[0, 2].set(data.cx).at[1, 2].set(data.cy)
    cb = data.cub_bbox
    r = jax.vmap(fac.cuboid_bbox_residual, in_axes=(0, 0, 0, 0, None))(
        state.poses[cb.kf], state.cuboid_pose[cb.cub], state.cuboid_scale[cb.cub], cb.bbox, Kmat
    )
    bbox_ok = cb.valid & (jnp.linalg.norm(r, axis=-1) <= w.bbox_chi)
    cc = data.cub_corner
    r = jax.vmap(fac.cuboid_corner_residual, in_axes=(0, 0, 0, 0, None))(
        state.poses[cc.kf], state.cuboid_pose[cc.cub], state.cuboid_scale[cc.cub], cc.corners, Kmat
    )
    corner_ok = cc.valid & (jnp.linalg.norm(r, axis=-1) <= w.corner_chi)
    cpq = data.cub_plane
    r = jax.vmap(fac.cuboid_plane_residual)(
        state.cuboid_pose[cpq.cub], state.cuboid_scale[cpq.cub], state.planes[cpq.plane], cpq.face
    )
    cub_plane_ok = cpq.valid & (jnp.linalg.norm(r, axis=-1) <= w.cub_plane_chi)

    return data._replace(
        mono=m._replace(valid=mono_ok),
        stereo=s._replace(valid=stereo_ok),
        plane_obs=po._replace(valid=plane_ok),
        cub_bbox=cb._replace(valid=bbox_ok),
        cub_corner=cc._replace(valid=corner_ok),
        cub_plane=cpq._replace(valid=cub_plane_ok),
    )


# ---------------------------------------------------------------------------
# High-level solves
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("phase1_iters", "phase2_iters", "reproj_n"))
def local_ba(state: BAState, data: BAData, w: BAWeights, phase1_iters: int = 5, phase2_iters: int = 10,
             reproj_n: int = 0):
    """Two-phase local BA mirroring LocalBundleAdjustment /
    LocalBACameraPlaneCuboids (Optimizer.cc:461-786, 1994-2967):
    optimize, cut outliers by per-type chi2, optimize again, final cut."""
    state, _ = lm_iterations(state, data, w, phase1_iters, reproj_n=reproj_n)
    data = gate_observations(state, data, w)
    state, chi2s = lm_iterations(state, data, w, phase2_iters, reproj_n=reproj_n)
    data = gate_observations(state, data, w)
    return state, data, chi2s


@functools.partial(jax.jit, static_argnames=("rounds", "iters_per_round"))
def optimize_pose(
    T_init,
    points,
    uv,
    inv_sigma2,
    valid,
    fx,
    fy,
    cx,
    cy,
    chi2_th: float = 5.991,
    rounds: int = 4,
    iters_per_round: int = 10,
    ur=None,
    bf: float = 0.0,
    chi2_th_stereo: float = 7.815,
):
    """Motion-only pose optimization — PoseOptimization (Optimizer.cc:247-459).

    4 rounds of 10 LM iterations; between rounds observations are
    re-classified inlier/outlier by chi2 (the reference also drops the robust
    kernel after round 2 — mirrored with ``use_huber``).

    ``ur``: optional (N,) right-view u coordinate per observation; entries
    >= 0 add the third (stereo) residual row like the reference's
    EdgeStereoSE3ProjectXYZOnlyPose (Optimizer.cc:318-360), with the stereo
    chi2 threshold 7.815 for those observations.

    Returns (T_opt, inlier_mask, n_inliers).
    """
    # guard against scale drift in the incoming pose: det(R) != 1 is
    # invisible to mono reprojection and the caller's velocity model
    # amplifies it exponentially (see geometry.se3_renorm)
    T_init = geo.se3_renorm(T_init)
    has_ur = (ur >= 0) if ur is not None else jnp.zeros(points.shape[0], bool)
    ur_s = ur if ur is not None else jnp.full(points.shape[0], -1.0, jnp.float32)
    chi2_lim = jnp.where(has_ur, chi2_th_stereo, chi2_th)

    def residuals(T):
        r3 = jax.vmap(
            fac.stereo_residual, in_axes=(None, 0, 0, None, None, None, None, None)
        )(T, points, jnp.concatenate([uv, ur_s[:, None]], axis=-1), fx, fy, cx, cy, bf)
        # mono observations contribute only the first two rows
        return r3 * jnp.concatenate(
            [jnp.ones_like(uv), has_ur[:, None].astype(r3.dtype)], axis=-1
        )

    def chi2_of(T):
        r = residuals(T)
        return jnp.sum(r * r, axis=-1) * inv_sigma2

    def run_round(T, inlier, use_huber):
        def body(carry):
            T, lam, it, dn = carry

            def lin(T):
                def res_at(d6):
                    return residuals(fac.retract_pose(T, d6))

                z = jnp.zeros(6, jnp.float32)
                r = res_at(z)
                J = jax.jacfwd(res_at)(z)  # (N, 3, 6)
                return r, J

            r, J = lin(T)
            chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
            w_rob = jnp.where(use_huber, fac.huber_weight(chi2, chi2_lim), 1.0)
            wgt = w_rob * inlier * inv_sigma2
            H = jnp.einsum("ndi,ndj,n->ij", J, J, wgt)
            b = -jnp.einsum("ndi,nd,n->i", J, r, wgt)
            H = H + lam * jnp.diag(jnp.diag(H)) + 1e-6 * jnp.eye(6)
            delta = jnp.linalg.solve(H, b)
            T_new = fac.retract_pose(T, delta)
            rho_cur = jnp.sum(
                jnp.where(use_huber, _rho_huber(chi2, chi2_lim), chi2) * inlier
            )
            chi2_new = chi2_of(T_new)
            rho_new = jnp.sum(
                jnp.where(use_huber, _rho_huber(chi2_new, chi2_lim), chi2_new) * inlier
            )
            dn_new = jnp.linalg.norm(delta)
            ok = (rho_new < rho_cur) & jnp.all(jnp.isfinite(T_new)) & jnp.isfinite(dn_new)
            T = jnp.where(ok, T_new, T)
            lam = jnp.where(ok, jnp.maximum(lam * 0.3, 1e-7), jnp.minimum(lam * 8.0, 1e4))
            # carry the step norm only for ACCEPTED steps: a rejected or
            # non-finite delta (near-singular solve) must not look converged —
            # the loop keeps iterating with increased damping and can recover
            dn = jnp.where(ok, dn_new, dn)
            return T, lam, it + 1, dn

        # early-exit LM: once an ACCEPTED step is tiny the solution has
        # converged, so stopping there is result-equivalent to running the
        # reference's full 10 iterations (Optimizer.cc:430
        # optimizer.optimize(its[it])) — and the pose-opt chain is the
        # per-frame latency tail on TPU (~21 us per iteration).
        def cond(carry):
            _, _, it, dn = carry
            return (it < iters_per_round) & (dn > 1e-6)

        T, _, _, _ = jax.lax.while_loop(
            cond, body, (T, jnp.float32(1e-3), jnp.int32(0), jnp.float32(1.0))
        )
        return T

    T = T_init
    inlier = valid.astype(jnp.float32)
    for rnd in range(rounds):
        use_huber = jnp.asarray(rnd < 2)
        T = run_round(T, inlier, use_huber)
        chi2 = chi2_of(T)
        inlier = (valid & (chi2 <= chi2_lim)).astype(jnp.float32)
    n_inliers = jnp.sum(inlier).astype(jnp.int32)
    return T, inlier.astype(bool), n_inliers
