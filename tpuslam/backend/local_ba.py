"""Local BA orchestration: covisibility window -> packed factor arrays ->
graph/lm solve -> scatter-back.

Mirrors Optimizer::LocalBundleAdjustment / LocalBACameraPlaneCuboids window
construction (Optimizer.cc:461-560, 1994-2140): optimized KFs = covisible
neighbours of the newest KF; fixed frontier = other KFs observing the window
points; landmarks = points/planes/cuboids seen by the window.  Here the
window is selected with top-k over the covisibility matmul and the pt-id
remap is a scatter — fully jittable, static shapes.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import geometry as geo
from ..graph import lm
from ..map import mapstate as ms


class LocalBAPack(NamedTuple):
    state: lm.BAState
    data: lm.BAData
    window_ids: jnp.ndarray  # (W,) kf slots (opt + fixed frontier)
    window_mask: jnp.ndarray  # (W,) bool
    point_ids: jnp.ndarray  # (PL,) map point slots
    point_mask: jnp.ndarray  # (PL,) bool


def _scale_inv_sigma2(octave, scale_factor: float = 1.2):
    return 1.0 / (scale_factor ** (2.0 * octave.astype(jnp.float32)))


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_opt", "n_fixed", "n_local_pts",
        "use_planes", "use_cub_2d", "use_corners_2d", "use_cub_3d",
        "use_pt_obj", "use_cub_plane", "pt_per_cub", "fix_cuboid_scale",
        "use_stereo",
    ),
)
def pack_local_ba(
    m: ms.MapState,
    center_kf,
    cam,
    n_opt: int = 16,
    n_fixed: int = 16,
    n_local_pts: int = 4096,
    use_planes: bool = False,
    use_cub_2d: bool = False,
    use_corners_2d: bool = False,
    use_cub_3d: bool = False,
    use_pt_obj: bool = False,
    use_cub_plane: bool = False,
    pt_per_cub: int = 64,
    fix_cuboid_scale: bool = False,
    use_stereo: bool = False,
):
    """Build a BA problem around ``center_kf``.

    Optimized KFs: center + best covisible neighbours (weight-sorted).
    Fixed KFs: next-best covisible KFs (stand-in for the observing frontier).
    KF slot 0 is always fixed (gauge; the reference fixes mnId==0,
    Optimizer.cc:2103-2111), and when fewer than 2 optimized KFs carry
    weight the oldest is fixed too.
    """
    K, N = m.kf_pt.shape
    P = m.pt_pos.shape[0]
    cov = ms.covisibility(m)
    w = jnp.where(m.kf_valid, cov[center_kf], -1.0)
    w = w.at[center_kf].set(jnp.inf)
    top_w, top_i = jax.lax.top_k(w, n_opt + n_fixed)
    opt_ids = top_i[:n_opt]
    opt_mask = (top_w[:n_opt] > 0) | (jnp.arange(n_opt) == 0)
    fixed_ids = top_i[n_opt:]
    fixed_mask = top_w[n_opt:] > 0

    window_ids = jnp.concatenate([opt_ids, fixed_ids])
    window_mask = jnp.concatenate([opt_mask, fixed_mask])
    W = n_opt + n_fixed
    # pose gauge: fixed frontier + slot id 0 if present in optimized set
    pose_fixed = jnp.concatenate([jnp.zeros(n_opt, bool), jnp.ones(n_fixed, bool)])
    pose_fixed = pose_fixed | (window_ids == 0) | ~window_mask

    # local points: observed by any optimized-window KF
    obs = ms.incidence(m)  # (K, P)
    sel_rows = obs[opt_ids] * opt_mask[:, None]
    local_mask = (jnp.sum(sel_rows, axis=0) > 0) & m.pt_valid
    sel_val, point_ids = jax.lax.top_k(local_mask.astype(jnp.float32), n_local_pts)
    point_mask = sel_val > 0
    inv_map = jnp.full((P + 1,), -1, jnp.int32).at[jnp.where(point_mask, point_ids, P)].set(
        jnp.arange(n_local_pts, dtype=jnp.int32)
    )[:P]

    # mono factors: every (window kf, keypoint) pair
    kf_local = jnp.repeat(jnp.arange(W, dtype=jnp.int32), N)
    kf_global = window_ids[kf_local]
    kp = jnp.tile(jnp.arange(N, dtype=jnp.int32), W)
    pt_gl = m.kf_pt[kf_global, kp]
    pt_lc = inv_map[jnp.clip(pt_gl, 0, P - 1)]
    valid = (
        window_mask[kf_local]
        & m.kf_kp_valid[kf_global, kp]
        & (pt_gl >= 0)
        & (pt_lc >= 0)
    )
    # observations with a right-view coordinate become stereo factors
    # (EdgeStereoSE3ProjectXYZ, Optimizer.cc:640-698); the rest stay mono
    ur = m.kf_ur[kf_global, kp]
    inv_s2 = _scale_inv_sigma2(m.kf_octave[kf_global, kp])
    uv = m.kf_uv[kf_global, kp]
    stereo = None
    if use_stereo:
        stereo = lm.StereoFactors(
            kf=kf_local,
            pt=jnp.clip(pt_lc, 0),
            uvr=jnp.concatenate([uv, ur[:, None]], axis=-1),
            inv_sigma2=inv_s2,
            valid=valid & (ur >= 0),
        )
        valid = valid & (ur < 0)
    mono = lm.MonoFactors(
        kf=kf_local,
        pt=jnp.clip(pt_lc, 0),
        uv=uv,
        inv_sigma2=inv_s2,
        valid=valid,
    )

    use_semantics = use_planes or use_cub_2d or use_corners_2d or use_cub_3d or use_pt_obj or use_cub_plane
    if not use_semantics:
        state = lm.BAState(
            poses=m.kf_pose[window_ids],
            points=m.pt_pos[point_ids],
            planes=m.plane_coef[:1],
            cuboid_pose=m.cub_pose[:1],
            cuboid_scale=m.cub_scale[:1],
        )
        data = lm.make_ba_data(
            W, n_local_pts, 1, 1, cam,
            mono=mono, stereo=stereo, pose_fixed=pose_fixed, point_active=point_mask,
        )
        return LocalBAPack(
            state=state,
            data=data,
            window_ids=window_ids,
            window_mask=window_mask,
            point_ids=point_ids,
            point_mask=point_mask,
        )

    # ---- heterogeneous graph: planes and cuboids as first-class variables --
    from ..semantic.associate import cuboid_plane_pairs

    Q = m.plane_coef.shape[0]
    C = m.cub_valid.shape[0]
    L = m.kf_plane_valid.shape[1]
    O = m.kf_cub_valid.shape[1]
    opt_in_window = window_mask & jnp.concatenate([opt_mask, jnp.zeros(n_fixed, bool)])

    # camera-plane factors: one per (window kf, det slot, relation kind)
    kf_l = jnp.repeat(jnp.arange(W, dtype=jnp.int32), L)
    kf_g = window_ids[kf_l]
    sl = jnp.tile(jnp.arange(L, dtype=jnp.int32), W)
    meas = m.kf_plane_coef[kf_g, sl]
    base_valid = window_mask[kf_l] & m.kf_plane_valid[kf_g, sl] & use_planes

    def plane_bundle(plane_id_arr, kind):
        pid = plane_id_arr[kf_g, sl]
        return lm.PlaneFactors(
            kf=kf_l,
            plane=jnp.clip(pid, 0),
            meas=meas,
            kind=jnp.full(W * L, kind, jnp.int32),
            valid=base_valid & (pid >= 0) & m.plane_valid[jnp.clip(pid, 0)],
        )

    pf_dir = plane_bundle(m.kf_plane_map, 0)
    pf_ver = plane_bundle(m.kf_plane_ver, 1)
    pf_par = plane_bundle(m.kf_plane_par, 2)
    plane_obs = lm.PlaneFactors(*[jnp.concatenate(x) for x in zip(pf_dir, pf_ver, pf_par)])

    # camera-cuboid factors: one per (window kf, det slot)
    kf_lc = jnp.repeat(jnp.arange(W, dtype=jnp.int32), O)
    kf_gc = window_ids[kf_lc]
    so = jnp.tile(jnp.arange(O, dtype=jnp.int32), W)
    cub_id = m.kf_cub_map[kf_gc, so]
    bbox = m.kf_cub_bbox[kf_gc, so]
    # FOV margin gate (Optimizer.cc:2458-2461)
    margin = 5.0
    x1 = bbox[:, 0] - bbox[:, 2] / 2
    y1 = bbox[:, 1] - bbox[:, 3] / 2
    in_fov = (
        (x1 > margin)
        & (y1 > margin)
        & (x1 + bbox[:, 2] < cam.width - margin)
        & (y1 + bbox[:, 3] < cam.height - margin)
    )
    cub_base = (
        window_mask[kf_lc]
        & m.kf_cub_valid[kf_gc, so]
        & (cub_id >= 0)
        & m.cub_valid[jnp.clip(cub_id, 0)]
    )
    quality = m.kf_cub_quality[kf_gc, so]
    cub_bbox = lm.CuboidBBoxFactors(
        kf=kf_lc, cub=jnp.clip(cub_id, 0), bbox=bbox,
        weight=quality, valid=cub_base & in_fov & use_cub_2d,
    )
    cub_corner = lm.CuboidCornerFactors(
        kf=kf_lc, cub=jnp.clip(cub_id, 0), corners=m.kf_cub_corners[kf_gc, so],
        weight=quality, valid=cub_base & in_fov & use_corners_2d,
    )
    cub_se3 = lm.CuboidSE3Factors(
        kf=kf_lc, cub=jnp.clip(cub_id, 0),
        meas_pose=m.kf_cub_local_pose[kf_gc, so],
        meas_scale=m.kf_cub_local_scale[kf_gc, so],
        weight=quality, valid=cub_base & use_cub_3d,
    )

    # point-in-cuboid: per cuboid, owned points remapped to local indices
    owned_mask = (m.pt_cub[point_ids][None, :] == jnp.arange(C)[:, None]) & point_mask[None, :]
    own_val, own_idx = jax.lax.top_k(owned_mask.astype(jnp.float32), pt_per_cub)  # (C, M)
    pt_cub_f = lm.PointCuboidFactors(
        cub=jnp.arange(C, dtype=jnp.int32),
        pts=own_idx.astype(jnp.int32),
        pts_mask=own_val,
        weight=jnp.ones(C),
        valid=m.cub_valid & (jnp.sum(own_val, axis=1) >= 5) & use_pt_obj,
    )

    # cuboid-plane factors from the current geometric association
    face_of = cuboid_plane_pairs(m)  # (C, Q)
    cub_q = jnp.repeat(jnp.arange(C, dtype=jnp.int32), Q)
    pl_q = jnp.tile(jnp.arange(Q, dtype=jnp.int32), C)
    face_flat = face_of.reshape(-1)
    cub_plane = lm.CuboidPlaneFactors(
        cub=cub_q, plane=pl_q, face=jnp.clip(face_flat, 0),
        valid=(face_flat >= 0) & use_cub_plane,
    )

    # active variables: referenced by at least one valid factor
    plane_active = (
        jnp.zeros((Q + 1,), bool)
        .at[jnp.where(plane_obs.valid, plane_obs.plane, Q)]
        .set(True)[:Q]
        & m.plane_valid
    )
    cub_ref = jnp.concatenate(
        [
            jnp.where(cub_bbox.valid, cub_bbox.cub, C),
            jnp.where(cub_corner.valid, cub_corner.cub, C),
            jnp.where(cub_se3.valid, cub_se3.cub, C),
            jnp.where(pt_cub_f.valid, pt_cub_f.cub, C),
        ]
    )
    cuboid_active = jnp.zeros((C + 1,), bool).at[cub_ref].set(True)[:C] & m.cub_valid

    state = lm.BAState(
        poses=m.kf_pose[window_ids],
        points=m.pt_pos[point_ids],
        planes=m.plane_coef,
        cuboid_pose=m.cub_pose,
        cuboid_scale=m.cub_scale,
    )
    data = lm.make_ba_data(
        W, n_local_pts, Q, C, cam,
        mono=mono,
        stereo=stereo,
        plane_obs=plane_obs,
        cub_bbox=cub_bbox,
        cub_corner=cub_corner,
        cub_se3=cub_se3,
        pt_cub=pt_cub_f,
        cub_plane=cub_plane,
        pose_fixed=pose_fixed,
        point_active=point_mask,
        plane_active=plane_active,
        cuboid_active=cuboid_active,
        cuboid_fix_scale=1.0 if fix_cuboid_scale else 0.0,
    )
    return LocalBAPack(
        state=state,
        data=data,
        window_ids=window_ids,
        window_mask=window_mask,
        point_ids=point_ids,
        point_mask=point_mask,
    )


@functools.partial(jax.jit, static_argnames=("stereo_shared",))
def unpack_local_ba(m: ms.MapState, pack: LocalBAPack, state_opt: lm.BAState, data_out: lm.BAData, stereo_shared: bool = False, accept=True):
    """Scatter optimized poses/points back into the map; unlink observations
    that were gated as outliers during BA (Optimizer.cc:744-760).

    ``stereo_shared``: the packer built a stereo bundle with the same
    (window kf, keypoint) flattening as the mono bundle, so its outliers
    unlink through the same index map.

    ``accept``: device scalar bool — False keeps the whole map untouched
    (a diverged solve; computed from the chi2 trajectory without a host
    sync)."""
    K, N = m.kf_pt.shape
    P = m.pt_pos.shape[0]
    W = pack.window_ids.shape[0]
    accept = jnp.asarray(accept)

    # a diverged solve must never write NaN/Inf into the map: one bad local
    # BA cascades into total tracking loss on the next frame (every match
    # against a NaN pose/point fails at once — measured on the points-only
    # golden replay, LOST at the frame after one keyframe's BA).  Non-finite
    # lanes keep their pre-BA values.
    new_poses = geo.se3_renorm(state_opt.poses)
    pose_ok = jnp.all(jnp.isfinite(new_poses), axis=(1, 2)) & accept
    writable = pack.window_mask & ~data_out.pose_fixed & pose_ok
    kf_slots = jnp.where(writable, pack.window_ids, K)
    kf_pose = jnp.concatenate([m.kf_pose, m.kf_pose[:1]], axis=0)
    # renormalize on write-back: repeated BA passes must not let float32
    # rotation drift accumulate in the stored poses (geometry.se3_renorm)
    kf_pose = kf_pose.at[kf_slots].set(new_poses)[:K]

    pt_ok = jnp.all(jnp.isfinite(state_opt.points), axis=1) & accept
    pt_slots = jnp.where(pack.point_mask & pt_ok, pack.point_ids, P)
    pt_pos = jnp.concatenate([m.pt_pos, m.pt_pos[:1]], axis=0)
    pt_pos = pt_pos.at[pt_slots].set(state_opt.points)[:P]

    # unlink outlier observations: for factors valid at pack time but gated
    # out during the solve, clear kf_pt at (kf, kp)
    mono_in, mono_packed = data_out.mono.valid, pack.data.mono.valid
    outlier = mono_packed & ~mono_in & accept
    if stereo_shared:
        outlier = outlier | (pack.data.stereo.valid & ~data_out.stereo.valid)
    kf_local = jnp.repeat(jnp.arange(W, dtype=jnp.int32), N)
    kf_global = pack.window_ids[kf_local]
    kp = jnp.tile(jnp.arange(N, dtype=jnp.int32), W)
    flat_idx = kf_global * N + kp
    flat_idx = jnp.where(outlier, flat_idx, K * N)
    kf_pt = jnp.concatenate([m.kf_pt.reshape(-1), jnp.zeros(1, jnp.int32)])
    kf_pt = kf_pt.at[flat_idx].set(-1)[:-1].reshape(K, N)

    m = m._replace(kf_pose=kf_pose, pt_pos=pt_pos, kf_pt=kf_pt)

    # points that LOST an observation to the outlier gate and are left with
    # <= 2 observers die with it (MapPoint::EraseObservation -> SetBadFlag;
    # the reference's BA erase path, Optimizer.cc:744-760, triggers exactly
    # this rule) — under-observed survivors are depth-unconstrained and
    # drift along their rays in later solves
    lost_global = pack.point_ids[jnp.clip(pack.data.mono.pt, 0, pack.point_ids.shape[0] - 1)]
    lost_pt = jnp.zeros((P + 1,), bool).at[
        jnp.where(outlier, lost_global, P)
    ].set(True)[:P]
    obs_after = ms.point_obs_counts(m)
    m = ms.cull_points(m, lost_pt & m.pt_valid & (obs_after <= 2))

    # heterogeneous case: planes/cuboids were full-map variables — write back
    # the active ones (Optimizer.cc:2915-2966 cuboid_global_opti write-back)
    if state_opt.planes.shape[0] == m.plane_coef.shape[0]:
        pa = (
            data_out.plane_active
            & jnp.all(jnp.isfinite(state_opt.planes), axis=1) & accept
        )[:, None]
        m = m._replace(plane_coef=jnp.where(pa, state_opt.planes, m.plane_coef))
    if state_opt.cuboid_pose.shape[0] == m.cub_pose.shape[0]:
        cub_ok = data_out.cuboid_active & jnp.all(
            jnp.isfinite(state_opt.cuboid_pose), axis=(1, 2)
        ) & jnp.all(jnp.isfinite(state_opt.cuboid_scale), axis=1) & accept
        m = m._replace(
            cub_pose=jnp.where(cub_ok[:, None, None], state_opt.cuboid_pose, m.cub_pose),
            cub_scale=jnp.where(cub_ok[:, None], state_opt.cuboid_scale, m.cub_scale),
        )
    return m


@functools.partial(jax.jit, static_argnames=("n_kfs", "n_pts", "use_stereo"))
def pack_global_ba(m: ms.MapState, cam, n_kfs: int = 64, n_pts: int = 8192, use_stereo: bool = False):
    """All-keyframes BA problem (GlobalBundleAdjustemnt, Optimizer.cc:46-54:
    every KF except id 0 free).  Points are selected best-observed-first so
    that when the point budget truncates, the best-constrained landmarks
    anchor the solve; the remainder is re-anchored through its reference
    keyframe afterwards (run_global_ba), mirroring the reference's
    spanning-tree point propagation (LoopClosing.cc:676-737)."""
    K, N = m.kf_pt.shape
    P = m.pt_pos.shape[0]
    window_ids = jnp.arange(n_kfs, dtype=jnp.int32)
    window_mask = m.kf_valid[:n_kfs]
    pose_fixed = (window_ids == 0) | ~window_mask

    obs_rank = jnp.where(m.pt_valid, ms.point_obs_counts(m).astype(jnp.float32), -1.0)
    sel_val, point_ids = jax.lax.top_k(obs_rank, n_pts)
    point_mask = sel_val > 0
    inv_map = jnp.full((P + 1,), -1, jnp.int32).at[
        jnp.where(point_mask, point_ids, P)
    ].set(jnp.arange(n_pts, dtype=jnp.int32))[:P]

    kf_local = jnp.repeat(jnp.arange(n_kfs, dtype=jnp.int32), N)
    kf_global = window_ids[kf_local]
    kp = jnp.tile(jnp.arange(N, dtype=jnp.int32), n_kfs)
    pt_gl = m.kf_pt[kf_global, kp]
    pt_lc = inv_map[jnp.clip(pt_gl, 0, P - 1)]
    valid = (
        window_mask[kf_local]
        & m.kf_kp_valid[kf_global, kp]
        & (pt_gl >= 0)
        & (pt_lc >= 0)
    )
    ur = m.kf_ur[kf_global, kp]
    inv_s2 = _scale_inv_sigma2(m.kf_octave[kf_global, kp])
    uv = m.kf_uv[kf_global, kp]
    stereo = None
    if use_stereo:
        stereo = lm.StereoFactors(
            kf=kf_local, pt=jnp.clip(pt_lc, 0),
            uvr=jnp.concatenate([uv, ur[:, None]], axis=-1),
            inv_sigma2=inv_s2, valid=valid & (ur >= 0),
        )
        valid = valid & (ur < 0)
    mono = lm.MonoFactors(
        kf=kf_local,
        pt=jnp.clip(pt_lc, 0),
        uv=uv,
        inv_sigma2=inv_s2,
        valid=valid,
    )
    state = lm.BAState(
        poses=m.kf_pose[window_ids],
        points=m.pt_pos[point_ids],
        planes=m.plane_coef[:1],
        cuboid_pose=m.cub_pose[:1],
        cuboid_scale=m.cub_scale[:1],
    )
    data = lm.make_ba_data(
        n_kfs, n_pts, 1, 1, cam,
        mono=mono, stereo=stereo, pose_fixed=pose_fixed, point_active=point_mask,
    )
    return LocalBAPack(
        state=state, data=data,
        window_ids=window_ids, window_mask=window_mask,
        point_ids=point_ids, point_mask=point_mask,
    )


def _ba_bucket(n_needed: int, base: int, cap: int) -> int:
    """Smallest power-of-two multiple of ``base`` that covers ``n_needed``
    (bucketed static shapes: one XLA recompilation per bucket)."""
    b = base
    while b < n_needed and b < cap:
        b *= 2
    return min(b, cap)


@functools.partial(jax.jit, static_argnames=())
def _reanchor_points(m: ms.MapState, poses_old, skip_mask):
    """Move points NOT optimized by global BA through their reference
    keyframe's pose correction: X' = T_new^-1 (T_old X) — the SE3 analogue of
    the reference's post-GBA point propagation (LoopClosing.cc:709-736,
    mpRefKF-relative re-anchoring)."""
    K = m.kf_pose.shape[0]
    ref = jnp.clip(m.pt_first_kf, 0, K - 1)
    X_cam = jax.vmap(lambda T, x: T[:3, :3] @ x + T[:3, 3])(poses_old[ref], m.pt_pos)
    T_new = m.kf_pose[ref]
    X_new = jax.vmap(
        lambda T, x: T[:3, :3].T @ (x - T[:3, 3])
    )(T_new, X_cam)
    move = m.pt_valid & ~skip_mask & m.kf_valid[ref]
    return m._replace(pt_pos=jnp.where(move[:, None], X_new, m.pt_pos))


def run_global_ba(m: ms.MapState, cam, cfg, n_iters: int = 10, n_kf: int = 0,
                  should_abort=None, chunk: int = 5):
    """Full-map BA after a loop closure (RunGlobalBundleAdjustment,
    LoopClosing.cc:645-749 — synchronous here, on the functional snapshot).

    Covers EVERY keyframe slot and EVERY valid point, like the reference:
    the KF window is bucketed up from ``caps.global_ba_keyframes``
    (64 -> 128 -> ... -> max_keyframes) to the actual slot count, and the
    point set likewise up to ``caps.max_points``, so late loop closures
    refine the whole trajectory.  Should the point budget ever truncate
    (misconfigured caps), it is logged and the remainder is re-anchored
    through its reference keyframe — dropping observations instead would
    un-constrain their keyframes and measurably DEGRADE the solve.

    ``should_abort``: optional zero-arg callable polled between iteration
    chunks of ``chunk`` LM iterations — the reference's ``mbStopGBA``
    interrupt (LoopClosing.cc:410-429: a new loop closure aborts the
    running GBA and restarts it on the corrected map).  On abort the
    partially optimized state IS written back (the reference likewise
    applies whatever the aborted g2o run produced when it was not told to
    discard it); the caller restarts GBA on the new snapshot."""
    import logging

    caps = cfg.caps
    if n_kf <= 0:
        kf_valid_np = jax.device_get(m.kf_valid)
        n_kf = int(kf_valid_np.nonzero()[0].max()) + 1 if kf_valid_np.any() else 0
    n_kfs = _ba_bucket(n_kf, caps.global_ba_keyframes, caps.max_keyframes)
    n_valid_pts = int(jax.device_get(jnp.sum(m.pt_valid)))
    n_pts = _ba_bucket(n_valid_pts, caps.global_ba_points, m.pt_pos.shape[0])
    if n_valid_pts > n_pts:
        logging.getLogger("tpuslam").warning(
            "global BA truncating points: %d valid > %d budget; the rest is "
            "re-anchored through reference keyframes", n_valid_pts, n_pts,
        )
    poses_old = m.kf_pose
    pack = pack_global_ba(
        m, cam, n_kfs=n_kfs, n_pts=n_pts,
        use_stereo=cfg.sensor in ("rgbd", "stereo"),
    )
    w = lm.BAWeights.from_config(cfg.ba)
    n_dev = jax.device_count()
    dist_ok = cfg.flags.distributed_ba and not os.environ.get("TPUSLAM_FORCE_LOCAL_BA")
    if dist_ok and jax.process_count() > 1:
        from ..dist.ba import default_mesh, multihost_lm_iterations

        state_np, chi2s = multihost_lm_iterations(
            default_mesh(), pack.state, pack.data, w, n_iters=n_iters
        )
        state_opt = lm.BAState(*[jnp.asarray(x) for x in state_np])
    elif dist_ok and n_dev > 1:
        from ..dist.ba import (
            default_mesh, distributed_lm_iterations, pad_factors_for_mesh,
        )

        data_p = pad_factors_for_mesh(pack.data, n_dev)
        state_opt, chi2s = distributed_lm_iterations(
            default_mesh(), pack.state, data_p, w, n_iters=n_iters
        )
    elif should_abort is not None:
        # chunked solve with an abort poll between chunks (mbStopGBA)
        state_opt = pack.state
        chi2s = jnp.zeros((0,))
        done = 0
        while done < n_iters:
            step = min(chunk, n_iters - done)
            state_opt, c = _jitted_lm_iterations(
                state_opt, pack.data, w, step, reproj_n=m.kf_pt.shape[1]
            )
            chi2s = jnp.concatenate([chi2s, c])
            done += step
            if done < n_iters and should_abort():
                break
    else:
        state_opt, chi2s = _jitted_lm_iterations(
            pack.state, pack.data, w, n_iters, reproj_n=m.kf_pt.shape[1]
        )
    m = unpack_local_ba(
        m, pack, state_opt, pack.data, stereo_shared=cfg.sensor in ("rgbd", "stereo")
    )
    # points outside the optimized set follow their reference keyframe
    P = m.pt_pos.shape[0]
    in_opt = jnp.zeros((P + 1,), bool).at[
        jnp.where(pack.point_mask, pack.point_ids, P)
    ].set(True)[:P]
    m = _reanchor_points(m, poses_old, in_opt)
    return m, chi2s


_jitted_lm_iterations = jax.jit(lm.lm_iterations, static_argnames=("n_iters", "reproj_n"))


def run_local_ba(m: ms.MapState, center_kf: int, cam, cfg):
    """pack -> solve -> unpack.  Host-callable; everything inside is jitted.

    Factor-type toggles follow the reference's optimization flags
    (Parameters.cc:43-48): the heterogeneous graph is only built when at
    least one semantic term is enabled (LocalBACameraPlaneCuboids vs
    LocalBundleAdjustment dispatch, LocalMapping.cc:92-110)."""
    caps = cfg.caps
    fl = cfg.flags
    pack = pack_local_ba(
        m,
        center_kf,
        cam,
        n_opt=caps.local_ba_keyframes,
        n_fixed=caps.local_ba_fixed_keyframes,
        n_local_pts=caps.local_ba_points,
        use_planes=fl.optimize_with_plane_3d,
        use_cub_2d=fl.optimize_with_cuboid_2d,
        use_corners_2d=fl.optimize_with_corners_2d,
        use_cub_3d=fl.optimize_with_cuboid_3d,
        use_pt_obj=fl.optimize_with_pt_obj_3d,
        use_cub_plane=fl.optimize_with_cuboid_plane,
        pt_per_cub=caps.max_points_per_cuboid,
        fix_cuboid_scale=cfg.ba.cuboid_fix_scale,
        use_stereo=cfg.sensor in ("rgbd", "stereo"),
    )
    w = lm.BAWeights.from_config(cfg.ba)
    n_dev = jax.device_count()
    dist_ok = cfg.flags.distributed_ba and not os.environ.get("TPUSLAM_FORCE_LOCAL_BA")
    if dist_ok and jax.process_count() > 1:
        # multi-host: lift the replicated pack onto the cross-process mesh,
        # solve collectively, gate locally (dist/ba.multihost_local_ba)
        from ..dist.ba import default_mesh, multihost_local_ba

        state_opt, data_out, chi2s = multihost_local_ba(
            default_mesh(), pack.state, pack.data, w,
            phase1_iters=cfg.ba.local_ba_iters_phase1,
            phase2_iters=cfg.ba.local_ba_iters_phase2,
        )
    elif dist_ok and n_dev > 1:
        # production multi-device path: factors shard over the mesh, the
        # normal-equation blocks all-reduce, the Schur solve is replicated
        from ..dist.ba import (
            default_mesh, distributed_local_ba, pad_factors_for_mesh, unpad_factors,
        )

        data_p = pad_factors_for_mesh(pack.data, n_dev)
        state_opt, data_out_p, chi2s = distributed_local_ba(
            default_mesh(), pack.state, data_p, w,
            phase1_iters=cfg.ba.local_ba_iters_phase1,
            phase2_iters=cfg.ba.local_ba_iters_phase2,
        )
        data_out = unpad_factors(data_out_p, pack.data)
    else:
        state_opt, data_out, chi2s = lm.local_ba(
            pack.state,
            pack.data,
            w,
            phase1_iters=cfg.ba.local_ba_iters_phase1,
            phase2_iters=cfg.ba.local_ba_iters_phase2,
            reproj_n=m.kf_pt.shape[1],
        )
    # acceptance: a solve that ENDS with a (much) higher robust chi2 than it
    # started with has diverged — write-back would corrupt the map (the
    # reference's g2o LM only ever accepts cost-decreasing steps, so its
    # write-back is implicitly guarded; one diverged local BA here collapsed
    # the points-only golden replay to zero matches on the next frame).
    # Device scalar -> no host sync in the mapping chain.
    c = jnp.asarray(chi2s)
    accept = jnp.isfinite(c[-1]) & (c[-1] <= 1.5 * c[0] + 1e-3)
    m = unpack_local_ba(
        m, pack, state_opt, data_out,
        stereo_shared=cfg.sensor in ("rgbd", "stereo"), accept=accept,
    )
    return m, chi2s
