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
from typing import NamedTuple

import jax
import jax.numpy as jnp

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


@functools.partial(jax.jit, static_argnames=("n_opt", "n_fixed", "n_local_pts"))
def pack_local_ba(m: ms.MapState, center_kf, cam, n_opt: int = 16, n_fixed: int = 16, n_local_pts: int = 4096):
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
    mono = lm.MonoFactors(
        kf=kf_local,
        pt=jnp.clip(pt_lc, 0),
        uv=m.kf_uv[kf_global, kp],
        inv_sigma2=_scale_inv_sigma2(m.kf_octave[kf_global, kp]),
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
        W,
        n_local_pts,
        1,
        1,
        cam,
        mono=mono,
        pose_fixed=pose_fixed,
        point_active=point_mask,
    )
    return LocalBAPack(
        state=state,
        data=data,
        window_ids=window_ids,
        window_mask=window_mask,
        point_ids=point_ids,
        point_mask=point_mask,
    )


@jax.jit
def unpack_local_ba(m: ms.MapState, pack: LocalBAPack, state_opt: lm.BAState, data_out: lm.BAData):
    """Scatter optimized poses/points back into the map; unlink observations
    that were gated as outliers during BA (Optimizer.cc:744-760)."""
    K, N = m.kf_pt.shape
    P = m.pt_pos.shape[0]
    W = pack.window_ids.shape[0]

    writable = pack.window_mask & ~data_out.pose_fixed
    kf_slots = jnp.where(writable, pack.window_ids, K)
    kf_pose = jnp.concatenate([m.kf_pose, m.kf_pose[:1]], axis=0)
    kf_pose = kf_pose.at[kf_slots].set(state_opt.poses)[:K]

    pt_slots = jnp.where(pack.point_mask, pack.point_ids, P)
    pt_pos = jnp.concatenate([m.pt_pos, m.pt_pos[:1]], axis=0)
    pt_pos = pt_pos.at[pt_slots].set(state_opt.points)[:P]

    # unlink outlier observations: for factors valid at pack time but gated
    # out during the solve, clear kf_pt at (kf, kp)
    mono_in, mono_packed = data_out.mono.valid, pack.data.mono.valid
    outlier = mono_packed & ~mono_in
    kf_local = jnp.repeat(jnp.arange(W, dtype=jnp.int32), N)
    kf_global = pack.window_ids[kf_local]
    kp = jnp.tile(jnp.arange(N, dtype=jnp.int32), W)
    flat_idx = kf_global * N + kp
    flat_idx = jnp.where(outlier, flat_idx, K * N)
    kf_pt = jnp.concatenate([m.kf_pt.reshape(-1), jnp.zeros(1, jnp.int32)])
    kf_pt = kf_pt.at[flat_idx].set(-1)[:-1].reshape(K, N)

    return m._replace(kf_pose=kf_pose, pt_pos=pt_pos, kf_pt=kf_pt)


def run_local_ba(m: ms.MapState, center_kf: int, cam, cfg):
    """pack -> solve -> unpack.  Host-callable; everything inside is jitted."""
    caps = cfg.caps
    pack = pack_local_ba(
        m,
        center_kf,
        cam,
        n_opt=caps.local_ba_keyframes,
        n_fixed=caps.local_ba_fixed_keyframes,
        n_local_pts=caps.local_ba_points,
    )
    w = lm.BAWeights.from_config(cfg.ba)
    state_opt, data_out, chi2s = lm.local_ba(
        pack.state,
        pack.data,
        w,
        phase1_iters=cfg.ba.local_ba_iters_phase1,
        phase2_iters=cfg.ba.local_ba_iters_phase2,
    )
    m = unpack_local_ba(m, pack, state_opt, data_out)
    return m, chi2s
