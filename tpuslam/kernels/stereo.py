"""Stereo left-right keypoint matching.

TPU re-design of ``Frame::ComputeStereoMatches`` (reference Frame.cc: the
row-table candidate search, best-Hamming-descriptor match, then SAD sliding
window with parabola sub-pixel refinement and median-based outlier cull).

The reference walks per-row candidate vectors with nested loops; here the
whole frame is one batched program:

  1. dense Hamming matrix left x right, masked by an epipolar row band
     (|yL - yR| <= 2 * scale(octave_L)), a disparity gate
     (uL - maxD <= uR <= uL) and an octave gate (+-1) — the mask is the
     TPU analogue of the reference's per-row candidate table;
  2. argmin + descriptor threshold ((TH_HIGH + TH_LOW) / 2 = 75, the
     reference's ``thOrbDist``);
  3. SAD refinement: an 11-wide normalized patch around the left keypoint
     correlated against 11 shifted right patches (w = 5, L = 5 as in the
     reference), all gathered in one advanced-indexing batch, with a
     parabola fit over the best triplet for sub-pixel disparity;
  4. vectorized median SAD cull (keep dist < 1.5 * 1.4 * median).

Difference from the reference: SAD runs on the full-resolution images with
the window scaled by the keypoint's octave, instead of on the pyramid level
images — the pyramid is not retained outside the extractor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .match import hamming_matrix

_BIG = 1e9


def _gather_patch_rows(img, yc, xc, dy, dx):
    """img (H, W); yc/xc (N,); dy (P,), dx (Q,) -> (N, P, Q) patches
    (clamped at the border)."""
    H, W = img.shape
    ys = jnp.clip(yc[:, None, None] + dy[None, :, None], 0, H - 1)
    xs = jnp.clip(xc[:, None, None] + dx[None, None, :], 0, W - 1)
    return img[ys, xs]


@functools.partial(jax.jit, static_argnames=("w", "search"))
def sad_subpixel(img_l, img_r, uv_l, u_r0, octave_l, w: int = 5, search: int = 5):
    """Batched SAD sliding-window refinement of right-image u coordinates.

    For each left keypoint i at ``uv_l[i]`` with a coarse right match at
    column ``u_r0[i]`` (same row), slide a (2w+1)^2 window over
    ``[-search, +search]`` columns in the right image, take the SAD argmin,
    and refine with a parabola fit.  Windows are scaled by the keypoint
    octave (full-res analogue of the reference's per-level images).

    Returns ``(u_refined, sad_best, ok)``.
    """
    N = uv_l.shape[0]
    scale = jnp.power(1.2, octave_l.astype(jnp.float32))
    step = jnp.maximum(jnp.round(scale).astype(jnp.int32), 1)  # window dilation

    xl = jnp.round(uv_l[:, 0]).astype(jnp.int32)
    yl = jnp.round(uv_l[:, 1]).astype(jnp.int32)
    xr = jnp.round(u_r0).astype(jnp.int32)

    off = jnp.arange(-w, w + 1, dtype=jnp.int32)
    # per-keypoint dilated offsets: (N, 2w+1)
    dyx = off[None, :] * step[:, None]

    def patch(img, yc, xc):
        H, W = img.shape
        ys = jnp.clip(yc[:, None, None] + dyx[:, :, None], 0, H - 1)
        xs = jnp.clip(xc[:, None, None] + dyx[:, None, :], 0, W - 1)
        return img[ys, xs]

    pl = patch(img_l, yl, xl)  # (N, P, P)
    pl = pl - pl[:, w : w + 1, w : w + 1]  # center-normalize (reference does the same)

    shifts = jnp.arange(-search, search + 1, dtype=jnp.int32)  # (S,)
    S = shifts.shape[0]

    def sad_at_shift(s):
        pr = patch(img_r, yl, xr + s)
        pr = pr - pr[:, w : w + 1, w : w + 1]
        return jnp.sum(jnp.abs(pl - pr), axis=(1, 2))  # (N,)

    sads = jax.vmap(sad_at_shift, out_axes=1)(shifts)  # (N, S)
    best = jnp.argmin(sads, axis=1)
    sad_best = jnp.take_along_axis(sads, best[:, None], axis=1)[:, 0]
    interior = (best > 0) & (best < S - 1)
    bi = jnp.clip(best, 1, S - 2)
    d_m = jnp.take_along_axis(sads, (bi - 1)[:, None], axis=1)[:, 0]
    d_p = jnp.take_along_axis(sads, (bi + 1)[:, None], axis=1)[:, 0]
    denom = 2.0 * (d_m + d_p - 2.0 * sad_best)
    delta = jnp.where(jnp.abs(denom) > 1e-6, (d_m - d_p) / jnp.maximum(denom, 1e-6), 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    u_ref = xr.astype(jnp.float32) + best.astype(jnp.float32) - search + jnp.where(interior, delta, 0.0)
    return u_ref, sad_best, interior


@functools.partial(jax.jit, static_argnames=("w", "search"))
def compute_stereo_matches(
    img_l,
    img_r,
    uv_l,
    octave_l,
    desc_l,
    valid_l,
    uv_r,
    octave_r,
    desc_r,
    valid_r,
    bf: float,
    fx: float,
    w: int = 5,
    search: int = 5,
    th_orb: float = 75.0,
):
    """Full stereo association for one frame.

    Returns ``(ur, depth, ok)`` per left keypoint: the sub-pixel right-view
    u coordinate, the triangulated depth ``bf / disparity``, and a validity
    mask.  Mirrors Frame::ComputeStereoMatches's gates: minD = 0,
    maxD = fx (i.e. min depth = baseline), row band 2 * scale, descriptor
    threshold 75, median-SAD cull at 1.5 * 1.4 * median.
    """
    scale_l = jnp.power(1.2, octave_l.astype(jnp.float32))
    row_band = 2.0 * scale_l
    dy = jnp.abs(uv_l[:, 1:2] - uv_r[None, :, 1])
    du = uv_l[:, 0:1] - uv_r[None, :, 0]  # disparity if matched
    gate = (
        (dy <= row_band[:, None])
        & (du >= -1.0)
        & (du <= fx)
        & (jnp.abs(octave_l[:, None] - octave_r[None, :]) <= 1)
    )
    dist = hamming_matrix(desc_l, desc_r)
    mask = valid_l[:, None] & valid_r[None, :] & gate
    dist = jnp.where(mask, dist, _BIG)
    idx = jnp.argmin(dist, axis=1)
    d1 = jnp.take_along_axis(dist, idx[:, None], axis=1)[:, 0]
    coarse_ok = d1 < th_orb

    u_r0 = uv_r[idx, 0]
    u_ref, sad_best, sp_ok = sad_subpixel(img_l, img_r, uv_l, u_r0, octave_l, w=w, search=search)
    disparity = uv_l[:, 0] - u_ref
    ok = coarse_ok & sp_ok & (disparity > 0.0) & (disparity <= fx)

    # median SAD outlier cull (Frame.cc sorts vDistIdx and thresholds at
    # 1.5 * 1.4 * median)
    sad_masked = jnp.where(ok, sad_best, jnp.nan)
    med = jnp.nanmedian(sad_masked)
    med = jnp.where(jnp.isnan(med), _BIG, med)
    ok = ok & (sad_best <= 1.5 * 1.4 * med)

    depth = jnp.where(ok, bf / jnp.maximum(disparity, 1e-6), -1.0)
    ur = jnp.where(ok, u_ref, -1.0)
    return ur, depth, ok
