"""ORB feature extraction, TPU-native.

Re-design of the reference extractor (ORBextractor.cc:765-1134: 8-level
pyramid, per-30px-cell FAST with 20->7 threshold fallback, quad-tree spatial
balancing, IC-angle orientation, 7x7 Gaussian blur + 256-bit rBRIEF) as a
fully batched, static-shape XLA program:

* the pyramid is ONE padded ``(L, H, W)`` array so every later gather is a
  single batched op across octaves;
* FAST is evaluated densely on all pixels of all levels with bit-packed
  circular-arc tests (no branches, fuses into a handful of VPU passes);
* the 20 -> 7 threshold fallback (ORBextractor.cc:811-819) becomes a
  branch-free score bonus: corners passing the strict threshold dominate any
  weak-threshold corner inside the same cell;
* the quad-tree ``DistributeOctTree`` (ORBextractor.cc:539-763) is replaced
  by per-cell top-k + per-level top-n_l: same goal (spatially uniform, best
  response wins locally), but a fixed-shape sort instead of a pointer tree;
* orientation and descriptors never touch XLA's scalar gather path (13-16 ns
  per element on TPU — it dominated early profiles): each keypoint's
  neighbourhood is pulled out as ONE contiguous 48x64 patch
  (``lax.dynamic_slice``, row-contiguous DMA), IC-angle moments become a
  static masked reduction over the patch, the 7x7 Gaussian becomes shifted
  adds on the patch stack, and steered-BRIEF sampling becomes two one-hot
  selection matmuls on the MXU (row-select then column-select) — ~8x faster
  end-to-end than the gather formulation on a v5e chip.

The BRIEF sampling pattern is generated from a fixed PRNG seed (original
BRIEF recipe: Gaussian sigma = patch/5) rather than copying OpenCV's learned
table — the whole stack (descriptors, matcher, vocabulary) is self-consistent
so only the distribution matters.

Outputs are padded to ``n_features`` with a validity mask — static shapes
everywhere (SURVEY.md §7.3).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Static tables
# ---------------------------------------------------------------------------

# FAST circle of radius 3 (standard Bresenham ring, 16 offsets, clockwise).
_FAST_RING = np.array(
    [
        (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    ],
    dtype=np.int32,
)  # (dy, dx)

_PATCH_RADIUS = 15  # IC-angle circular patch radius (ORBextractor half patch)

# Per-keypoint patch geometry: one contiguous 48x64 window with the keypoint
# at (24, 32).  Everything IC-angle (±15), rotated BRIEF (±14) and the 7-tap
# blur (±3 more) need fits with margin; 64 columns keeps rows lane-aligned.
_PATCH_H, _PATCH_W = 48, 64
_PATCH_CY, _PATCH_CX = 24, 32
_PYR_PAD = 32  # pyramid border pad so every patch slice is in bounds


def _ic_angle_weights():
    """(2, PATCH_H, PATCH_W) static m01/m10 moment weights: dy/dx inside the
    radius-15 circle centred on the keypoint, zero elsewhere."""
    ys, xs = np.mgrid[-_PATCH_CY : _PATCH_H - _PATCH_CY, -_PATCH_CX : _PATCH_W - _PATCH_CX]
    mask = (ys * ys + xs * xs <= _PATCH_RADIUS * _PATCH_RADIUS).astype(np.float32)
    return np.stack([ys * mask, xs * mask]).astype(np.float32)


_IC_WEIGHTS = _ic_angle_weights()  # (2, 48, 64)


def _brief_pattern(n_bits: int = 256, patch: int = 31, seed: int = 1234):
    """(n_bits, 2, 2) sampling pairs, Gaussian sigma = patch/5, clipped."""
    rng = np.random.RandomState(seed)
    sigma = patch / 5.0
    pts = rng.randn(n_bits, 2, 2) * sigma
    lim = patch // 2 - 2  # keep rotated samples within the gather patch
    return np.clip(np.round(pts), -lim, lim).astype(np.float32)


_BRIEF_PAIRS = _brief_pattern()  # (256, 2, 2): [pair, point a/b, (y, x)]


class Features(NamedTuple):
    """Padded per-frame ORB features (all arrays length ``N = n_features``)."""

    uv: jnp.ndarray  # (N, 2) pixel coords at level 0 scale (x, y)
    response: jnp.ndarray  # (N,)
    octave: jnp.ndarray  # (N,) int32
    angle: jnp.ndarray  # (N,) radians
    desc: jnp.ndarray  # (N, 8) uint32 packed 256-bit descriptors
    valid: jnp.ndarray  # (N,) bool


# ---------------------------------------------------------------------------
# Pyramid
# ---------------------------------------------------------------------------


def level_scales(n_levels: int, scale_factor: float):
    return np.array([scale_factor**i for i in range(n_levels)], dtype=np.float32)


@functools.lru_cache(maxsize=64)
def _resize_matrix(src: int, dst: int):
    """(dst, src) ANTIALIASED linear-interpolation matrix matching
    ``jax.image.resize(method='bilinear')`` downsampling semantics: output
    center i samples input coordinate c = (i + 0.5) * src/dst - 0.5 with a
    triangle kernel whose support widens by the scale factor (the
    antialiasing jax.image applies when shrinking), weights normalized.
    Dense so the resample becomes an MXU matmul instead of a gather."""
    scale = src / dst
    support = max(scale, 1.0)
    M = np.zeros((dst, src), np.float64)
    j = np.arange(src, dtype=np.float64)
    for i in range(dst):
        c = (i + 0.5) * scale - 0.5
        w = np.maximum(0.0, 1.0 - np.abs(j - c) / support)
        s = w.sum()
        M[i] = w / s
    return M.astype(np.float32)


def build_pyramid(image, n_levels: int, scale_factor: float):
    """(H, W) float32 -> padded (L, H, W) pyramid; level l is the top-left
    ``ceil(H/s^l) x ceil(W/s^l)`` region.  Each level is resized from the
    PREVIOUS level, like the reference (ORBextractor.cc ComputePyramid
    resizes mvImagePyramid[level-1]); the separable bilinear resample is
    expressed as two static interpolation matmuls (rows then columns) so
    the whole pyramid is MXU work."""
    H, W = image.shape
    levels = [image]
    prev, ph, pw = image, H, W
    for lvl in range(1, n_levels):
        s = scale_factor**lvl
        h, w = int(round(H / s)), int(round(W / s))
        Ry = jnp.asarray(_resize_matrix(ph, h))  # (h, ph)
        Cx = jnp.asarray(_resize_matrix(pw, w))  # (w, pw)
        resized = Ry @ prev[:ph, :pw] @ Cx.T
        padded = jnp.zeros((H, W), dtype=image.dtype).at[:h, :w].set(resized)
        levels.append(padded)
        prev, ph, pw = padded, h, w
    return jnp.stack(levels, axis=0)


def _level_dims(H, W, n_levels, scale_factor):
    dims = []
    for lvl in range(n_levels):
        s = scale_factor**lvl
        dims.append((int(round(H / s)), int(round(W / s))))
    return dims


# ---------------------------------------------------------------------------
# FAST corner response (dense, all levels at once)
# ---------------------------------------------------------------------------


def fast_response(img, strict_th: float, weak_th: float):
    """Dense FAST-9 response for one image (..., H, W).

    Returns ``score`` (float) where score > 0 iff the pixel passes the weak
    threshold, and score includes a large constant bonus iff it also passes
    the strict threshold — encoding the reference's 20 -> 7 fallback
    (ORBextractor.cc:811-819) without branches.
    """
    shifted = jnp.stack(
        [jnp.roll(img, (-int(dy), -int(dx)), axis=(-2, -1)) for dy, dx in _FAST_RING],
        axis=0,
    )  # (16, ..., H, W)
    diff = shifted - img[None]

    def arc_test(th):
        bright = (diff > th).astype(jnp.uint32)
        dark = (diff < -th).astype(jnp.uint32)

        def pack(bits):  # (16, ..., H, W) -> uint32 bitmask duplicated to 32
            m = bits[0]
            for p in range(1, 16):
                m = m | (bits[p] << p)
            return m | (m << 16)

        def has_run9(m):  # circular run of >= 9 set bits
            acc = m
            for k in range(1, 9):
                acc = acc & (m >> k)
            return acc != 0

        is_corner = has_run9(pack(bright)) | has_run9(pack(dark))
        mag = jnp.abs(diff)
        strength = jnp.where(mag > th, mag - th, 0.0)
        score = jnp.maximum(
            jnp.sum(jnp.where(diff > th, strength, 0.0), axis=0),
            jnp.sum(jnp.where(diff < -th, strength, 0.0), axis=0),
        )
        return is_corner, score

    weak_corner, weak_score = arc_test(weak_th)
    strict_corner, _ = arc_test(strict_th)
    bonus = 1e6
    return jnp.where(weak_corner, weak_score + jnp.where(strict_corner, bonus, 0.0), 0.0)


def _topk_small(s, k):
    """Iterative top-k along the last axis for tiny static k.

    ``lax.top_k`` lowers to a sort on TPU (~2.3 ms/frame for the cell
    selection); k rounds of argmax + mask are a handful of VPU reduction
    passes instead.  Ties resolve to the lowest index, like top_k."""
    scores, idxs = [], []
    lane = jnp.arange(s.shape[-1])
    for _ in range(k):
        i = jnp.argmax(s, axis=-1)
        v = jnp.take_along_axis(s, i[..., None], axis=-1)[..., 0]
        scores.append(v)
        idxs.append(i.astype(jnp.int32))
        s = jnp.where(lane == i[..., None], -jnp.inf, s)
    return jnp.stack(scores, axis=-1), jnp.stack(idxs, axis=-1)


def _nms3(score):
    """3x3 non-maximum suppression on (..., H, W)."""
    neighborhood = jax.lax.reduce_window(
        score,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1,) * (score.ndim - 2) + (3, 3),
        window_strides=(1,) * score.ndim,
        padding="SAME",
    )
    return jnp.where(score >= neighborhood, score, 0.0)


# ---------------------------------------------------------------------------
# Extraction
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_features", "n_levels", "scale_factor", "ini_th", "min_th",
        "cell_size", "edge_margin", "cell_topk",
    ),
)
def extract(
    image,
    n_features: int = 1000,
    n_levels: int = 8,
    scale_factor: float = 1.2,
    ini_th: int = 20,
    min_th: int = 7,
    cell_size: int = 32,
    edge_margin: int = 20,
    cell_topk: int = 4,
):
    """Extract ORB features from a (H, W) float32 grayscale image in [0, 255].

    The whole pipeline — pyramid, dense FAST, NMS, cell top-k, per-level
    quota, IC-angle, blur, steered BRIEF — is one jitted program.
    """
    H, W = image.shape
    image = image.astype(jnp.float32)
    pyramid = build_pyramid(image, n_levels, scale_factor)  # (L, H, W)
    dims = _level_dims(H, W, n_levels, scale_factor)
    scales = level_scales(n_levels, scale_factor)

    # --- dense response on every level (padded regions masked out) ---------
    from .pallas_fast import fast_nms_score_auto  # lazy: pallas_fast imports us

    score = fast_nms_score_auto(pyramid, float(ini_th), float(min_th))

    row = jnp.arange(H)[None, :, None]
    col = jnp.arange(W)[None, None, :]
    h_arr = jnp.asarray([d[0] for d in dims])[:, None, None]
    w_arr = jnp.asarray([d[1] for d in dims])[:, None, None]
    inside = (
        (row >= edge_margin)
        & (row < h_arr - edge_margin)
        & (col >= edge_margin)
        & (col < w_arr - edge_margin)
    )
    score = jnp.where(inside, score, 0.0)

    # --- per-cell top-k on each level --------------------------------------
    n_cy, n_cx = -(-H // cell_size), -(-W // cell_size)
    pad_h, pad_w = n_cy * cell_size - H, n_cx * cell_size - W
    s = jnp.pad(score, ((0, 0), (0, pad_h), (0, pad_w)))
    s = s.reshape(n_levels, n_cy, cell_size, n_cx, cell_size)
    s = s.transpose(0, 1, 3, 2, 4).reshape(n_levels, n_cy * n_cx, cell_size * cell_size)
    cell_scores, cell_idx = _topk_small(s, cell_topk)  # (L, C, k)

    cells = jnp.arange(n_cy * n_cx)
    cy = (cells // n_cx)[None, :, None]
    cx = (cells % n_cx)[None, :, None]
    in_y = cell_idx // cell_size
    in_x = cell_idx % cell_size
    ys = cy * cell_size + in_y  # (L, C, k)
    xs = cx * cell_size + in_x

    cand_scores = cell_scores.reshape(n_levels, -1)
    cand_y = ys.reshape(n_levels, -1)
    cand_x = xs.reshape(n_levels, -1)

    # --- per-level quota (geometric series, ORBextractor.cc ctor) ----------
    inv = 1.0 / scale_factor
    quota = n_features * (1 - inv) / (1 - inv**n_levels) * inv ** np.arange(n_levels)
    quota = np.floor(quota).astype(np.int32)
    quota[-1] = max(n_features - int(quota[:-1].sum()), 0)

    sel_y, sel_x, sel_s, sel_l = [], [], [], []
    for lvl in range(n_levels):
        k = int(quota[lvl])
        if k == 0:
            continue
        k = min(k, cand_scores.shape[1])
        top_s, top_i = jax.lax.top_k(cand_scores[lvl], k)
        sel_y.append(cand_y[lvl][top_i])
        sel_x.append(cand_x[lvl][top_i])
        sel_s.append(top_s)
        sel_l.append(jnp.full((k,), lvl, dtype=jnp.int32))

    kp_y = jnp.concatenate(sel_y)[:n_features]
    kp_x = jnp.concatenate(sel_x)[:n_features]
    kp_s = jnp.concatenate(sel_s)[:n_features]
    kp_l = jnp.concatenate(sel_l)[:n_features]
    n_out = kp_y.shape[0]
    if n_out < n_features:
        pad = n_features - n_out
        kp_y = jnp.pad(kp_y, (0, pad))
        kp_x = jnp.pad(kp_x, (0, pad))
        kp_s = jnp.pad(kp_s, (0, pad))
        kp_l = jnp.pad(kp_l, (0, pad))
    valid = kp_s > 0.0

    # --- blur the pyramid once, then pull per-keypoint patches -------------
    # The reference blurs whole pyramid levels before descriptor sampling
    # (ORBextractor.cc operator(): GaussianBlur on workingMat); blurring the
    # (L, H, W) stack once costs ~8x less HBM traffic than blurring 1024
    # separate 48x64 patches.  IC angle is computed from the blurred patch
    # too — the Gaussian is radially symmetric, so the intensity-centroid
    # direction is unbiased (the reference uses the raw image there; the
    # smoothed moments differ only in magnitude, not direction).
    blurred = _blur_pyramid(pyramid)
    patches = _extract_patches(blurred, kp_l, kp_y, kp_x)  # (N, 48, 64)

    # --- orientation (IC angle: static masked moment reduction) ------------
    # NOTE: a fused Pallas blur+BRIEF kernel was tried and measured SLOWER
    # (146 vs 175 frames/s end-to-end): its per-keypoint (512x48)@(48x64)
    # matmuls serialize in a 128-step loop, while XLA streams the one-hot
    # sampling as large batched matmuls at full MXU utilization.
    w01, w10 = jnp.asarray(_IC_WEIGHTS)
    m01 = jnp.sum(patches * w01, axis=(1, 2))
    m10 = jnp.sum(patches * w10, axis=(1, 2))
    angle = jnp.arctan2(m01, m10)

    # --- steered BRIEF (one-hot MXU sampling) -------------------------------
    desc = _brief_descriptors(patches, angle)

    # scale keypoint coords back to level-0 pixels
    scale_per_kp = jnp.asarray(scales)[kp_l]
    uv = jnp.stack([kp_x * scale_per_kp, kp_y * scale_per_kp], axis=-1)

    return Features(
        uv=uv.astype(jnp.float32),
        response=kp_s,
        octave=kp_l,
        angle=angle,
        desc=desc,
        valid=valid,
    )


def _extract_patches(pyramid, kp_l, kp_y, kp_x):
    """(L, H, W) + per-keypoint (level, y, x) -> (N, PATCH_H, PATCH_W).

    Two stages, both TPU-friendly:
      1. gather whole ROWS: the padded pyramid is viewed as (L*Hp, Wp) and
         each keypoint pulls its 48 full-width rows — contiguous 2.8 KB
         transfers that XLA lowers to efficient DMA;
      2. column selection as a one-hot bf16 matmul on the MXU
         ((N, 48, Wp) @ (N, Wp, 64)) — selection weights in {0, 1} are exact
         in bf16.  The pixel strips themselves are mean-centered before the
         bf16 cast and the mean is added back after (each output column
         selects exactly one input column, so the shift is exact): bf16's
         8-bit mantissa quantizes raw intensities near 255 by ~1 gray level,
         but deviations from the patch mean are typically <64, keeping the
         error under ~1/4 level for the downstream IC-angle moments and
         BRIEF comparisons (descriptor parity covered by test_orb.py).
    Measured 3.5x faster than a vmapped (1, 48, 64) ``dynamic_slice`` (the
    3D slice gather lowers poorly on TPU: 1.98 -> 0.56 ms/frame for 1024
    keypoints on a v5e).  The pyramid is border-padded once so every row and
    column index is statically in bounds.  (A Pallas per-patch async-DMA
    variant is NOT viable: Mosaic requires DMA slice offsets to respect the
    (8, 128) tiling, and patch origins are arbitrary pixels.)"""
    L, H, W = pyramid.shape
    pp = jnp.pad(pyramid, ((0, 0), (_PYR_PAD, _PYR_PAD), (_PYR_PAD, _PYR_PAD)))
    Hp, Wp = H + 2 * _PYR_PAD, W + 2 * _PYR_PAD
    flat = pp.reshape(L * Hp, Wp)
    row0 = kp_l * Hp + kp_y + _PYR_PAD - _PATCH_CY
    rows = row0[:, None] + jnp.arange(_PATCH_H)[None, :]  # (N, 48)
    strips = flat[rows]  # (N, 48, Wp)
    col0 = kp_x + _PYR_PAD - _PATCH_CX
    onehot = (
        col0[:, None, None] + jnp.arange(_PATCH_W)[None, None, :]
        == jnp.arange(Wp)[None, :, None]
    ).astype(jnp.bfloat16)  # (N, Wp, 64)
    mean = jnp.mean(strips, axis=(1, 2), keepdims=True)
    sel = jnp.einsum(
        "nyw,nwx->nyx",
        (strips - mean).astype(jnp.bfloat16),
        onehot,
        preferred_element_type=jnp.float32,
    )
    return sel + mean


def _blur_pyramid(pyramid, sigma: float = 2.0, radius: int = 3):
    """Separable 7-tap Gaussian on the whole (L, H, W) pyramid via shifted
    adds, matching the reference's GaussianBlur(7x7, sigma=2) before
    descriptor sampling (ORBextractor.cc operator()).  ``jnp.roll`` wraps at
    image borders, corrupting only the outermost ``radius`` rows/cols of each
    level; keypoints carry an edge margin of 20 and BRIEF samples reach at
    most ±(14 + radius) = ±17 from the keypoint, so no sampled pixel sees
    the wrap."""
    xs = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    k /= k.sum()
    out = jnp.zeros_like(pyramid)
    for d in range(-radius, radius + 1):
        out = out + float(k[d + radius]) * jnp.roll(pyramid, -d, axis=-1)
    out2 = jnp.zeros_like(out)
    for d in range(-radius, radius + 1):
        out2 = out2 + float(k[d + radius]) * jnp.roll(out, -d, axis=-2)
    return out2


def _brief_descriptors(blurred_patches, angle):
    """Steered BRIEF from blurred patches: (N, 48, 64), (N,) -> (N, 8) u32.

    Sampling at the rotated pattern positions is expressed as two one-hot
    selection matmuls (row-select on the MXU, then a column-select reduce)
    instead of a 512-element random gather per keypoint — selection with
    {0,1} f32 weights is exact, and the batched (512x48)@(48x64) matmuls are
    ~5x faster than XLA's scalar gather path on TPU."""
    n = blurred_patches.shape[0]
    pairs = jnp.asarray(_BRIEF_PAIRS)  # (256, 2, 2) in (y, x)
    py = pairs[..., 0].reshape(-1)  # (512,) a/b interleaved
    px = pairs[..., 1].reshape(-1)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    ry = jnp.round(px[None] * sa[:, None] + py[None] * ca[:, None]).astype(jnp.int32)
    rx = jnp.round(px[None] * ca[:, None] - py[None] * sa[:, None]).astype(jnp.int32)
    iy = jnp.clip(_PATCH_CY + ry, 0, _PATCH_H - 1)  # (N, 512)
    ix = jnp.clip(_PATCH_CX + rx, 0, _PATCH_W - 1)
    # bf16 halves the HBM traffic of the big (N, 512, 48/64) intermediates;
    # selection weights are exact in bf16 and pixel rounding (~0.2%) only
    # matters for near-tie comparisons the descriptor is robust to anyway
    row_sel = (iy[:, :, None] == jnp.arange(_PATCH_H)[None, None, :]).astype(jnp.bfloat16)
    rowvals = jnp.einsum(
        "nsy,nyx->nsx", row_sel, blurred_patches.astype(jnp.bfloat16),
        preferred_element_type=jnp.bfloat16,
    )  # (N, 512, 64)
    col_sel = ix[:, :, None] == jnp.arange(_PATCH_W)[None, None, :]
    samples = jnp.sum(
        jnp.where(col_sel, rowvals.astype(jnp.float32), 0.0), axis=-1
    ).reshape(n, 256, 2)
    bits = (samples[..., 0] < samples[..., 1]).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits.reshape(n, 8, 32) << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def unpack_descriptor_bits(desc_u32):
    """(..., 8) uint32 -> (..., 256) float32 in {0, 1} (for MXU matching)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc_u32[..., :, None] >> shifts[None, :]) & jnp.uint32(1)
    return bits.reshape(*desc_u32.shape[:-1], 256).astype(jnp.float32)
