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
* orientation and descriptors are one gather per (keypoint, sample-point)
  over the padded pyramid.

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


def _ic_angle_offsets():
    """(n, 2) integer offsets inside the radius-15 circle."""
    ys, xs = np.mgrid[-_PATCH_RADIUS : _PATCH_RADIUS + 1, -_PATCH_RADIUS : _PATCH_RADIUS + 1]
    mask = ys * ys + xs * xs <= _PATCH_RADIUS * _PATCH_RADIUS
    return np.stack([ys[mask], xs[mask]], axis=-1).astype(np.int32)


_IC_OFFSETS = _ic_angle_offsets()  # (~709, 2)


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


def build_pyramid(image, n_levels: int, scale_factor: float):
    """(H, W) float32 -> padded (L, H, W) pyramid; level l is the top-left
    ``ceil(H/s^l) x ceil(W/s^l)`` region (ORBextractor.cc ComputePyramid)."""
    H, W = image.shape
    levels = [image]
    for lvl in range(1, n_levels):
        s = scale_factor**lvl
        h, w = int(round(H / s)), int(round(W / s))
        resized = jax.image.resize(image, (h, w), method="bilinear")
        padded = jnp.zeros((H, W), dtype=image.dtype).at[:h, :w].set(resized)
        levels.append(padded)
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
    score = fast_response(pyramid, float(ini_th), float(min_th))
    score = _nms3(score)

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
    cell_scores, cell_idx = jax.lax.top_k(s, cell_topk)  # (L, C, k)

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

    # --- orientation (IC angle on the raw level image) ---------------------
    offs = jnp.asarray(_IC_OFFSETS)  # (P, 2)
    gy = kp_y[:, None] + offs[None, :, 0]
    gx = kp_x[:, None] + offs[None, :, 1]
    gy = jnp.clip(gy, 0, H - 1)
    gx = jnp.clip(gx, 0, W - 1)
    vals = pyramid[kp_l[:, None], gy, gx]  # (N, P)
    m01 = jnp.sum(vals * offs[None, :, 0], axis=1)
    m10 = jnp.sum(vals * offs[None, :, 1], axis=1)
    angle = jnp.arctan2(m01, m10)

    # --- blur + steered BRIEF ---------------------------------------------
    blurred = _gaussian_blur(pyramid)
    pairs = jnp.asarray(_BRIEF_PAIRS)  # (256, 2, 2) in (y, x)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    py, px = pairs[..., 0], pairs[..., 1]  # (256, 2)
    ry = jnp.round(px[None] * sa[:, None, None] + py[None] * ca[:, None, None]).astype(jnp.int32)
    rx = jnp.round(px[None] * ca[:, None, None] - py[None] * sa[:, None, None]).astype(jnp.int32)
    sy = jnp.clip(kp_y[:, None, None] + ry, 0, H - 1)  # (N, 256, 2)
    sx = jnp.clip(kp_x[:, None, None] + rx, 0, W - 1)
    samples = blurred[kp_l[:, None, None], sy, sx]  # (N, 256, 2)
    bits = (samples[..., 0] < samples[..., 1]).astype(jnp.uint32)  # (N, 256)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    desc = jnp.sum(
        bits.reshape(-1, 8, 32) << shifts[None, None, :], axis=-1, dtype=jnp.uint32
    )

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


def _gaussian_blur(pyramid, sigma: float = 2.0, radius: int = 3):
    """Separable 7-tap Gaussian on (L, H, W), matching the reference's
    GaussianBlur(7x7, sigma=2) before descriptor sampling."""
    xs = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    k /= k.sum()
    k = jnp.asarray(k)
    x = pyramid[:, None]  # (L, 1, H, W)
    x = jax.lax.conv_general_dilated(
        x, k.reshape(1, 1, -1, 1), (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    x = jax.lax.conv_general_dilated(
        x, k.reshape(1, 1, 1, -1), (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return x[:, 0]


def unpack_descriptor_bits(desc_u32):
    """(..., 8) uint32 -> (..., 256) float32 in {0, 1} (for MXU matching)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc_u32[..., :, None] >> shifts[None, :]) & jnp.uint32(1)
    return bits.reshape(*desc_u32.shape[:-1], 256).astype(jnp.float32)
