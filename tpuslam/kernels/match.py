"""Batched ORB descriptor matching on the MXU.

Re-design of ORBmatcher.cc (9 search variants, popcount Hamming, ratio test,
30-bin rotation-consistency histogram, ORBmatcher.cc:37-39 thresholds) as
dense masked matrix ops:

* Hamming distance between 256-bit descriptors uses the identity
  ``ham(a, b) = |a| + |b| - 2 a.b`` on unpacked {0,1} bit vectors, so the
  (N, M) distance matrix is ONE 256-deep matmul — MXU work instead of the
  reference's per-pair popcount loop (ORBmatcher.cc:1647-1664).
* Every search variant (projection-gated, window-gated, epipolar-gated)
  is the same dense distance matrix with a different additive mask.

All shapes static; invalid rows/columns are masked with +inf distance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .orb import unpack_descriptor_bits

BIG = 1e9


def hamming_matrix(desc_a, desc_b):
    """(N, 8) x (M, 8) packed uint32 -> (N, M) float32 Hamming distances."""
    a = unpack_descriptor_bits(desc_a)  # (N, 256)
    b = unpack_descriptor_bits(desc_b)  # (M, 256)
    dot = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    na = jnp.sum(a, axis=-1, keepdims=True)
    nb = jnp.sum(b, axis=-1, keepdims=True)
    return na + nb.T - 2.0 * dot


def masked_argmin2(dist):
    """Best and second-best along axis 1: (idx, d1, d2)."""
    idx = jnp.argmin(dist, axis=1)
    d1 = jnp.take_along_axis(dist, idx[:, None], axis=1)[:, 0]
    dist2 = dist.at[jnp.arange(dist.shape[0]), idx].set(BIG)
    d2 = jnp.min(dist2, axis=1)
    return idx, d1, d2


def match_descriptors(
    desc_a,
    desc_b,
    valid_a,
    valid_b,
    gate_mask=None,
    max_dist: float = 50.0,
    ratio: float = 1.0,
    mutual: bool = False,
):
    """Generic gated nearest-neighbour matching a -> b.

    ``gate_mask`` (N, M) bool restricts candidate pairs (the TPU analogue of
    the reference's grid / BoW-node candidate lists).  Returns
    ``(idx (N,), dists (N,), ok (N,))``.

    Ungated non-mutual searches dispatch to the fused Pallas kernel
    (kernels/pallas_match.py): 17x faster on TPU than materializing the
    distance matrix.
    """
    if gate_mask is None and not mutual:
        from .pallas_match import hamming_top2_auto

        idx, d1, d2 = hamming_top2_auto(desc_a, desc_b, valid_b)
        ok = valid_a & (d1 <= max_dist) & (d1 <= ratio * d2)
        return idx.astype(jnp.int32), d1, ok

    dist = hamming_matrix(desc_a, desc_b)
    mask = valid_a[:, None] & valid_b[None, :]
    if gate_mask is not None:
        mask = mask & gate_mask
    dist = jnp.where(mask, dist, BIG)
    idx, d1, d2 = masked_argmin2(dist)
    ok = (d1 <= max_dist) & (d1 <= ratio * d2)
    if mutual:
        back = jnp.argmin(dist, axis=0)
        ok = ok & (back[idx] == jnp.arange(desc_a.shape[0]))
    return idx, d1, ok


def rotation_consistency(angle_a, angle_b, idx, ok, hist_length: int = 30, top_bins: int = 3):
    """Keep only matches whose angle difference falls in the ``top_bins``
    most popular histogram bins (ORBmatcher.cc rotation histogram; the
    reference keeps the top 3 of 30 bins)."""
    rot = angle_a - angle_b[idx]
    rot = jnp.mod(rot, 2.0 * jnp.pi)
    bins = jnp.clip((rot * hist_length / (2.0 * jnp.pi)).astype(jnp.int32), 0, hist_length - 1)
    counts = jnp.zeros(hist_length, dtype=jnp.int32).at[bins].add(ok.astype(jnp.int32))
    _, top = jax.lax.top_k(counts, top_bins)
    in_top = jnp.any(bins[:, None] == top[None, :], axis=1)
    return ok & in_top


def window_gate(uv_a, uv_b, radius):
    """(N, 2), (M, 2) -> (N, M) bool: b within ``radius`` pixels of a.

    ``radius`` may be scalar or per-row (N,).  Replaces the reference's
    64x48 frame grid candidate lookup (Frame.h:37-38, GetFeaturesInArea) —
    the dense mask is cheaper on TPU than a gather through grid cells.
    """
    d2 = jnp.sum((uv_a[:, None, :] - uv_b[None, :, :]) ** 2, axis=-1)
    r = jnp.asarray(radius)
    r2 = (r**2)[..., None] if r.ndim == 1 else r**2
    return d2 <= r2


def octave_gate(oct_pred, oct_b, lo: int = -1, hi: int = 1):
    """(N,), (M,) -> (N, M) bool: octave of b within [pred+lo, pred+hi]
    (reference: SearchByProjection octave window, ORBmatcher.cc:1380-1390)."""
    diff = oct_b[None, :] - oct_pred[:, None]
    return (diff >= lo) & (diff <= hi)


def epipolar_gate(uv_a, uv_b, F12, scale_b, th: float = 3.84):
    """(N, 2), (M, 2), fundamental F12 -> (N, M) bool Sampson-style gate.

    Mirrors ``CheckDistEpipolarLine`` (ORBmatcher.cc:~640): squared distance
    of b to the epipolar line of a below ``3.84 * sigma2(octave_b)``.
    """
    ones_a = jnp.ones_like(uv_a[:, :1])
    pa = jnp.concatenate([uv_a, ones_a], axis=-1)  # (N, 3)
    lines = pa @ F12  # (N, 3) line coefficients in image b
    num = (
        lines[:, None, 0] * uv_b[None, :, 0]
        + lines[:, None, 1] * uv_b[None, :, 1]
        + lines[:, None, 2]
    ) ** 2
    den = lines[:, 0:1] ** 2 + lines[:, 1:2] ** 2
    dsq = num / (den + 1e-12)
    return dsq < th * scale_b[None, :] ** 2
