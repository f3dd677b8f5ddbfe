"""Online plane segmentation from depth — TPU-native PCL replacement.

The reference's RGB-D plane path (Tracking.cc:2404-2513) builds an organized
point cloud at stride 3, runs PCL IntegralImageNormalEstimation +
OrganizedMultiPlaneSegmentation (min 1000 inliers, 3 deg angle, 0.05 m
distance) and refits each plane with SAC-RANSAC.

TPU formulation: per-pixel normals from cross products of the organized
point-map gradients, then plane extraction as HOUGH VOTING over a quantized
(azimuth, elevation, distance) accumulator — peaks replace PCL's region
growing (connectivity is traded for global voting; coplanar but disconnected
surfaces merge, which the downstream world-frame association tolerates) —
followed by a least-squares refit (smallest eigenvector of the inlier
covariance) per extracted plane.  Everything is one jitted program with
static output capacity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def organized_cloud(depth, fx, fy, cx, cy, stride: int = 3):
    """(H, W) depth -> (h, w, 3) camera-frame point map at ``stride``."""
    d = depth[::stride, ::stride]
    h, w = d.shape
    ys = jnp.arange(h) * stride
    xs = jnp.arange(w) * stride
    X = (xs[None, :] - cx) / fx * d
    Y = (ys[:, None] - cy) / fy * d
    return jnp.stack([X, Y, d], axis=-1)


def cloud_normals(pts):
    """Normals from central differences of the organized point map,
    oriented toward the camera (the integral-image estimator analogue)."""
    dx = jnp.roll(pts, -1, axis=1) - jnp.roll(pts, 1, axis=1)
    dy = jnp.roll(pts, -1, axis=0) - jnp.roll(pts, 1, axis=0)
    n = jnp.cross(dx, dy)
    nrm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(nrm, 1e-9)
    # orient: normal . point < 0 (facing the camera)
    flip = jnp.sum(n * pts, axis=-1, keepdims=True) > 0
    return jnp.where(flip, -n, n)


@functools.partial(
    jax.jit,
    static_argnames=("stride", "max_planes", "n_az", "n_el", "n_d"),
)
def segment_planes(
    depth,
    fx,
    fy,
    cx,
    cy,
    stride: int = 3,
    max_planes: int = 8,
    min_inliers: int = 1000,
    angle_cos: float = 0.99863,  # cos(3 deg) (Tracking.cc:2446)
    dist_th: float = 0.05,  # metres (Tracking.cc:2447)
    n_az: int = 24,
    n_el: int = 12,
    n_d: int = 64,
    d_max: float = 12.8,
):
    """Extract up to ``max_planes`` camera-frame planes from a depth image.

    Returns (coef (max_planes, 4) Hessian d >= 0, centroid (max_planes, 3),
    inlier counts (max_planes,), valid (max_planes,)).  ``min_inliers`` is in
    FULL-RES pixel units like the reference's 1000; internally scaled by
    stride^2.
    """
    pts = organized_cloud(depth, fx, fy, cx, cy, stride)
    normals = cloud_normals(pts)
    h, w = pts.shape[:2]
    valid_px = (pts[..., 2] > 0.1) & (jnp.abs(normals).sum(-1) > 0.1)
    # border pixels have wrapped gradients
    border = jnp.zeros((h, w), bool).at[1:-1, 1:-1].set(True)
    valid_px = valid_px & border

    d_signed = -jnp.sum(normals * pts, axis=-1)  # n.p + d = 0
    # canonicalize sign: d >= 0
    flip = d_signed < 0
    normals = jnp.where(flip[..., None], -normals, normals)
    d_plane = jnp.abs(d_signed)

    az = jnp.arctan2(normals[..., 1], normals[..., 0])  # [-pi, pi]
    el = jnp.arcsin(jnp.clip(normals[..., 2], -1.0, 1.0))  # [-pi/2, pi/2]
    ia = jnp.clip(((az + jnp.pi) / (2 * jnp.pi) * n_az).astype(jnp.int32), 0, n_az - 1)
    ie = jnp.clip(((el + jnp.pi / 2) / jnp.pi * n_el).astype(jnp.int32), 0, n_el - 1)
    idd = jnp.clip((d_plane / d_max * n_d).astype(jnp.int32), 0, n_d - 1)
    flat = (ia * n_el + ie) * n_d + idd
    flat = jnp.where(valid_px, flat, n_az * n_el * n_d)
    votes = jnp.zeros((n_az * n_el * n_d + 1,), jnp.int32).at[flat.reshape(-1)].add(1)[:-1]

    # peak NMS over the distance axis neighbourhood (same cell +- 1 d-bin)
    v3 = votes.reshape(n_az * n_el, n_d)
    neigh = jnp.maximum(
        v3, jnp.maximum(jnp.roll(v3, 1, axis=1), jnp.roll(v3, -1, axis=1))
    )
    peaks = jnp.where(v3 >= neigh, v3, 0).reshape(-1)
    top_votes, top_bins = jax.lax.top_k(peaks, max_planes)

    # decode bin centers as initial plane hypotheses
    bin_d = top_bins % n_d
    bin_ae = top_bins // n_d
    bin_e = bin_ae % n_el
    bin_a = bin_ae // n_el
    az0 = (bin_a + 0.5) / n_az * 2 * jnp.pi - jnp.pi
    el0 = (bin_e + 0.5) / n_el * jnp.pi - jnp.pi / 2
    d0 = (bin_d + 0.5) / n_d * d_max
    n0 = jnp.stack(
        [jnp.cos(el0) * jnp.cos(az0), jnp.cos(el0) * jnp.sin(az0), jnp.sin(el0)], axis=-1
    )

    pts_flat = pts.reshape(-1, 3)
    nrm_flat = normals.reshape(-1, 3)
    valid_flat = valid_px.reshape(-1)

    def refine(n_init, d_init):
        n_cur, d_cur = n_init, d_init
        # coarse-to-fine gates: the Hough bin center can be ~half a bin off
        # (7.5 deg / 0.1 m), so the first LS round must accept loosely
        schedule = [(0.966, 0.3), (0.9945, 0.1), (angle_cos, dist_th)]
        for gate_cos, gate_dist in schedule:
            cos = jnp.abs(nrm_flat @ n_cur)
            dist = jnp.abs(pts_flat @ n_cur + d_cur)
            inl = valid_flat & (cos > gate_cos) & (dist < gate_dist)
            wgt = inl.astype(jnp.float32)
            cnt = jnp.maximum(wgt.sum(), 3.0)
            mu = jnp.sum(pts_flat * wgt[:, None], axis=0) / cnt
            xc = (pts_flat - mu) * wgt[:, None]
            cov = xc.T @ (pts_flat - mu)
            _, vecs = jnp.linalg.eigh(cov)
            n_new = vecs[:, 0]
            d_new = -jnp.dot(n_new, mu)
            sgn = jnp.where(d_new < 0, -1.0, 1.0)
            n_cur, d_cur = n_new * sgn, d_new * sgn
        cos = jnp.abs(nrm_flat @ n_cur)
        dist = jnp.abs(pts_flat @ n_cur + d_cur)
        inl = valid_flat & (cos > angle_cos) & (dist < dist_th)
        cnt = inl.sum()
        mu = jnp.sum(pts_flat * inl[:, None].astype(jnp.float32), axis=0) / jnp.maximum(cnt, 1)
        return jnp.concatenate([n_cur, d_cur[None]]), mu, cnt

    coefs, centroids, counts = jax.vmap(refine)(n0, d0)
    # dedupe: suppress a plane if an earlier (higher-vote) one is near-equal
    def dedupe(carry, i):
        keep = carry
        earlier = jnp.arange(max_planes) < i
        same = (
            (jnp.abs(jnp.sum(coefs[:, :3] * coefs[i, :3], axis=-1)) > 0.98)
            & (jnp.abs(coefs[:, 3] - coefs[i, 3]) < 0.1)
            & earlier
            & keep
        )
        keep = keep.at[i].set(~jnp.any(same))
        return keep, None

    keep0 = jnp.ones(max_planes, bool)
    keep, _ = jax.lax.scan(dedupe, keep0, jnp.arange(max_planes))
    min_count = min_inliers // (stride * stride)
    valid = keep & (counts >= min_count) & (top_votes > 0)
    return coefs, centroids, counts.astype(jnp.int32), valid
