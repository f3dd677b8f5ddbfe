"""Pinhole camera model with radial-tangential distortion.

Replaces the reference's OpenCV camera handling (Frame.cc ``UndistortKeyPoints``
uses ``cv::undistortPoints``; projection constants fx/fy/cx/cy are read in
Tracking.cc:61-89).  All functions are batched and jit-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    """Static camera intrinsics (a pytree of scalars/arrays).

    ``dist`` is OpenCV-ordered ``[k1, k2, p1, p2, k3]``.  ``bf`` is the
    stereo baseline times fx (reference: Tracking.cc:97-100), 0 for mono.
    """

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray  # (5,)
    width: int
    height: int
    bf: jnp.ndarray

    @property
    def K(self):
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.array(
            [[self.fx, z, self.cx], [z, self.fy, self.cy], [z, z, o]], dtype=jnp.float32
        )

    @staticmethod
    def make(fx, fy, cx, cy, dist=None, width=640, height=480, bf=0.0):
        if dist is None:
            dist = jnp.zeros(5, dtype=jnp.float32)
        return Camera(
            fx=jnp.float32(fx),
            fy=jnp.float32(fy),
            cx=jnp.float32(cx),
            cy=jnp.float32(cy),
            dist=jnp.asarray(dist, dtype=jnp.float32),
            width=int(width),
            height=int(height),
            bf=jnp.float32(bf),
        )


def project(cam: Camera, p_cam):
    """Camera-frame points (..., 3) -> pixels (..., 2).  No distortion
    (matches the reference which projects onto the undistorted image)."""
    z = p_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * p_cam[..., 0] * inv_z + cam.cx
    v = cam.fy * p_cam[..., 1] * inv_z + cam.cy
    return jnp.stack([u, v], axis=-1)


def backproject(cam: Camera, uv, depth):
    """Pixels (..., 2) + depth (...) -> camera-frame points (..., 3)
    (reference: Frame.cc ``UnprojectStereo``)."""
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def distort_normalized(cam: Camera, xy):
    """Apply radtan distortion to normalized coords (..., 2)."""
    k1, k2, p1, p2, k3 = (cam.dist[i] for i in range(5))
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(cam: Camera, uv, iters: int = 8):
    """Iteratively undistort pixel coords, same fixed-point scheme as
    ``cv::undistortPoints`` (used by Frame.cc ``UndistortKeyPoints``)."""
    xy_d = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )
    xy = xy_d
    for _ in range(iters):
        k1, k2, p1, p2, k3 = (cam.dist[i] for i in range(5))
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        xy = jnp.stack(
            [(xy_d[..., 0] - dx) / radial, (xy_d[..., 1] - dy) / radial], axis=-1
        )
    return jnp.stack(
        [xy[..., 0] * cam.fx + cam.cx, xy[..., 1] * cam.fy + cam.cy], axis=-1
    )


def in_image(cam: Camera, uv, margin: float = 0.0):
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < cam.width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < cam.height - margin)
    )
