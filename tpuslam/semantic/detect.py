"""Offline semantic detection inputs (planes, cuboids, 2D bboxes).

The reference consumes per-frame detection text files (the detectors run
offline): plane rows ``[id nx ny nz d cx cy cz num]``
(Tracking.cc:2354-2377), cuboid rows ``classname x y z roll pitch yaw sx sy
sz`` read with ``read_obj_detection_txt`` (Tracking.cc:1991-1997,
matrix_utils.h:28-40), and YOLO bbox rows ``classname x1 y1 w h prob``
(Tracking.cc:1980-1986).  Cuboid measurements are converted from the global
frame to the camera frame using the GT camera pose of the frame
(Tracking.cc:2004-2022) and the 2D bbox/corners come from projecting the
global cuboid with that pose (the reference distrusts the YOLO bbox,
Tracking.cc:2030-2035).

Same contract here, plus an in-memory path for synthetic tests.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..core import geometry as geo


class PlaneDetections(NamedTuple):
    """Per-frame plane measurements in the CAMERA frame, padded to L."""

    coef: jnp.ndarray  # (L, 4) Hessian form, d >= 0
    centroid: jnp.ndarray  # (L, 3)
    valid: jnp.ndarray  # (L,) bool

    @staticmethod
    def empty(l):
        return PlaneDetections(
            coef=np.tile(np.array([[0.0, 0.0, 1.0, 1.0]], np.float32), (l, 1)),
            centroid=np.zeros((l, 3), np.float32),
            valid=np.zeros(l, bool),
        )


class CuboidDetections(NamedTuple):
    """Per-frame cuboid measurements, padded to O."""

    local_pose: jnp.ndarray  # (O, 4, 4) object->camera
    local_scale: jnp.ndarray  # (O, 3)
    global_pose: jnp.ndarray  # (O, 4, 4) object->world (via GT pose)
    global_scale: jnp.ndarray  # (O, 3)
    bbox: jnp.ndarray  # (O, 4) [cx, cy, w, h]
    corners: jnp.ndarray  # (O, 16) projected corner pixels
    classid: jnp.ndarray  # (O,) int32
    quality: jnp.ndarray  # (O,) meas_quality (0.7 default)
    valid: jnp.ndarray  # (O,) bool

    @staticmethod
    def empty(o):
        """HOST-side (numpy) empty detections: per-frame detector IO must
        never touch the device — building padded device arrays and pulling
        them back cost ~8 sync round trips (~200 ms) per frame on a
        tunnel-attached chip.  Consumers jnp-convert at keyframe time."""
        eye = np.broadcast_to(np.eye(4, dtype=np.float32), (o, 4, 4)).copy()
        return CuboidDetections(
            local_pose=eye,
            local_scale=np.ones((o, 3), np.float32),
            global_pose=eye.copy(),
            global_scale=np.ones((o, 3), np.float32),
            bbox=np.zeros((o, 4), np.float32),
            corners=np.zeros((o, 16), np.float32),
            classid=np.full(o, -1, np.int32),
            quality=np.full(o, 0.7, np.float32),
            valid=np.zeros(o, bool),
        )


def detect_planes_online(depth, cam, cap: int, stride: int = 3) -> PlaneDetections:
    """Online plane segmentation from a depth image — the PCL
    OrganizedMultiPlaneSegmentation path of DetectPlane
    (Tracking.cc:2404-2513), via the JAX kernel (kernels/planes.py)."""
    import jax.numpy as jnp

    from ..kernels.planes import segment_planes

    coef, centroid, counts, valid = segment_planes(
        jnp.asarray(depth, jnp.float32),
        float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
        stride=stride, max_planes=cap,
    )
    return PlaneDetections(coef=coef, centroid=centroid, valid=valid)


def read_offline_planes(path: str, cap: int) -> PlaneDetections:
    """Read a ``*_offline_plane_multiplane.txt`` file: rows
    ``[id nx ny nz d cx cy cz num]`` (Tracking.cc:2354-2377)."""
    if not os.path.exists(path):
        return PlaneDetections.empty(cap)
    rows = np.loadtxt(path, ndmin=2, dtype=np.float64)
    if rows.size == 0:
        return PlaneDetections.empty(cap)
    coef = np.zeros((cap, 4), np.float32)
    cent = np.zeros((cap, 3), np.float32)
    valid = np.zeros(cap, bool)
    n = min(len(rows), cap)
    for i in range(n):
        c = rows[i, 1:5].astype(np.float32)
        if c[3] < 0:
            c = -c
        coef[i] = c
        cent[i] = rows[i, 5:8]
        valid[i] = True
    # host numpy throughout (see CuboidDetections.empty) — consumers convert
    return PlaneDetections(coef=coef, centroid=cent, valid=valid)


_CLASSNAME_IDS: dict = {}


def classname_to_id(name: str) -> int:
    """Stable integer ids for detection class names (association by
    classname, Tracking.cc:2168-2217, compares the strings directly)."""
    if name not in _CLASSNAME_IDS:
        _CLASSNAME_IDS[name] = len(_CLASSNAME_IDS)
    return _CLASSNAME_IDS[name]


def read_obj_detection_txt(path: str):
    """``classname v1 v2 ...`` rows (matrix_utils read_obj_detection_txt)."""
    names, vals = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            names.append(parts[0])
            vals.append([float(x) for x in parts[1:]])
    return names, np.asarray(vals, np.float64)


def _np_euler_zyx_to_R(roll, pitch, yaw):
    """Numpy twin of geo.euler_zyx_to_R (Rz(yaw) Ry(pitch) Rx(roll))."""
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    return np.array(
        [
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ],
        np.float32,
    )


def _np_project_corners(pose_g, scale_g, Tcw, K):
    """(8, 2) pixel corners of a cuboid (geo.cuboid_project_corners twin)."""
    sx, sy, sz = scale_g
    # corner order matches geo._CORNER_SIGNS (g2o_cuboid.h:200-204)
    signs = np.array(
        [[1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
         [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1]], np.float32)
    corners_o = signs * np.array([sx, sy, sz], np.float32)
    cw = corners_o @ pose_g[:3, :3].T + pose_g[:3, 3]
    cc = cw @ Tcw[:3, :3].T + Tcw[:3, 3]
    z = np.maximum(cc[:, 2], 1e-6)
    return np.stack(
        [K[0, 0] * cc[:, 0] / z + K[0, 2], K[1, 1] * cc[:, 1] / z + K[1, 2]],
        axis=-1,
    ).astype(np.float32)


def read_offline_cuboids(path: str, truth_Twc: np.ndarray, K: np.ndarray, cap: int) -> CuboidDetections:
    """Read per-frame global cuboids and convert to camera-frame measurements
    with the GT camera pose (Tracking.cc:2004-2060).

    ``truth_Twc``: (4, 4) camera-to-world GT pose of this frame.

    All math is host-side numpy on purpose: this is per-frame detector I/O
    (a handful of 4x4 products), and dispatching it op-by-op to the device
    costs hundreds of ms/frame in transport latency alone.
    """
    if not os.path.exists(path):
        return CuboidDetections.empty(cap)
    names, rows = read_obj_detection_txt(path)
    det = CuboidDetections.empty(cap)
    if rows.size == 0:
        return det
    n = min(len(rows), cap)
    Twc = np.asarray(truth_Twc, np.float32)
    Tcw = np.eye(4, dtype=np.float32)
    Tcw[:3, :3] = Twc[:3, :3].T
    Tcw[:3, 3] = -Twc[:3, :3].T @ Twc[:3, 3]
    Kn = np.asarray(K, np.float32)
    lp, ls, gp, gs, bb, cc, ci, vv = (
        det.local_pose, det.local_scale, det.global_pose, det.global_scale,
        det.bbox, det.corners, det.classid, det.valid,
    )
    for i in range(n):
        v9 = rows[i, -9:].astype(np.float32)
        pose_g = np.eye(4, dtype=np.float32)
        pose_g[:3, :3] = _np_euler_zyx_to_R(v9[3], v9[4], v9[5])
        pose_g[:3, 3] = v9[:3]
        scale_g = v9[6:9]
        pose_l = Tcw @ pose_g  # transform_to(Twc) (g2o_cuboid.h:134-140)
        corners = _np_project_corners(pose_g, scale_g, Tcw, Kn)
        lo, hi = corners.min(axis=0), corners.max(axis=0)
        bbox = np.array(
            [(lo[0] + hi[0]) / 2, (lo[1] + hi[1]) / 2, hi[0] - lo[0], hi[1] - lo[1]],
            np.float32,
        )
        lp[i], ls[i] = pose_l, scale_g
        gp[i], gs[i] = pose_g, scale_g
        bb[i], cc[i] = bbox, corners.reshape(16)
        ci[i] = classname_to_id(names[i])
        vv[i] = True
    return CuboidDetections(
        local_pose=lp, local_scale=ls, global_pose=gp, global_scale=gs,
        bbox=bb, corners=cc, classid=ci, quality=det.quality, valid=vv,
    )
