"""Synthetic ICL-style golden sequence generator.

The reference's whole validation method is golden-trajectory replay on
ICL-NUIM (README.md:33-41, Examples/Monocular/mono_icl_test.cc:139-151):
run the system over a dataset folder, dump KeyFrameTrajectory.txt, compare
against GT odom.txt.  No dataset ships in this environment, so this module
renders one: a textured box room with yaw-rotated cuboid objects on the
floor, viewed from a looping camera trajectory, written to disk in the exact
on-disk layout the reference consumes --

  rgb.txt, rgb/*.png                       (mono_icl_test.cc:155-182)
  depth.txt, depth/*.png  (uint16 / 5000)  (rgbd_icl_test.cc)
  odom.txt  [t x y z qx qy qz qw], Twc     (Tracking.cc:191-229)
  ICL.yaml                                 (mono_icl_test.cc:184-234)
  plane_seg/{fid}_offline_plane_multiplane.txt
      rows [id nx ny nz d cx cy cz num] in the CAMERA frame
      (Tracking.cc:2354-2377)
  pred_3d_obj_matched_txt/{fid:04d}_3d_cuboids.txt
      rows [classname x y z roll pitch yaw sx sy sz] in the GLOBAL frame
      (Tracking.cc:1990-1997, matrix_utils read_obj_detection_txt)

Everything is analytic ray casting in vectorized numpy: GT depth, GT plane
coefficients + centroids (from the per-pixel hit masks, i.e. exactly what a
PCL organized segmentation would see), and GT cuboids restricted to the
frames where they are actually visible.  The texture is a view-invariant
function of the world hit point (two-scale random cell grid), so ORB
re-detects and re-matches the same corners across frames -- no synthetic
descriptor shortcut.

World convention: z up, floor at z=0 (cuboid yaw is about world z, matching
the fix-roll-pitch cuboid vertex, g2o_cuboid.h:259-288).  The camera circles
the room interior looking along the tangent, pitched slightly down, and
keeps going past 360 degrees so the sequence closes a loop.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np

# (classname, cx, cy, yaw, sx, sy, sz) -- half-extents; cz = sz (on floor)
_DEFAULT_CUBOIDS: List[Tuple[str, float, float, float, float, float, float]] = [
    ("chair", 2.2, 0.4, 0.5, 0.25, 0.25, 0.45),
    ("table", 0.5, 2.3, -0.3, 0.45, 0.30, 0.35),
    ("sofa", -2.2, 1.2, 1.1, 0.40, 0.28, 0.30),
    ("shelf", -1.8, -1.9, 0.2, 0.30, 0.22, 0.60),
    ("monitor", 0.8, -2.3, -0.8, 0.22, 0.18, 0.28),
    ("bed", 2.1, -1.5, 0.9, 0.35, 0.45, 0.25),
]


@dataclass
class SceneSpec:
    room_half_x: float = 3.0
    room_half_y: float = 3.0
    room_height: float = 3.0
    cuboids: List[Tuple[str, float, float, float, float, float, float]] = field(
        default_factory=lambda: list(_DEFAULT_CUBOIDS)
    )
    cell: float = 0.22  # coarse texture cell (m)
    cell_fine: float = 0.055  # fine texture cell (m)
    seed: int = 7


@dataclass
class CameraSpec:
    width: int = 640
    height: int = 480
    fx: float = 520.0
    fy: float = 520.0
    cx: float = 319.5
    cy: float = 239.5
    baseline: float = 0.075  # for Camera.bf in the YAML (RGB-D virtual right)


def _hash_cells(ix, iy, iz, salt):
    """Integer-hash 3D grid cells to [0, 1) (value-noise texture)."""
    h = (
        ix.astype(np.int64) * 374761393
        + iy.astype(np.int64) * 668265263
        + iz.astype(np.int64) * 1274126177
        + np.asarray(salt, np.int64) * 97531
    ) & 0x7FFFFFFF
    h = ((h ^ (h >> 13)) * 1103515245) & 0x7FFFFFFF
    h = h ^ (h >> 16)
    return (h & 0xFFFF).astype(np.float32) / 65535.0


# lattice offset keeping scene surfaces (floor z=0, walls at +-half) off
# exact cell boundaries, where f32 noise would flip the hash cell per pixel
_LATTICE_OFF = 0.1234


def _texture(p, prim_id, spec: SceneSpec):
    """View-invariant intensity at world points ``p`` (N, 3)."""
    c1 = np.floor((p + _LATTICE_OFF) / spec.cell).astype(np.int64)
    c2 = np.floor((p + _LATTICE_OFF) / spec.cell_fine).astype(np.int64)
    salt = prim_id.astype(np.int64)
    v = 0.62 * _hash_cells(c1[:, 0], c1[:, 1], c1[:, 2], spec.seed + salt)
    v += 0.38 * _hash_cells(c2[:, 0], c2[:, 1], c2[:, 2], spec.seed + 101 + salt)
    return v


def room_planes(spec: SceneSpec):
    """(6, 4) world plane coefficients [n, d] with n.X + d = 0, inward n."""
    hx, hy, hz = spec.room_half_x, spec.room_half_y, spec.room_height
    return np.array(
        [
            [0.0, 0.0, 1.0, 0.0],  # floor z=0
            [0.0, 0.0, -1.0, hz],  # ceiling z=hz
            [-1.0, 0.0, 0.0, hx],  # wall x=+hx
            [1.0, 0.0, 0.0, hx],  # wall x=-hx
            [0.0, -1.0, 0.0, hy],  # wall y=+hy
            [0.0, 1.0, 0.0, hy],  # wall y=-hy
        ],
        np.float32,
    )


def trajectory(n_frames: int, spec: SceneSpec, radius: float = 1.6,
               total_angle_deg: float = 400.0, height: float = 1.5,
               pitch_down_deg: float = 14.0, bob: float = 0.05):
    """(F, 4, 4) camera-to-world poses: a loop around the room center,
    looking along the tangent, pitched down so floor + cuboids stay in view.
    ``total_angle_deg`` > 360 revisits the start -> loop closure material."""
    th = np.linspace(0.0, np.deg2rad(total_angle_deg), n_frames)
    pos = np.stack(
        [radius * np.cos(th), radius * np.sin(th),
         height + bob * np.sin(3.0 * th)], axis=-1)
    fwd = np.stack([-np.sin(th), np.cos(th), np.zeros_like(th)], axis=-1)
    down = np.array([0.0, 0.0, -1.0], np.float32)
    a = np.deg2rad(pitch_down_deg)
    out = []
    for i in range(n_frames):
        z = np.cos(a) * fwd[i] + np.sin(a) * down
        z /= np.linalg.norm(z)
        x = np.cross(down, fwd[i])
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        T = np.eye(4, dtype=np.float32)
        T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = x, y, z, pos[i]
        out.append(T)
    return np.stack(out)


def _box_frames(spec: SceneSpec):
    centers, halfs, yaws = [], [], []
    for (_, cx, cy, yaw, sx, sy, sz) in spec.cuboids:
        centers.append([cx, cy, sz])
        halfs.append([sx, sy, sz])
        yaws.append(yaw)
    return (np.array(centers, np.float32), np.array(halfs, np.float32),
            np.array(yaws, np.float32))


def render_frame(T_wc: np.ndarray, cam: CameraSpec, spec: SceneSpec):
    """Ray-cast one frame.

    Returns (gray (H,W) float32 [0,255], depth (H,W) float32 metres,
    prim_id (H,W) int32: 0-5 room planes, 6+i cuboid i, p_cam (H,W,3))."""
    H, W = cam.height, cam.width
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    d_cam = np.stack(
        [(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy, np.ones_like(u)], axis=-1
    ).reshape(-1, 3)
    R, t = T_wc[:3, :3], T_wc[:3, 3]
    d_w = d_cam @ R.T  # (N, 3)
    N = d_w.shape[0]

    best_t = np.full(N, np.inf, np.float32)
    best_id = np.full(N, -1, np.int32)

    planes = room_planes(spec)
    hx, hy, hz = spec.room_half_x, spec.room_half_y, spec.room_height
    for i, pl in enumerate(planes):
        n, d = pl[:3], pl[3]
        denom = d_w @ n
        with np.errstate(divide="ignore", invalid="ignore"):
            ti = -(d + t @ n) / denom
        hit = (denom < -1e-9) & (ti > 1e-3)
        p = t[None] + ti[:, None] * d_w
        hit &= (np.abs(p[:, 0]) <= hx + 1e-3) & (np.abs(p[:, 1]) <= hy + 1e-3)
        hit &= (p[:, 2] >= -1e-3) & (p[:, 2] <= hz + 1e-3)
        closer = hit & (ti < best_t)
        best_t = np.where(closer, ti, best_t)
        best_id = np.where(closer, i, best_id)

    centers, halfs, yaws = _box_frames(spec)
    for i in range(len(yaws)):
        c, s, yw = centers[i], halfs[i], yaws[i]
        cy_, sy_ = np.cos(yw), np.sin(yw)
        Rz = np.array([[cy_, -sy_, 0], [sy_, cy_, 0], [0, 0, 1]], np.float32)
        o_b = (t - c) @ Rz  # rotate by Rz^T
        d_b = d_w @ Rz
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / d_b
            t1 = (-s[None] - o_b[None]) * inv
            t2 = (s[None] - o_b[None]) * inv
        tmin = np.nanmax(np.minimum(t1, t2), axis=-1)
        tmax = np.nanmin(np.maximum(t1, t2), axis=-1)
        hit = (tmax > tmin) & (tmin > 1e-3)
        closer = hit & (tmin < best_t)
        best_t = np.where(closer, tmin, best_t)
        best_id = np.where(closer, 6 + i, best_id)

    # sky should never happen inside a closed room, but guard anyway
    best_t = np.where(best_id < 0, 10.0, best_t)
    p_w = t[None] + best_t[:, None] * d_w
    gray = _texture(p_w, best_id, spec)
    # mild per-primitive albedo separation so surfaces read differently
    albedo = 0.75 + 0.25 * _hash_cells(
        best_id.astype(np.int64), np.zeros_like(best_id, np.int64),
        np.zeros_like(best_id, np.int64), spec.seed + 999)
    gray = 20.0 + 215.0 * np.clip(gray * albedo, 0.0, 1.0)
    p_cam = best_t[:, None] * d_cam
    return (
        gray.reshape(H, W).astype(np.float32),
        best_t.reshape(H, W).astype(np.float32),
        best_id.reshape(H, W),
        p_cam.reshape(H, W, 3).astype(np.float32),
    )


def make_batch_renderer(cam: CameraSpec, spec: SceneSpec):
    """Jitted XLA renderer over a BATCH of poses: (B,4,4) ->
    (gray (B,H,W), depth (B,H,W), prim_id (B,H,W) int32).

    Same math as :func:`render_frame` (the numpy oracle — a parity test pins
    the two together); XLA fuses the whole ray-cast + texture pipeline, which
    is what makes 500-frame golden-sequence generation cheap on device."""
    import jax
    import jax.numpy as jnp

    H, W = cam.height, cam.width
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    d_cam = jnp.asarray(
        np.stack([(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy,
                  np.ones_like(u)], axis=-1).reshape(-1, 3))
    planes = jnp.asarray(room_planes(spec))
    centers_np, halfs_np, yaws_np = _box_frames(spec)
    M = len(yaws_np)
    Rzs = np.zeros((M, 3, 3), np.float32)
    for i, yw in enumerate(yaws_np):
        c, s = np.cos(yw), np.sin(yw)
        Rzs[i] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    Rzs = jnp.asarray(Rzs)
    centers, halfs = jnp.asarray(centers_np), jnp.asarray(halfs_np)
    hx, hy, hz = spec.room_half_x, spec.room_half_y, spec.room_height

    def _hash(ix, iy, iz, salt):
        h = (ix.astype(jnp.uint32) * np.uint32(374761393)
             + iy.astype(jnp.uint32) * np.uint32(668265263)
             + iz.astype(jnp.uint32) * np.uint32(1274126177)
             + salt.astype(jnp.uint32) * np.uint32(97531)) & np.uint32(0x7FFFFFFF)
        h = ((h ^ (h >> 13)) * np.uint32(1103515245)) & np.uint32(0x7FFFFFFF)
        h = h ^ (h >> 16)
        return (h & np.uint32(0xFFFF)).astype(jnp.float32) / 65535.0

    def one(T_wc):
        R, t = T_wc[:3, :3], T_wc[:3, 3]
        hp = jax.lax.Precision.HIGHEST  # f32-exact: parity with the numpy oracle
        d_w = jnp.einsum("nk,jk->nj", d_cam, R, precision=hp)  # (N,3)
        denom = jnp.einsum("nk,jk->nj", d_w, planes[:, :3], precision=hp)  # (N,6)
        ti = -(planes[:, 3] + jnp.einsum("k,jk->j", t, planes[:, :3], precision=hp))[None] / jnp.where(
            jnp.abs(denom) < 1e-12, -1e-12, denom)
        p = t[None, None] + ti[..., None] * d_w[:, None, :]  # (N,6,3)
        hit = (denom < -1e-9) & (ti > 1e-3)
        hit &= (jnp.abs(p[..., 0]) <= hx + 1e-3) & (jnp.abs(p[..., 1]) <= hy + 1e-3)
        hit &= (p[..., 2] >= -1e-3) & (p[..., 2] <= hz + 1e-3)
        ti = jnp.where(hit, ti, jnp.inf)

        d_b = jnp.einsum("nk,mkj->nmj", d_w, Rzs, precision=hp)  # ray dirs in box frames
        o_b = jnp.einsum("mk,mkj->mj", t[None] - centers, Rzs, precision=hp)
        inv = 1.0 / jnp.where(jnp.abs(d_b) < 1e-12, 1e-12, d_b)
        t1 = (-halfs[None] - o_b[None]) * inv
        t2 = (halfs[None] - o_b[None]) * inv
        tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
        tb = jnp.where((tmax > tmin) & (tmin > 1e-3), tmin, jnp.inf)

        all_t = jnp.concatenate([ti, tb], axis=1)  # (N, 6+M)
        best_id = jnp.argmin(all_t, axis=1).astype(jnp.int32)
        best_t = jnp.min(all_t, axis=1)
        none = ~jnp.isfinite(best_t)
        best_t = jnp.where(none, 10.0, best_t)
        best_id = jnp.where(none, -1, best_id)

        p_w = t[None] + best_t[:, None] * d_w
        c1 = jnp.floor((p_w + _LATTICE_OFF) / spec.cell).astype(jnp.int32)
        c2 = jnp.floor((p_w + _LATTICE_OFF) / spec.cell_fine).astype(jnp.int32)
        salt = best_id
        gray = 0.62 * _hash(c1[:, 0], c1[:, 1], c1[:, 2], spec.seed + salt)
        gray += 0.38 * _hash(c2[:, 0], c2[:, 1], c2[:, 2], spec.seed + 101 + salt)
        zero = jnp.zeros_like(best_id)
        albedo = 0.75 + 0.25 * _hash(best_id, zero, zero, zero + spec.seed + 999)
        gray = 20.0 + 215.0 * jnp.clip(gray * albedo, 0.0, 1.0)
        return (gray.reshape(H, W), best_t.reshape(H, W),
                best_id.reshape(H, W))

    return jax.jit(jax.vmap(one))


def _R_to_quat_np(R: np.ndarray) -> np.ndarray:
    """(x, y, z, w) from a rotation matrix (numpy, Shepperd-style)."""
    tr = np.trace(R)
    qw = 0.5 * np.sqrt(max(1.0 + tr, 1e-12))
    qx = 0.5 * np.sqrt(max(1.0 + R[0, 0] - R[1, 1] - R[2, 2], 1e-12))
    qy = 0.5 * np.sqrt(max(1.0 - R[0, 0] + R[1, 1] - R[2, 2], 1e-12))
    qz = 0.5 * np.sqrt(max(1.0 - R[0, 0] - R[1, 1] + R[2, 2], 1e-12))
    qx *= np.sign(R[2, 1] - R[1, 2]) or 1.0
    qy *= np.sign(R[0, 2] - R[2, 0]) or 1.0
    qz *= np.sign(R[1, 0] - R[0, 1]) or 1.0
    q = np.array([qx, qy, qz, qw])
    return q / np.linalg.norm(q)


def _plane_rows_for_frame(T_wc, prim_id, p_cam, spec: SceneSpec,
                          min_pix: int) -> List[List[float]]:
    """Offline plane rows [id n_cam d_cam centroid_cam num] for the room
    faces visible in this frame (what organized segmentation would emit)."""
    R, t = T_wc[:3, :3], T_wc[:3, 3]
    R_cw = R.T
    t_cw = -R_cw @ t
    rows = []
    flat_id = prim_id.reshape(-1)
    flat_p = p_cam.reshape(-1, 3)
    for i, pl in enumerate(room_planes(spec)):
        mask = flat_id == i
        num = int(mask.sum())
        if num < min_pix:
            continue
        n_c = R_cw @ pl[:3]
        d_c = float(pl[3] - t_cw @ n_c)
        if d_c < 0:
            n_c, d_c = -n_c, -d_c
        cen = flat_p[mask].mean(axis=0)
        rows.append([float(len(rows)), *n_c.tolist(), d_c, *cen.tolist(), float(num)])
    return rows


def _cuboid_lines_for_frame(T_wc, prim_id, spec: SceneSpec,
                            min_pix: int) -> List[str]:
    """Global-frame cuboid rows for objects with enough visible pixels."""
    counts = np.bincount(prim_id.reshape(-1)[prim_id.reshape(-1) >= 6] - 6,
                         minlength=len(spec.cuboids))
    lines = []
    for i, (name, cx, cy, yaw, sx, sy, sz) in enumerate(spec.cuboids):
        # a real detector would not fire on an object the camera is standing
        # on top of; grazing corners (z_cam ~ 0) also make the projected bbox
        # measurement meaningless
        dist = np.linalg.norm(np.array([cx, cy, sz]) - T_wc[:3, 3])
        if counts[i] < min_pix or dist < 1.0:
            continue
        lines.append(
            f"{name} {cx:.6f} {cy:.6f} {sz:.6f} 0 0 {yaw:.6f} "
            f"{sx:.6f} {sy:.6f} {sz:.6f}"
        )
    return lines


def write_sequence(folder: str, n_frames: int = 500,
                   cam: CameraSpec | None = None,
                   spec: SceneSpec | None = None,
                   total_angle_deg: float = 400.0,
                   depth_factor: float = 5000.0,
                   min_plane_pix: int = 1500,
                   min_cuboid_pix: int = 400,
                   fps: float = 30.0) -> str:
    """Render and write a full golden dataset folder.  Returns ``folder``.

    Skips re-rendering when a matching sequence (marker file) already exists,
    so repeated bench/test runs reuse the fixture."""
    import cv2

    cam = cam or CameraSpec()
    spec = spec or SceneSpec()
    marker = os.path.join(
        folder,
        f"SYNTH_{n_frames}_{cam.width}x{cam.height}_{spec.seed}_"
        f"{int(total_angle_deg)}.done",
    )
    if os.path.exists(marker):
        return folder
    os.makedirs(os.path.join(folder, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(folder, "depth"), exist_ok=True)
    os.makedirs(os.path.join(folder, "plane_seg"), exist_ok=True)
    os.makedirs(os.path.join(folder, "pred_3d_obj_matched_txt"), exist_ok=True)

    poses = trajectory(n_frames, spec, total_angle_deg=total_angle_deg)
    render = make_batch_renderer(cam, spec)
    chunk = 8
    H, W = cam.height, cam.width
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    d_cam = np.stack([(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy,
                      np.ones_like(u)], axis=-1)
    rgb_lines, depth_lines, odom_lines = [], [], []
    for f0 in range(0, n_frames, chunk):
        batch = poses[f0 : f0 + chunk]
        g_b, t_b, id_b = (np.asarray(x) for x in render(batch))
        for j in range(len(batch)):
            f = f0 + j
            stamp = f / fps
            gray, depth, prim_id = g_b[j], t_b[j], id_b[j]
            p_cam = depth[..., None] * d_cam
            cv2.imwrite(os.path.join(folder, "rgb", f"{f:04d}.png"),
                        gray.astype(np.uint8))
            d16 = np.clip(depth * depth_factor, 0, 65535).astype(np.uint16)
            cv2.imwrite(os.path.join(folder, "depth", f"{f:04d}.png"), d16)
            rgb_lines.append(f"{stamp:.6f} rgb/{f:04d}.png")
            depth_lines.append(f"{stamp:.6f} depth/{f:04d}.png")
            q = _R_to_quat_np(poses[f][:3, :3])
            tx, ty, tz = poses[f][:3, 3]
            odom_lines.append(
                f"{stamp:.6f} {tx:.9f} {ty:.9f} {tz:.9f} "
                f"{q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f}"
            )
            prows = _plane_rows_for_frame(poses[f], prim_id, p_cam, spec, min_plane_pix)
            with open(os.path.join(
                    folder, "plane_seg", f"{f}_offline_plane_multiplane.txt"), "w") as fh:
                for r in prows:
                    fh.write(" ".join(f"{x:.9f}" for x in r) + "\n")
            clines = _cuboid_lines_for_frame(poses[f], prim_id, spec, min_cuboid_pix)
            with open(os.path.join(
                    folder, "pred_3d_obj_matched_txt", f"{f:04d}_3d_cuboids.txt"), "w") as fh:
                fh.write("\n".join(clines) + ("\n" if clines else ""))

    with open(os.path.join(folder, "rgb.txt"), "w") as fh:
        fh.write("\n".join(rgb_lines) + "\n")
    with open(os.path.join(folder, "depth.txt"), "w") as fh:
        fh.write("\n".join(depth_lines) + "\n")
    with open(os.path.join(folder, "odom.txt"), "w") as fh:
        fh.write("\n".join(odom_lines) + "\n")
    with open(os.path.join(folder, "ICL.yaml"), "w") as fh:
        fh.write(
            "%YAML:1.0\n"
            f"Camera.fx: {cam.fx}\nCamera.fy: {cam.fy}\n"
            f"Camera.cx: {cam.cx}\nCamera.cy: {cam.cy}\n"
            "Camera.k1: 0.0\nCamera.k2: 0.0\nCamera.p1: 0.0\nCamera.p2: 0.0\n"
            f"Camera.width: {cam.width}\nCamera.height: {cam.height}\n"
            f"Camera.bf: {cam.fx * cam.baseline}\nCamera.fps: {fps}\n"
        )
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return folder
