"""Benchmark: per-frame tracking hot path on real TPU hardware.

Measures the SURVEY §3.2 hot path — project local map points, MXU Hamming
matching, motion-only pose optimization (4x10 LM rounds) — as a
device-resident lax.scan over a batch of synthetic frames, i.e. ONE dispatch
for the whole sequence (the design target: the per-frame stack is a single
XLA program).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is relative to 30 frames/s — the ORB-SLAM2-class real-time
CPU tracking rate the reference inherits (README.md:59 citation; the repo
publishes no numbers of its own, BASELINE.md).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpuslam.core import geometry as geo
from tpuslam.graph import lm
from tpuslam.kernels import match as km

N_KPS = 1024  # per-frame features (reference ICL config: 1000)
N_PTS = 4096  # local map points in the tracking window
N_FRAMES = 64
FX = FY = 500.0
CX, CY = 320.0, 240.0


def build_workload(seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform([-4, -2, 3], [4, 2, 12], (N_PTS, 3)).astype(np.float32)
    desc_bits = rng.randint(0, 1 << 32, (N_PTS, 8), dtype=np.uint64).astype(np.uint32)
    poses = []
    for i in range(N_FRAMES):
        T_wc = np.eye(4, dtype=np.float32)
        T_wc[:3, 3] = [0.02 * i, 0.005 * i, 0.01 * i]
        poses.append(np.linalg.inv(T_wc))
    poses = np.stack(poses)

    frames_uv = np.zeros((N_FRAMES, N_KPS, 2), np.float32)
    frames_desc = np.zeros((N_FRAMES, N_KPS, 8), np.uint32)
    frames_pt = np.zeros((N_FRAMES, N_KPS), np.int32)
    for f in range(N_FRAMES):
        T = poses[f]
        pc = (T[:3, :3] @ pts.T).T + T[:3, 3]
        u = FX * pc[:, 0] / pc[:, 2] + CX
        v = FY * pc[:, 1] / pc[:, 2] + CY
        vis = (pc[:, 2] > 0.3) & (u > 0) & (u < 640) & (v > 0) & (v < 480)
        ids = np.where(vis)[0]
        rng.shuffle(ids)
        ids = ids[:N_KPS]
        n = len(ids)
        frames_uv[f, :n, 0] = u[ids] + rng.randn(n) * 0.4
        frames_uv[f, :n, 1] = v[ids] + rng.randn(n) * 0.4
        frames_desc[f, :n] = desc_bits[ids]
        frames_pt[f, :n] = ids
    return (
        jnp.asarray(pts),
        jnp.asarray(desc_bits),
        jnp.asarray(poses[0]),
        jnp.asarray(frames_uv),
        jnp.asarray(frames_desc),
    )


@jax.jit
def track_sequence(pts, pt_desc, T0, frames_uv, frames_desc):
    """Device-resident frame loop: project -> gate -> MXU match -> pose opt."""

    def step(T_prev, frame):
        uv, desc = frame
        pc = geo.se3_apply(T_prev, pts)
        uv_pred = jnp.stack(
            [
                FX * pc[:, 0] / jnp.maximum(pc[:, 2], 1e-6) + CX,
                FY * pc[:, 1] / jnp.maximum(pc[:, 2], 1e-6) + CY,
            ],
            axis=-1,
        )
        vis = pc[:, 2] > 0
        gate = km.window_gate(uv_pred, uv, 15.0)
        kp_valid = jnp.any(desc != 0, axis=-1)
        idx, dist, ok = km.match_descriptors(
            pt_desc, desc, vis, kp_valid, gate_mask=gate, max_dist=60.0, ratio=0.9
        )
        T_opt, inl, n_in = lm.optimize_pose(
            T_prev, pts, uv[idx], jnp.ones(pts.shape[0]), ok, FX, FY, CX, CY
        )
        return T_opt, (T_opt, n_in)

    T_last, (traj, n_ins) = jax.lax.scan(step, T0, (frames_uv, frames_desc))
    return traj, n_ins


def main():
    args = build_workload()
    # warm up + compile
    traj, n_ins = track_sequence(*args)
    jax.block_until_ready(traj)
    # timed runs
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        traj, n_ins = track_sequence(*args)
    jax.block_until_ready(traj)
    dt = (time.perf_counter() - t0) / reps
    fps = N_FRAMES / dt
    # sanity: tracking must actually work
    med_inliers = float(jnp.median(n_ins))
    assert med_inliers > 200, f"tracking degenerate in bench: {med_inliers}"
    print(
        json.dumps(
            {
                "metric": "tracking_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
