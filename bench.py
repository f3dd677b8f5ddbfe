"""Benchmark: full per-frame tracking pipeline on real TPU hardware.

Measures the SURVEY §3.2 hot path end-to-end per frame — ORB extraction
(pyramid, FAST, cell top-k, IC-angle, BRIEF), projection-gated MXU Hamming
matching against the local map, and motion-only pose optimization (LM) — as
a device-resident ``lax.scan`` over a sequence of real images, i.e. ONE
dispatch for the whole sequence.  This is the same work the reference counts
in its "time single frame" profiler section (mono_icl_test.cc:83,124), minus
host I/O.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is relative to 30 frames/s — the ORB-SLAM2-class real-time
CPU tracking rate the reference inherits (README.md:59 citation; the repo
publishes no numbers of its own, BASELINE.md).

NOTE: each timed rep perturbs the input images on device — the axon tunnel
memoizes executions with identical arguments, which would otherwise inflate
the number ~60x.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpuslam.core import geometry as geo
from tpuslam.graph import lm
from tpuslam.kernels import match as km
from tpuslam.kernels import orb

H, W = 480, 640
N_KPS = 1024  # per-frame features (reference ICL config: 1000)
# 64 frames per dispatch: the device tunnel costs ~26 ms per round trip
# regardless of work, so longer device-resident sequences report throughput
# closer to the chip's actual rate
N_FRAMES = 64
FX = FY = 500.0
CX, CY = 320.0, 240.0
Z_WALL = 5.0
PX_STEP = 3  # lateral image shift per frame


def build_workload(seed=0):
    """A textured wall at Z_WALL viewed by a laterally translating camera:
    frame images are crops of one big texture, so descriptors genuinely
    re-detect across frames (no synthetic-descriptor shortcut)."""
    rng = np.random.RandomState(seed)
    margin = PX_STEP * N_FRAMES + 8
    base = rng.uniform(0, 255, (H, W + margin)).astype(np.float32)
    k = np.ones((3, 3), np.float32) / 9.0
    for _ in range(2):
        p = np.pad(base, 1, mode="edge")
        base = sum(k[i, j] * p[i : i + H, j : j + W + margin] for i in range(3) for j in range(3))
    frames = np.stack([base[:, i * PX_STEP : i * PX_STEP + W] for i in range(N_FRAMES)])

    # map from frame-0 extraction, backprojected at the wall depth
    f0 = orb.extract(jnp.asarray(frames[0]), n_features=N_KPS)
    u, v = f0.uv[:, 0], f0.uv[:, 1]
    pts = jnp.stack(
        [(u - CX) * Z_WALL / FX, (v - CY) * Z_WALL / FY, jnp.full_like(u, Z_WALL)], -1
    )
    T0 = jnp.eye(4)
    return jnp.asarray(frames), pts, f0.desc, f0.valid, T0


@jax.jit
def track_sequence(frames, pts, pt_desc, pt_valid, T0):
    """Device-resident frame loop: extract -> project -> gate -> MXU match
    -> pose opt, one XLA program for the whole sequence."""

    def step(T_prev, image):
        f = orb.extract(image, n_features=N_KPS)
        pc = geo.se3_apply(T_prev, pts)
        uv_pred = jnp.stack(
            [
                FX * pc[:, 0] / jnp.maximum(pc[:, 2], 1e-6) + CX,
                FY * pc[:, 1] / jnp.maximum(pc[:, 2], 1e-6) + CY,
            ],
            axis=-1,
        )
        vis = pt_valid & (pc[:, 2] > 0)
        gate = km.window_gate(uv_pred, f.uv, 25.0)
        idx, dist, ok = km.match_descriptors(
            pt_desc, f.desc, vis, f.valid, gate_mask=gate, max_dist=60.0, ratio=0.9
        )
        T_opt, inl, n_in = lm.optimize_pose(
            T_prev, pts, f.uv[idx], jnp.ones(pts.shape[0]), ok, FX, FY, CX, CY
        )
        return T_opt, (T_opt, n_in)

    T_last, (traj, n_ins) = jax.lax.scan(step, T0, frames)
    return traj, n_ins


def main():
    frames, pts, pt_desc, pt_valid, T0 = build_workload()
    # warm up + compile
    traj, n_ins = track_sequence(frames, pts, pt_desc, pt_valid, T0)
    jax.block_until_ready(traj)
    # timed runs: sequential with a block per rep and the MEDIAN taken —
    # the device tunnel's round-trip latency is noisy, and each rep perturbs
    # the images on device to defeat the tunnel's identical-execution
    # memoization (see module docstring)
    reps = 9
    times = []
    for i in range(reps):
        f2 = frames + jnp.float32(1e-3 * (i + 1))
        _ = float(jnp.sum(f2))  # materialize the input before the clock starts
        t0 = time.perf_counter()
        traj, n_ins = track_sequence(f2, pts, pt_desc, pt_valid, T0)
        # fetch a scalar: forces actual completion even if the transport's
        # block_until_ready resolves before device execution finishes
        _ = float(traj[-1, 2, 3]) + float(n_ins[-1])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    fps = N_FRAMES / dt
    # sanity: tracking must actually work (camera moves PX_STEP*Z/FX per frame)
    med_inliers = float(jnp.median(n_ins))
    assert med_inliers > 150, f"tracking degenerate in bench: {med_inliers}"
    x_last = float(jnp.linalg.inv(traj[-1])[0, 3])
    x_expect = (N_FRAMES - 1) * PX_STEP * Z_WALL / FX
    assert abs(x_last - x_expect) < 0.15 * x_expect + 0.02, (
        f"trajectory wrong: {x_last} vs {x_expect}"
    )
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
