"""Worker for the multi-process PIPELINE test (test_multiprocess.py): each
process runs the REAL Tracker over the same synthetic feature sequence with
``distributed_ba`` active, so every keyframe's local BA executes collectively
on the 2-device cross-process mesh (dist/ba.multihost_local_ba) while the
rest of the pipeline runs process-locally.  The trajectories must agree
across processes (the pipeline is deterministic and the BA is collective),
and must track the synthetic ground truth.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ.pop("TPUSLAM_FORCE_LOCAL_BA", None)  # this test IS the dist path

import numpy as np  # noqa: E402


def main():
    coord, pid_s, nproc_s = sys.argv[1:4]
    pid, nproc = int(pid_s), int(nproc_s)
    import jax

    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.device_count() == nproc and jax.process_count() == nproc

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from jax.experimental import multihost_utils
    import jax.numpy as jnp

    from tpuslam.core.camera import Camera
    from tpuslam.core.config import Capacities, SlamConfig
    from tpuslam.frontend.tracking import Tracker
    from tpuslam.io.synthetic import make_room_scene, render_frame
    from tpuslam.io.trajectory import ate_rmse

    cam = Camera.make(500.0, 500.0, 320.0, 240.0)
    cfg = SlamConfig().replace(
        caps=Capacities(
            max_keypoints=256, max_keyframes=32, max_points=4096,
            max_planes=8, max_cuboids=4,
            local_ba_keyframes=6, local_ba_fixed_keyframes=6,
            local_ba_points=1024, vocab_words=256,
        ),
    )
    import dataclasses

    cfg = cfg.replace(orb=dataclasses.replace(cfg.orb, n_features=256))
    assert cfg.flags.distributed_ba

    n_frames = 25
    scene = make_room_scene(n_points=600, n_frames=n_frames, seed=3)
    tracker = Tracker(cam, cfg)
    for i in range(n_frames):
        frame = render_frame(scene, i, cam, n_features=256, pix_noise=0.3)
        tracker.process_frame(frame, i)

    assert tracker.state == Tracker.OK, f"tracker lost (state={tracker.state})"
    assert len(tracker.trajectory) >= 18, len(tracker.trajectory)
    assert tracker.n_kf >= 3

    est = [p for _, p in tracker.trajectory]
    gt = [scene.poses[fid] for fid, _ in tracker.trajectory]
    rmse, _ = ate_rmse(est, gt, with_scale=True)
    assert rmse < 0.10, f"ATE {rmse}"

    # cross-process agreement: the pipeline is deterministic and the BA is
    # collective, so both processes must produce the SAME trajectory
    traj = np.stack(est).astype(np.float32)
    pad = np.zeros((n_frames, 4, 4), np.float32)
    pad[: traj.shape[0]] = traj
    gathered = np.asarray(multihost_utils.process_allgather(jnp.asarray(pad)))
    for other in range(nproc):
        np.testing.assert_allclose(
            gathered[other], pad, atol=1e-5,
            err_msg=f"trajectory mismatch between process {pid} and {other}",
        )

    print(f"OK pipeline tracked={len(est)} kf={tracker.n_kf} ate={rmse:.4f}")


if __name__ == "__main__":
    main()
