"""tpuslam — TPU-native structure SLAM with points, planes, and objects.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
benchun123/point-plane-object-SLAM (an ORB-SLAM2 fork with plane and cuboid
landmarks; see /root/reference).  Nothing here is a translation: the pointer
graph + mutex architecture of the reference is replaced by structure-of-arrays
map state, batched vmapped factor blocks, a Schur-complement Levenberg-
Marquardt engine, and host-orchestrated jitted device programs.

Sub-packages (mirrors SURVEY.md §7.1):
  core/      geometry pytrees (SE3 / Sim3 / plane / cuboid), camera, config
  kernels/   ORB pyramid+FAST+BRIEF, Hamming matching (Pallas / jnp)
  graph/     factor library + batched LM + Schur elimination
  map/       SoA map state (keyframes, points, planes, cuboids, observations)
  frontend/  tracking state machine, two-view init, PnP, relocalization
  backend/   local / global BA, Sim3 pose graph
  place/     BoW vocabulary tree, inverted index, loop detection
  semantic/  plane & cuboid detection + association
  dist/      device-mesh sharded BA (shard_map + psum over ICI)
  io/        dataset loaders, trajectory writers, checkpoints
  apps/      CLI entry points mirroring the reference examples
"""

__version__ = "0.1.0"
