"""Distributed bundle adjustment over a device mesh.

The reference is a single-process pthread system with zero distribution
(SURVEY.md §2.3); this module is the TPU-native scaling story: factors are
sharded across devices along the factor axis, every device assembles partial
normal equations from its shard, and the blocks are combined with ``psum``
over ICI.  The reduced (Schur) solve is replicated — it is tiny (D x D for
D = 6K + 9C + 3Q) — and the landmark back-substitution is elementwise, so
the only collective traffic per LM iteration is one all-reduce of the
normal-equation blocks.

Sharding layout:
  state (poses/points/planes/cuboids): replicated
  factor bundles:                      sharded along F (axis name "dp")
  H_cc, b_c, S, delta:                 psum -> replicated
  H_ll / H_cl / b_l:                   psum (landmark blocks gather
                                       contributions from all shards)

Keyframe-cluster sharding (covisibility-partitioned, SURVEY.md §5
"long-context" analogue) builds on the same primitive: each cluster is a
factor shard.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..graph import lm
from ..graph.schur import schur_solve
from ..backend.posegraph import Sim3Edges, assemble_sim3_system, solve_sim3_step


def _shard_factors_spec():
    """PartitionSpec for BAData: factor arrays split on their leading axis,
    everything else replicated."""
    factor_spec = {
        "mono": lm.MonoFactors(*([P("dp")] * 5)),
        "stereo": lm.StereoFactors(*([P("dp")] * 5)),
        "plane_obs": lm.PlaneFactors(*([P("dp")] * 5)),
        "cub_bbox": lm.CuboidBBoxFactors(*([P("dp")] * 5)),
        "cub_corner": lm.CuboidCornerFactors(*([P("dp")] * 5)),
        "cub_se3": lm.CuboidSE3Factors(*([P("dp")] * 6)),
        "pt_cub": lm.PointCuboidFactors(*([P("dp")] * 5)),
        "cub_plane": lm.CuboidPlaneFactors(*([P("dp")] * 4)),
    }
    return lm.BAData(
        pose_fixed=P(),
        point_active=P(),
        plane_active=P(),
        cuboid_active=P(),
        fx=P(),
        fy=P(),
        cx=P(),
        cy=P(),
        bf=P(),
        cuboid_fix_scale=P(),
        **factor_spec,
    )


def pad_factors_for_mesh(data: lm.BAData, n_devices: int) -> lm.BAData:
    """Pad every factor bundle's leading axis to a multiple of n_devices."""

    def pad_bundle(b):
        n = b[0].shape[0]
        target = -(-n // n_devices) * n_devices
        if target == n:
            return b
        pad = target - n

        def pad_arr(a):
            widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, widths)

        return type(b)(*[pad_arr(a) for a in b])

    return data._replace(
        mono=pad_bundle(data.mono),
        stereo=pad_bundle(data.stereo),
        plane_obs=pad_bundle(data.plane_obs),
        cub_bbox=pad_bundle(data.cub_bbox),
        cub_corner=pad_bundle(data.cub_corner),
        cub_se3=pad_bundle(data.cub_se3),
        pt_cub=pad_bundle(data.pt_cub),
        cub_plane=pad_bundle(data.cub_plane),
    )


@functools.lru_cache(maxsize=32)
def _make_dist_lm(mesh: Mesh, w: lm.BAWeights, n_iters: int, lam0: float):
    """Build (and cache) the jitted factor-sharded LM program for a mesh.

    The cache keys on (mesh, weights, iters): production callers hit the
    same compiled executable every keyframe instead of re-tracing."""
    data_spec = _shard_factors_spec()

    def run(state, data_shard):
        free_c = lm._free_mask(state, data_shard)
        point_active = data_shard.point_active.astype(jnp.float32)

        def body(carry, _):
            st, lam = carry
            H_cc, H_cl, H_ll, b_c, b_l, chi2_part = lm.build_system(st, data_shard, w)
            # ONE collective round per iteration: all-reduce the blocks
            H_cc = jax.lax.psum(H_cc, "dp")
            H_cl = jax.lax.psum(H_cl, "dp")
            H_ll = jax.lax.psum(H_ll, "dp")
            b_c = jax.lax.psum(b_c, "dp")
            b_l = jax.lax.psum(b_l, "dp")
            chi2_cur = jax.lax.psum(chi2_part, "dp")
            delta_c, delta_l = schur_solve(
                H_cc, H_cl, H_ll, b_c, b_l, lam, free_c, point_active
            )
            trial = lm.retract_state(st, data_shard, delta_c, delta_l)
            chi2_new = jax.lax.psum(lm.total_chi2(trial, data_shard, w), "dp")
            ok = (chi2_new < chi2_cur) & jnp.isfinite(chi2_new)
            st = jax.tree.map(lambda a, b_: jnp.where(ok, b_, a), st, trial)
            lam = jnp.where(ok, jnp.maximum(lam * 0.3, 1e-7), jnp.minimum(lam * 8.0, 1e4))
            return (st, lam), chi2_new

        (state, _), chi2s = jax.lax.scan(body, (state, jnp.float32(lam0)), None, length=n_iters)
        return state, chi2s

    sharded = shard_map(
        run,
        mesh=mesh,
        in_specs=(lm.BAState(*([P()] * 5)), data_spec),
        out_specs=(lm.BAState(*([P()] * 5)), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def distributed_lm_iterations(mesh: Mesh, state: lm.BAState, data: lm.BAData, w: lm.BAWeights, n_iters: int = 5, lam0: float = 1e-4):
    """LM iterations with factor-sharded assembly and psum'd normal equations.

    ``data`` factor bundles must have leading dims divisible by the mesh size
    (use :func:`pad_factors_for_mesh`).  Returns (state, chi2_history).
    """
    return _make_dist_lm(mesh, w, n_iters, float(lam0))(state, data)


_jitted_gate = jax.jit(lm.gate_observations)


def _to_global(x, mesh: Mesh, spec):
    """Lift a (replicated) process-local array onto the multi-process mesh.

    For sharded specs every process contributes its slice of the identical
    replicated host array; for P() the local copy becomes the replica."""
    from jax.experimental import multihost_utils

    arr = np.asarray(x)
    if spec != P():
        n = arr.shape[0]
        k = jax.process_count()
        pid = jax.process_index()
        arr = arr[pid * n // k : (pid + 1) * n // k]
    return multihost_utils.host_local_array_to_global_array(arr, mesh, spec)


def multihost_lm_iterations(mesh: Mesh, state: lm.BAState, data: lm.BAData,
                            w: lm.BAWeights, n_iters: int):
    """Factor-sharded LM where the mesh SPANS PROCESSES (multi-host): the
    replicated process-local pack is lifted into global arrays (each process
    contributes its factor slice), the psum rides the cross-process mesh,
    and the replicated result is pulled back host-local.  Every process must
    call this collectively with identical data (the pipeline replicates
    deterministically).  Returns (state, chi2s) as host-local arrays."""
    data_p = pad_factors_for_mesh(data, jax.device_count())
    spec = _shard_factors_spec()
    # align spec leaves with data leaves by structure (PartitionSpec is itself
    # a tuple, so a naive two-tree map would flatten INTO the specs)
    leaves, treedef = jax.tree.flatten(data_p)
    spec_leaves = treedef.flatten_up_to(spec)
    data_g = jax.tree.unflatten(
        treedef, [_to_global(x, mesh, s) for x, s in zip(leaves, spec_leaves)]
    )
    state_g = jax.tree.map(lambda x: _to_global(x, mesh, P()), state)
    state_out, chi2s = distributed_lm_iterations(mesh, state_g, data_g, w, n_iters)
    host = lambda t: jax.tree.map(lambda x: np.asarray(jax.device_get(x)), t)
    return host(state_out), host(chi2s)


def multihost_local_ba(mesh: Mesh, state: lm.BAState, data: lm.BAData, w: lm.BAWeights,
                       phase1_iters: int = 5, phase2_iters: int = 10):
    """Two-phase local BA across processes: distributed solves on the global
    mesh, outlier gating evaluated process-locally on the replicated pack
    (gate_observations is a masked residual pass, tiny next to assembly)."""
    state, _ = multihost_lm_iterations(mesh, state, data, w, phase1_iters)
    data = _jitted_gate(lm.BAState(*[jnp.asarray(x) for x in state]), data, w)
    state, chi2s = multihost_lm_iterations(mesh, state, data, w, phase2_iters)
    data = _jitted_gate(lm.BAState(*[jnp.asarray(x) for x in state]), data, w)
    return lm.BAState(*[jnp.asarray(x) for x in state]), data, chi2s


def distributed_local_ba(mesh: Mesh, state: lm.BAState, data: lm.BAData, w: lm.BAWeights, phase1_iters: int = 5, phase2_iters: int = 10):
    """Two-phase local BA on the mesh — the distributed twin of
    ``lm.local_ba`` (optimize, per-type chi2 outlier cut, optimize, final
    cut).  The gating pass is replicated (it is a masked residual
    evaluation, tiny next to assembly).  Returns (state, data, chi2s)."""
    state, _ = distributed_lm_iterations(mesh, state, data, w, phase1_iters)
    data = _jitted_gate(state, data, w)
    state, chi2s = distributed_lm_iterations(mesh, state, data, w, phase2_iters)
    data = _jitted_gate(state, data, w)
    return state, data, chi2s


_DEFAULT_MESH = None


def default_mesh() -> Mesh:
    """Process-wide 1-D mesh over all local devices (axis "dp")."""
    global _DEFAULT_MESH
    if _DEFAULT_MESH is None or len(_DEFAULT_MESH.devices.ravel()) != len(jax.devices()):
        _DEFAULT_MESH = Mesh(np.asarray(jax.devices()), axis_names=("dp",))
    return _DEFAULT_MESH


def unpad_factors(data_padded: lm.BAData, data_orig: lm.BAData) -> lm.BAData:
    """Slice every factor bundle back to ``data_orig``'s leading dims (the
    inverse of :func:`pad_factors_for_mesh`, for unpack paths that index by
    the original factor layout)."""

    def cut(b_pad, b_orig):
        n = b_orig[0].shape[0]
        return type(b_pad)(*[a[:n] for a in b_pad])

    return data_padded._replace(
        mono=cut(data_padded.mono, data_orig.mono),
        stereo=cut(data_padded.stereo, data_orig.stereo),
        plane_obs=cut(data_padded.plane_obs, data_orig.plane_obs),
        cub_bbox=cut(data_padded.cub_bbox, data_orig.cub_bbox),
        cub_corner=cut(data_padded.cub_corner, data_orig.cub_corner),
        cub_se3=cut(data_padded.cub_se3, data_orig.cub_se3),
        pt_cub=cut(data_padded.pt_cub, data_orig.pt_cub),
        cub_plane=cut(data_padded.cub_plane, data_orig.cub_plane),
    )


def pad_edges_for_mesh(edges: Sim3Edges, n_devices: int) -> Sim3Edges:
    """Pad the edge bundle's leading axis to a multiple of n_devices."""
    n = edges.i.shape[0]
    target = -(-n // n_devices) * n_devices
    if target == n:
        return edges
    pad = target - n

    def pad_arr(a):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths)

    return Sim3Edges(*[pad_arr(a) for a in edges])


def distributed_essential_graph(mesh: Mesh, S, fixed, edges: Sim3Edges, n_iters: int = 20, lam: float = 1e-6):
    """Edge-sharded Sim3 pose-graph optimization — the multi-chip analogue of
    Optimizer::OptimizeEssentialGraph (Optimizer.cc:789-1052).

    Each device linearizes its edge shard and scatter-adds partial (7K x 7K)
    normal equations; one ``psum`` per GN iteration combines them, and the
    small dense solve is replicated.  Pad ``edges`` with
    :func:`pad_edges_for_mesh` first.  Returns (S_opt, cost history).
    """
    K = S.shape[0]
    D = 7 * K
    free = jnp.repeat((~fixed).astype(jnp.float32), 7, total_repeat_length=D)

    edges_spec = Sim3Edges(*([P("dp")] * 5))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), edges_spec),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(S, e):
        def body(S, _):
            # shared assembly (backend/posegraph.py) on this device's shard,
            # then ONE collective round per GN iteration
            H, b, cost_part = assemble_sim3_system(S, e, D)
            H = jax.lax.psum(H, "dp")
            b = jax.lax.psum(b, "dp")
            cost = jax.lax.psum(cost_part, "dp")
            return solve_sim3_step(S, H, b, free, lam), cost

        S, costs = jax.lax.scan(body, S, None, length=n_iters)
        return S, costs

    return jax.jit(run)(S, edges)
