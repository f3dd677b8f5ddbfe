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


def distributed_lm_iterations(mesh: Mesh, state: lm.BAState, data: lm.BAData, w: lm.BAWeights, n_iters: int = 5, lam0: float = 1e-4):
    """LM iterations with factor-sharded assembly and psum'd normal equations.

    ``data`` factor bundles must have leading dims divisible by the mesh size
    (use :func:`pad_factors_for_mesh`).  Returns (state, chi2_history).
    """
    free_c = lm._free_mask(state, data)
    point_active = data.point_active.astype(jnp.float32)

    data_spec = _shard_factors_spec()
    state_spec = jax.tree.map(lambda _: P(), state)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(state_spec, data_spec),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    def run(state, data_shard):
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

    return jax.jit(run)(state, data)


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
