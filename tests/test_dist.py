"""Distributed BA on the 8-device virtual CPU mesh + graft entry points."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

sys.path.insert(0, ".")


def test_distributed_ba_matches_single_device():
    from __graft_entry__ import _small_problem
    from tpuslam.dist.ba import distributed_lm_iterations, pad_factors_for_mesh
    from tpuslam.graph import lm

    state, data, w = _small_problem(n_kf=4, n_pts=256, n_factors=1024)
    # single device reference
    state_1, chi2_1 = lm.lm_iterations(state, data, w, n_iters=3)
    # 8-device mesh
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("dp",))
    data_p = pad_factors_for_mesh(data, 8)
    state_8, chi2_8 = distributed_lm_iterations(mesh, state, data_p, w, n_iters=3)
    np.testing.assert_allclose(np.asarray(chi2_1), np.asarray(chi2_8), rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(state_1.poses), np.asarray(state_8.poses), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(state_1.points), np.asarray(state_8.points), atol=2e-3
    )


def test_entry_compiles():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert all(bool(jnp.isfinite(o).all()) for o in out)


def test_dryrun_multichip():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_distributed_essential_graph_matches_single_device():
    """Edge-sharded Sim3 pose graph == the single-device optimizer."""
    from tpuslam.backend.posegraph import Sim3Edges, optimize_essential_graph
    from tpuslam.core import geometry as geo
    from tpuslam.dist.ba import distributed_essential_graph, pad_edges_for_mesh

    rng = np.random.RandomState(0)
    K = 12
    # a noisy chain of poses with a loop edge back to the start
    S_gt = [jnp.eye(4)]
    for i in range(1, K):
        d = jnp.asarray(np.r_[rng.randn(3) * 0.05, rng.randn(3) * 0.3, 0.0].astype(np.float32))
        S_gt.append(geo.sim3_exp(d) @ S_gt[-1])
    S_gt = jnp.stack(S_gt)
    noise = [jnp.eye(4)]
    for i in range(1, K):
        d = jnp.asarray(np.r_[rng.randn(3) * 0.01, rng.randn(3) * 0.05, rng.randn(1) * 0.01].astype(np.float32))
        noise.append(geo.sim3_exp(d))
    S0 = jnp.stack([n @ s for n, s in zip(noise, S_gt)])

    ii = list(range(K - 1)) + [0]
    jj = list(range(1, K)) + [K - 1]
    meas = jnp.stack([S_gt[j] @ geo.sim3_inv(S_gt[i]) for i, j in zip(ii, jj)])
    edges = Sim3Edges(
        i=jnp.asarray(ii, jnp.int32), j=jnp.asarray(jj, jnp.int32),
        meas=meas, weight=jnp.ones(len(ii)), valid=jnp.ones(len(ii), bool),
    )
    fixed = jnp.zeros(K, bool).at[0].set(True)

    S1, c1 = optimize_essential_graph(S0, fixed, edges, n_iters=10)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("dp",))
    S8, c8 = distributed_essential_graph(mesh, S0, fixed, pad_edges_for_mesh(edges, 8), n_iters=10)
    np.testing.assert_allclose(np.asarray(S1), np.asarray(S8), atol=1e-4)
    # and it actually solves the graph: final cost tiny
    assert float(c8[-1]) < 1e-6


def test_run_local_ba_takes_distributed_path_and_matches(monkeypatch):
    """PRODUCTION wiring (VERDICT r2 item 5): run_local_ba on a real MapState
    must take the dist/ba.py path when >1 device is visible and produce the
    same solution as the single-device solve."""
    monkeypatch.delenv("TPUSLAM_FORCE_LOCAL_BA", raising=False)
    import dataclasses

    from test_global_ba import build, CAM
    from tpuslam.backend.local_ba import run_local_ba

    assert jax.device_count() >= 8, "conftest should provide the 8-dev CPU mesh"
    cfg, m, gt, noisy = build()
    cfg_single = cfg.replace(flags=dataclasses.replace(cfg.flags, distributed_ba=False))
    m_dist, chi2_d = run_local_ba(m, 100, CAM, cfg)
    m_single, chi2_s = run_local_ba(m, 100, CAM, cfg_single)
    np.testing.assert_allclose(
        np.asarray(m_dist.kf_pose), np.asarray(m_single.kf_pose), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(m_dist.pt_pos), np.asarray(m_single.pt_pos), atol=2e-3
    )
    # and the distributed solve actually reduced the error around the window
    assert float(chi2_d[-1]) <= float(chi2_d[0])


def test_run_global_ba_takes_distributed_path_and_matches():
    import dataclasses

    from test_global_ba import build, CAM, NKF
    from tpuslam.backend.local_ba import run_global_ba

    cfg, m, gt, noisy = build()
    cfg_single = cfg.replace(flags=dataclasses.replace(cfg.flags, distributed_ba=False))
    m_dist, _ = run_global_ba(m, CAM, cfg, n_iters=5, n_kf=NKF)
    m_single, _ = run_global_ba(m, CAM, cfg_single, n_iters=5, n_kf=NKF)
    np.testing.assert_allclose(
        np.asarray(m_dist.kf_pose), np.asarray(m_single.kf_pose), atol=2e-3
    )
