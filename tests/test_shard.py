"""Covisibility-clustered keyframe partitioning (dist/shard.py): clustering
quality, factor-reorder equivalence, and clustered distributed BA."""

import sys

import numpy as np
import jax
from jax.sharding import Mesh

sys.path.insert(0, ".")

from tpuslam.dist.shard import cluster_keyframes, partition_data
from tpuslam.dist.mesh import make_mesh
from tpuslam.graph import lm


def test_cluster_keyframes_balanced_and_affine():
    # two covisibility blobs of 6 KFs each, weak cross edges
    K = 12
    cov = np.zeros((K, K))
    for blob in (range(0, 6), range(6, 12)):
        for i in blob:
            for j in blob:
                if i != j:
                    cov[i, j] = 50
    cov[5, 6] = cov[6, 5] = 2  # weak bridge
    valid = np.ones(K, bool)
    cl = cluster_keyframes(cov, valid, 2)
    assert set(cl.tolist()) == {0, 1}
    # each blob should land (almost) entirely in one cluster
    a = cl[:6]
    b = cl[6:]
    assert (a == a[0]).sum() >= 5 and (b == b[0]).sum() >= 5
    assert a[0] != b[0]
    # balance
    assert abs((cl == 0).sum() - (cl == 1).sum()) <= 2


def test_cluster_invalid_kfs_excluded():
    cov = np.ones((6, 6))
    valid = np.array([True, True, True, False, False, False])
    cl = cluster_keyframes(cov, valid, 2)
    assert (cl[3:] == -1).all()
    assert (cl[:3] >= 0).all()


def test_clustered_distributed_ba_matches_single_device():
    from __graft_entry__ import _small_problem
    from tpuslam.dist.ba import distributed_lm_iterations

    state, data, w = _small_problem(n_kf=8, n_pts=256, n_factors=1024)
    state_1, chi2_1 = lm.lm_iterations(state, data, w, n_iters=3)

    # covisibility from shared factor points
    kf = np.asarray(data.mono.kf)
    pt = np.asarray(data.mono.pt)
    val = np.asarray(data.mono.valid)
    K = state.poses.shape[0]
    P = state.points.shape[0]
    inc = np.zeros((K, P))
    inc[kf[val], pt[val]] = 1
    cov = inc @ inc.T
    cl = cluster_keyframes(cov, np.ones(K, bool), 8)

    data_p = partition_data(data, cl, 8)
    # factor multiset must be preserved (valid factors only)
    assert int(np.asarray(data_p.mono.valid).sum()) == int(val.sum())

    mesh = make_mesh(8)
    state_8, chi2_8 = distributed_lm_iterations(mesh, state, data_p, w, n_iters=3)
    np.testing.assert_allclose(np.asarray(chi2_1), np.asarray(chi2_8), rtol=2e-3)
    np.testing.assert_allclose(np.asarray(state_1.poses), np.asarray(state_8.poses), atol=1e-3)
