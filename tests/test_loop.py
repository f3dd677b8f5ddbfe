"""Loop-closing component tests: vocabulary, Sim3 RANSAC, pose graph."""

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.core import geometry as geo
from tpuslam.backend import posegraph as pg
from tpuslam.backend.sim3solver import solve_sim3
from tpuslam.place import vocab as vb

K = jnp.array([[500.0, 0.0, 320.0], [0.0, 500.0, 240.0], [0.0, 0.0, 1.0]])


def test_vocab_words_deterministic_and_discriminative():
    rng = np.random.RandomState(0)
    voc = vb.random_vocabulary(256)
    desc = jnp.asarray(rng.randint(0, 1 << 32, (100, 8), dtype=np.uint64).astype(np.uint32))
    valid = jnp.ones(100, bool)
    w1 = vb.assign_words(voc, desc, valid)
    w2 = vb.assign_words(voc, desc, valid)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    bow_a = vb.bow_vector(voc, desc, valid)
    desc_b = jnp.asarray(rng.randint(0, 1 << 32, (100, 8), dtype=np.uint64).astype(np.uint32))
    bow_b = vb.bow_vector(voc, desc_b, valid)
    s_aa = float(jnp.dot(bow_a, bow_a))
    s_ab = float(jnp.dot(bow_a, bow_b))
    assert s_aa > 2.0 * s_ab, (s_aa, s_ab)


def test_sim3_solver_recovers_similarity():
    rng = np.random.RandomState(1)
    N = 100
    P2 = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32) + np.array([0, 0, 6]))
    s_true = 1.3
    R_true = geo.so3_exp(jnp.array([0.1, -0.2, 0.3]))
    t_true = jnp.array([0.5, -0.3, 0.8])
    P1 = s_true * (P2 @ R_true.T) + t_true
    # corrupt 20%
    P1 = P1.at[:20].add(jnp.asarray(rng.randn(20, 3) * 2.0))
    uv1 = jnp.stack([500 * P1[:, 0] / P1[:, 2] + 320, 500 * P1[:, 1] / P1[:, 2] + 240], -1)
    uv2 = jnp.stack([500 * P2[:, 0] / P2[:, 2] + 320, 500 * P2[:, 1] / P2[:, 2] + 240], -1)
    res = solve_sim3(P1, P2, jnp.ones(N, bool), uv1, uv2, K, jax.random.PRNGKey(0))
    assert bool(res.ok)
    assert abs(float(res.s) - s_true) < 0.02
    ang = np.degrees(
        np.arccos(np.clip((np.trace(np.asarray(res.R).T @ np.asarray(R_true)) - 1) / 2, -1, 1))
    )
    assert ang < 1.0
    assert int(res.n_inliers) >= 75


def test_pose_graph_closes_a_drifted_loop():
    """Chain of 20 poses with accumulated drift + a loop edge back to the
    start: after optimization the loop constraint should be satisfied."""
    n = 20
    # GT: poses around a circle, world->camera
    gt = []
    for i in range(n):
        a = 2 * np.pi * i / n
        T_wc = np.eye(4, dtype=np.float32)
        T_wc[:3, :3] = np.asarray(geo.so3_exp(jnp.array([0.0, a, 0.0])))
        T_wc[:3, 3] = [np.sin(a) * 3, 0.0, 3 - np.cos(a) * 3]
        gt.append(np.linalg.inv(T_wc))
    gt = jnp.asarray(np.stack(gt))
    # drifted estimates: inject noise into each relative motion
    rng = np.random.RandomState(2)
    est = [np.array(gt[0])]
    rels = []
    for i in range(1, n):
        rel = np.array(gt[i] @ geo.se3_inv(gt[i - 1]))
        noise = np.asarray(geo.se3_exp(jnp.asarray(rng.randn(6).astype(np.float32) * 0.01)))
        rels.append(noise @ rel)
        est.append(rels[-1] @ est[-1])
    est = jnp.asarray(np.stack(est))

    # edges: odometry chain with the DRIFTED relatives (consistent with est),
    # + one loop edge with the TRUE relative from end to start
    ii = list(range(n - 1)) + [n - 1]
    jj = list(range(1, n)) + [0]
    meas = [rels[i] for i in range(n - 1)] + [np.array(gt[0] @ geo.se3_inv(gt[n - 1]))]
    edges = pg.Sim3Edges(
        i=jnp.asarray(np.array(ii, np.int32)),
        j=jnp.asarray(np.array(jj, np.int32)),
        meas=jnp.asarray(np.stack(meas)),
        weight=jnp.ones(n).at[n - 1].set(5.0),
        valid=jnp.ones(n, bool),
    )
    fixed = jnp.zeros(n, bool).at[0].set(True)
    before = float(
        jnp.linalg.norm(pg.edge_residual(est[n - 1], est[0], edges.meas[n - 1]))
    )
    S_opt, costs = pg.optimize_essential_graph(est, fixed, edges, n_iters=25)
    after = float(
        jnp.linalg.norm(pg.edge_residual(S_opt[n - 1], S_opt[0], edges.meas[n - 1]))
    )
    assert after < 0.1 * before, (before, after)
    # poses should be closer to GT overall
    err_before = np.mean(
        [np.linalg.norm(np.asarray(geo.se3_log(geo.se3_inv(gt[i]) @ est[i]))) for i in range(n)]
    )
    err_after = np.mean(
        [
            np.linalg.norm(np.asarray(geo.sim3_log(jnp.asarray(np.linalg.inv(np.asarray(gt[i]))) @ S_opt[i])))
            for i in range(n)
        ]
    )
    assert err_after < 0.6 * err_before, (err_before, err_after)


def test_optimize_sim3_refines_perturbed_estimate():
    """GN refinement recovers a known Sim3 from a perturbed start and
    prunes planted outliers (Optimizer::OptimizeSim3 semantics)."""
    import numpy as np
    import jax.numpy as jnp
    from tpuslam.backend.sim3solver import optimize_sim3
    from tpuslam.core import geometry as geo

    rng = np.random.RandomState(0)
    N = 120
    K = jnp.asarray([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
    # ground-truth Sim3 (frame2 -> frame1)
    xi = jnp.asarray([0.05, -0.08, 0.03, 0.2, -0.1, 0.15, 0.1])
    S_gt = geo.sim3_exp(xi)
    P2 = jnp.asarray(rng.uniform([-2, -2, 3], [2, 2, 8], (N, 3)).astype(np.float32))
    P1 = geo.sim3_apply(S_gt, P2)

    def proj(p):
        return jnp.stack([400.0 * p[:, 0] / p[:, 2] + 320, 400.0 * p[:, 1] / p[:, 2] + 240], -1)

    uv1 = proj(P1) + jnp.asarray(rng.randn(N, 2).astype(np.float32)) * 0.3
    uv2 = proj(P2) + jnp.asarray(rng.randn(N, 2).astype(np.float32)) * 0.3
    # plant outliers
    uv1 = uv1.at[:10].add(40.0)
    valid = jnp.ones(N, bool)

    S0 = geo.sim3_exp(xi + jnp.asarray([0.02, 0.01, -0.02, 0.1, 0.05, -0.08, 0.05]))
    S_ref, inl, n_in = optimize_sim3(S0, P1, P2, uv1, uv2, K, valid)
    assert int(n_in) >= 100
    assert int(jnp.sum(inl[:10])) <= 2  # planted outliers pruned
    err = geo.sim3_log(S_ref @ geo.sim3_inv(S_gt))
    err0 = geo.sim3_log(S0 @ geo.sim3_inv(S_gt))
    assert float(jnp.linalg.norm(err)) < 0.25 * float(jnp.linalg.norm(err0))
    np.testing.assert_allclose(float(geo.sim3_scale(S_ref)), float(jnp.exp(xi[6])), rtol=0.02)
