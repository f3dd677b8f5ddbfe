"""PnP RANSAC and relocalization tests."""

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.core import geometry as geo
from tpuslam.frontend.pnp import ransac_pnp


def test_ransac_pnp_recovers_pose_with_outliers():
    rng = np.random.RandomState(0)
    N = 200
    X = jnp.asarray(rng.uniform([-3, -2, 4], [3, 2, 10], (N, 3)).astype(np.float32))
    T_true = geo.se3_exp(jnp.array([0.1, -0.05, 0.2, 0.4, 0.1, -0.3]))
    pc = geo.se3_apply(T_true, X)
    uv = jnp.stack([500 * pc[:, 0] / pc[:, 2] + 320, 500 * pc[:, 1] / pc[:, 2] + 240], -1)
    uv = uv + jnp.asarray(rng.randn(N, 2).astype(np.float32) * 0.5)
    # 25% outliers
    uv = uv.at[:50].add(jnp.asarray(rng.randn(50, 2).astype(np.float32) * 100 + 30))
    res = ransac_pnp(
        X, uv, jnp.ones(N, bool), 500.0, 500.0, 320.0, 240.0, jax.random.PRNGKey(1)
    )
    assert bool(res.ok)
    err = geo.se3_log(geo.se3_inv(T_true) @ res.T_cw)
    assert float(jnp.linalg.norm(err)) < 0.05, np.asarray(err)  # raw DLT, LM polish happens in relocalize()
    assert int(res.n_inliers) > 100
