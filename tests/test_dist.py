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
