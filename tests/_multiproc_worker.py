"""Worker for the multi-process jax.distributed smoke test (run by
test_multiprocess.py, one subprocess per simulated host).

Each process owns ONE CPU device; together they form a 2-device global mesh.
The worker runs (a) a cross-process allgather through the distributed
runtime and (b) one step of the factor-sharded distributed LM from
dist/ba.py on a global mesh whose shards live on different processes —
the multi-host story of SURVEY.md §5 on two local processes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import numpy as np  # noqa: E402


def main():
    coord, pid_s, nproc_s = sys.argv[1:4]
    pid, nproc = int(pid_s), int(nproc_s)
    import jax

    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.device_count() == nproc, jax.device_count()
    assert jax.process_count() == nproc

    # (a) cross-process allgather
    got = multihost_utils.process_allgather(jnp.array([float(pid)]))
    np.testing.assert_allclose(np.asarray(got).ravel(), np.arange(nproc, dtype=np.float32))

    # (b) distributed LM over a global mesh spanning both processes
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _small_problem
    from tpuslam.dist.ba import (
        _shard_factors_spec, distributed_lm_iterations, pad_factors_for_mesh,
    )
    from tpuslam.graph import lm

    state, data, w = _small_problem(n_kf=4, n_pts=64, n_factors=256)
    data = pad_factors_for_mesh(data, nproc)
    mesh = Mesh(np.asarray(jax.devices()), axis_names=("dp",))

    def to_global(x, spec):
        sh = NamedSharding(mesh, spec)
        if spec == P():
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        # factor-sharded: this process contributes its slice
        n = x.shape[0]
        lo, hi = pid * n // nproc, (pid + 1) * n // nproc
        return jax.make_array_from_process_local_data(sh, np.asarray(x[lo:hi]))

    state_g = jax.tree.map(lambda x: to_global(x, P()), state)
    data_g = jax.tree.map(to_global, data, _shard_factors_spec())
    state_out, chi2s = distributed_lm_iterations(mesh, state_g, data_g, w, n_iters=2)
    # chi2s is replicated over the mesh: read this process's local copy
    chi2_local = np.asarray(chi2s.addressable_data(0))
    assert np.isfinite(chi2_local).all()
    print(f"proc {pid}: OK chi2={chi2_local.ravel()[-1]:.3f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
