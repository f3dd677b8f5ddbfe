"""Pallas fused Hamming matcher vs the dense jnp reference."""

import numpy as np
import jax.numpy as jnp

from tpuslam.kernels import match as km
import jax

from tpuslam.kernels.pallas_match import hamming_top2, hamming_top2_auto


def test_pallas_top2_matches_dense():
    rng = np.random.RandomState(0)
    N, M = 200, 700
    a = jnp.asarray(rng.randint(0, 1 << 32, (N, 8), dtype=np.uint64).astype(np.uint32))
    b = jnp.asarray(rng.randint(0, 1 << 32, (M, 8), dtype=np.uint64).astype(np.uint32))
    valid_b = jnp.asarray(rng.rand(M) > 0.2)
    interp = jax.devices()[0].platform != "tpu"
    idx, d1, d2 = hamming_top2(a, b, valid_b, interpret=interp)

    dist = km.hamming_matrix(a, b)
    dist = jnp.where(valid_b[None, :], dist, 1e9)
    ref_idx, ref_d1, ref_d2 = km.masked_argmin2(dist)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(ref_d1))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(ref_d2))
    # argmin may differ only on exact ties
    ties = np.asarray(d1) == np.asarray(d2)
    same = np.asarray(idx) == np.asarray(ref_idx)
    assert np.all(same | ties)
