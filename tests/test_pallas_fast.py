"""Interpreter-mode parity: Pallas fused FAST+NMS vs the jnp formulation."""

import numpy as np
import jax.numpy as jnp

from tpuslam.kernels.orb import _nms3, build_pyramid, fast_response
from tpuslam.kernels.pallas_fast import _HALO, fast_nms_score


def test_fast_nms_parity_interpret():
    rng = np.random.RandomState(0)
    H, W = 120, 256
    img = rng.uniform(0, 255, (H, W)).astype(np.float32)
    # smooth a little so corners are sparse-ish, then inject strong corners
    k = np.ones((3, 3), np.float32) / 9.0
    p = np.pad(img, 1, mode="edge")
    img = sum(k[i, j] * p[i : i + H, j : j + W] for i in range(3) for j in range(3))
    img[40:43, 60:63] += 120.0
    img[80, 200] -= 110.0

    pyr = build_pyramid(jnp.asarray(img), n_levels=3, scale_factor=1.2)
    ref = np.asarray(_nms3(fast_response(pyr, 20.0, 7.0)))
    got = np.asarray(fast_nms_score(pyr, 20.0, 7.0, interpret=True))

    # interior only: the jnp path wraps at the global image borders (y rolls,
    # x NMS) where the kernel zero-pads / wraps differently; extract() masks
    # an edge_margin of 20 >> _HALO there anyway
    sl = np.s_[:, _HALO : H - _HALO, _HALO : W - _HALO]
    np.testing.assert_allclose(got[sl], ref[sl], rtol=1e-5, atol=1e-3)
    assert (ref[sl] > 0).sum() > 20  # the test image actually has corners
    assert (ref[sl] > 1e5).sum() >= 2  # and some strict-threshold corners
