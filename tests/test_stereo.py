"""Stereo matching kernel tests (kernels/stereo.py vs known disparity)."""

import numpy as np
import jax.numpy as jnp

from tpuslam.kernels import orb, stereo


def _textured_pair(H=240, W=320, disparity=12.0, seed=0):
    """Left image = smoothed random texture; right = left shifted by a
    constant disparity (fronto-parallel plane)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (H, W + 64)).astype(np.float32)
    k = np.ones((3, 3), np.float32) / 9.0
    for _ in range(2):
        p = np.pad(base, 1, mode="edge")
        base = sum(
            k[i, j] * p[i : i + H, j : j + W + 64] for i in range(3) for j in range(3)
        )
    d = int(disparity)
    left = base[:, 64 : 64 + W]
    right = base[:, 64 + d : 64 + d + W]  # uR = uL - d
    return left, right


def test_constant_disparity_recovered():
    disparity = 12.0
    left, right = _textured_pair(disparity=disparity)
    kw = dict(n_features=512, n_levels=4, scale_factor=1.2, ini_th=20.0, min_th=7.0)
    fl = orb.extract(jnp.asarray(left), **kw)
    fr = orb.extract(jnp.asarray(right), **kw)
    bf, fx = 40.0, 320.0
    ur, depth, ok = stereo.compute_stereo_matches(
        jnp.asarray(left), jnp.asarray(right),
        fl.uv, fl.octave, fl.desc, fl.valid,
        fr.uv, fr.octave, fr.desc, fr.valid,
        bf=bf, fx=fx,
    )
    ok = np.array(ok)
    assert ok.sum() >= 50, f"too few stereo matches: {ok.sum()}"
    disp = np.array(fl.uv[:, 0] - ur)[ok]
    med = np.median(disp)
    assert abs(med - disparity) < 0.75, f"median disparity {med} vs {disparity}"
    z = np.array(depth)[ok]
    assert abs(np.median(z) - bf / disparity) < 0.25


def test_sad_subpixel_shift():
    left, right = _textured_pair(disparity=8.0)
    # coarse guesses offset by up to 3 px; refinement should land near 8
    ys = np.linspace(30, 200, 40)
    xs = np.linspace(40, 280, 40)
    uv_l = jnp.asarray(np.stack([xs, ys], axis=1), jnp.float32)
    u_r0 = uv_l[:, 0] - 8.0 + jnp.asarray(np.random.default_rng(1).integers(-3, 4, 40), jnp.float32)
    octv = jnp.zeros(40, jnp.int32)
    u_ref, sad, okm = stereo.sad_subpixel(
        jnp.asarray(left), jnp.asarray(right), uv_l, u_r0, octv
    )
    err = np.array(uv_l[:, 0] - u_ref)[np.array(okm)] - 8.0
    assert np.median(np.abs(err)) < 0.5
