"""Tests for ORB extraction and MXU Hamming matching on synthetic images."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.kernels import match as m
from tpuslam.kernels import orb


def synthetic_image(key, H=240, W=320, n_blobs=120):
    """Random bright squares on a dark background — corner-rich."""
    rng = np.random.RandomState(int(jax.random.randint(key, (), 0, 1 << 30)))
    img = rng.rand(H, W).astype(np.float32) * 10.0
    for _ in range(n_blobs):
        y, x = rng.randint(20, H - 28), rng.randint(20, W - 28)
        s = rng.randint(4, 12)
        img[y : y + s, x : x + s] += rng.rand() * 150.0 + 50.0
    return jnp.asarray(np.clip(img, 0, 255))


def test_extract_shapes_and_validity():
    img = synthetic_image(jax.random.PRNGKey(0))
    feats = orb.extract(img, n_features=512, n_levels=4)
    assert feats.uv.shape == (512, 2)
    assert feats.desc.shape == (512, 8)
    n_valid = int(feats.valid.sum())
    assert n_valid > 100, f"only {n_valid} features detected"
    uv = np.asarray(feats.uv[feats.valid])
    assert uv[:, 0].min() >= 0 and uv[:, 0].max() < 320
    assert uv[:, 1].min() >= 0 and uv[:, 1].max() < 240


def test_extract_detects_corners_not_flat():
    flat = jnp.full((240, 320), 100.0)
    feats = orb.extract(flat, n_features=256, n_levels=2)
    assert int(feats.valid.sum()) == 0


def test_hamming_matrix_matches_numpy():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randint(0, 1 << 32, (16, 8), dtype=np.uint64).astype(np.uint32))
    b = jnp.asarray(rng.randint(0, 1 << 32, (24, 8), dtype=np.uint64).astype(np.uint32))
    d = np.asarray(m.hamming_matrix(a, b))
    an = np.asarray(a)
    bn = np.asarray(b)
    expect = np.zeros((16, 24))
    for i in range(16):
        for j in range(24):
            x = an[i] ^ bn[j]
            expect[i, j] = sum(bin(int(v)).count("1") for v in x)
    np.testing.assert_allclose(d, expect, atol=0)


def test_matching_recovers_translation():
    """Features from an image and its shifted copy should match at the shift."""
    img = synthetic_image(jax.random.PRNGKey(3))
    dx, dy = 6, 4
    shifted = jnp.roll(img, (dy, dx), axis=(0, 1))
    fa = orb.extract(img, n_features=512, n_levels=4)
    fb = orb.extract(shifted, n_features=512, n_levels=4)
    gate = m.window_gate(fa.uv + jnp.array([dx, dy], jnp.float32), fb.uv, 8.0)
    idx, dist, ok = m.match_descriptors(
        fa.desc, fb.desc, fa.valid, fb.valid, gate_mask=gate, max_dist=60.0, ratio=0.9
    )
    ok = m.rotation_consistency(fa.angle, fb.angle, idx, ok)
    n_ok = int(ok.sum())
    assert n_ok > 50, f"only {n_ok} matches"
    disp = np.asarray(fb.uv[idx] - fa.uv)[np.asarray(ok)]
    med = np.median(disp, axis=0)
    np.testing.assert_allclose(med, [dx, dy], atol=1.5)


def test_match_rejects_unrelated():
    img_a = synthetic_image(jax.random.PRNGKey(4))
    img_b = synthetic_image(jax.random.PRNGKey(5))
    fa = orb.extract(img_a, n_features=256, n_levels=2)
    fb = orb.extract(img_b, n_features=256, n_levels=2)
    _, dist, ok = m.match_descriptors(
        fa.desc, fb.desc, fa.valid, fb.valid, max_dist=35.0, ratio=0.7, mutual=True
    )
    frac = int(ok.sum()) / max(int(fa.valid.sum()), 1)
    assert frac < 0.25, f"{frac:.2f} of unrelated features matched"


def test_octave_and_epipolar_gates():
    oct_pred = jnp.array([0, 2, 5])
    oct_b = jnp.array([0, 1, 3, 6])
    g = np.asarray(m.octave_gate(oct_pred, oct_b))
    assert g[0, 0] and g[0, 1] and not g[0, 2]
    assert g[1, 1] and g[1, 2] and not g[1, 3]

    # epipolar: pure-translation stereo -> F = [e]_x, horizontal lines
    F = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
    uv_a = jnp.array([[100.0, 50.0]])
    uv_b = jnp.array([[200.0, 50.5], [200.0, 80.0]])
    g = np.asarray(m.epipolar_gate(uv_a, uv_b, F, jnp.ones(2)))
    assert g[0, 0] and not g[0, 1]
