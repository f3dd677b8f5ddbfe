"""MapPoint lifecycle parity: distinctive-descriptor refresh (median-Hamming
argmin, MapPoint::ComputeDistinctiveDescriptors), scale-invariance distance
band (MapPoint::UpdateNormalAndDepth), and the predicted-octave search level
(MapPoint::PredictScale)."""

import numpy as np
import jax.numpy as jnp

from tpuslam.core.config import Capacities
from tpuslam.map import mapstate as ms


def _map(n_kf=4, n_pts=4, n_kp=8):
    caps = Capacities(
        max_keypoints=n_kp, max_keyframes=n_kf, max_points=n_pts,
        max_planes=4, max_cuboids=2, max_planes_per_frame=2,
        max_cuboids_per_frame=2, vocab_words=16,
    )
    m = ms.empty_map(caps)
    return m._replace(kf_valid=jnp.ones(n_kf, bool), pt_valid=jnp.ones(n_pts, bool))


def _desc(bits_set):
    """Packed (8,) uint32 descriptor with ``bits_set`` low bits of word 0."""
    d = np.zeros(8, np.uint32)
    d[0] = (1 << bits_set) - 1
    return d


def test_distinctive_descriptor_is_median_hamming_argmin():
    m = _map()
    # point 0 observed by kf0..kf2 with descriptors at Hamming "positions"
    # 0, 4, 16 bits: pairwise distances d(0,4)=4, d(0,16)=16, d(4,16)=12.
    # medians (incl. self 0): obs0 -> [0,4,16] med 4; obs1 -> [0,4,12] med 4;
    # obs2 -> [0,12,16] med 12.  The argmin tie resolves to the FIRST row,
    # i.e. the 0-bit descriptor.
    kf_pt = -np.ones((4, 8), np.int32)
    kf_pt[0, 0] = kf_pt[1, 0] = kf_pt[2, 0] = 0
    desc = np.zeros((4, 8, 8), np.uint32)
    desc[0, 0] = _desc(0)
    desc[1, 0] = _desc(4)
    desc[2, 0] = _desc(16)
    m = m._replace(
        kf_pt=jnp.asarray(kf_pt),
        kf_kp_valid=jnp.asarray(kf_pt >= 0),
        kf_desc=jnp.asarray(desc),
        pt_desc=m.pt_desc.at[0].set(jnp.asarray(_desc(31))),  # stale
    )
    m2 = ms.update_point_stats(m)
    np.testing.assert_array_equal(np.array(m2.pt_desc[0]), _desc(0))
    # a point with no observations keeps its (stale) descriptor
    np.testing.assert_array_equal(np.array(m2.pt_desc[1]), np.zeros(8, np.uint32))


def test_descriptor_updates_after_new_observations():
    """After new keyframes observe the point with a different appearance, the
    representative descriptor moves to the new majority (VERDICT r2 item 4)."""
    m = _map()
    kf_pt = -np.ones((4, 8), np.int32)
    kf_pt[0, 0] = 0
    desc = np.zeros((4, 8, 8), np.uint32)
    desc[0, 0] = _desc(0)
    m = m._replace(
        kf_pt=jnp.asarray(kf_pt), kf_kp_valid=jnp.asarray(kf_pt >= 0),
        kf_desc=jnp.asarray(desc),
    )
    m = ms.update_point_stats(m)
    np.testing.assert_array_equal(np.array(m.pt_desc[0]), _desc(0))
    # two new observations with 20 bits set: majority shifts
    kf_pt2 = np.array(m.kf_pt)
    kf_pt2[1, 0] = kf_pt2[2, 0] = 0
    desc2 = np.array(m.kf_desc)
    desc2[1, 0] = _desc(20)
    desc2[2, 0] = _desc(20)
    m = m._replace(
        kf_pt=jnp.asarray(kf_pt2), kf_kp_valid=jnp.asarray(kf_pt2 >= 0),
        kf_desc=jnp.asarray(desc2),
    )
    m = ms.update_point_stats(m)
    np.testing.assert_array_equal(np.array(m.pt_desc[0]), _desc(20))


def test_scale_band_and_predicted_level():
    m = _map()
    # anchor kf0 at origin observes point 0 at depth 2 with octave 2
    kf_pt = -np.ones((4, 8), np.int32)
    kf_pt[0, 0] = 0
    octv = np.zeros((4, 8), np.int32)
    octv[0, 0] = 2
    m = m._replace(
        kf_pt=jnp.asarray(kf_pt), kf_kp_valid=jnp.asarray(kf_pt >= 0),
        kf_octave=jnp.asarray(octv),
        pt_pos=m.pt_pos.at[0].set(jnp.array([0.0, 0.0, 2.0])),
        pt_first_kf=m.pt_first_kf.at[0].set(0),
    )
    m2 = ms.update_point_stats(m, n_levels=8, scale_factor=1.2)
    max_d = float(m2.pt_max_dist[0])
    min_d = float(m2.pt_min_dist[0])
    np.testing.assert_allclose(max_d, 2.0 * 1.2**2, rtol=1e-5)
    np.testing.assert_allclose(min_d, max_d / 1.2**7, rtol=1e-5)
    # unobserved point keeps the sentinel band
    assert float(m2.pt_max_dist[1]) > 1e8

    # PredictScale: at the anchor distance the level is the anchor octave
    lvl = float(ms.predict_scale_level(jnp.asarray(2.0), jnp.asarray(max_d)))
    assert lvl == 2.0
    # closer -> finer (higher) level; sentinel band -> level 0
    lvl_close = float(ms.predict_scale_level(jnp.asarray(0.5), jnp.asarray(max_d)))
    assert lvl_close > 2.0
    assert float(ms.predict_scale_level(jnp.asarray(1.0), jnp.asarray(1e9))) == 0.0


def test_normal_points_from_camera_to_point():
    m = _map()
    kf_pt = -np.ones((4, 8), np.int32)
    kf_pt[0, 0] = 0
    m = m._replace(
        kf_pt=jnp.asarray(kf_pt), kf_kp_valid=jnp.asarray(kf_pt >= 0),
        pt_pos=m.pt_pos.at[0].set(jnp.array([0.0, 0.0, 3.0])),
    )
    m2 = ms.update_point_stats(m)
    np.testing.assert_allclose(np.array(m2.pt_normal[0]), [0.0, 0.0, 1.0], atol=1e-5)
