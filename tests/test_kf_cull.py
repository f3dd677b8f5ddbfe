"""KeyFrame culling: redundancy measurement + map surgery semantics."""

import numpy as np
import jax.numpy as jnp

from tpuslam.core.config import Capacities
from tpuslam.map import mapstate as ms


def _tiny_map(n_kf=4, n_pts=6):
    caps = Capacities(
        max_keypoints=8, max_keyframes=n_kf, max_points=n_pts,
        max_planes=4, max_cuboids=2, max_planes_per_frame=2,
        max_cuboids_per_frame=2, vocab_words=16,
    )
    m = ms.empty_map(caps)
    m = m._replace(
        kf_valid=jnp.ones(n_kf, bool),
        pt_valid=jnp.ones(n_pts, bool),
    )
    return m


def test_keyframe_redundancy_counts_same_or_finer_scale():
    m = _tiny_map()
    # point 0 observed by kfs 0,1,2,3 (octave 0 everywhere): for each
    # observer there are 3 others at <= octave+1 -> redundant at th_obs=3.
    # point 1 observed only by kf 3 -> not redundant.
    kf_pt = -np.ones((4, 8), np.int32)
    kf_pt[0, 0] = kf_pt[1, 0] = kf_pt[2, 0] = kf_pt[3, 0] = 0
    kf_pt[3, 1] = 1
    kp_valid = kf_pt >= 0
    m = m._replace(
        kf_pt=jnp.asarray(kf_pt),
        kf_kp_valid=jnp.asarray(kp_valid),
        kf_octave=jnp.zeros((4, 8), jnp.int32),
    )
    red = np.array(ms.keyframe_redundancy(m, th_obs=3))
    np.testing.assert_allclose(red[:3], 1.0)  # their only point is redundant
    np.testing.assert_allclose(red[3], 0.5)  # one of two points redundant

    # coarser observers don't count: push others to octave 3 while kf0
    # observes at octave 0 -> others at octave <= 1 drop to zero
    octv = np.zeros((4, 8), np.int32)
    octv[1, 0] = octv[2, 0] = octv[3, 0] = 3
    m2 = m._replace(kf_octave=jnp.asarray(octv))
    red2 = np.array(ms.keyframe_redundancy(m2, th_obs=1))
    assert red2[0] == 0.0  # no same-or-finer observers for kf0's point
    assert red2[1] == 1.0  # kf1 sees octave-3; kf2/kf3 are <= 4


def test_cull_keyframes_releases_observations_and_counts():
    m = _tiny_map()
    kf_pt = -np.ones((4, 8), np.int32)
    kf_pt[1, :3] = [0, 1, 2]
    m = m._replace(
        kf_pt=jnp.asarray(kf_pt),
        kf_kp_valid=jnp.asarray(kf_pt >= 0),
        kf_plane_map=m.kf_plane_map.at[1, 0].set(2),
        kf_plane_valid=m.kf_plane_valid.at[1, 0].set(True),
        plane_obs_count=m.plane_obs_count.at[2].set(5),
        kf_cub_map=m.kf_cub_map.at[1, 1].set(1),
        kf_cub_valid=m.kf_cub_valid.at[1, 1].set(True),
        cub_obs_count=m.cub_obs_count.at[1].set(2),
    )
    kill = jnp.asarray(np.array([False, True, False, False]))
    out = ms.cull_keyframes(m, kill)
    assert not bool(out.kf_valid[1])
    assert bool(out.kf_valid[0]) and bool(out.kf_valid[2])
    assert int(jnp.sum(out.kf_pt[1] >= 0)) == 0
    # landmark observation counters are lifetime statistics: the reference's
    # SetBadFlag (KeyFrame.cc:469-471) erases only MapPoint observations, so
    # plane/cuboid counts stay monotone — only the per-KF links are cleared
    assert int(out.plane_obs_count[2]) == 5
    assert int(out.cub_obs_count[1]) == 2
    assert not bool(out.kf_plane_valid[1, 0]) and int(out.kf_plane_map[1, 0]) == -1
    assert not bool(out.kf_cub_valid[1, 1]) and int(out.kf_cub_map[1, 1]) == -1
    # untouched rows keep their links
    np.testing.assert_array_equal(np.array(out.kf_pt[0]), np.array(m.kf_pt[0]))
