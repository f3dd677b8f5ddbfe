"""Covisibility-clustered keyframe partitioning for distributed BA.

SURVEY.md §5: the reference bounds its working set with covisibility-windowed
local BA; that same covisibility structure is the natural sharding axis for
scaling map size across devices.  Keyframes are partitioned into balanced
clusters that keep strongly-covisible keyframes together, and each cluster's
factors land on one device (the factor-sharded LM in dist/ba.py then needs
only the single psum round per iteration for cross-cluster landmarks).

The partitioner is a host-side greedy balanced graph grower (METIS-style
heavy-edge affinity, capacity-bounded) — partitioning runs once per BA
window on tiny K, not worth a device kernel.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..graph import lm


def cluster_keyframes(cov: np.ndarray, kf_valid: np.ndarray, n_clusters: int) -> np.ndarray:
    """Partition keyframes into ``n_clusters`` balanced clusters.

    ``cov`` (K, K) covisibility weights (shared map-point counts,
    KeyFrame::UpdateConnections analogue), ``kf_valid`` (K,) mask.
    Returns (K,) int32 cluster ids (-1 for invalid keyframes).

    Greedy growth: seed each cluster with the highest-degree unassigned
    keyframe, then repeatedly give the cluster with the fewest members its
    most-connected unassigned keyframe (capacity-bounded balance).
    """
    cov = np.asarray(cov)
    kf_valid = np.asarray(kf_valid).astype(bool)
    K = cov.shape[0]
    ids = np.where(kf_valid)[0]
    out = np.full(K, -1, np.int32)
    if len(ids) == 0:
        return out
    n_clusters = max(1, min(n_clusters, len(ids)))
    cap = -(-len(ids) // n_clusters)

    degree = cov[np.ix_(ids, ids)].sum(axis=1)
    unassigned = set(ids.tolist())
    members: list[list[int]] = []
    # seeds: strongest-degree keyframes, mutually spread apart
    order = ids[np.argsort(-degree)]
    for s in order[:n_clusters]:
        members.append([int(s)])
        out[s] = len(members) - 1
        unassigned.discard(int(s))

    while unassigned:
        # smallest cluster with remaining capacity picks next
        c = min(
            (ci for ci in range(len(members)) if len(members[ci]) < cap),
            key=lambda ci: len(members[ci]),
            default=None,
        )
        if c is None:
            c = min(range(len(members)), key=lambda ci: len(members[ci]))
        cand = np.fromiter(unassigned, dtype=np.int64)
        affinity = cov[np.ix_(members[c], cand)].sum(axis=0)
        pick = int(cand[np.argmax(affinity)])
        members[c].append(pick)
        out[pick] = c
        unassigned.discard(pick)
    return out


def _partition_bundle(bundle, cluster_of_kf: np.ndarray, n_clusters: int):
    """Reorder a factor bundle so factors of cluster c occupy slot c's
    contiguous span, padding every span to the max cluster factor count
    (pad factors have valid=False).  Returns a bundle with leading dim
    n_clusters * span."""
    kf = np.asarray(bundle.kf)
    valid = np.asarray(bundle.valid).astype(bool)
    cl = cluster_of_kf[kf]
    cl = np.where(valid, cl, -1)
    per = [np.where(cl == c)[0] for c in range(n_clusters)]
    span = max(1, max((len(p) for p in per), default=1))
    take = np.zeros(n_clusters * span, np.int64)
    keep = np.zeros(n_clusters * span, bool)
    for c, p in enumerate(per):
        take[c * span : c * span + len(p)] = p
        keep[c * span : c * span + len(p)] = True

    def pick(a):
        a = np.asarray(a)
        out = a[take]
        if a.dtype == bool:
            out = out & keep
        return jnp.asarray(out)

    fields = bundle._asdict()
    fields = {k: pick(v) for k, v in fields.items()}
    fields["valid"] = jnp.asarray(np.asarray(bundle.valid)[take] & keep)
    return type(bundle)(**fields)


def _spread_bundle(bundle, n_clusters: int):
    """Round-robin a bundle with no keyframe axis (pt_cub, cub_plane are
    landmark-only factors) into n_clusters equal spans."""
    n = np.asarray(bundle.valid).shape[0]
    span = max(1, -(-n // n_clusters))
    total = n_clusters * span
    take = np.arange(total) % max(n, 1)
    keep = np.arange(total) < n

    def pick(a):
        a = np.asarray(a)
        return jnp.asarray(a[take])

    fields = {k: pick(v) for k, v in bundle._asdict().items()}
    fields["valid"] = jnp.asarray(np.asarray(bundle.valid)[take] & keep)
    return type(bundle)(**fields)


def partition_data(data: lm.BAData, cluster_of_kf: np.ndarray, n_clusters: int) -> lm.BAData:
    """Cluster-align every factor bundle of a BAData (host-side reorder).

    The result's factor axes are exactly divisible by ``n_clusters`` and
    aligned so that sharding over a ``n_clusters``-device "dp" axis puts
    cluster c's factors on device c (locality: most landmark touches stay
    on-device; the psum in dist/ba.py reconciles the frontier).
    """
    return data._replace(
        mono=_partition_bundle(data.mono, cluster_of_kf, n_clusters),
        stereo=_partition_bundle(data.stereo, cluster_of_kf, n_clusters),
        plane_obs=_partition_bundle(data.plane_obs, cluster_of_kf, n_clusters),
        cub_bbox=_partition_bundle(data.cub_bbox, cluster_of_kf, n_clusters),
        cub_corner=_partition_bundle(data.cub_corner, cluster_of_kf, n_clusters),
        cub_se3=_partition_bundle(data.cub_se3, cluster_of_kf, n_clusters),
        pt_cub=_spread_bundle(data.pt_cub, n_clusters),
        cub_plane=_spread_bundle(data.cub_plane, n_clusters),
    )
