"""Device-mesh helpers.

One axis ("dp") shards factor bundles for distributed BA (dist/ba.py);
clustered sharding (dist/shard.py) aligns covisibility clusters with shard
slots on the same axis.  There is nothing reference-equivalent to cite: the
reference is single-process (SURVEY.md §2.3); this is the TPU scaling layer.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int = 0, axis: str = "dp") -> Mesh:
    """A 1D mesh over the first ``n_devices`` devices (all if 0)."""
    devs = jax.devices()
    if n_devices <= 0:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_devices]), axis_names=(axis,))


def mesh_size(mesh: Mesh) -> int:
    return int(np.prod(list(mesh.shape.values())))
