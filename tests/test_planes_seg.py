"""Online plane segmentation test: synthetic depth of a 3-wall corner."""

import numpy as np
import jax.numpy as jnp

from tpuslam.kernels.planes import segment_planes

FX = FY = 500.0
CX, CY = 320.0, 240.0


def render_depth_of_planes(planes, H=480, W=640):
    """Ray-cast depth: for each pixel the nearest positive plane hit."""
    ys, xs = np.mgrid[0:H, 0:W]
    rx = (xs - CX) / FX
    ry = (ys - CY) / FY
    rays = np.stack([rx, ry, np.ones_like(rx)], axis=-1)  # unnormalized
    depth = np.full((H, W), np.inf, np.float32)
    for n, d in planes:
        denom = rays @ n
        t = -d / np.where(np.abs(denom) < 1e-9, 1e-9, denom)  # n.(t*ray)+d=0
        t = np.where(t > 0.1, t, np.inf)
        depth = np.minimum(depth, t.astype(np.float32))
    depth[~np.isfinite(depth)] = 0.0
    return depth


def test_segment_planes_recovers_walls():
    walls = [
        (np.array([0.0, 0.0, -1.0]), 6.0),  # z = 6 back wall
        (np.array([-1.0, 0.0, 0.0]), 3.0),  # x = 3 right wall
        (np.array([0.0, -1.0, 0.0]), 2.5),  # y = 2.5 floor
    ]
    depth = render_depth_of_planes(walls)
    rng = np.random.RandomState(0)
    depth = depth * (1.0 + rng.randn(*depth.shape).astype(np.float32) * 0.002)
    coefs, centroids, counts, valid = segment_planes(
        jnp.asarray(depth), FX, FY, CX, CY, stride=3, max_planes=8
    )
    coefs = np.array(coefs)[np.array(valid)]
    assert len(coefs) >= 3, f"found {len(coefs)} planes"
    found = 0
    for n, d in walls:
        # camera-frame plane: n.p + d = 0 with our d >= 0 convention
        target = np.concatenate([n, [d]])
        if target[3] < 0:
            target = -target
        for c in coefs:
            if abs(np.dot(c[:3], target[:3])) > 0.999 and abs(c[3] - target[3]) < 0.05:
                found += 1
                break
    assert found == 3, f"only matched {found} walls: {coefs}"


def test_segment_planes_empty_depth():
    depth = jnp.zeros((480, 640))
    coefs, centroids, counts, valid = segment_planes(depth, FX, FY, CX, CY)
    assert not bool(valid.any())
