"""Pallas TPU kernel: fused Hamming nearest + second-nearest search.

The jnp matcher (kernels/match.py) materializes the (N, M) distance matrix
in HBM before reducing it.  For the ungated searches (loop-closure matching,
fuse, BoW-style association) this kernel streams the matrix: each grid step
computes a (TILE_N, TILE_M) distance tile on the MXU (±1 dot-product form of
Hamming distance) and folds it into running best/second-best/argmin scratch
in VMEM, so HBM traffic is O(N*D + M*D) instead of O(N*M).

Falls back to the jnp path off-TPU (tests run on the CPU mesh; the kernel is
exercised there in interpreter mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .orb import unpack_descriptor_bits

TILE_N = 128
TILE_M = 512
BIG = 1e9  # python scalar: jnp constants may not be captured by pallas kernels


def _kernel(a_ref, bt_ref, bpen_ref, best_ref, second_ref, idx_ref, sb, ss, si):
    """Grid: (N/TILE_N, M/TILE_M); j (columns) iterates fastest."""
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        sb[:] = jnp.full((TILE_N, 1), 1e9, jnp.float32)
        ss[:] = jnp.full((TILE_N, 1), 1e9, jnp.float32)
        si[:] = jnp.zeros((TILE_N, 1), jnp.int32)

    a = a_ref[:]  # (TILE_N, 256) in {-1, +1}
    bt = bt_ref[:]  # (256, TILE_M) in {-1, +1}
    sim = jnp.dot(a, bt, preferred_element_type=jnp.float32)  # (TILE_N, TILE_M)
    dist = 0.5 * (256.0 - sim) + bpen_ref[:]  # bpen: +BIG on invalid columns

    # chunk best + second best along columns (mask ONLY the argmin position:
    # tied minima must surface as d2 == d1, matching masked_argmin2)
    c_best = jnp.min(dist, axis=1, keepdims=True)
    c_arg_local = jnp.argmin(dist, axis=1).astype(jnp.int32)[:, None]
    c_arg = c_arg_local + j * TILE_M
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    masked = jnp.where(cols == c_arg_local, 1e9, dist)
    c_second = jnp.min(masked, axis=1, keepdims=True)

    b0, s0, i0 = sb[:], ss[:], si[:]
    new_best = jnp.minimum(b0, c_best)
    new_idx = jnp.where(c_best < b0, c_arg, i0)
    new_second = jnp.minimum(jnp.maximum(b0, c_best), jnp.minimum(s0, c_second))
    sb[:] = new_best
    ss[:] = new_second
    si[:] = new_idx

    @pl.when(j == n_j - 1)
    def _():
        best_ref[:] = sb[:]
        second_ref[:] = ss[:]
        idx_ref[:] = si[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_top2(desc_a, desc_b, valid_b, interpret: bool = False):
    """(N, 8), (M, 8) packed uint32 -> (idx (N,), d1 (N,), d2 (N,)).

    N, M are padded to the tile sizes internally.
    """
    N = desc_a.shape[0]
    M = desc_b.shape[0]
    a = unpack_descriptor_bits(desc_a) * 2.0 - 1.0  # (N, 256)
    b = unpack_descriptor_bits(desc_b) * 2.0 - 1.0
    Np = -(-N // TILE_N) * TILE_N
    Mp = -(-M // TILE_M) * TILE_M
    a = jnp.pad(a, ((0, Np - N), (0, 0)))
    b = jnp.pad(b, ((0, Mp - M), (0, 0)))
    pen = jnp.where(valid_b, 0.0, BIG).astype(jnp.float32)
    pen = jnp.pad(pen, (0, Mp - M), constant_values=BIG)[None, :]  # (1, Mp)
    bt = b.T  # (256, Mp)

    grid = (Np // TILE_N, Mp // TILE_M)
    best, second, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, 256), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((256, TILE_M), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
            jax.ShapeDtypeStruct((Np, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_N, 1), jnp.float32),
            pltpu.VMEM((TILE_N, 1), jnp.float32),
            pltpu.VMEM((TILE_N, 1), jnp.int32),
        ],
        interpret=interpret,
    )(a, bt, pen)
    return idx[:N, 0], best[:N, 0], second[:N, 0]


def hamming_top2_auto(desc_a, desc_b, valid_b):
    """Dispatch: Pallas on TPU; the dense jnp reduction elsewhere (the
    interpreter is only used by the parity test — it is far too slow for the
    CPU test suite's inner loops)."""
    if jax.devices()[0].platform == "tpu":
        return hamming_top2(desc_a, desc_b, valid_b)
    return _dense_top2(desc_a, desc_b, valid_b)


@jax.jit
def _dense_top2(desc_a, desc_b, valid_b):
    from .match import hamming_matrix, masked_argmin2

    dist = hamming_matrix(desc_a, desc_b)
    dist = jnp.where(valid_b[None, :], dist, BIG)
    idx, d1, d2 = masked_argmin2(dist)
    return idx.astype(jnp.int32), d1, d2
