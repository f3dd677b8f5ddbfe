"""Pallas TPU kernel: fused dense FAST-9 response + 3x3 NMS.

The jnp formulation (kernels/orb.py:fast_response + _nms3) materializes 16
ring-shifted copies of the whole pyramid plus run-length masks in HBM —
~3.2 ms/frame on a v5e chip for a 8x480x640 pyramid.  This kernel keeps
everything in VMEM: each grid step owns one pyramid level, sweeps it in
row strips with a 4-row halo, recomputes ring differences on the fly
(slices + lane rolls instead of materialized shifts), tracks the circular
>=9 run with a streaming run-length counter, and fuses the 3x3 non-maximum
suppression before writing the single (H, W) score map back — HBM traffic
is one read + one write of the pyramid instead of dozens.

Semantics match the jnp path (kernels/orb.py:124-181): score > 0 iff the
pixel is a FAST-9 corner at the weak threshold after NMS, with a +1e6 bonus
iff it also passes the strict threshold (the reference's 20 -> 7 fallback,
ORBextractor.cc:811-819).  Ring differences wrap at image x-borders exactly
like the jnp ``jnp.roll`` version; callers mask an ``edge_margin`` >= 4
ring anyway.

Falls back to the jnp path off-TPU; an interpreter-mode parity test pins
the two implementations together (tests/test_pallas_fast.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .orb import _FAST_RING, _nms3, fast_response

_HALO = 4  # ring radius 3 + 1 NMS row
_STRIP = 60  # output rows per inner step (480 = 8 strips)


def _fast_nms_kernel(img_ref, out_ref, *, H, W, strict_th, weak_th, n_strips):
    """img_ref: (1, H + 2*_HALO, W) one pyramid level; out_ref: (1, H, W)."""
    ring = [(int(dy), int(dx)) for dy, dx in _FAST_RING]

    for s in range(n_strips):
        base = s * _STRIP  # first output row of this strip (level coords)
        # score rows [base-1, base+_STRIP+1) need source rows [base-4, base+_STRIP+4)
        src = img_ref[0, base : base + _STRIP + 2 * _HALO, :]  # (STRIP+8, W)
        n_sc = _STRIP + 2  # score rows incl. NMS halo
        center = src[_HALO - 1 : _HALO - 1 + n_sc, :]  # (n_sc, W)

        def ring_diff(i):
            dy, dx = ring[i % 16]
            sl = src[_HALO - 1 + dy : _HALO - 1 + dy + n_sc, :]
            sl = pltpu.roll(sl, (-dx) % W, axis=1)
            return sl - center

        zeros = jnp.zeros((n_sc, W), jnp.float32)
        rb7 = zeros; rd7 = zeros; rb20 = zeros; rd20 = zeros
        c7 = zeros; c20 = zeros
        sb = zeros; sd = zeros
        for i in range(24):
            d = ring_diff(i)
            b7 = (d > weak_th).astype(jnp.float32)
            dk7 = (d < -weak_th).astype(jnp.float32)
            b20 = (d > strict_th).astype(jnp.float32)
            dk20 = (d < -strict_th).astype(jnp.float32)
            rb7 = (rb7 + b7) * b7
            rd7 = (rd7 + dk7) * dk7
            rb20 = (rb20 + b20) * b20
            rd20 = (rd20 + dk20) * dk20
            c7 = jnp.maximum(c7, jnp.maximum(rb7, rd7))
            c20 = jnp.maximum(c20, jnp.maximum(rb20, rd20))
            if i < 16:
                sb = sb + jnp.maximum(d - weak_th, 0.0)
                sd = sd + jnp.maximum(-d - weak_th, 0.0)

        score = jnp.maximum(sb, sd)
        score = jnp.where(c7 >= 9.0, score + jnp.where(c20 >= 9.0, 1e6, 0.0), 0.0)

        # fused 3x3 NMS: out row j (of _STRIP) is score row j+1
        m = jnp.full((_STRIP, W), -jnp.inf, jnp.float32)
        for dy in range(3):
            row = score[dy : dy + _STRIP, :]
            for dx in (-1, 0, 1):
                m = jnp.maximum(m, pltpu.roll(row, (-dx) % W, axis=1))
        keep = score[1 : 1 + _STRIP, :]
        out_ref[0, base : base + _STRIP, :] = jnp.where(keep >= m, keep, 0.0)


@functools.partial(jax.jit, static_argnames=("strict_th", "weak_th", "interpret"))
def fast_nms_score(pyramid, strict_th: float = 20.0, weak_th: float = 7.0,
                   interpret: bool = False):
    """(L, H, W) float32 pyramid -> (L, H, W) NMS'd FAST score map."""
    L, H, W = pyramid.shape
    n_strips = -(-H // _STRIP)
    Hp = n_strips * _STRIP
    padded = jnp.pad(pyramid, ((0, 0), (_HALO, Hp - H + _HALO), (0, 0)))
    out = pl.pallas_call(
        functools.partial(
            _fast_nms_kernel, H=Hp, W=W,
            strict_th=float(strict_th), weak_th=float(weak_th), n_strips=n_strips,
        ),
        grid=(L,),
        in_specs=[pl.BlockSpec((1, Hp + 2 * _HALO, W), lambda l: (l, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Hp, W), lambda l: (l, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, Hp, W), jnp.float32),
        interpret=interpret,
    )(padded)
    return out[:, :H, :]


def fast_nms_score_auto(pyramid, strict_th: float = 20.0, weak_th: float = 7.0):
    """Dispatch: fused Pallas kernel on TPU, jnp elsewhere."""
    if jax.devices()[0].platform == "tpu":
        return fast_nms_score(pyramid, strict_th, weak_th)
    return _nms3(fast_response(pyramid, strict_th, weak_th))
