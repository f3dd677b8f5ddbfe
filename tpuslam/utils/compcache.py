"""Persistent XLA compilation cache setup.

The reference is an ahead-of-time-compiled C++ binary; the JAX analogue of
"compile once" is the persistent compilation cache.  Every entry point
(apps, bench, tests) calls :func:`enable` so a fresh process replays a
sequence without re-paying the 20-40 s XLA compile of the fused tracking
program and the BA solver buckets.

Opt out with TPUSLAM_NO_COMPILE_CACHE=1; override the location with
JAX_COMPILATION_CACHE_DIR (honoured by JAX itself before this runs).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "/tmp/tpuslam_jax_cache"


def enable(path: str | None = None) -> None:
    import jax

    # geometry correctness before MXU speed: the TPU's default bf16 matmul
    # passes are enough to corrupt triangulation/BA on this problem scale —
    # the points-only golden replay collapses deterministically on TPU and
    # NOT on CPU with identical code.  SLAM matmuls are small; the fp32
    # penalty is negligible against the device-tunnel round trip.
    try:
        jax.config.update("jax_default_matmul_precision", "float32")
    except Exception:  # pragma: no cover
        pass
    if os.environ.get("TPUSLAM_NO_COMPILE_CACHE"):
        return

    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or _DEFAULT_DIR
    )
    if path is None and not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        # separate caches per backend AND per XLA_FLAGS: XLA:CPU AOT entries
        # embed compile-time machine-feature options (+prefer-no-scatter
        # etc.) that differ between the axon (TPU tunnel) client, plain CPU
        # runs, and the 8-virtual-device test config — sharing one directory
        # triggers machine-feature mismatch on reload (warnings at best,
        # SIGABRT/SIGILL at worst; the round-4 full-suite abort)
        import hashlib

        tag = hashlib.sha1(
            os.environ.get("XLA_FLAGS", "").encode()
        ).hexdigest()[:8]
        cache_dir = "{}_{}_{}".format(
            cache_dir,
            (os.environ.get("JAX_PLATFORMS") or "axon").split(",")[0].strip(),
            tag,
        )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        # default entry-size gate skips small executables entirely; -1 keeps
        # everything that passed the compile-time gate
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - never break startup over a cache
        pass
