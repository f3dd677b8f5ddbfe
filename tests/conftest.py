"""Test configuration: force an 8-device virtual CPU mesh.

Sharding/collective code paths are exercised on host CPU devices; the real
TPU chip is reserved for bench.py.

The container boots every interpreter with an axon TPU backend registered via
sitecustomize (JAX_PLATFORMS=axon, PALLAS_AXON_POOL_IPS set), which would run
unit tests over a slow device tunnel.  sitecustomize runs before conftest, so
the only reliable fix is to re-exec the test process once with a scrubbed
environment.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
# Pipeline tests run every keyframe BA; as an 8-virtual-device collective on
# a 2-core host the XLA CPU all-reduce rendezvous (40 s) intermittently
# hard-aborts the process.  Tests exercise the LOCAL solver by default; the
# dedicated distribution tests (test_dist/test_shard/test_multiprocess)
# opt back in explicitly.
os.environ.setdefault("TPUSLAM_FORCE_LOCAL_BA", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

from tpuslam.utils import compcache  # noqa: E402

compcache.enable()
jax.config.update("jax_enable_x64", False)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound in-process XLA executable growth: a full-suite run compiles
    hundreds of programs and the XLA:CPU client eventually hard-aborts
    (SIGABRT around test ~99 of 103; round 4 died at ~59).  Dropping the
    in-memory caches between modules keeps the live executable count small;
    the persistent on-disk compilation cache (utils/compcache.py) makes the
    re-compiles cheap."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
