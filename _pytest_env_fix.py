"""Early pytest plugin: re-exec the test process with a CPU-only JAX env.

The container boots every interpreter with an axon TPU backend registered in
sitecustomize (JAX_PLATFORMS=axon, PALLAS_AXON_POOL_IPS set).  Unit tests must
run on an 8-device virtual CPU mesh instead: the tunnel-attached TPU is slow
for eager dispatch and has a single chip.  sitecustomize runs before any
pytest code, and pytest's capture plugin steals fd1 before conftest.py is
imported, so the only place a clean re-exec can happen is an initial plugin
loaded via ``addopts = "-p _pytest_env_fix"`` (see pyproject.toml) — plugin
import happens before capture starts, so the child inherits the real stdout.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("TPUSLAM_FORCE_LOCAL_BA", "1")
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)
