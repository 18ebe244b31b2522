"""Early pytest plugin: re-exec the test run with the TPU plugin disabled.

This environment's TPU plugin (axon) is registered by a sitecustomize hook at
interpreter startup and routes EVERY XLA compilation through a remote service
(~10 s wall-clock per compile, even on the CPU backend).  The unit-test suite
compiles hundreds of small kernels on the virtual-device CPU backend, so we
re-exec pytest once with the plugin's environment variables removed.

Loaded via ``addopts = -p _testenv_reexec`` in pytest.ini, which runs this
module BEFORE pytest enables fd-level output capture -- a re-exec from
conftest.py would inherit the capture file descriptors and lose all output.
"""

import os
import sys

_SENTINEL = "PYPMC_TPU_TEST_REEXEC"

if os.environ.get(_SENTINEL) != "1" and os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                "AXON_POOL_SVC_OVERRIDE", "AXON_LOOPBACK_RELAY"):
        env.pop(var, None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    env[_SENTINEL] = "1"
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
