"""Test configuration: run all tests on a virtual 8-device CPU mesh with
float64 enabled (the exact-value regression tests assert 1e-7..1e-13
agreement with hand-derived numbers, which requires double precision --
available on the CPU backend).

The TPU plugin used in this environment (axon) hooks XLA compilation at
interpreter startup via sitecustomize and routes EVERY compile through a
remote service (~10 s wall-clock per compile, even for the CPU backend).
Unit tests compile hundreds of small kernels, so we re-exec pytest once with
the plugin's environment removed; the real-TPU path is exercised by
``bench.py`` and the driver's compile checks instead.
"""

import os

# The re-exec that disables the slow remote-compile TPU plugin lives in
# ``_testenv_reexec.py`` (loaded via pytest.ini addopts) because it must run
# BEFORE pytest's fd-level capture starts.

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
