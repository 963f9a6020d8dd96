"""Test configuration.

Tests run on CPU in double precision for parity with the reference numbers
(the reference is numpy/complex128). Multi-device tests use 8 virtual CPU
devices (the XLA host-platform device-count trick replaces the reference's
mpiexec-based CI, cf. SURVEY.md section 4).
"""

import os

# Must be set before the CPU backend is instantiated.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
