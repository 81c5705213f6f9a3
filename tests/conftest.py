"""Test configuration: 8 virtual CPU devices + float64 enabled.

Tests run on a virtual CPU mesh (multi-chip sharding without hardware,
per the multi-host test strategy in SURVEY.md §2.6) with x64 so reference
tolerances (reference runs its solvers in float64, qpth/AL_mpc.py:138)
are meaningful. TPU-path precision (f32 + iterative refinement) is
covered by dedicated tolerance tests and the bench harness.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
