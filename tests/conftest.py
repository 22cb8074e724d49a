"""Test configuration: force the CPU backend with 8 virtual devices so
sharding tests run without a TPU (SURVEY.md §4), and enable x64 for
bit-parity tests against the f64 scalar reference implementation."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The shell environment pins JAX_PLATFORMS to the TPU tunnel and the site
# hook re-exports it, so the config update (read at backend init) is the
# reliable override, not the env var.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
