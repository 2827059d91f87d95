"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding (parallel/) is exercised without TPU hardware
(SURVEY.md §4 test strategy).

NOTE: the host environment pre-imports jax (sitecustomize registers the TPU
plugin and pins JAX_PLATFORMS), so the env var alone is too late — the
platform must be overridden through jax.config before any backend
initializes, or every test compile silently routes through the hardware
tunnel.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu", "tests must not run on the TPU tunnel"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
