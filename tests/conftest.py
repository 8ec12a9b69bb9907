"""Test configuration: hermetic CPU backend with a virtual 8-device mesh and
x64 enabled (parity tests need complex128; TPU perf paths are exercised by
bench.py on real hardware).

The sandbox's sitecustomize pre-registers a tunneled TPU backend at
interpreter start, so forcing CPU must go through jax.config (env vars are
too late)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu"
