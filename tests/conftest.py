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

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# hermetic-but-persistent MPO artifact cache (same lifecycle as .jax_cache)
os.environ.setdefault(
    "QILAPLACE_MPO_CACHE", os.path.join(_repo, ".jax_cache", "mpo")
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the suite's wall-clock is compile-dominated on
# this 1-core box; warm runs skip ~all of it
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.default_backend() == "cpu"
