"""Test environment: force CPU with 8 virtual devices (SURVEY §4d).

Multi-chip sharding tests run on a virtual CPU mesh; must be set before the
first jax import anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize force-registers the 'axon' TPU platform and
# overrides JAX_PLATFORMS; jax.config wins over both.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)
# Persistent compile cache: the op tests compile many small programs; caching
# makes repeated suite runs fast. Repo-local so it survives container
# restarts (/tmp does not — VERDICT r2 item 7).
_repo_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _repo_cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
