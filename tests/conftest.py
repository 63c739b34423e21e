"""Test configuration: force a virtual 8-device CPU mesh.

Tests run on CPU with 8 virtual devices so data-parallel sharding paths are
exercised without TPU hardware (the JAX-native "fake backend" per SURVEY.md
§4). Must run before jax initializes its backends.
"""

import os

# Force CPU even if a site customization already imported jax with a TPU
# plugin (JAX_PLATFORMS may be pre-set to a tunnel backend): set the env for
# late initializers AND override via jax.config below for the already-
# imported case.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: CPU test-suite compiles (convs are slow to
# build on the CPU backend) are cached across pytest runs.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
