"""Test config: force an 8-device virtual CPU platform BEFORE any jax use.

Multi-chip sharding tests run on a simulated 8-device mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per SURVEY.md §4.
NOTE: the env var JAX_PLATFORMS is not honored by all platform plugins
(the axon TPU plugin overrides it), so we use jax.config.update, which is.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is compile-bound on this
# 1-CPU box (hundreds of small jit episodes), and identical HLO recurs
# both across test files within one run and across runs — warm runs skip
# most of that work.  Keyed by backend+flags, so the forced 8-device CPU
# platform gets its own entries; safe to delete the directory any time.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def default_map():
    import os.path as osp

    from montecarlolocalisation_tpu.maps import from_map_file

    path = osp.join(
        osp.dirname(__file__), "..", "montecarlolocalisation_tpu", "maps",
        "default_map.txt",
    )
    return from_map_file(path)
