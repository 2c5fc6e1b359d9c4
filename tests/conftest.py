"""Test config: force an 8-device virtual CPU platform BEFORE jax import.

Multi-chip sharding tests run on a simulated 8-device mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per SURVEY.md §4.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

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
