"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so the multi-chip
sharding path is exercised without TPU hardware (SURVEY §4 tier 3);
bench.py (not run under pytest) uses the real chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the image defaults to the axon TPU
# Don't let the axon plugin phone the TPU relay at import: CPU tests must
# run (and fail meaningfully) even when the relay/remote chip is wedged.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running corpus-level test")


def pytest_collection_modifyitems(config, items):
    if config.getoption("-m", default=None):
        return
    skip_slow = pytest.mark.skip(reason="slow; run with -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
