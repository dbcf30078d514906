"""Test configuration: force CPU with 8 virtual devices and 64-bit mode.

The TPU in this container sits behind the axon relay; tests run on the CPU
backend (f64-capable) with a virtual 8-device mesh for sharding tests.
TPU-only tests are marked ``tpu`` and skipped here.
"""

import os

_FLAG = "--xla_force_host_platform_device_count=8"
if _FLAG not in os.environ.get("XLA_FLAGS", ""):
    # append rather than setdefault: a pre-set XLA_FLAGS (container/CI)
    # must not silently disable the 8-virtual-device sharding tests
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " "
                               + _FLAG).strip()

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms to "axon,cpu"; override to cpu.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")
    config.addinivalue_line(
        "markers", "slow: long-running test (skipped by the default "
        "fast tier; run with -m full)")
    config.addinivalue_line(
        "markers", "full: every test (so `pytest -m full` overrides the "
        "default `-m 'not slow'` and runs the whole suite)")


def _slow_nodeids():
    path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    try:
        with open(path) as f:
            return {line.strip() for line in f
                    if line.strip() and not line.startswith("#")}
    except FileNotFoundError:
        return set()


def pytest_collection_modifyitems(config, items):
    skip_tpu = pytest.mark.skip(reason="CPU-only test session")
    slow_ids = _slow_nodeids()
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)
        # tier the suite: measured-slow tests (tests/slow_tests.txt) are
        # deselected by the default addopts -m 'not slow'; `-m full`
        # selects everything since every item carries `full`
        if item.nodeid in slow_ids:
            item.add_marker(pytest.mark.slow)
        item.add_marker(pytest.mark.full)
