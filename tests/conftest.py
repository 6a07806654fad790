"""Test configuration: force CPU JAX with a virtual 8-device mesh.

Note: in this environment the JAX_PLATFORMS env var is not honored (an
'axon' TPU plugin overrides it), so we must use jax.config.update. The
XLA_FLAGS env var must still be set before jax initializes its backends.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (VERDICT r2 weak #7): anything not explicitly
    @pytest.mark.slow is `fast`, so `pytest -m fast` gives a <3-min loop
    on the 1-CPU host while `pytest tests/ -q` stays the full gate."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)
