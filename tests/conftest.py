"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Device-kernel tests must work without TPU hardware; multi-chip sharding is
validated on virtual CPU devices (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).
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

import pytest  # noqa: E402

TOY_DIR = "/root/reference/toy_ex"


@pytest.fixture(scope="session")
def toy_dir():
    return TOY_DIR
