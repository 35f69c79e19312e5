"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
code paths (padne_tpu.parallel) are exercised without TPU hardware, and
with 64-bit floats enabled (the solver's verification dtype).
Must be set before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import pathlib
import sys

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture(scope="session")
def boards_dir(tmp_path_factory):
    """Directory of generated KiCad fixture boards."""
    from tests import boardgen

    out = tmp_path_factory.mktemp("boards")
    boardgen.generate_all(out)
    return out
