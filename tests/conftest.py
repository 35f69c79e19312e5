"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
code paths (padne_tpu.parallel) are exercised without TPU hardware, and
with 64-bit floats enabled (the solver's verification dtype).

Note: this environment's sitecustomize registers the axon TPU plugin and
hard-sets ``jax_platforms``; overriding the env var is not enough — the
config must be updated after importing jax, before any backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "1")
# Arm the runtime contract checker for the WHOLE suite (the reference
# arms typeguard over the package for every test, pyproject.toml:78-79).
os.environ["PADNE_TPU_CHECKS"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib  # noqa: E402
import sys  # noqa: E402

import pytest  # noqa: E402

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture(scope="session")
def boards_dir(tmp_path_factory):
    """Directory of generated KiCad fixture boards."""
    from tests import boardgen

    out = tmp_path_factory.mktemp("boards")
    boardgen.generate_all(out)
    return out
