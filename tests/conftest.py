"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
paths (shard_map over a Mesh) are exercised without TPU hardware.  Must be
set before jax is imported anywhere.
"""

import os

# force CPU: this machine's sitecustomize registers a tunneled TPU backend
# ("axon") and overrides JAX_PLATFORMS, so setting the env var is not enough —
# update the config directly before any backend is initialized.
# Exception: MIXLAB_TPU_GOLDEN=1 keeps the real backend so the opt-in
# golden-fixture test (test_tpu_golden.py) runs on the chip as documented.
_TPU_GOLDEN = bool(os.environ.get("MIXLAB_TPU_GOLDEN"))
if not _TPU_GOLDEN:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _TPU_GOLDEN:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def fixtures_dir():
    import pathlib

    d = pathlib.Path("/root/reference/fixtures")
    if not d.exists():
        pytest.skip("reference fixtures not available")
    return d


def load_f32_raw(path) -> np.ndarray:
    return np.fromfile(path, dtype="<f4")
