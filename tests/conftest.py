"""Test environment: force CPU backend with 8 virtual devices.

Must run before jax initializes — pytest imports conftest before test
modules, and no package module imports jax at import time of this file's
os.environ mutation.
"""

import os

# The image's sitecustomize registers a remote-TPU ("axon") backend and the
# environment pins JAX_PLATFORMS=axon, so a plain setdefault is not enough:
# force-override, and also update the live config in case jax is already
# imported (backends initialize lazily, so this wins as long as no op ran).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_root(tmp_path_factory):
    """A synthetic KITTI-format mini dataset (sequence 08, 14 scans)."""
    from insmos_tpu.data.synthetic import write_synthetic_sequence

    root = tmp_path_factory.mktemp("kitti")
    write_synthetic_sequence(str(root), seq=8, n_scans=14, seed=0)
    return str(root)


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
