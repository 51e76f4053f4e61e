"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding tests run against this virtual mesh, mirroring how the
driver validates the multi-chip path.  ``import pytest`` already imports jax
(via a site plugin), so env vars are too late — use jax.config, which takes
effect any time before backend initialization.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)


REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "src"))


def add_reference_to_path():
    import sys

    path = os.path.join(REFERENCE_ROOT, "src")
    if path not in sys.path:
        sys.path.insert(0, path)
