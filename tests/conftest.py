"""Test config: force an 8-device CPU platform BEFORE jax initializes.

This is the TPU analog of the reference's cpu/cuda device fixture
(d_nerf/torchsearchsorted/test/conftest.py): the same suite that exercises
multi-chip sharding on real TPUs runs here on a simulated 8-device host mesh.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The image's sitecustomize may have pre-registered a remote TPU backend at
# interpreter start (which would silently route every test's compile through
# a single-TPU tunnel). Force the host-CPU platform; with the XLA_FLAGS
# above this yields the 8-device simulated mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest



@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
