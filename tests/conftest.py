"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""
import os

# Force CPU: the environment registers a TPU PJRT plugin at interpreter start
# and pins jax_platforms, so the env var alone is not enough — override via
# jax.config before any jax use. The test suite must run on a deterministic
# f32 8-device host mesh (bench.py is the TPU entry point).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


REFERENCE_DIR = "/root/reference"


def has_reference():
    return os.path.isdir(REFERENCE_DIR)


def stub_torchvision():
    """The reference module chain imports torchvision (absent here); install
    a minimal stub so reference modules import."""
    import sys
    import types

    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_resnet = types.ModuleType("torchvision.models.resnet")

    class _Fake:
        pass

    tv_resnet.ResNet = type("ResNet", (),
                            {"__init__": lambda self, *a, **k: None})
    tv_resnet.BasicBlock = _Fake
    tv_resnet.Bottleneck = _Fake
    tv_models.resnet = tv_resnet
    tv.models = tv_models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models
    sys.modules["torchvision.models.resnet"] = tv_resnet
