"""Test configuration: force an 8-device virtual CPU mesh.

Must run before jax is imported anywhere, so all sharding/multichip tests
exercise real Mesh/pjit paths without TPU hardware (the driver separately
dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
os.environ.setdefault("HF_HUB_OFFLINE", "1")        # zero-egress environment
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# A sitecustomize hook may have force-registered the TPU backend before this
# conftest ran; the config update re-pins tests to the virtual CPU devices.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def eight_device_mesh():
    import jax
    from jax.sharding import Mesh
    devices = np.array(jax.devices()[:8]).reshape(8)
    with Mesh(devices, ("data",)) as mesh:
        yield mesh


def make_sine(duration_s: float, sr: int = 16000, freq: float = 440.0,
              amp: float = 0.5) -> np.ndarray:
    t = np.arange(int(duration_s * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.fixture
def sine_wave():
    return make_sine
