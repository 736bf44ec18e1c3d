"""Test configuration: force a virtual 8-device CPU mesh.

Must run before jax is imported anywhere. Real-TPU behavior is exercised by
bench.py and the driver's compile checks, not the unit suite.
"""

import os

# The image pre-sets JAX_PLATFORMS=axon (real TPU via tunnel) and registers
# the plugin from sitecustomize, so we must override explicitly — both the
# env var and the already-latched config value.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_WAVS = "/root/reference/example_files"


@pytest.fixture(scope="session")
def example_wav():
    return os.path.join(REFERENCE_WAVS, "u0013002.wav")


@pytest.fixture(scope="session")
def example_wavs():
    import glob

    return sorted(glob.glob(os.path.join(REFERENCE_WAVS, "*.wav")))
