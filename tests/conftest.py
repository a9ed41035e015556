"""Test config: force an 8-device virtual CPU platform so sharding tests run
without TPU hardware, and keep numerics in fp32 for parity checks."""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (TPU), whose
# default f32 matmul precision is bf16-based and breaks 1e-4 parity bounds.
# jax is already imported by the host sitecustomize, so the env var alone is
# too late — update the live config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax reads XLA_FLAGS instead

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
REFERENCE = pathlib.Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE / "wav2vec2" / "model.py").exists()


@pytest.fixture(scope="session")
def reference_module():
    """Import the reference torch implementation as a golden oracle (the
    reference repo is mounted read-only; skip parity tests if absent)."""
    if not reference_available():
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, str(REFERENCE))
    try:
        import wav2vec2.model as ref_model  # noqa: F401

        yield ref_model
    finally:
        sys.path.remove(str(REFERENCE))
