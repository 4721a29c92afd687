"""Test env: host CPU with 8 virtual devices so sharding tests exercise a
real (virtual) mesh without TPUs — replaces the reference's absent
multi-device testing (SURVEY.md §4)."""

import os

# The container's sitecustomize force-registers the TPU backend and sets
# JAX_PLATFORMS; the env var alone is not enough — override via jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Parity tests compare against torch float32; keep matmuls full precision.
jax.config.update("jax_default_matmul_precision", "highest")

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_PT = Path("/root/reference/video_features_pytorch")


def _reference_available() -> bool:
    return REFERENCE_PT.is_dir()


@pytest.fixture(scope="session")
def reference_pt_path():
    """Path to the reference PyTorch half; tests that do golden-parity checks
    against the reference import its modules from here (read-only)."""
    if not _reference_available():
        pytest.skip("reference repo not mounted")
    if str(REFERENCE_PT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_PT))
    return REFERENCE_PT
