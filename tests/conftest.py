"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a simulated mesh
(``xla_force_host_platform_device_count``), the standard JAX fake-backend
trick (SURVEY.md §4). Must run before jax is imported anywhere.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the box exports axon; tests run on CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The machine's sitecustomize imports jax at interpreter startup (axon PJRT
# registration), which freezes JAX_PLATFORMS=axon into jax's config before
# this file runs — override the live config, not just the env var. This also
# keeps concurrent test processes from serializing on the single TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


def add_reference_to_path():
    """Expose the PyTorch reference (read-only) as a golden oracle."""
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
