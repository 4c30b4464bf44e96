"""Test configuration: force an 8-device CPU JAX platform.

All unit tests run on CPU with 8 virtual devices so sharding/pjit paths are
exercised without TPU hardware (the reference had no multi-device tests at
all; see SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Force CPU even when the session env points at a TPU tunnel: the tunnel's
# sitecustomize registers its backend at interpreter startup and overrides
# the JAX_PLATFORMS env var, so the config API is the reliable switch.
# Unit tests must be fast, deterministic, and exercise the 8-device
# sharding path.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
