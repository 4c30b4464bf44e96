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

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


# ---------------------------------------------------------------------------
# Two test tiers. The multi-minute equivalence soaks (R=2 gradient-sum
# exactness, 8-dev sharded full-size steps, multiscale mesh switches) are
# marked @pytest.mark.slow and SKIPPED by default; the quick tier takes
# ~18 min on this 1-core host (round-5 measurement — timing note kept in
# ONE place: CLAUDE.md). Run the full suite with --runslow or
# FSD_SLOW_TESTS=1 (~11 extra min).
# ---------------------------------------------------------------------------


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (multi-minute equivalence soaks)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute equivalence soak; skipped unless --runslow "
        "or FSD_SLOW_TESTS=1",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("FSD_SLOW_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow soak (quick tier): pass --runslow or FSD_SLOW_TESTS=1"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
