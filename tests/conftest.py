"""Test configuration: force an 8-virtual-device CPU platform before JAX
import so multi-chip sharding paths are exercised without TPU hardware
(mirrors the reference's LocalNetwork single-machine test strategy,
/root/reference/mpc-net/src/local.rs + SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: driver env pins the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize force-selects the TPU backend via
# jax.config.update("jax_platforms", "axon,cpu"), which overrides the env
# var above — override it back so tests run on the virtual-8-device CPU.
jax.config.update("jax_platforms", "cpu")
# The persistent compile cache is DISABLED for the suite by default: the
# serialization write path (compilation_cache.put_executable_and_time ->
# zstandard compress) segfaults reproducibly ~60 tests into a full-suite
# run (same test, same stack, fresh cache dir; passes in isolation), i.e.
# it depends on accumulated in-process XLA state. Opt back in with
# COSNARKS_TEST_CACHE=1 for single-module iteration where it is safe and
# saves recompiles.
if os.environ.get("COSNARKS_TEST_CACHE"):
    # own cache dir: sharing one with concurrently-running TPU processes
    # can deadlock reads when another process is mid-write (seen as
    # indefinite hangs inside pjit cache_miss during full-suite runs)
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/cosnarks_jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import random

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running tier (full KAT corpora, large proofs); "
        "enabled with --runslow or COSNARKS_SLOW=1")


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run slow-marked tests")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("COSNARKS_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: use --runslow or "
                                   "COSNARKS_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return random.Random(0xC05)


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_executables_per_module():
    """Release each module's compiled executables when it finishes.

    A full-suite run accumulates every jitted program of ~250 tests in
    one process; on hosts with the default vm.max_map_count (65530) the
    mapping count eventually exhausts and XLA aborts/segfaults mid-
    compile (seen deterministically ~60 tests in). Modules share almost
    no jit cache entries, so per-module teardown costs nothing."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
