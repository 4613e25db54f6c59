import os
import sys

# JAX tests run on a virtual 8-device CPU mesh so multi-chip sharding
# is exercised without TPU hardware (the driver separately dry-runs the
# multichip path).  Must be set before jax is imported.
# (hard override: the environment may pre-register a TPU plugin via
# sitecustomize and pre-import jax, so env vars alone are not enough;
# tests must be hermetic on the virtual CPU mesh.  Set
# SREGEX_TEST_TPU=1 to run tests on real hardware instead.)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
if os.environ.get("SREGEX_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

# Interpret-mode kernels trace ~2x slower at the production G=8
# default; the layout/fold logic is G-parametric, so the CPU mesh
# tests pin G=4 for speed (hardware smoke/bench run the production
# default; test_groups8.py covers the G=8 layout on the CPU mesh).
if os.environ.get("SREGEX_TEST_TPU") != "1":
    os.environ.setdefault("SREGEX_GROUPS", "4")

# The mid-band core-vs-wide first-scan A/B (stream._maybe_tier_ab)
# picks a tier from interpret-mode TIMINGS here, which would make
# tier assertions nondeterministic suite-wide; pin it off, except for
# the dedicated test (test_tier_ab.py re-enables it) and the hardware
# smoke suite (production config).
os.environ.setdefault("SREGEX_TIER_AB", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import shutil

import pytest


@pytest.fixture(autouse=True, scope="module")
def _release_jax_executables():
    """Free compiled XLA:CPU executables between test modules.

    The full suite compiles hundreds of Pallas/XLA programs in one
    process; the accumulated JIT code eventually crashes a LATER
    compile inside LLVM (observed deterministically as SIGSEGV/
    SIGABRT in backend_compile_and_load at ~450 tests, while every
    half-suite subset passes).  Dropping the jit caches at module
    boundaries keeps the resident executable count bounded; within a
    module everything stays cached."""
    yield
    import gc
    import jax
    jax.clear_caches()
    gc.collect()


def _have_perl():
    return shutil.which("perl") is not None


@pytest.fixture(scope="session")
def perl_oracle():
    if not _have_perl():
        pytest.skip("perl not available for oracle")
    from tblocks import PerlOracle
    o = PerlOracle()
    yield o
    o.close()
