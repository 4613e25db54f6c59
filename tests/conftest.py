import os
import sys

# JAX tests run on a virtual 8-device CPU mesh so multi-chip sharding
# is exercised without TPU hardware (the driver separately dry-runs the
# multichip path).  Must be set before jax is imported.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import shutil

import pytest


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
