"""G=8 layout coverage on the CPU mesh: the production default since
round 4 (conftest pins G=4 for interpret speed, so this module runs
ONE exactness pass at G=8 in a subprocess with the production
default)."""

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["SREGEX_GROUPS"] = "8"
os.environ["SREGEX_TIER_AB"] = "0"
import jax
jax.config.update("jax_platforms", "cpu")
import random
from sregex_tpu.ops.pallas_scan import GROUPS
assert GROUPS == 8, GROUPS
from sregex_tpu.stream import compile_pattern
rng = random.Random(4)
sc = compile_pattern("(?:a|b)aa(?:aa|bb)cc(?:a|b)")
sc.use_device = True
sc.__init__(sc.program, use_device=True, ast=sc.ast)
sc.DEVICE_THRESHOLD = 1 << 12
data = bytearray(rng.choice(b"abc ") for _ in range(300_000))
data[7000:7008] = b"baaaaccb"
data = bytes(data)
host = compile_pattern("(?:a|b)aa(?:aa|bb)cc(?:a|b)")
assert sc.count(data) == host.count(data)
assert sc.scan(data) == host.scan(data)
assert sc.stats().tier.startswith("SpecTables"), sc.stats().tier
print("G8_OK")
"""


def test_g8_layout_exact():
    r = subprocess.run([sys.executable, "-c", _SCRIPT],
                       capture_output=True, text=True, timeout=560,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert "G8_OK" in r.stdout, (r.stdout[-2000:], r.stderr[-2000:])
