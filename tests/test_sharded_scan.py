"""Sharded scan on the virtual 8-device CPU mesh: must agree with the
host DFA engine and the single-chip device scan."""

import numpy as np
import jax
import pytest

from sregex_tpu import parse, compile_regex
from sregex_tpu.dfa import build_dfa
from sregex_tpu.ops import dfa_device_tables, scan_bytes
from sregex_tpu.parallel import make_mesh, sharded_scan_bytes


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device (virtual) platform")
    return make_mesh()


@pytest.mark.parametrize("pattern,data", [
    ("(?:a|b)aa(?:aa|bb)cc(?:a|b)", b"abccc" * 2000 + b"aaabbccb"),
    ("xyz", b"abc" * 5000),
    ("needle", b"hay " * 3000 + b"needle" + b" hay" * 1000),
    (r"\bw\d+\b", b"a w12 b" * 997),
    ("^line", b"text\nline two\n" * 500),
])
def test_sharded_matches_single(pattern, data, mesh):
    ast, _ = parse(pattern)
    prog = compile_regex(ast)
    dfa = build_dfa(prog)
    tables = dfa_device_tables(dfa)
    s1, m1, r1 = scan_bytes(tables, data, chunk_len=256)
    s8, m8, r8 = sharded_scan_bytes(tables, data, mesh=mesh,
                                    chunk_len=256)
    assert (s1, m1, r1) == (s8, m8, r8), \
        "%r: single %r sharded %r" % (pattern, (s1, m1, r1),
                                      (s8, m8, r8))
