"""Piecewise-affine tier (ops/pallas_affine.py) vs the native oracle
(interpret mode on the CPU mesh)."""

import random

import numpy as np
import pytest

from sregex_tpu import parse, compile_regex
from sregex_tpu.dfa import build_dfa
from sregex_tpu.native import NativeDfa
from sregex_tpu.ops.pallas_affine import (SpecTablesAffine,
                                          detect_pieces)
from sregex_tpu.ops.pallas_scan import (spec_scan_bytes,
                                        spec_count_bytes,
                                        spec_scan_last_bytes)

CASES = [
    # (pattern, alphabet, plant)
    (rb"a{400,499}b", b"ab x", b"x" + b"a" * 450 + b"b"),
    (rb"[a-c]{450}x", b"abcx ", b"." + b"abc" * 150 + b"x"),
    (rb"a{499}b{499}c{499}", b"abc",
     b"a" * 499 + b"b" * 499 + b"c" * 499),
    (rb"\dA{300,400}z", b"7Az x", b"3" + b"A" * 350 + b"z"),
]


def _machine(pat):
    ast, _ = parse(pat)
    dfa = build_dfa(compile_regex(ast), max_states=65536)
    return dfa


@pytest.mark.parametrize("pat,alpha,plant", CASES,
                         ids=[repr(p) for p, _, _ in CASES])
def test_affine_exact(pat, alpha, plant):
    dfa = _machine(pat)
    t = SpecTablesAffine(dfa)
    assert t.pieces <= 8
    native = NativeDfa(dfa)
    rng = random.Random(hash(pat) & 0xFFFF)
    for trial in range(3):
        n = rng.choice([60_000, 300_000, 2049])
        data = bytearray(rng.choice(alpha) for _ in range(n))
        if trial != 1:
            at = rng.randrange(0, max(1, n - len(plant) - 1))
            data[at:at + len(plant)] = plant
        data = bytes(data)
        exp_c, exp_st = native.count(data, 0)
        st, c = spec_count_bytes(t, data, chunk_len=512)
        assert (c, st) == (exp_c, exp_st), (pat, trial)
        exp_f, exp_st = native.scan_first(data, 0)
        st, f = spec_scan_bytes(t, data, chunk_len=512)
        assert (f, st) == (exp_f, exp_st), (pat, trial)
        exp_l, exp_st = native.scan_last(data, 0)
        st, l = spec_scan_last_bytes(t, data, chunk_len=512)
        assert (l, st) == (exp_l, exp_st), (pat, trial)


def test_detect_pieces_exactness_and_decline():
    dfa = _machine(rb"a{400,499}b")
    bounds, mode, val, match = detect_pieces(dfa)
    assert len(bounds) <= 4
    # a branching (non-chain) machine declines the tight piece cap
    dfa2 = _machine(rb"(x|y|z[QW]){1,5}(longish|loquatious)")
    with pytest.raises(ValueError):
        SpecTablesAffine(dfa2, max_pieces=6)


def test_scanner_routes_counted_rep_to_affine():
    from sregex_tpu.stream import Scanner
    pat = rb"a{60,120}b"
    ast, _ = parse(pat)
    prog = compile_regex(ast)
    sc = Scanner(prog, use_device=True, ast=ast)
    from sregex_tpu.ops.pallas_affine import SpecTablesAffine as A
    assert isinstance(sc._spec, A), type(sc._spec)
    sc.DEVICE_THRESHOLD = 1 << 12
    rng = random.Random(3)
    data = bytearray(rng.choice(b"aab x") for _ in range(200_000))
    data[1000:1082] = b"x" + b"a" * 80 + b"b"
    data = bytes(data)
    exp_c, exp_st = sc._native.count(data, 0)
    exp = exp_c + int(sc.dfa.match_eof[exp_st])
    assert sc.count(data) == exp
    assert sc.stats().tier == "SpecTablesAffine"


def test_affine_warmup_escalation_window():
    """with_warmup must work on the affine tier (bounded-history
    chains are exactly its machines)."""
    from sregex_tpu.ops.pallas_scan import with_warmup
    dfa = _machine(rb"a{400,499}b")
    t = SpecTablesAffine(dfa)
    t2 = with_warmup(t, 512)
    assert t2 is not None and t2.warmup == 512
    native = NativeDfa(dfa)
    rng = random.Random(9)
    # long a-runs: the default 32-byte window cannot converge, W=512
    # covers the bound
    data = bytearray()
    while len(data) < 150_000:
        data += b"a" * rng.randrange(300, 520) + b"b"
    data = bytes(data[:150_000])
    exp_c, exp_st = native.count(data, 0)
    st, c = spec_count_bytes(t2, data, chunk_len=1024)
    assert (c, st) == (exp_c, exp_st)
    nat, C = t2.last_repair
    assert nat <= max(2, C // 16), (nat, C)
