"""Multi-pattern regex IDs: which pattern matched.

Semantics under test (documented in docs/API.md):

  - Scanner.scan() / StreamScanner.matched_regex / scan_bytes /
    sharded_scan_bytes report the EARLIEST match-end boundary and the
    LOWEST regex id with a match ending there (the boolean-engine
    layer; the reference's Thompson engines report no id at all, so
    this is parity-plus).  The DFA's per-(state,class) match_id table
    encodes it (dfa.py _closure).
  - Scanner.find() reports full Pike leftmost-first (id, captures) —
    byte-exact to the reference (sre_vm_pike.c:607-658) — which may
    differ when an earlier-STARTING match of a higher id ends later.

Oracle: per-pattern single-regex DFAs — the lowest id whose own DFA
fires at the earliest boundary any of them fires."""

import random

import numpy as np
import jax
import pytest

from sregex_tpu import parse, parse_multi, compile_regex
from sregex_tpu.dfa import build_dfa, LazyDfa
from sregex_tpu.native import NativeDfa
from sregex_tpu.stream import Scanner, StreamScanner, compile_pattern
from sregex_tpu.consts import SRE_OK

PATTERN_SETS = [
    [b"abcd", b"bc", b"zz"],
    [b"a+b", b"ab+", b"ba"],
    [br"\bw\d+", b"w1", b"x"],
    [b"cat", b"dog", b"bird", b"fish"],
    [b"^line", b"ine", b"li"],
]

ALPHABET = b"abcdwzx 019\nlinecatdogbirdfish"


def oracle_scan(patterns, data):
    """(lowest id firing at the earliest end boundary, boundary) or
    None, via per-pattern DFAs (independent single-regex automata)."""
    best = None
    for i, p in enumerate(patterns):
        ast, _ = parse(p)
        nd = NativeDfa(build_dfa(compile_regex(ast)))
        first, st = nd.scan_first(data, 0)
        end = first if first >= 0 else (
            len(data) if nd.match_eof[st] else -1)
        if end >= 0 and (best is None or end < best[1]):
            best = (i, end)
    return best


@pytest.mark.parametrize("patterns", PATTERN_SETS)
def test_scanner_scan_ids(patterns):
    sc = compile_pattern(list(patterns))
    rng = random.Random(sum(map(len, patterns)))
    for trial in range(8):
        n = rng.choice([0, 3, 40, 200])
        data = bytes(rng.choice(ALPHABET) for _ in range(n))
        if trial % 3 == 0 and patterns:
            pick = patterns[rng.randrange(len(patterns))]
            if b"^" not in pick and br"\b" not in pick:
                mid = n // 2
                data = data[:mid] + pick + data[mid:]
        exp = oracle_scan(patterns, data)
        got = sc.scan(data)
        assert got == exp, (patterns, data, got, exp)


@pytest.mark.parametrize("patterns", PATTERN_SETS[:3])
def test_stream_scanner_ids(patterns):
    ast, _ = parse_multi(list(patterns))
    dfa = build_dfa(compile_regex(ast))
    rng = random.Random(7)
    for _ in range(6):
        n = rng.choice([10, 64, 300])
        data = bytes(rng.choice(ALPHABET) for _ in range(n))
        exp = oracle_scan(patterns, data)
        ss = StreamScanner(dfa)
        # feed in ragged chunks
        rc, end = None, -1
        pos = 0
        while pos < len(data):
            step = rng.choice([1, 3, 17, len(data)])
            rc, end = ss.exec(data[pos:pos + step],
                              eof=pos + step >= len(data))
            pos += step
            if rc == SRE_OK:
                break
        if not len(data):
            rc, end = ss.exec(b"", eof=True)
        if exp is None:
            assert rc != SRE_OK
        else:
            assert rc == SRE_OK and (ss.matched_regex, end) == exp, \
                (patterns, data, end, ss.matched_regex, exp)


def test_lazy_dfa_ids():
    patterns = [b"abcd", b"bc", b"zz"]
    ast, _ = parse_multi(list(patterns))
    prog = compile_regex(ast)
    lazy = LazyDfa(prog)
    data = b"xxbcxx"
    first, st = lazy.scan_first(data, 0)
    assert first == 4  # 'bc' consumed, match flagged at boundary 4
    assert lazy.id_at(st, data[first]) == 1


def test_scan_vs_find_divergence_documented():
    """scan() = earliest END + lowest id; find() = Pike leftmost-first.
    [b, ab] on 'ab': both end at EOF; scan reports id 0 (lowest),
    find reports id 1 ('ab' starts earlier — leftmost wins)."""
    sc = compile_pattern([b"b", b"ab"])
    assert sc.scan(b"ab") == (0, 2)
    rid, ov = sc.find(b"ab")
    assert rid == 1 and ov[:2] == [0, 2]


def test_single_regex_ids_are_zero():
    sc = compile_pattern(b"needle")
    assert sc.scan(b"hay needle hay") == (0, 10)
    ast, _ = parse(b"needle")
    dfa = build_dfa(compile_regex(ast))
    ss = StreamScanner(dfa)
    rc, end = ss.exec(b"hay needle hay", eof=True)
    assert rc == SRE_OK and ss.matched_regex == 0


def test_sharded_scan_ids():
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device (virtual) platform")
    from sregex_tpu.ops import dfa_device_tables
    from sregex_tpu.parallel import make_mesh, sharded_scan_bytes
    patterns = [b"abcd", b"bc", b"zz"]
    ast, _ = parse_multi(list(patterns))
    dfa = build_dfa(compile_regex(ast))
    tables = dfa_device_tables(dfa)
    mesh = make_mesh()
    rng = random.Random(3)
    for _ in range(4):
        data = bytes(rng.choice(b"abcdz x") for _ in range(600))
        s, end, rid = sharded_scan_bytes(tables, data, mesh=mesh,
                                         chunk_len=64)
        exp = oracle_scan(patterns, data)
        if exp is None or exp[1] == len(data):
            assert end == -1
            if exp is not None:   # EOF match: the id rides match_eof_id
                assert int(np.asarray(
                    tables["match_eof_id"])[s]) == exp[0]
        else:
            assert (rid, end) == exp, (data, rid, end, exp)
