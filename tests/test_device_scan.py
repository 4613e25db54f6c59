"""Device DFA scan vs host DFA engine: randomized differential tests
on the virtual CPU mesh (conftest forces JAX_PLATFORMS=cpu with 8
virtual devices)."""

import random

import numpy as np
import pytest

from sregex_tpu import parse, parse_multi, compile_regex
from sregex_tpu.consts import SRE_OK, SRE_DECLINED
from sregex_tpu.dfa import build_dfa
from sregex_tpu.ops import dfa_device_tables, scan_bytes

PATTERNS = [
    "abc",
    "a|ab",
    "(?:a|b)aa(?:aa|bb)cc(?:a|b)",
    "a*b+c?",
    "[a-f]{2,5}x",
    "^start",
    "end$",
    r"\bword\b",
    r"\d+\.\d+",
    "(foo|bar|baz)+qux",
    r"\Aabs",
    r"tail\z",
    "x",
    "a.c",
]


def host_scan(dfa, data):
    """Whole-buffer host DFA result: (rc, first_match_end or -1)."""
    ctx = dfa.create_ctx()
    # replicate DfaCtx.exec but record the match boundary
    cmap = dfa.class_map
    s = 0
    arr = np.frombuffer(data, dtype=np.uint8)
    cls = cmap[arr] if len(arr) else []
    for i, c in enumerate(cls):
        if dfa.match[s, c]:
            return SRE_OK, i
        s = dfa.trans[s, c]
    if dfa.match_eof[s]:
        return SRE_OK, len(data)
    return SRE_DECLINED, -1


def rand_text(rng, n, alphabet):
    return bytes(rng.choice(alphabet) for _ in range(n))


@pytest.mark.parametrize("pattern", PATTERNS)
def test_device_scan_matches_host(pattern):
    ast, _ = parse(pattern)
    prog = compile_regex(ast)
    dfa = build_dfa(prog)
    tables = dfa_device_tables(dfa)
    rng = random.Random(hash(pattern) & 0xFFFF)
    alphabet = b"abcdefx.01 \nwordstalz"
    for trial in range(8):
        n = rng.choice([0, 1, 5, 63, 64, 65, 200, 1000])
        data = rand_text(rng, n, alphabet)
        if trial == 3:
            # plant a likely match
            data = data[: n // 2] + b"abcaaabbccab wordx 1.5" + data[n // 2:]
        rc_h, end_h = host_scan(dfa, data)
        state, first, _rid = scan_bytes(tables, data, chunk_len=64)
        if first >= 0:
            rc_d, end_d = SRE_OK, first
        elif len(data) == 0:
            ok_eof = bool(np.asarray(tables["match_eof"])[0])
            rc_d, end_d = (SRE_OK, 0) if ok_eof else (SRE_DECLINED, -1)
        else:
            ok_eof = bool(np.asarray(tables["match_eof"])[state])
            rc_d, end_d = ((SRE_OK, len(data)) if ok_eof
                           else (SRE_DECLINED, -1))
        assert (rc_h, end_h) == (rc_d, end_d), \
            "%r on %r: host %r device %r" % (
                pattern, data[:50], (rc_h, end_h), (rc_d, end_d))


def test_multi_pattern_scan():
    ast, _ = parse_multi([b"abcd", b"bc"])
    prog = compile_regex(ast)
    dfa = build_dfa(prog)
    tables = dfa_device_tables(dfa)
    _, first, rid = scan_bytes(tables, b"zzabcdzz", chunk_len=4)
    # earliest match end: "bc" ends at boundary 6? abcd ends at 6 too;
    # host oracle decides
    rc_h, end_h = host_scan(dfa, b"zzabcdzz")
    assert rc_h == SRE_OK and first == end_h
    # both end at 6; the lower id (priority winner) must be reported
    assert rid == dfa.id_at(  # noqa: the host oracle for the id
        _state_at(dfa, b"zzabcdzz", first), b"zzabcdzz"[first])


def _state_at(dfa, data, boundary):
    s = 0
    for b in data[:boundary]:
        s = dfa.trans[s, dfa.class_map[b]]
    return int(s)


def test_multi_pattern_scan_ids():
    """Device fid plane vs the host match_id tables on random text."""
    pats = [b"abcd", b"bc", b"zza", b"q+x"]
    ast, _ = parse_multi(pats)
    prog = compile_regex(ast)
    dfa = build_dfa(prog)
    tables = dfa_device_tables(dfa)
    rng = random.Random(11)
    for _ in range(6):
        data = rand_text(rng, rng.choice([37, 64, 129, 400]),
                         b"abcdqxz ")
        _, first, rid = scan_bytes(tables, data, chunk_len=32)
        rc_h, end_h = host_scan(dfa, data)
        if end_h < 0 or end_h == len(data):
            assert first == -1
            continue
        assert first == end_h
        exp = dfa.id_at(_state_at(dfa, data, first), data[first])
        assert rid == exp, (data, first, rid, exp)


def test_core_sweep_smoke():
    """Bounded run of the conformance-pattern device-tier sweep
    (tests/core_sweep.py): real suite patterns through the production
    tier dispatch, count/scan/find vs the host oracles.  The full
    sweep (450 patterns) runs standalone; this smoke keeps the
    dispatch stack pinned in CI."""
    from core_sweep import run
    ran, fails = run(limit=12, seed=3, verbose=False)
    assert not fails, fails[:3]
    assert ran >= 10
