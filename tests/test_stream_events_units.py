"""Units under the streaming events engine: max_match_len (the
bounded-pattern teleport lookback) and the DFA sterile vector (the
unbounded-pattern teleport soundness bit)."""

import numpy as np
import pytest

from sregex_tpu import parse, compile_regex
from sregex_tpu.parser import parse_multi
from sregex_tpu.ast_nodes import max_match_len
from sregex_tpu.dfa import build_dfa


BOUNDED = [
    (rb"abc", 3),
    (rb"a|bcde", 4),
    (rb"[a-z]\d?", 2),
    (rb"a{3,7}", 7),
    (rb"(foo|ba?r)baz", 6),
    (rb"\bword\b", 4),          # assertions span 0 bytes
    (rb"\A(?:ab){2,5}", 10),
    (rb"x", 1),
    (rb"", 0),
    (rb"a{0,499}", 499),        # at the cquant bound (<500)
]

UNBOUNDED = [rb"a*", rb"a+b", rb"ab.*c", rb"a{3,}", rb"(?:xy)+",
             rb"a|b*"]


@pytest.mark.parametrize("pat,expect", BOUNDED,
                         ids=[repr(p) for p, _ in BOUNDED])
def test_max_match_len_bounded(pat, expect):
    ast, _ = parse(pat)
    assert max_match_len(ast.right) == expect


@pytest.mark.parametrize("pat", UNBOUNDED, ids=repr)
def test_max_match_len_unbounded(pat):
    ast, _ = parse(pat)
    assert max_match_len(ast.right) is None


def test_max_match_len_multi():
    ast, _ = parse_multi([rb"short", rb"a{2,9}x"])
    assert max_match_len(ast.right) == 10
    ast, _ = parse_multi([rb"bounded", rb"un*bounded"])
    assert max_match_len(ast.right) is None


def test_max_match_len_deep_desugared_chain():
    # counted reps desugar into thousands-deep CAT/QUEST nests; the
    # walker must be iterative
    ast, _ = parse(rb"a{1,499}")
    assert max_match_len(ast.right) == 499


def _dfa(pat):
    ast, _ = parse(pat)
    return build_dfa(compile_regex(ast), max_states=65536)


def _states_on(dfa, data, state=0):
    out = [state]
    for b in data:
        state = int(dfa.trans[state, dfa.class_map[b]])
        out.append(state)
    return out


def test_sterile_tracks_thread_progress():
    dfa = _dfa(rb"ab{2}c")
    assert dfa.sterile is not None
    sts = _states_on(dfa, b"xxabbxx")
    # boundaries with no partial match in progress
    assert dfa.sterile[sts[0]] and dfa.sterile[sts[1]] \
        and dfa.sterile[sts[2]]
    # after 'a', 'ab', 'abb': a thread is mid-pattern
    assert not dfa.sterile[sts[3]]
    assert not dfa.sterile[sts[4]]
    assert not dfa.sterile[sts[5]]
    # the b-run broke (x): progress died
    assert dfa.sterile[sts[6]] and dfa.sterile[sts[7]]


def test_sterile_survives_minimization_conservatively():
    # (?:ab)*c: after "ab" the loop returns to its entry, so the
    # state can be BEHAVIORALLY identical to fresh (fires the same in
    # every continuation) while holding a progress thread whose
    # chosen-match start differs.  Sterility must say False there.
    dfa = _dfa(rb"(?:ab)*c")
    sts = _states_on(dfa, b"ab")
    assert not dfa.sterile[sts[2]], \
        "loop-back state wrongly marked sterile"
    dfa2 = _dfa(rb"(?:ab|b)")
    sts2 = _states_on(dfa2, b"a")
    assert not dfa2.sterile[sts2[1]]


def test_sterile_start_and_unbounded_tail():
    dfa = _dfa(rb"ERROR[^\n]*")
    sts = _states_on(dfa, b"ok line\nERRORtail\nok")
    assert dfa.sterile[sts[3]]           # mid "ok line"
    i = len(b"ok line\nERROR")
    for j in range(i, len(b"ok line\nERRORtail")):
        assert not dfa.sterile[sts[j]]   # inside the [^\n]* tail
    assert dfa.sterile[sts[len(b'ok line\nERRORtail\n')]]


def test_sterile_roundtrips_serialize(tmp_path):
    import io
    from sregex_tpu.serialize import save_compiled, load_compiled
    from sregex_tpu.stream import Scanner
    ast, _ = parse(rb"ab{2}c")
    prog = compile_regex(ast)
    sc = Scanner(prog, ast=ast)
    buf = io.BytesIO()
    save_compiled(buf, sc)
    buf.seek(0)
    sc2 = load_compiled(buf)
    assert sc2.dfa.sterile is not None
    assert np.array_equal(sc2.dfa.sterile, sc.dfa.sterile)
