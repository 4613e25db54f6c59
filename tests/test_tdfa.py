"""Tagged-DFA engine vs the Pike VM (the conformance-verified oracle).

The full-corpus differential lives in tests/tdfa_diff.py (needs the
Perl oracle); this file pins the determinization quirks that fuzzing
found, runs a small deterministic fuzz, and checks the streaming
(chunked) carry against whole-buffer execution.
"""

import random

import pytest

from sregex_tpu.parser import parse, parse_multi, ParseError
from sregex_tpu.compiler import compile_regex
from sregex_tpu.pike_vm import PikeCtx
from sregex_tpu.tdfa import Tdfa, TdfaTooLarge, TdfaCtx, tdfa_find, \
    tdfa_finditer


def compile_any(re_val):
    if isinstance(re_val, list):
        ast, _ = parse_multi(re_val, [0] * len(re_val))
    else:
        ast, _ = parse(re_val, 0)
    return compile_regex(ast)


def bank_slice(prog, rid, bank):
    ofs = 0
    for i in range(rid):
        ofs += 2 * (prog.multi_ncaps[i] + 1)
    ns = 2 * (prog.multi_ncaps[rid] + 1)
    return list(bank[ofs:ofs + ns]) + [-1] * (prog.ovecsize - ns)


def pike_find_all(prog, data, limit=50):
    ctx = PikeCtx(prog)
    out = []
    pos = 0
    while len(out) < limit:
        rc, _ = ctx.exec(data[pos:], True)
        if rc < 0:
            break
        ov = [int(v) for v in ctx.ovector]
        out.append((rc, ov))
        if ov[1] >= len(data) and ov[0] == ov[1]:
            break
        pos = ov[1]
    return out


def tdfa_find_all(tdfa, prog, data, limit=50):
    out = []
    for rid, bank in tdfa_finditer(tdfa, data):
        out.append((rid, bank_slice(prog, rid, bank)))
        if len(out) >= limit:
            break
    return out


def assert_equal_streams(re_val, data):
    prog = compile_any(re_val)
    tdfa = Tdfa(prog, max_states=20000)
    assert pike_find_all(prog, data) == tdfa_find_all(tdfa, prog, data), \
        (re_val, data)


# -- regressions: the exact cases where the one-pass closure diverged --

def test_eager_match_beats_deferred_assert():
    # Pike's phase-A closure commits branch 3's match DURING step i;
    # the step-i+1 \b splice is dedup-blocked (tag-decrement trick)
    # from re-reaching MATCH, so the lower-priority eager match wins
    # (sre_vm_pike.c:506-528 + :889-899)
    assert_equal_streams(
        b'.\\b|(?:\\ +)[ba]|a([xac](||\\B\\w\\b(?:|ab[^x]{2}a{2}))+?\\v|)',
        b'0x a acc')


def test_rearm_carry_stale_after_multi_id_match():
    # last_matched_pos reads RAW slot 1 (sre_vm_pike.c:532,891): a
    # regex-id>0 match records -1, the seen_word recompute silently
    # skips, and the re-armed scan runs with a stale word context
    assert_equal_streams(
        [b'\\bb*',
         b'a*(?:(?:|(?:\\141{2}(|).{0,2}\\n|.{2}[x][x]{2,})(?:xb)?'
         b'\\b{0,2}).+?b||\\s\\ {2,})|\\w\\A+|'
         b'(\\ |.*|x{2,}[bxx]+a{2,}\\ {2})b\\z^'],
        b'0b0c\n__ __bc')


def test_capture_tag_through_rearm():
    assert_equal_streams(
        [b'b{2}?|(?:(?:[xc]$?.{0,2}|[a](?:)(?:[\\d-x]+\\n'
         b'(|c{1,3}?a{2}a\\ |x?a{2,}a){0,2}?\\ |(?:){1,3}\\{\\d{1,3}?'
         b'b{2}?)*?.)a.{1,3})(?:)((?:a{1,3}.{0,2}(?:(?:\\ c|bb)\\h*b*?)'
         b'c+?|$[a])(?:xa{2}.(?:.?\\d{0,2}|a(a{1,3}b|){2}(?:b|aa){0,2}'
         b'(?:a?x|c{1,3})|\\b{1,3}?(?:cx{2,}x\\ )a{1,3}?(?:x\\ ))?)|)*?'
         b'(c?a.|$){1,3}'],
        b'ccax_a \n__ x')


# -- basics ------------------------------------------------------------

@pytest.mark.parametrize("re_val,data", [
    (b"ab", b"xxabyy"),
    (b"a(b*)c", b"zzabbbczz"),
    (b"(a|b)+", b"xabba"),
    (b"^b", b"a\nb"),
    (b"a$", b"ba\nc"),
    (b"\\bword\\b", b"a word here"),
    (b"x\\B", b"xy x"),
    (b"\\Aab", b"abab"),
    (b"ab\\z", b"abab"),
    (b"a*", b"baa"),
    (b"(|x)*", b"xx"),
    ([b"foo", b"bar"], b"a bar foo"),
    ([b"a+", b"ab"], b"zab"),
])
def test_basic_agreement(re_val, data):
    assert_equal_streams(re_val, data)


def test_first_match_api():
    prog = compile_any(b"a(b+)c")
    tdfa = Tdfa(prog)
    r = tdfa_find(tdfa, b"xxabbbc")
    assert r is not None
    rid, bank = r
    assert rid == 0
    assert bank[:4] == [2, 7, 3, 6]
    assert tdfa_find(tdfa, b"xxx") is None


def test_chunked_equals_whole_buffer():
    cases = [
        (b"a(b*)c", b"zzabbbczz"),
        (b"^b", b"a\nb"),
        (b"\\bword\\b", b"a word here"),
        (b"a$", b"ba\nc"),
        (b"(x|y)+z", b"wxyxyz!"),
        ([b"foo", b"ba(r)"], b"xx bar yy"),
    ]
    for re_val, data in cases:
        prog = compile_any(re_val)
        tdfa = Tdfa(prog)
        whole = TdfaCtx(tdfa)
        rc_w, bank_w = whole.exec(data, True)
        # byte-at-a-time with interleaved empty non-EOF chunks (the
        # CLI "splitted" discipline, sre_cli.c:364-413)
        ctx = TdfaCtx(tdfa)
        rc = None
        for k in range(len(data)):
            rc, bank = ctx.exec(data[k:k + 1], False)
            if rc >= 0:
                break
            rc, bank = ctx.exec(b"", False)
            if rc >= 0:
                break
        else:
            rc, bank = ctx.exec(b"", True)
        assert rc == rc_w, (re_val, data)
        if rc >= 0:
            assert bank == bank_w, (re_val, data)


def test_mini_fuzz_vs_pike():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fuzz_differential import gen_alt, gen_subject
    rng = random.Random(424242)
    checked = 0
    for _ in range(120):
        nre = 1 if rng.random() < 0.7 else rng.randint(2, 3)
        regexes = [gen_alt(rng, 0).encode() for _ in range(nre)]
        s = gen_subject(rng)
        try:
            prog = compile_any(regexes if nre > 1 else regexes[0])
        except (ParseError, OverflowError, ValueError):
            continue
        if len(prog.insts) > 120:
            # keep the oracle (Python Pike x 50 finditer matches) fast;
            # big programs are covered by tests/tdfa_diff.py --fuzz
            continue
        try:
            tdfa = Tdfa(prog, max_states=20000)
            t = tdfa_find_all(tdfa, prog, s)
        except TdfaTooLarge:
            continue
        p = pike_find_all(prog, s)
        assert p == t, (regexes, s, p, t)
        checked += 1
    assert checked > 40
