"""Standalone Pike/Thompson VM unit tests: streaming protocol
(SRE_AGAIN carry, pending/temp captures, re-arm), chunking invariance,
and spans vs Python re.  Reference-checkout independent."""

import re as pyre

import pytest

from sregex_tpu import parse, parse_multi, compile_regex
from sregex_tpu.consts import SRE_OK, SRE_AGAIN, SRE_DECLINED, SRE_ERROR
from sregex_tpu.pike_vm import PikeCtx
from sregex_tpu.thompson_vm import ThompsonCtx


def pike_whole(pattern, data, flags=0):
    ast, ncaps = parse(pattern, flags)
    prog = compile_regex(ast)
    ctx = PikeCtx(prog, [-1] * (2 * (ncaps + 1)))
    rc, _ = ctx.exec(data, True)
    return rc, list(ctx.ovector)


@pytest.mark.parametrize("pattern,data", [
    (r"(\w+)@(\w+)", b"mail me a@b ok"),
    (r"a(b|c)*d", b"xxabcbcd"),
    (r"(a+)(b+)?", b"zaab"),
    (r"x|y", b"zzy"),
])
def test_spans_vs_python_re(pattern, data):
    rc, ov = pike_whole(pattern, data)
    m = pyre.search(pattern.encode(), data)
    assert (rc >= 0) == (m is not None)
    if m:
        pairs = []
        for i in range((len(ov)) // 2):
            pairs.append((ov[2 * i], ov[2 * i + 1]))
        exp = [(m.start(i), m.end(i)) if m.start(i) >= 0 else (-1, -1)
               for i in range(m.re.groups + 1)]
        assert pairs[:len(exp)] == exp


def test_chunked_equals_whole():
    ast, ncaps = parse(r"b.+?a")
    prog = compile_regex(ast)
    data = b"xxbhaaaca"
    rc_w, ov_w = None, None
    ctx = PikeCtx(prog, [-1] * (2 * (ncaps + 1)))
    rc_w, _ = ctx.exec(data, True)
    ov_w = list(ctx.ovector)
    for size in (1, 2, 4):
        ctx = PikeCtx(prog, [-1] * (2 * (ncaps + 1)))
        rc = SRE_AGAIN
        for i in range(0, len(data), size):
            last = i + size >= len(data)
            rc, _ = ctx.exec(data[i:i + size], last)
            if rc != SRE_AGAIN:
                break
        assert rc == rc_w and list(ctx.ovector) == ov_w


def test_temp_captures_tell_buffering_bound():
    # conservative $0 span over live threads after AGAIN
    ast, ncaps = parse(r"ab+c")
    prog = compile_regex(ast)
    ctx = PikeCtx(prog, [-1] * (2 * (ncaps + 1)))
    rc, _ = ctx.exec(b"zzabb", False)
    assert rc == SRE_AGAIN
    # a potential match is in flight starting at offset 2
    assert ctx.ovector[0] == 2 and ctx.ovector[1] == -1


def test_pending_match_survives_extension_attempt():
    # "a|ab": after 'a' matched, a longer higher-priority path is NOT
    # pending (a wins immediately)... use "ab|a" ordering instead
    ast, ncaps = parse_multi([b"abcd", b"bc"])
    prog = compile_regex(ast)
    ctx = PikeCtx(prog, [-1] * (2 * (ncaps + 1)))
    rc, pending = ctx.exec(b"abc", False, True)
    assert rc == SRE_AGAIN
    # "bc" matched provisionally (1,3) but "abcd" could still win
    assert pending == [1, 3]
    rc, _ = ctx.exec(b"d", True, True)
    assert rc == 0  # abcd wins
    assert ctx.ovector[0] == 0 and ctx.ovector[1] == 4


def test_rearm_after_match():
    ast, ncaps = parse(r"a+")
    prog = compile_regex(ast)
    ctx = PikeCtx(prog, [-1] * (2 * (ncaps + 1)))
    data = b"aa baa"
    rc, _ = ctx.exec(data, True)
    assert rc == 0 and (ctx.ovector[0], ctx.ovector[1]) == (0, 2)
    # re-armed: continue the same stream from the match end
    rc, _ = ctx.exec(data[2:], True)
    assert rc == 0 and (ctx.ovector[0], ctx.ovector[1]) == (4, 6)
    rc, _ = ctx.exec(data[6:], True)
    assert rc == SRE_DECLINED
    # stream finished
    assert ctx.exec(b"x", True)[0] == SRE_ERROR


def test_empty_match_skip_protocol():
    ast, ncaps = parse(r"a*")
    prog = compile_regex(ast)
    ctx = PikeCtx(prog, [-1] * (2 * (ncaps + 1)))
    rc, _ = ctx.exec(b"ba", True)
    assert rc == 0 and (ctx.ovector[0], ctx.ovector[1]) == (0, 0)
    assert ctx.empty_capture
    # protocol: the engine skips ONE byte of the next chunk to avoid an
    # infinite empty-match loop, so the next match is the empty string
    # after the skipped byte (sre_vm_pike.c:179-194)
    rc, _ = ctx.exec(b"a", True)
    assert rc == 0 and (ctx.ovector[0], ctx.ovector[1]) == (1, 1)


def test_word_boundary_across_chunks():
    ast, ncaps = parse(r"\bcat\b")
    prog = compile_regex(ast)
    ctx = PikeCtx(prog, [-1] * (2 * (ncaps + 1)))
    for chunk, eof in ((b"a c", False), (b"at", False), (b" x", True)):
        rc, _ = ctx.exec(chunk, eof)
        if rc != SRE_AGAIN:
            break
    assert rc == 0 and (ctx.ovector[0], ctx.ovector[1]) == (2, 5)


def test_thompson_streaming():
    prog = compile_regex(parse("abc")[0])
    ctx = ThompsonCtx(prog)
    assert ctx.exec(b"xxa", False) == SRE_AGAIN
    assert ctx.exec(b"b", False) == SRE_AGAIN
    # the match is detected at the boundary AFTER the final byte, which
    # belongs to the next exec call (sre_vm_thompson.c:233-235)
    assert ctx.exec(b"c", False) == SRE_AGAIN
    assert ctx.exec(b"", True) == SRE_OK
