"""Exact-mode cross-chunk assertion carry.

The reference's exec loop consults ctx->seen_word for word-boundary
asserts at a chunk start (`t->seen_word || (sp == input &&
ctx->seen_word)`, sre_vm_pike.c:472-487) — but ctx->seen_word is only
refreshed when a match fires (:586-601).  After a re-arm (the
substitution loop) or a set_carry teleport, a later chunk whose
predecessor byte is NOT a word char still sees the stale carry, and a
valid `\b` thread is killed: the match is silently dropped.  The
reference's own suite can't see this (the CLI stops at the first
match; nothing re-arms and keeps streaming), but finditer/sub/
StreamEditor — the production re-arm loop — hit it.

Exact mode (the Scanner API engines) therefore tracks the true
previous-byte context (prev_word/prev_nl), updated on every chunk,
and drops the stale-carry OR.  Default mode keeps the reference
formula for byte-exact CLI conformance (docs/CONFORMANCE.md).
"""

import pytest

from sregex_tpu.pike_vm import PikeCtx
from sregex_tpu.consts import SRE_AGAIN, sre_isword
from sregex_tpu.stream import compile_pattern


def ctxs(prog, exact=True):
    yield PikeCtx(prog, exact=exact)
    from sregex_tpu.native_pike import NativePikeCtx
    if NativePikeCtx.available():
        yield NativePikeCtx(prog, exact=exact)


def drive(ctx, chunks):
    for i, piece in enumerate(chunks):
        rc, _ = ctx.exec(piece, i == len(chunks) - 1)
        if rc >= 0:
            return rc, [int(v) for v in ctx.ovector[:2]]
    return rc, [int(v) for v in ctx.ovector[:2]]


def test_set_carry_then_chunked_word_boundary():
    # teleport to offset 6 after a word char; the later "word" is
    # preceded by ' ' — the stale seen_word=True must not kill it
    sc = compile_pattern(rb"\bword\b")
    for ctx in ctxs(sc.program):
        ctx.set_carry(6, False, True)
        rc, ov = drive(ctx, [b", words, ", b"word"])
        assert rc == 0 and ov == [15, 19]


def test_rearm_then_chunked_word_boundary():
    # the production substitution loop: match, re-arm, keep streaming
    # in chunks; data = "word, words, word"
    sc = compile_pattern(rb"\bword\b")
    for ctx in ctxs(sc.program):
        rc, _ = ctx.exec(b"word, words, ", False)
        assert rc == 0
        assert [int(v) for v in ctx.ovector[:2]] == [0, 4]
        # engine re-armed at 4: re-feed the rest of the chunk, then
        # the next chunk
        rc, _ = ctx.exec(b", words, ", False)
        assert rc == SRE_AGAIN
        rc, _ = ctx.exec(b"word", True)
        assert rc == 0
        assert [int(v) for v in ctx.ovector[:2]] == [13, 17]


def test_rearm_chunked_nonword_boundary_B():
    # \B analog: stale carry can also FAKE a boundary context.
    # pattern x\By: after a re-arm whose match ended after a non-word
    # char, a chunk-start \B between two word chars must still hold.
    sc = compile_pattern(rb"xy|q\By")
    for ctx in ctxs(sc.program):
        # match "xy" at [2,4), re-arm; then "q|y" split across chunks
        rc, _ = ctx.exec(b"..xy, q", False)
        assert rc == 0
        rc, _ = ctx.exec(b", q", False)
        assert rc == SRE_AGAIN
        rc, _ = ctx.exec(b"y..", True)
        assert rc == 0
        assert [int(v) for v in ctx.ovector[:2]] == [6, 8]


def test_caret_after_boundary_splice_chunked():
    # ^ tested at a chunk start via an assertion splice (\b^): the
    # stale seen_newline must not resurrect/kill it
    sc = compile_pattern(rb"\b^ab")
    for ctx in ctxs(sc.program):
        # only a match at absolute 0 is possible for \b^ with \n carry
        ctx.set_carry(4, True, False)   # prev byte is '\n'
        rc, ov = drive(ctx, [b"xx ", b"ab"])
        # ^ needs prev '\n' (position 4 qualifies via carry) but \b^ab
        # at 7 has prev ' ': no match
        assert rc < 0

    sc2 = compile_pattern(rb"\b^ab")
    for ctx in ctxs(sc2.program):
        ctx.set_carry(4, False, True)   # prev is a word char, not \n
        rc, ov = drive(ctx, [b"x\n", b"ab"])
        # match at 6: prev byte '\n' (chunk boundary), \b between \n
        # and 'a' holds
        assert rc == 0 and ov == [6, 8]


def test_default_mode_keeps_reference_formula():
    # default (conformance) mode must keep the reference's stale-carry
    # behavior byte-for-byte: the same drive drops the match
    sc = compile_pattern(rb"\bword\b")
    for ctx in ctxs(sc.program, exact=False):
        ctx.set_carry(6, False, True)
        rc, _ = drive(ctx, [b", words, ", b"word"])
        assert rc < 0


def test_finditer_window_path_word_boundary():
    # the geometric-window Pike stream used by the device finditer
    # resolution feeds multi-chunk after re-arms
    sc = compile_pattern(rb"\bword\b")
    data = (b"word " + b"x" * 100 + b" words, word " + b"y" * 50) * 3
    import re
    want = [(m.start(), m.end())
            for m in re.finditer(rb"\bword\b", data)]
    got = [(ov[0], ov[1]) for _rid, ov in sc.finditer(data)]
    assert got == want


def test_editor_rearm_word_boundary_chunked():
    sc = compile_pattern(rb"\bword\b")
    data = b"word, words, word"
    want, wantn = sc.sub(b"W", data)
    assert want == b"W, words, W"
    ed = sc.editor(b"W")
    out = ed.feed(b"word, words, ") + ed.feed(b"word", eof=True)
    assert out == want and ed.n_replacements == 2
