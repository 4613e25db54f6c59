"""StreamEditor — streaming substitution over chunked streams (the
ngx_replace_filter use case).  Properties tested:

  1. chunking invariance: for every random chunking (including empty
     chunks), the concatenated feed() outputs equal the whole-buffer
     Scanner.sub result;
  2. incremental flush: output becomes final as soon as the engine's
     temp/pending capture bounds allow — the held window stays
     O(potential match), not O(stream);
  3. the misuse contract (feed after eof raises).
"""

import random

import pytest

from sregex_tpu.stream import Scanner, StreamEditor, compile_pattern


def chunkings(data, rng, n_cases=4):
    """Yield random chunk lists covering data, with empty chunks."""
    n = len(data)
    yield [data]                       # whole buffer
    yield [data[i:i + 1] for i in range(n)] or [b""]   # byte-at-a-time
    for _ in range(n_cases):
        cuts = sorted(rng.randrange(n + 1)
                      for _ in range(rng.randrange(1, 6)))
        pieces = []
        prev = 0
        for c in cuts:
            pieces.append(data[prev:c])
            prev = c
        pieces.append(data[prev:])
        # sprinkle empty chunks
        for _ in range(rng.randrange(0, 3)):
            pieces.insert(rng.randrange(len(pieces) + 1), b"")
        yield pieces


def run_editor(sc, repl, pieces, count=0):
    ed = sc.editor(repl, count=count)
    out = []
    for i, p in enumerate(pieces):
        out.append(ed.feed(p, eof=(i == len(pieces) - 1)))
        if ed.finished:
            break
    assert ed.finished
    return b"".join(out), ed.n_replacements


CASES = [
    (rb"(\d+)", b"<$1>", b"a1 b22 c333 d"),
    (b"cat", b"[$0]", b"cat dog cat catcat"),
    (rb"a*", b"-", b"bbabaa aab"),            # empty matches
    (rb"^foo", b"X", b"foo bar\nfoo baz"),    # anchors across chunks
    (rb"\bword\b", b"W", b"a word, words, word"),
    (rb"ab|abc", b"<$0>", b"zabcz ab abc"),   # leftmost-first priority
    (rb"(a+)(b+)?", b"[$1|$2]", b"aab a abb"),
    (rb"x$", b"E", b"x yx zx"),
]


@pytest.mark.parametrize("pat,repl,data", CASES)
def test_editor_matches_sub(pat, repl, data):
    rng = random.Random(hash((pat, data)) & 0xffffffff)
    sc = compile_pattern(pat)
    want, wantn = sc.sub(repl, data)
    for pieces in chunkings(data, rng):
        got, n = run_editor(sc, repl, pieces)
        assert got == want, (pat, pieces)
        assert n == wantn


def test_editor_multi_regex_and_callable():
    sc = compile_pattern([rb"(\d+)", b"cat"])
    data = b"1 cat 22 dog cat 333"

    def repl(rid, ov, window):
        return b"<%d:%s>" % (rid, window[ov[0]:ov[1]])

    want, wantn = sc.sub(repl, data)
    assert want == b"<0:1> <1:cat> <0:22> dog <1:cat> <0:333>"
    rng = random.Random(7)
    for pieces in chunkings(data, rng):
        got, n = run_editor(sc, repl, pieces)
        assert got == want and n == wantn


def test_editor_count_limit_and_passthrough():
    sc = compile_pattern(b"a")
    data = b"xaxaxaxa"
    want, wantn = sc.sub(b"A", data, count=2)
    rng = random.Random(3)
    for pieces in chunkings(data, rng):
        got, n = run_editor(sc, b"A", pieces, count=2)
        assert got == want and n == wantn == 2


def test_editor_incremental_flush():
    # no possible match pending => everything flushes each feed; the
    # held window stays bounded by the longest potential match prefix
    sc = compile_pattern(b"xyz")
    ed = sc.editor(b"!")
    emitted = 0
    for i in range(50):
        chunk = b"ab" * 10 + (b"x" if i % 3 == 0 else b"")
        out = ed.feed(chunk)
        emitted += len(out)
        # at most the live "x...", never the whole stream
        assert len(ed._held) <= 2
    ed.feed(b"x")
    out = ed.feed(b"yz", eof=True)
    assert out.endswith(b"!")


def test_editor_bounded_memory_on_long_stream():
    # a pattern whose match cannot span two chunks of 'b's: held
    # window must not grow with the stream
    sc = compile_pattern(rb"a+b")
    ed = sc.editor(b"*")
    for _ in range(100):
        ed.feed(b"b" * 100 + b"a" * 3)
        assert len(ed._held) <= 103
    ed.feed(b"b", eof=True)


def test_editor_misuse_after_eof():
    sc = compile_pattern(b"a")
    ed = sc.editor(b"X")
    ed.feed(b"za", eof=True)
    with pytest.raises(RuntimeError):
        ed.feed(b"more")


def test_editor_empty_stream():
    # empty-matching pattern on the empty stream: one empty-match
    # replacement, exactly like sub
    sc = compile_pattern(rb"a*")
    want, wantn = sc.sub(b"-", b"")
    ed = sc.editor(b"-")
    got = ed.feed(b"", eof=True)
    assert got == want and ed.n_replacements == wantn


def test_editor_fuzz_against_sub():
    rng = random.Random(42)
    pats = [rb"(a|b)+c", rb"a{2,4}", rb"[ab]c|b(c)", rb"\d(\w)?",
            rb"^ab", rb"b$", rb"(?:ab)*", rb"a.?b"]
    alpha = b"abc1 \n"
    for trial in range(120):
        pat = pats[trial % len(pats)]
        data = bytes(rng.choice(alpha) for _ in range(rng.randrange(0, 40)))
        sc = compile_pattern(pat)
        want, wantn = sc.sub(b"<$0>", data)
        for pieces in chunkings(data, rng, n_cases=2):
            got, n = run_editor(sc, b"<$0>", pieces)
            assert got == want, (pat, data, pieces)
            assert n == wantn
