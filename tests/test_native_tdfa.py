"""Native TDFA walker (csrc/sre_tdfa.cpp) vs the exact-mode Pike
finditer loop — the two must agree match-for-match, ovector-for-
ovector, on every pattern the walker accepts.  Scanner.finditer
routes through the walker when available (SREGEX_FINDITER=pike
forces the Pike loop), so sub()/split() are covered transitively.
"""

import os
import random

import pytest

from sregex_tpu.stream import Scanner, compile_pattern
from sregex_tpu.tdfa import TdfaTooLarge


def pike_matches(sc, data, limit=2000):
    """The Pike re-arm loop Scanner.finditer used before the walker
    (exact mode), driven directly."""
    from sregex_tpu.consts import SRE_AGAIN
    ctx = sc._pike_ctx()
    out = []
    pos = 0
    n = len(data)
    while len(out) < limit:
        rc, _ = ctx.exec(data[pos:], True)
        if rc < 0:
            break
        ov = [int(v) for v in ctx.ovector]
        out.append((rc, ov))
        if ov[1] >= n and ov[0] == ov[1]:
            break
        pos = ov[1]
    return out


def walker_matches(sc, data):
    w = sc._tdfa_walker()
    assert w is not None
    return list(w.iter_ovectors(data))


PATTERNS = [
    rb"(\w+)@(\w+)",
    rb"a*",
    rb"(?:ab)*",
    rb"\bword\b",
    rb"(a+)(b+)?",
    rb"^ab",
    rb"b$",
    rb"a{2,4}",
    rb"x\By",
    rb"a.?b",
    rb"(a)(b(c))?d?",
    rb"\d+|[a-c]+",
]


@pytest.mark.parametrize("pat", PATTERNS)
def test_walker_equals_pike(pat):
    sc = compile_pattern(pat)
    if sc._tdfa_walker() is None:
        pytest.skip("walker unavailable for pattern")
    rng = random.Random(hash(pat) & 0xffff)
    alpha = b"abcdx1 word\n@_"
    for trial in range(40):
        data = bytes(rng.choice(alpha)
                     for _ in range(rng.randrange(0, 120)))
        got = walker_matches(sc, data)
        want = pike_matches(sc, data)
        assert got == want, (pat, data)


def test_walker_multi_regex():
    sc = compile_pattern([rb"(\d+)", b"cat", rb"c\w+"])
    if sc._tdfa_walker() is None:
        pytest.skip("walker unavailable")
    rng = random.Random(5)
    alpha = b"cat19 do"
    for trial in range(60):
        data = bytes(rng.choice(alpha)
                     for _ in range(rng.randrange(0, 80)))
        assert walker_matches(sc, data) == pike_matches(sc, data), data


def test_walker_caseless_and_newline():
    from sregex_tpu.consts import SRE_REGEX_CASELESS
    sc = compile_pattern(rb"c[at]+", flags=SRE_REGEX_CASELESS)
    if sc._tdfa_walker() is None:
        pytest.skip("walker unavailable")
    data = b"CAT cAtT xx Ca"
    assert walker_matches(sc, data) == pike_matches(sc, data)


def test_scanner_finditer_routes_through_walker():
    sc = compile_pattern(rb"(\d+)")
    data = b"a1 b22 c333"
    got = list(sc.finditer(data))
    assert sc._walker not in (None, False)   # walker was built + used
    os.environ["SREGEX_FINDITER"] = "pike"
    try:
        sc2 = compile_pattern(rb"(\d+)")
        want = list(sc2.finditer(data))
        assert sc2._walker is False
    finally:
        del os.environ["SREGEX_FINDITER"]
    assert got == want


def test_sub_and_split_ride_walker():
    sc = compile_pattern(rb"(\d+)")
    got, n = sc.sub(b"<$1>", b"a1 b22 c333")
    assert got == b"a<1> b<22> c<333>" and n == 3
    assert sc.split(b"a1b22c") == [b"a", b"b", b"c"]


def test_batch_resume_protocol():
    # tiny batches force the C walker's resume path (incl. after
    # empty matches)
    sc = compile_pattern(rb"a*")
    w = sc._tdfa_walker()
    if w is None:
        pytest.skip("walker unavailable")
    data = b"baaab aa b"
    all_rows = w.findall(data)
    batched = []
    for rows in w._batches(data, batch=1, max_batch=2):
        batched.extend((list(map(int, r)) for r in rows))
    assert batched == [list(map(int, r)) for r in all_rows]


def test_too_large_falls_back_to_pike():
    # counted-rep monster exceeds the walker budget; finditer must
    # still work (Pike loop)
    sc = compile_pattern(rb"(?:ab|aab){150,400}z")
    assert sc._tdfa_walker() is None
    data = b"ab" * 160 + b"z" + b"xx"
    ms = list(sc.finditer(data))
    assert len(ms) == 1 and ms[0][1][1] == 321


def test_walker_empty_match_protocol():
    sc = compile_pattern(rb"b|")
    if sc._tdfa_walker() is None:
        pytest.skip("walker unavailable")
    for data in [b"", b"b", b"ab", b"ba", b"aab"]:
        assert walker_matches(sc, data) == pike_matches(sc, data), data


def test_walker_fuzz_random_patterns():
    rng = random.Random(77)
    pats = [rb"(a|b)+c", rb"[ab]c|b(c)", rb"\d(\w)?", rb"(?:a|ab)b*",
            rb"a\b", rb"^(a*)b$", rb"(a?)(a?)a"]
    alpha = b"abc1 \nd"
    for trial in range(150):
        pat = pats[trial % len(pats)]
        sc = compile_pattern(pat)
        if sc._tdfa_walker() is None:
            continue
        data = bytes(rng.choice(alpha)
                     for _ in range(rng.randrange(0, 60)))
        assert walker_matches(sc, data) == pike_matches(sc, data), \
            (pat, data)


def test_walker_prefilter_nullable_prefix_regression():
    """The seed-family prefilter must NOT skip a byte whose transition
    keeps a register: ``b*a{2,4}``'s post-``b`` progress state dedups
    onto a seed id, so the old family-membership test skipped the
    ``b``s and lost the earlier leftmost start (device/Pike said
    [1,4] on b"xbaa", the walker said [2,4]).  Skippability now
    requires a seed-uniform successor AND position-following
    (SRC_NEXT) register rebuilds."""
    for pat in (rb"b*a{2,4}", rb"b*aa", rb"[bc]*ab", rb"b?aa",
                rb"(b*)(a+)c"):
        sc = compile_pattern(pat)
        if sc._tdfa_walker() is None:
            continue
        for data in (b"xbaa", b"bbaa", b"aabaa", b"ccabb",
                     b"x" * 40 + b"bbaac", b"bcbcab" * 3):
            assert walker_matches(sc, data) == pike_matches(sc, data), \
                (pat, data)


def test_walker_prefilter_still_engages_on_literals():
    """The tightened skippability rule must keep the memchr-class
    prefilter for plain literal patterns (sparse-scan performance
    depends on it): every junk byte has a seed-uniform successor
    with SRC_NEXT rebuilds, so only the seed-leaving bytes remain
    interesting."""
    import ctypes
    sc = compile_pattern(rb"needle")
    w = sc._tdfa_walker()
    if w is None:
        pytest.skip("walker unavailable")
    # peek at the C tables: exactly one interesting byte ('n')
    class _T(ctypes.Structure):
        pass
    # cheap proxy: a pure-junk corpus must scan far faster than the
    # dense table walk would (prefilter rate >= ~2 GB/s vs ~0.2)
    import time
    data = (b"x" * (1 << 20)) * 24
    t0 = time.perf_counter()
    assert len(w.findall(data)) == 0
    rate = len(data) / (time.perf_counter() - t0) / 1e9
    assert rate > 1.0, rate
