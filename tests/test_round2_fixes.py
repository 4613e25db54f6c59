"""Round-2 regression tests: int64 absolute offsets past 2 GiB,
StreamScanner post-match contract, Scanner.count universality, and the
lazy DFA (ADVICE.md round 1 + VERDICT.md weak items)."""

import numpy as np
import pytest

from sregex_tpu.parser import parse
from sregex_tpu.compiler import compile_regex
from sregex_tpu.dfa import build_dfa, DfaTooLarge, LazyDfa
from sregex_tpu.stream import StreamScanner, Scanner, compile_pattern
from sregex_tpu.consts import SRE_OK, SRE_AGAIN, SRE_DECLINED, SRE_ERROR


def _prog(pattern, flags=0):
    ast, _ = parse(pattern, flags)
    return compile_regex(ast)


# ---------------------------------------------------------------- int64


def test_reduce_summaries_past_1gib():
    """A real match at an absolute offset >= 2**30 must not lose to the
    int32 sentinel (ADVICE.md item 1)."""
    import jax.numpy as jnp
    from sregex_tpu.ops.scan import reduce_summaries, _NO_MATCH, \
        _NO_MATCH_ABS

    S = 4
    C = 3
    # identity chunk transfers; one chunk fires at local offset 5
    phi = np.tile(np.arange(S, dtype=np.int32), (C, 1))
    fm = np.full((C, S), _NO_MATCH, dtype=np.int32)
    fm[2, :] = 5
    # chunk 0 and 1 each "cover" ~800 MiB => chunk 2's match lands at
    # an absolute offset past 2**30
    valid = np.array([800 << 20, 800 << 20, 4096], dtype=np.int32)
    fid = np.where(fm == _NO_MATCH, -1, 0).astype(np.int32)
    gphi, gfm, gfid = reduce_summaries(jnp.asarray(phi),
                                       jnp.asarray(fm),
                                       jnp.asarray(fid),
                                       jnp.asarray(valid))
    gfm = np.asarray(gfm)
    want = 2 * (800 << 20) + 5
    assert want >= 2 ** 30
    assert int(gfm[0]) == want
    assert int(gfm[0]) < int(_NO_MATCH_ABS)


def test_compose_int64_offsets():
    import jax
    import jax.numpy as jnp
    from sregex_tpu.ops.scan import compose, _NO_MATCH_ABS

    # compose is always called under enable_x64 (reduce_summaries /
    # the sharded fold); outside it jnp silently downcasts to int32
    with jax.enable_x64():
        S = 2
        phi_a = jnp.asarray(np.array([1, 0], dtype=np.int32))
        fm_a = jnp.asarray(np.full(S, int(_NO_MATCH_ABS),
                                   dtype=np.int64))
        phi_b = jnp.asarray(np.array([0, 1], dtype=np.int32))
        fm_b = jnp.asarray(np.array([3 << 31, 7 << 31], dtype=np.int64))
        fid_a = jnp.asarray(np.full(S, -1, dtype=np.int32))
        fid_b = jnp.asarray(np.zeros(S, dtype=np.int32))
        phi, fm, fid = compose((phi_a, fm_a, fid_a),
                               (phi_b, fm_b, fid_b))
        assert int(np.asarray(fm)[0]) == 7 << 31   # via phi_a[0] = 1
        assert int(np.asarray(fid)[0]) == 0


# ------------------------------------------------- StreamScanner misuse


def test_stream_scanner_finished_after_ok():
    dfa = build_dfa(_prog("abc"))
    sc = StreamScanner(dfa)
    rc, end = sc.exec(b"xxabcxx", eof=False)
    assert rc == SRE_OK and end == 5
    # the stream is finished: further feeding is misuse
    rc, _ = sc.exec(b"more", eof=False)
    assert rc == SRE_ERROR
    rc, _ = sc.exec(b"", eof=True)
    assert rc == SRE_ERROR


def test_stream_scanner_finished_after_declined():
    dfa = build_dfa(_prog("abc"))
    sc = StreamScanner(dfa)
    rc, _ = sc.exec(b"zzz", eof=True)
    assert rc == SRE_DECLINED
    rc, _ = sc.exec(b"abc", eof=True)
    assert rc == SRE_ERROR


def test_stream_scanner_device_contract_matches_native():
    """Both backends must agree on the post-match contract."""
    dfa = build_dfa(_prog("abc"))
    a = StreamScanner(dfa)
    b = StreamScanner(dfa, use_device=True)
    b.DEVICE_THRESHOLD = 1     # force the device path per chunk
    data = b"xx" * 300 + b"abc" + b"yy" * 300
    ra = a.exec(data, eof=False)
    rb = b.exec(data, eof=False)
    assert ra == rb
    assert a.exec(b"x", eof=False) == b.exec(b"x", eof=False) \
        == (SRE_ERROR, -1)


# ------------------------------------------------------------- lazy DFA


def test_lazy_dfa_matches_eager():
    for pat, data in [
        ("(?:a|b)aa(?:aa|bb)cc(?:a|b)", b"abccc" * 100 + b"aaabbccb"),
        (r"\bfoo\b", b"xfoo foo bar foofoo foo"),
        ("^bar$", b"bar\nxbar\nbar"),
        ("a+b?c*", b"aaabcccabc"),
    ]:
        prog = _prog(pat)
        eager = build_dfa(prog)
        lazy = LazyDfa(prog)
        # eager reference walk
        s = 0
        first_e = -1
        arr = eager.class_map[np.frombuffer(data, dtype=np.uint8)]
        cnt_e = 0
        for i, c in enumerate(arr):
            if eager.match[s, c]:
                cnt_e += 1
                if first_e < 0:
                    first_e = i
            s = eager.trans[s, c]
        first_l, sl = lazy.scan_first(data)
        cnt_l, sl2 = lazy.count(data)
        assert first_l == first_e
        assert cnt_l == cnt_e
        assert lazy.match_eof(sl2) == bool(eager.match_eof[s])


def test_scanner_count_too_large_pattern():
    """Patterns past the eager-DFA budget must still count correctly
    (VERDICT: no NotImplementedError reachable from the public API)."""
    pat = "[ab]*a[ab]{13}"
    with pytest.raises(DfaTooLarge):
        build_dfa(_prog(pat))
    sc = compile_pattern(pat)
    assert sc.dfa is None
    rng = np.random.RandomState(7)
    data = bytes(rng.choice([97, 98, 99], size=60).astype(np.uint8))
    import re
    want = 0
    for i in range(len(data) + 1):
        if any(re.fullmatch(pat.encode(), data[s:i])
               for s in range(0, i + 1)):
            want += 1
    assert sc.count(data) == want


def test_lazy_dfa_ctx_streaming():
    lazy = LazyDfa(_prog("abc"))
    ctx = lazy.create_ctx()
    assert ctx.exec(b"xa", False) == SRE_AGAIN
    assert ctx.exec(b"b", False) == SRE_AGAIN
    assert ctx.exec(b"c", False) == SRE_AGAIN   # boundary match is at
    assert ctx.exec(b"", True) == SRE_OK        # the EOF check here
