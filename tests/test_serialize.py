"""Compiled-pattern serialization round-trip: the loaded Scanner must
behave identically to the freshly compiled one (scan/count/find ids
and captures), without re-running subset construction."""

import io
import random

from sregex_tpu.parser import parse, parse_multi
from sregex_tpu.compiler import compile_regex
from sregex_tpu.stream import Scanner, compile_pattern
from sregex_tpu.serialize import save_compiled, load_compiled


def _roundtrip(sc):
    buf = io.BytesIO()
    save_compiled(buf, sc)
    buf.seek(0)
    return load_compiled(buf)


def test_roundtrip_single():
    sc = compile_pattern(rb"(\w+)@(\w+)")
    lo = _roundtrip(sc)
    data = b"mail me at a1@b2 thanks"
    assert lo.scan(data) == sc.scan(data)
    assert lo.count(data) == sc.count(data)
    assert lo.find(data) == sc.find(data)
    assert list(lo.finditer(data)) == list(sc.finditer(data))


def test_roundtrip_multi_ids():
    sc = compile_pattern([b"cat", b"dog(s)?", b"bird"])
    lo = _roundtrip(sc)
    rng = random.Random(3)
    for _ in range(5):
        data = bytes(rng.choice(b"catdogsbird x") for _ in range(300))
        assert lo.scan(data) == sc.scan(data)
        assert lo.find(data) == sc.find(data)


def test_roundtrip_preserves_tables_bitwise():
    import numpy as np
    sc = compile_pattern(rb"\bword\b")
    lo = _roundtrip(sc)
    assert np.array_equal(lo.dfa.trans, sc.dfa.trans)
    assert np.array_equal(lo.dfa.match_id, sc.dfa.match_id)
    assert np.array_equal(lo.dfa.match_eof_id, sc.dfa.match_eof_id)
    assert np.array_equal(lo.dfa.class_map, sc.dfa.class_map)


def test_roundtrip_program_quirks():
    # assertions, classes, counted reps, caseless
    for pat, flags in [(rb"a{2,4}[b-d]+\z", 0),
                       (rb"(?:AbC)+", 1)]:
        ast, _ = parse(pat, flags)
        sc = Scanner(compile_regex(ast), ast=ast)
        lo = _roundtrip(sc)
        for data in (b"aabbcc", b"AbCabcABC", b"aaacd"):
            assert lo.find(data) == sc.find(data), (pat, data)


def test_roundtrip_past_eager_budget():
    # a counted-repetition monster past the eager DFA budget: the
    # program round-trips without tables and the lazy machine serves
    import io as _io
    from sregex_tpu.serialize import save_compiled, load_compiled
    ast, _ = parse(b"word (?:[a-zA-Z0-9]+ ){0,300}otherword")
    sc = Scanner(compile_regex(ast), ast=ast)
    buf = _io.BytesIO()
    save_compiled(buf, sc)
    buf.seek(0)
    lo = load_compiled(buf)
    data = b"word ab c1 otherword"
    assert lo.scan(data) == sc.scan(data)
    assert lo.count(data) == sc.count(data)


def test_loaded_scanner_serves_device_tiers():
    """A Scanner reloaded from save_compiled (no AST, prebuilt DFA)
    must serve the device kernel tiers exactly like a fresh one."""
    import os
    import random
    import tempfile
    from sregex_tpu.stream import compile_pattern
    from sregex_tpu.serialize import save_compiled, load_compiled
    sc = compile_pattern(b"(?:a|b)aa(?:aa|bb)cc(?:a|b)")
    fd, path = tempfile.mkstemp(suffix=".npz")
    os.close(fd)
    try:
        save_compiled(path, sc)
        dev = load_compiled(path, use_device=True)
        dev.DEVICE_THRESHOLD = 1 << 12
        rng = random.Random(9)
        data = bytes(rng.choice(b"abccc x") for _ in range(30000))
        data = data[:20000] + b"xaaabbccb" + data[20000:]
        assert dev.count(data) == sc.count(data)
        assert dev.scan(data) == sc.scan(data)
        assert dev.find(data) == sc.find(data)
        assert dev._spec is not None   # a kernel tier engaged
    finally:
        os.unlink(path)
