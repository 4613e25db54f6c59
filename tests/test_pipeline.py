"""Pipelined streaming scan (ops/pipeline.py) vs the single-buffer
drivers and the native engine (interpret mode on the CPU mesh).

The pipeline's exactness argument — a non-first segment's chunk 0
speculates over the real previous-segment tail and is validated
against the true entry at fold time — is exercised with adversarial
segmentations: 1-byte segments, segments smaller than the warmup
window, ragged non-final segments (forced native bad_tail repair),
and patterns whose warmup cannot converge (long counted runs), which
drive the cross-segment repair path."""

import random

import pytest

from sregex_tpu import parse, compile_regex
from sregex_tpu.dfa import build_dfa
from sregex_tpu.native import NativeDfa
from sregex_tpu.ops.pallas_scan import SpecTables, SpecTablesWide
from sregex_tpu.ops.pallas_pair import SpecTablesPair
from sregex_tpu.ops.pipeline import pipelined_count, pipelined_scan


def _segments(data, rng):
    """Adversarial random segmentation: tiny, sub-warmup, ragged and
    chunk-multiple segment lengths all mixed."""
    segs = []
    i = 0
    while i < len(data):
        k = rng.choice([1, 3, 17, 100, 240, 480, 1000, 4096])
        segs.append(data[i:i + k])
        i += k
    return segs


def _corpus(rng, alphabet, n, plants):
    data = bytes(rng.choice(alphabet) for _ in range(n))
    for pos, s in plants:
        data = data[:pos] + s + data[pos:]
    return data


CASES = [
    # (pattern, tables class, alphabet, plant string)
    ("ab", SpecTables, b"aabbc ", b"ab"),
    ("(?:a|b)aa(?:aa|bb)cc(?:a|b)", SpecTablesPair, b"abc",
     b"baaaacca"),
    (r"\bword\b", SpecTables, b"word x", b" word "),
    ("a{60}b", SpecTablesWide, b"aaaaaab", b"c" + b"a" * 60 + b"b"),
]


@pytest.mark.parametrize("pattern,cls,alphabet,plant", CASES)
def test_pipelined_count_matches_native(pattern, cls, alphabet,
                                        plant):
    ast, _ = parse(pattern)
    dfa = build_dfa(compile_regex(ast))
    tables = cls(dfa)
    native = NativeDfa(dfa)
    rng = random.Random(hash(pattern) & 0xFFFF)
    for trial in range(3):
        n = rng.choice([900, 5000, 9000])
        data = _corpus(rng, alphabet, n,
                       [(n // 3, plant), (2 * n // 3, plant)])
        segs = _segments(data, rng)
        exp, est = native.count(data, 0)
        st, got = pipelined_count(tables, segs, chunk_len=240,
                                  in_flight=rng.choice([1, 2, 3]))
        assert got == exp, (pattern, trial, got, exp)
        assert st == est, (pattern, trial, st, est)


@pytest.mark.parametrize("pattern,cls,alphabet,plant", CASES)
def test_pipelined_scan_matches_native(pattern, cls, alphabet, plant):
    ast, _ = parse(pattern)
    dfa = build_dfa(compile_regex(ast))
    tables = cls(dfa)
    native = NativeDfa(dfa)
    rng = random.Random(~hash(pattern) & 0xFFFF)
    for trial in range(3):
        n = rng.choice([900, 5000])
        plants = [] if trial == 0 else [(n // 2, plant)]
        data = _corpus(rng, alphabet, n, plants)
        segs = _segments(data, rng)
        exp_first, est = native.scan_first(data, 0)
        st, got, byte, folded = pipelined_scan(tables, segs,
                                               chunk_len=240)
        assert got == exp_first, (pattern, trial, got, exp_first)
        if exp_first < 0:
            assert st == est and folded == len(data)
        else:
            assert byte == data[exp_first]


def test_pipelined_single_and_empty_segments():
    ast, _ = parse("ab")
    tables = SpecTables(build_dfa(compile_regex(ast)))
    native = NativeDfa(build_dfa(compile_regex(ast)))
    data = b"xxabxx" * 100
    exp, est = native.count(data, 0)
    st, got = pipelined_count(tables, [b"", data, b""], chunk_len=240)
    assert (got, st) == (exp, est)
    st, got = pipelined_count(tables, [], chunk_len=240)
    assert (st, got) == (0, 0)
    st, got, byte, folded = pipelined_scan(tables, iter([]))
    assert (st, got) == (0, -1)


def test_pipelined_pair_odd_segments():
    """Pair-unit tables must stay pair-aligned across odd-length
    segments (the odd-byte holdback)."""
    ast, _ = parse("(?:a|b)aa(?:aa|bb)cc(?:a|b)")
    dfa = build_dfa(compile_regex(ast))
    tables = SpecTablesPair(dfa)
    assert tables.bpu == 2
    native = NativeDfa(dfa)
    rng = random.Random(99)
    data = _corpus(rng, b"abc", 4001, [(1234, b"baaaacca"),
                                       (3999, b"abbbcca")])
    # every segment odd-length
    segs = [data[i:i + 333] for i in range(0, len(data), 333)]
    assert all(len(s) % 2 for s in segs[:-1])
    exp, est = native.count(data, 0)
    st, got = pipelined_count(tables, segs, chunk_len=240)
    assert (got, st) == (exp, est)


def test_pipelined_entry_state():
    """A nonzero entry state threads into the first segment's frozen
    warmup exactly like the single-buffer driver."""
    ast, _ = parse("ab")
    dfa = build_dfa(compile_regex(ast))
    tables = SpecTables(dfa)
    native = NativeDfa(dfa)
    # state after consuming "a"
    _, mid = native.count(b"xa", 0)
    data = b"b" + b"xab" * 400
    exp, est = native.count(data, mid)
    st, got = pipelined_count(tables, [data[:7], data[7:]],
                              chunk_len=240, entry_state=mid)
    assert (got, st) == (exp, est)


def test_scanner_stream_api():
    """Scanner.count_stream / scan_stream == count / scan on the
    concatenation, on both the device pipeline and the host
    fallback."""
    from sregex_tpu.stream import Scanner
    ast, _ = parse("(?:a|b)aa(?:aa|bb)cc(?:a|b)")
    prog = compile_regex(ast)
    rng = random.Random(5)
    data = _corpus(rng, b"abc", 6000, [(3000, b"baaaacca")])
    segs = _segments(data, rng)
    for use_device in (True, False):
        sc = Scanner(prog, use_device=use_device, ast=ast)
        assert sc.count_stream(list(segs)) == sc.count(data)
        assert sc.scan_stream(list(segs)) == sc.scan(data)
    # no-match stream: EOF/None handling
    sc = Scanner(prog, use_device=True, ast=ast)
    quiet = [b"xyz" * 100] * 3
    assert sc.scan_stream(quiet) == sc.scan(b"xyz" * 300)
    assert sc.count_stream(quiet) == 0


def test_pipelined_count_on_mesh():
    """The pipeline's kernels ride the device mesh like the
    single-buffer drivers (shard_map over the chunk-block dim; the
    fold is mesh-agnostic)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    ast, _ = parse("ab")
    dfa = build_dfa(compile_regex(ast))
    tables = SpecTables(dfa)
    native = NativeDfa(dfa)
    rng = random.Random(21)
    data = _corpus(rng, b"aabbc ", 7000, [(3500, b"abab")])
    segs = [data[i:i + 1700] for i in range(0, len(data), 1700)]
    exp, est = native.count(data, 0)
    st, got = pipelined_count(tables, segs, chunk_len=240, mesh=mesh)
    assert (got, st) == (exp, est)


def test_scanner_stream_eof_boundary():
    """A match that ends exactly at EOF is reported at the total
    stream length (the count includes it; scan returns (id, n))."""
    from sregex_tpu.stream import Scanner
    ast, _ = parse(r"tail\z")
    prog = compile_regex(ast)
    data = b"x" * 500 + b"tail"
    segs = [data[:100], data[100:503], data[503:]]
    for use_device in (True, False):
        sc = Scanner(prog, use_device=use_device, ast=ast)
        assert sc.count_stream(list(segs)) == 1
        assert sc.scan_stream(list(segs)) == (0, len(data))
