"""Device-rate finditer: the teleport path must be byte-exact with
the host Pike re-arm loop for every match (id + full ovector)."""

import random

import pytest

from sregex_tpu.parser import parse, parse_multi
from sregex_tpu.compiler import compile_regex
from sregex_tpu.stream import Scanner

CASES = [
    ("(?:a|b)aa(?:aa|bb)cc(?:a|b)", b"abc x"),
    (r"\bword\b", b"word abc "),
    ("^line", b"text\nline "),
    ("a[^b]{0,40}b", b"a b xyz"),
    ("(a+)(b+)?", b"aabb xy"),          # nullable group, empty-ish
    ("x*", b"xy "),                     # nullable: teleports disabled
]


def _matches(sc, data):
    return list(sc.finditer(data))


@pytest.mark.parametrize("pattern,alphabet", CASES)
def test_device_finditer_matches_host(pattern, alphabet):
    ast, _ = parse(pattern)
    prog = compile_regex(ast)
    host = Scanner(prog, ast=ast)
    dev = Scanner(prog, use_device=True, ast=ast)
    dev.DEVICE_THRESHOLD = 1 << 10
    rng = random.Random(hash(pattern) & 0xFFFF)
    for trial in range(2):
        n = rng.choice([3000, 9000])
        data = bytes(rng.choice(alphabet) for _ in range(n))
        exp = _matches(host, data)
        got = _matches(dev, data)
        assert got == exp, (pattern, len(exp), len(got))


def test_device_finditer_multi_regex():
    ast, _ = parse_multi([b"cat", b"dog(s)?", b"bird"])
    prog = compile_regex(ast)
    host = Scanner(prog, ast=ast)
    dev = Scanner(prog, use_device=True, ast=ast)
    dev.DEVICE_THRESHOLD = 1 << 10
    rng = random.Random(13)
    data = bytes(rng.choice(b"catdogsbird x") for _ in range(8000))
    assert _matches(dev, data) == _matches(host, data)


def test_device_finditer_sparse_teleports():
    """One match at the very end of a large gap: the teleport must
    jump the whole gap and still resolve the exact span."""
    ast, _ = parse("needle")
    prog = compile_regex(ast)
    dev = Scanner(prog, use_device=True, ast=ast)
    dev.DEVICE_THRESHOLD = 1 << 10
    data = b"h" * 50000 + b"needle" + b"h" * 100
    got = _matches(dev, data)
    assert got == [(0, [50000, 50006])]


def test_fuzz_finditer_smoke():
    from fuzz_finditer import run
    assert run(25, seed=1234) >= 15
