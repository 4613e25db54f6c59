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


def test_monster_pattern_finditer_lazy_reverse_locator():
    """Patterns whose FORWARD and REVERSE subset constructions both
    exceed the eager budget (and whose tagged automaton exceeds the
    walker budget) still get device-rate finditer: the start locator
    runs the lazy-reverse machine through the lazy core tier, and the
    teleports stay byte-exact with the Pike re-arm loop."""
    import os
    from sregex_tpu.stream import compile_pattern
    from sregex_tpu.ops.pallas_core import LazyCoreTables
    pat = rb"bar[a-z]{30,70}rab"
    dev = compile_pattern(pat, use_device=True)
    assert dev.dfa is None and dev._rev_dfa() is None \
        and dev._tdfa_walker() is None
    dev.DEVICE_THRESHOLD = 1 << 12
    os.environ["SREGEX_FINDITER"] = "pike"
    try:
        host = compile_pattern(pat)
    finally:
        os.environ.pop("SREGEX_FINDITER")
    rng = random.Random(3)
    data = bytearray(rng.choice(b"barxyz ") for _ in range(50000))
    m = b"bar" + b"qwertyuiopasdfghjklzxcvbnmqwertyuiopasdf"[:40] + b"rab"
    data[17000:17000 + len(m)] = m
    data[38000:38000 + len(m)] = m
    data = bytes(data)
    exp = list(host.finditer(data))
    assert len(exp) == 2
    assert list(dev.finditer(data)) == exp
    assert isinstance(dev._rev_lz_coret, LazyCoreTables)
    # find() rides the same lazy-reverse start locator
    assert dev.find(data) == host.find(data)
    calm = data.replace(b"rab", b"rax")
    assert list(dev.finditer(calm)) == list(host.finditer(calm))
    assert dev.find(calm) is None and host.find(calm) is None
