"""Scanner.sub — the substitution loop (reference production mode:
ngx_replace_filter over the Pike re-arm protocol).  Oracle: Python
re.sub, whose non-overlapping leftmost iteration matches our
exact-mode finditer on these patterns."""

import random
import re

import pytest

from sregex_tpu.parser import parse, parse_multi
from sregex_tpu.compiler import compile_regex
from sregex_tpu.stream import Scanner, compile_pattern


def test_sub_basic():
    sc = compile_pattern(rb"(\d+)")
    got, n = sc.sub(b"<$1>", b"a1 b22 c333")
    assert got == b"a<1> b<22> c<333>" and n == 3


def test_sub_whole_match_and_literal_dollar():
    sc = compile_pattern(b"cat")
    got, n = sc.sub(b"[$0]$$", b"cat dog cat")
    assert got == b"[cat]$ dog [cat]$" and n == 2


def test_sub_count_limit():
    sc = compile_pattern(b"a")
    got, n = sc.sub(b"X", b"aaaa", count=2)
    assert got == b"XXaa" and n == 2


def test_sub_braced_group_and_unset():
    sc = compile_pattern(rb"(a+)(b+)?")
    got, n = sc.sub(b"<${1}|${2}>", b"xaab ya")
    assert got == b"x<aa|b> y<a|>" and n == 2


def test_sub_callable():
    sc = compile_pattern([b"cat", b"dog"])
    got, n = sc.sub(lambda rid, ov, d: b"%d" % rid, b"a cat, a dog")
    assert got == b"a 0, a 1" and n == 2


def test_sub_vs_re_oracle():
    sc = compile_pattern(rb"w\d+")
    rng = random.Random(5)
    for _ in range(5):
        data = bytes(rng.choice(b"w123 xy") for _ in range(400))
        got, _ = sc.sub(b"#", data)
        assert got == re.sub(rb"w\d+", b"#", data)


def test_sub_device_path_matches_host():
    ast, _ = parse(rb"w\d+")
    prog = compile_regex(ast)
    host = Scanner(prog, ast=ast)
    dev = Scanner(prog, use_device=True, ast=ast)
    dev.DEVICE_THRESHOLD = 1 << 10
    rng = random.Random(6)
    data = bytes(rng.choice(b"w123 xy") for _ in range(6000))
    assert dev.sub(b"[$0]", data) == host.sub(b"[$0]", data)


def test_sub_empty_match_advance():
    # nullable pattern: empty matches must not loop forever
    sc = compile_pattern(b"x*")
    got, n = sc.sub(b"-", b"axa")
    assert got == re.sub(b"x*", b"-", b"axa"), got

def test_split_vs_re_oracle():
    import re as _re
    for pat, datas in [
        (rb"\s+", [b"a b  c", b"  x  ", b"nospaces", b""]),
        (b",", [b"a,b,c", b",", b"abc"]),
        (b"x*", [b"axa", b"xxa", b""]),
    ]:
        sc = compile_pattern(pat)
        for data in datas:
            assert sc.split(data) == _re.split(pat, data), (pat, data)


def test_split_maxsplit():
    sc = compile_pattern(b",")
    assert sc.split(b"a,b,c", maxsplit=1) == [b"a", b"b,c"]


def test_split_device_path_matches_host():
    ast, _ = parse(rb"\s+")
    prog = compile_regex(ast)
    host = Scanner(prog, ast=ast)
    dev = Scanner(prog, use_device=True, ast=ast)
    dev.DEVICE_THRESHOLD = 1 << 10
    data = (b"word " * 800) + b"tail"
    assert dev.split(data) == host.split(data)
