"""CLI contract tests with hardcoded expectations (verified against
the reference binary; these run without it)."""

import io

import pytest

from sregex_tpu.cli import main as cli_main
from sregex_tpu import parse, compile_regex, dump_ast
from sregex_tpu.consts import SRE_REGEX_NEWLINE


def run(argv, stdin=b""):
    out, err = io.BytesIO(), io.BytesIO()
    rc = cli_main([b"sregex-cli"] + argv, io.BytesIO(stdin), out, err)
    return out.getvalue(), err.getvalue(), rc


def test_usage():
    out, err, rc = run([])
    assert rc == 2 and b"usage:" in err


def test_no_subject():
    out, err, rc = run([b"abc"])
    assert rc == 1 and err == b"no subject string specified.\n"
    # the dumps are still printed first (reference behavior)
    assert out.startswith(b"Cat(NgStar(Dot), ")


def test_bad_flag():
    out, err, rc = run([b"--flags", b"z", b"abc", b"x"])
    assert rc == 1
    assert err == (b"Bad regex flag 'z' for regex 0\n"
                   b"Bad --flags option value: z")


def test_syntax_error_positions():
    out, err, rc = run([b"(ab", b"x"])
    assert rc == 1 and err == b"[error] syntax error at pos 3\n"
    out, err, rc = run([b"-n", b"2", b"ok", b"(bad", b"x"])
    assert rc == 1
    assert err == b"[error] regex 1: syntax error at pos 4\n"


def test_multi_frame_streams():
    # each --stdin frame is an independent stream over the same
    # compiled program (tags carry across, sre_cli.c:213-259)
    out, err, rc = run([b"--stdin", b"a|(ab)"],
                       b"3\nbah4\nabab0\n2\nab")
    assert rc == 0 and err == b""
    assert out.count(b"## ") == 4
    assert out.count(b"\npike match 0 (1, 2) (-1, -1)\n") == 1  # bah
    # 'a' (leftmost-first) wins in both "abab" and "ab"
    assert out.count(b"\npike match 0 (0, 1) (-1, -1)\n") == 2


def test_argv_subjects():
    out, err, rc = run([b"ab", b"zab", b"nope"])
    assert rc == 0
    assert b"pike match 0 (1, 3)" in out
    assert b"pike no match" in out


def test_newline_flag_library():
    # SRE_REGEX_NEWLINE is a library-level flag (the reference CLI only
    # exposes 'i'): '.' and \C become [^\n], classes are unchanged here
    ast, _ = parse(b".x\\C", SRE_REGEX_NEWLINE)
    d = dump_ast(ast)
    assert d.count("NCLASS([10, 10])") == 2
    prog = compile_regex(ast)
    from sregex_tpu.pike_vm import PikeCtx
    ctx = PikeCtx(prog)
    rc, _ = ctx.exec(b"\nxz", True)   # '.' must not match the newline
    assert rc == -5
    ctx = PikeCtx(prog)
    rc, _ = ctx.exec(b"axz", True)
    assert rc == 0 and (ctx.ovector[0], ctx.ovector[1]) == (0, 3)
