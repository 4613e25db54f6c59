"""Native C++ Pike VM vs the Python oracle engine: identical results
across whole-buffer and byte-at-a-time streaming, captures, multi-regex
ids, pending/temp captures."""

import pytest

from sregex_tpu import parse, parse_multi, compile_regex
from sregex_tpu.pike_vm import PikeCtx
from sregex_tpu.native_pike import NativePikeCtx, NativeProgram

pytestmark = pytest.mark.skipif(not NativePikeCtx.available(),
                                reason="no C++ toolchain")

CASES = [
    ("a|(ab)", b"bah"),
    ("(a*)*", b"bhaac"),
    ("b.+?a", b"bhaaaca"),
    ("^a$", b"a\nb"),
    (r"\b\w+\b", b"hi  you"),
    ("(a)(b(c))", b"zabcz"),
    ("a?", b"bhc"),
    ("x{0,3}y", b"xxxy"),
    (r"\d+", b"n 123 m"),
    ("$", b"abc"),
    ("(?:ab|cd)+", b"zzabcdab"),
]


def run_engine(make_ctx, prog, data, ncaps):
    """Whole-buffer + splitted runs; returns comparable tuples."""
    ctx = make_ctx()
    rc, _ = ctx.exec(data, True)
    whole = (rc, list(ctx.ovector))

    ctx = make_ctx()
    events = []
    gen_empty = True
    i = 0
    while i <= len(data):
        if i == len(data):
            rc, pending = ctx.exec(None, True, True)
        elif gen_empty:
            rc, pending = ctx.exec(None, False, False)
            gen_empty = False
            if rc == -2:
                continue
        else:
            rc, pending = ctx.exec(data[i:i + 1], False, True)
            if rc == -2:
                events.append((list(ctx.ovector[:2]),
                               list(pending) if pending else None))
            gen_empty = True
            i += 1
            if rc == -2:
                continue
        events.append(("final", rc, list(ctx.ovector)))
        break
    return whole, events


@pytest.mark.parametrize("pattern,data", CASES)
def test_native_matches_python(pattern, data):
    ast, ncaps = parse(pattern)
    prog = compile_regex(ast)
    nprog = NativeProgram(prog)
    size = 2 * (ncaps + 1)

    py = run_engine(lambda: PikeCtx(prog, [-1] * size), prog, data,
                    ncaps)
    nat = run_engine(lambda: NativePikeCtx(nprog, ovecsize=size),
                     prog, data, ncaps)
    py = (py[0][0], py[0][1]), py[1]
    nat = ((nat[0][0], [int(v) for v in nat[0][1]]),
           [e if e[0] == "final" and False else
            (("final", e[1], [int(v) for v in e[2]])
             if e[0] == "final" else
             ([int(v) for v in e[0]], e[1]))
            for e in nat[1]])
    assert py == nat, "%r on %r:\npy : %r\nnat: %r" % (pattern, data,
                                                       py, nat)


def test_native_multi_regex():
    ast, ncaps = parse_multi([b"abcd", b"bc"])
    prog = compile_regex(ast)
    size = 2 * (ncaps + 1)
    for data in (b"abcd", b"abce", b"zzz"):
        pctx = PikeCtx(prog, [-1] * size)
        nctx = NativePikeCtx(prog, ovecsize=size)
        prc, _ = pctx.exec(data, True)
        nrc, _ = nctx.exec(data, True)
        assert prc == nrc
        assert list(pctx.ovector) == [int(v) for v in nctx.ovector]


def test_native_rearm_finditer():
    ast, ncaps = parse("a+")
    prog = compile_regex(ast)
    size = 2 * (ncaps + 1)
    data = b"aa b aaa c a"

    def spans(make_ctx):
        ctx = make_ctx()
        out = []
        pos = 0
        while True:
            rc, _ = ctx.exec(data[pos:], True)
            if rc < 0:
                return out
            out.append((int(ctx.ovector[0]), int(ctx.ovector[1])))
            pos = int(ctx.ovector[1])
            if getattr(ctx, "eof", False):
                return out
            # native ctx: detect eof via next exec returning error
            if len(out) > 10:
                return out

    py = spans(lambda: PikeCtx(prog, [-1] * size))
    assert py == [(0, 2), (5, 8), (11, 12)]
