#!/usr/bin/env python
"""Multi-engine benchmark driver: the analog of the reference's
bench/bench script (which times sregex{thompson,jit,pike} vs
re1/pcre/re2).  Times each of OUR engines on the same corpus+pattern:

    pike-py        streaming Pike VM (Python host oracle)
    thompson-py    streaming Thompson VM (Python)
    dfa-native     C++ host DFA scanner (csrc/sre_host.cpp)
    dfa-xla        enumerative XLA device scan (ops/scan.py)
    dfa-pallas     speculative Pallas kernel (ops/pallas_scan.py)
    python-re      CPython's re module, for scale

Usage: python bench/compare.py [pattern] [corpus-mult] [--device]
"""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, reps=3):
    ts = []
    fn()
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    with_device = "--device" in sys.argv
    pattern = args[0] if args else "(?:a|b)aa(?:aa|bb)cc(?:a|b)"
    mult = int(args[1]) if len(args) > 1 else 1
    corpus = b"abccc" * (1024 * 1024 * mult) + b"aaabbccb"
    n = len(corpus)

    from sregex_tpu import parse, compile_regex
    from sregex_tpu.pike_vm import PikeCtx
    from sregex_tpu.thompson_vm import ThompsonCtx
    from sregex_tpu.dfa import build_dfa
    from sregex_tpu.native import NativeDfa

    ast, ncaps = parse(pattern)
    prog = compile_regex(ast)
    dfa = build_dfa(prog)
    native = NativeDfa(dfa)

    print("pattern: %s   corpus: %d MB" % (pattern, n >> 20))
    print("%-14s %10s %12s" % ("engine", "ms", "GB/s"))

    def report(name, dt):
        print("%-14s %10.2f %12.3f" % (name, dt * 1e3, n / dt / 1e9))

    def report_scaled(name, dt, nbytes):
        print("%-14s %10.2f %12.3f   (on %d KB)"
              % (name, dt * 1e3, nbytes / dt / 1e9, nbytes >> 10))

    report("dfa-native", timeit(lambda: native.scan_first(corpus, 0)))

    import re as pyre
    cre = pyre.compile(pattern.encode())
    report("python-re", timeit(lambda: cre.search(corpus)))

    # external engines, as in the reference bench
    # (/root/reference/bench/bench:6-13).  libpcre2-8 ships on this
    # image; re1 and RE2 do not (documented in docs/PERFORMANCE.md).
    def try_row(name, mk):
        try:
            fn = mk()
            report(name, timeit(fn))
        except Exception as e:
            print("%-14s %10s   (%s)" % (name, "n/a", e))

    from pcre2 import Pcre2
    try_row("pcre2", lambda: (lambda p: lambda: p.match(corpus))(
        Pcre2(pattern)))
    try_row("pcre2-jit", lambda: (lambda p: lambda: p.match(corpus))(
        Pcre2(pattern, jit=True)))
    try_row("pcre2-dfa", lambda: (lambda p: lambda: p.dfa_match(
        corpus))(Pcre2(pattern)))

    try:
        from sregex_tpu.native_pike import NativePikeCtx, NativeProgram
        nprog = NativeProgram(prog)

        def npike():
            NativePikeCtx(nprog).exec(corpus, True)
        report("pike-native", timeit(npike, reps=1))
    except Exception:
        pass

    # the Python VMs are oracles, not production engines: time them on
    # a bounded slice
    small = corpus[:262144]
    report_scaled("thompson-py",
                  timeit(lambda: ThompsonCtx(prog).exec(small, True),
                         reps=1), len(small))

    def pike():
        ctx = PikeCtx(prog)
        ctx.exec(small, True)
    report_scaled("pike-py", timeit(pike, reps=1), len(small))

    if with_device:
        from sregex_tpu.stream import (_build_spec_tables,
                                       _core_requirement)
        from sregex_tpu.ops.pallas_scan import spec_scan_bytes
        from sregex_tpu.ops.prep import prepare_auto
        st = _build_spec_tables(dfa)
        if st is not None:
            prepared = prepare_auto(st, corpus, 2048)
            report("dfa-pallas (%s)" % type(st).__name__,
                   timeit(lambda: spec_scan_bytes(st, corpus,
                                                  chunk_len=2048,
                                                  prepared=prepared)))
        req = _core_requirement(st)
        if req is not None:
            from sregex_tpu.ops.pallas_core import (CoreTables,
                                                    core_scan_bytes)
            try:
                ct = CoreTables(dfa, corpus[:1 << 20],
                                require_fast=req)
            except ValueError:
                ct = None
            if ct is not None:
                prep_c = prepare_auto(ct.inner, corpus, 2048)
                report("dfa-core (%s)" % type(ct.inner).__name__,
                       timeit(lambda: core_scan_bytes(
                           ct, corpus, chunk_len=2048,
                           prepared=prep_c)))
        if "--xla" in sys.argv:
            from sregex_tpu.ops.scan import (dfa_device_tables,
                                             scan_bytes)
            tables = dfa_device_tables(dfa)
            report("dfa-xla",
                   timeit(lambda: scan_bytes(tables, corpus), reps=2))


if __name__ == "__main__":
    main()
