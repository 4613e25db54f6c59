"""In-process interleaved A/B of warmup escalation on a
speculation-HOSTILE corpus: a bounded-counting automaton over data
whose run lengths exceed the default 32-byte window, so the W=32 arm
repairs most chunks natively (the round-2 degradation floor) while
the escalated arm (W >= the automaton's history bound) validates
clean and stays at device rate.  Both arms must return the exact
native count.

Usage: python bench/ab_warm.py [MB] [reps] [W]
Defaults: 256 MB, 3 reps, W=128 (pattern a{60,120}b, bound 121).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sregex_tpu import parse, compile_regex
from sregex_tpu.dfa import build_dfa
from sregex_tpu.native import NativeDfa
from sregex_tpu.ops.pallas_scan import (SpecTablesWide,
                                        spec_count_bytes, with_warmup)
from sregex_tpu.ops.prep import prepare_auto


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    ast, _ = parse(b"a{60,120}b")
    dfa = build_dfa(compile_regex(ast), max_states=65536)
    native = NativeDfa(dfa)
    base = SpecTablesWide(dfa)
    warm = with_warmup(base, W)
    print("S=%d ncls=%d rows=%d; arms W=%d vs W=%d"
          % (dfa.nstates, dfa.nclasses, base.rows, base.warmup,
             warm.warmup), flush=True)

    # hostile corpus: 'a' runs of 40..200 (>> 32, straddling the
    # 60..120 match band) separated by single terminators
    rng = np.random.default_rng(0)
    n = mb << 20
    parts = []
    total = 0
    seps = np.frombuffer(b"bx ", np.uint8)
    while total < n:
        runs = rng.integers(40, 200, size=4096)
        for r in runs:
            parts.append(b"a" * int(r))
            parts.append(bytes(rng.choice(seps, 1)))
            total += int(r) + 1
        if total >= n:
            break
    data = b"".join(parts)[:n]
    del parts

    t0 = time.time()
    exp_c, exp_st = native.count(data, 0)
    print("native count %d (%.1fs)" % (exp_c, time.time() - t0),
          flush=True)

    print("preparing both layouts + compiles...", flush=True)
    prep32 = prepare_auto(base, data, 2048)
    prepW = prepare_auto(warm, data, 2048)
    st, c = spec_count_bytes(base, data, prepared=prep32)
    assert (c, st) == (exp_c, exp_st), (c, exp_c)
    print("W=32 repair: %r" % (base.last_repair,), flush=True)
    st, c = spec_count_bytes(warm, data, prepared=prepW)
    assert (c, st) == (exp_c, exp_st), (c, exp_c)
    print("W=%d repair: %r" % (W, warm.last_repair), flush=True)

    t32, tW = [], []
    for rep in range(reps):
        t0 = time.perf_counter()
        st, c = spec_count_bytes(base, data, prepared=prep32)
        t32.append(time.perf_counter() - t0)
        assert (c, st) == (exp_c, exp_st)
        t0 = time.perf_counter()
        st, c = spec_count_bytes(warm, data, prepared=prepW)
        tW.append(time.perf_counter() - t0)
        assert (c, st) == (exp_c, exp_st)
        print("rep %d: W=32 %.2fs  W=%d %.2fs"
              % (rep, t32[-1], W, tW[-1]), flush=True)
    print("W=32 (degradation): %.2fs = %.3f GB/s"
          % (min(t32), n / min(t32) / 1e9))
    print("W=%d (escalated)  : %.2fs = %.3f GB/s  (%.1fx)"
          % (W, min(tW), n / min(tW) / 1e9, min(t32) / min(tW)))


if __name__ == "__main__":
    main()
