"""In-process interleaved A/B: byte-step narrow kernel vs pair-step
kernel (ops/pallas_pair.py) on the reference bench pattern.  Timings
use the scan entry point (the headline metric) with prepared
device-resident data per arm, value readback inside the timed region.

Usage: python bench/ab_pair.py [MB] [reps] [pattern]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sregex_tpu.parser import parse
from sregex_tpu.compiler import compile_regex
from sregex_tpu.dfa import build_dfa
from sregex_tpu.ops.pallas_scan import (SpecTables, _prepare,
                                        spec_scan_bytes,
                                        spec_count_bytes)
from sregex_tpu.ops.pallas_pair import SpecTablesPair


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    K = 2048

    pat = (sys.argv[3].encode() if len(sys.argv) > 3
           else b"(?:a|b)aa(?:aa|bb)cc(?:a|b)")
    ast, _ = parse(pat, 0)
    dfa = build_dfa(compile_regex(ast))
    t_byte = SpecTables(dfa)
    t_pair = SpecTablesPair(dfa)
    print("S=%d ncls=%d npair=%d rows=%d bits(pair)=%d" %
          (dfa.nstates, dfa.nclasses, t_pair.ncls, t_pair.rows,
           t_pair.bits))

    # reference-like corpus: no match in the bulk, one at the end
    rep = b"abccc"
    body = rep * ((mb << 20) // len(rep))
    corpus = body + b"aaabbccb"
    n = len(corpus)

    arms = []
    for name, t in (("byte", t_byte), ("pair", t_pair)):
        t0 = time.perf_counter()
        prepared = _prepare(t, corpus, K)
        print("prep %s: %.1f s" % (name, time.perf_counter() - t0))
        arms.append((name, t, prepared))

    for name, t, prepared in arms:
        t0 = time.perf_counter()
        st, f = spec_scan_bytes(t, corpus, chunk_len=K,
                                prepared=prepared)
        print("compile+run %s: %.1f s (first=%d)" %
              (name, time.perf_counter() - t0, f))

    res = {a[0]: [] for a in arms}
    ref = None
    for _ in range(reps):
        for name, t, prepared in arms:
            t0 = time.perf_counter()
            st, f = spec_scan_bytes(t, corpus, chunk_len=K,
                                    prepared=prepared)
            dt = time.perf_counter() - t0
            res[name].append(dt)
            if ref is None:
                ref = f
            assert f == ref, (name, f, ref)
    for name in res:
        ts = res[name]
        print("%s: best %.3f s = %.2f GB/s   (all: %s)" %
              (name, min(ts), n / min(ts) / 1e9,
               " ".join("%.3f" % x for x in ts)))


if __name__ == "__main__":
    main()
