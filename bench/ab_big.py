"""In-process interleaved A/B of the big-tier row lookup: fast
(spread<=1 straight-line two-row path + cond fallback) vs loop
(per-byte dynamic fori_loop).  Relay timings are only honest with the
arms interleaved in ONE process and a value readback inside the timed
region (docs/PERFORMANCE.md).

Usage: python bench/ab_big.py [pattern] [MB] [reps]
Defaults: the conformance-corpus-scale counted-rep monster, 64 MB, 3.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sregex_tpu.stream import compile_pattern
from sregex_tpu.ops.pallas_big import SpecTablesBig
from sregex_tpu.ops.pallas_scan import spec_count_bytes
from sregex_tpu.ops.prep import prepare_auto


def main():
    pat = (sys.argv[1] if len(sys.argv) > 1
           else "(?:a[bc]|de*f|g[hi]j){220,490}z")   # S*ncls=21,276
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    sc = compile_pattern(pat.encode())
    dfa = sc.dfa
    assert dfa is not None, "pattern exceeds the eager DFA budget"
    print("pattern %r: S=%d ncls=%d S*ncls=%d" %
          (pat, dfa.nstates, dfa.nclasses, dfa.nstates * dfa.nclasses))

    t_fast = SpecTablesBig(dfa, fast=True)
    t_slow = SpecTablesBig(dfa, fast=False)

    rng = np.random.default_rng(0)
    data = bytes(rng.choice(np.frombuffer(b"abcdefghijz.", np.uint8),
                            size=mb << 20))
    prepared = prepare_auto(t_fast, data, 2048)
    n = len(data)

    # compile both arms (first dispatch; remote compile dominates)
    for name, t in (("fast", t_fast), ("slow", t_slow)):
        t0 = time.perf_counter()
        st, c = spec_count_bytes(t, data, prepared=prepared)
        print("compile+run %s: %.1f s (count=%d state=%d)" %
              (name, time.perf_counter() - t0, c, st))

    res = {"fast": [], "slow": []}
    ref = None
    for _ in range(reps):
        for name, t in (("fast", t_fast), ("slow", t_slow)):
            t0 = time.perf_counter()
            st, c = spec_count_bytes(t, data, prepared=prepared)
            dt = time.perf_counter() - t0
            res[name].append(dt)
            if ref is None:
                ref = (st, c)
            assert (st, c) == ref, (name, st, c, ref)
    for name in ("fast", "slow"):
        ts = res[name]
        print("%s: best %.3f s = %.2f GB/s   (all: %s)" %
              (name, min(ts), n / min(ts) / 1e9,
               " ".join("%.3f" % t for t in ts)))


if __name__ == "__main__":
    main()
