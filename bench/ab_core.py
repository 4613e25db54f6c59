"""In-process interleaved A/B of the adaptive hot-core tier
(ops/pallas_core.py) vs the pattern's own static kernel tier, COUNT
mode.  Relay timings are only honest with the arms interleaved in ONE
process and a value readback inside the timed region
(docs/PERFORMANCE.md).

The corpus is skew-typical (benign random data whose hot set is small)
with one match planted at ~0.9n, far from the head sample slice — so
the core arm pays its real repair cost for the match chunk.  Both arms
must return the exact native count.

Usage: python bench/ab_core.py [pattern] [MB] [reps] [alphabet]
Defaults: a{60,120}b (static tier: wide), 256 MB, 3, "ab xx".
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sregex_tpu.stream import compile_pattern, _build_spec_tables
from sregex_tpu.ops.pallas_scan import spec_count_bytes
from sregex_tpu.ops.pallas_core import CoreTables, core_count_bytes
from sregex_tpu.ops.prep import prepare_auto


def main():
    pat = sys.argv[1] if len(sys.argv) > 1 else "a{60,120}b"
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    alphabet = (sys.argv[4] if len(sys.argv) > 4 else "ab xx").encode()

    sc = compile_pattern(pat.encode())
    dfa = sc.dfa
    assert dfa is not None, "pattern exceeds the eager DFA budget"
    static = _build_spec_tables(dfa)
    print("pattern %r: S=%d ncls=%d S*ncls=%d static tier=%s" %
          (pat, dfa.nstates, dfa.nclasses, dfa.nstates * dfa.nclasses,
           type(static).__name__))

    rng = np.random.default_rng(0)
    data = bytes(rng.choice(np.frombuffer(alphabet, np.uint8),
                            size=mb << 20))
    # plant one match at ~0.9n (outside the head sample slice), so the
    # core arm pays its real one-chunk repair cost
    import re as _re
    m = _re.fullmatch(r"a\{(\d+),(\d+)\}b", pat)
    if m:
        planted = b"x" + b"a" * ((int(m.group(1))
                                  + int(m.group(2))) // 2) + b"b"
        at = int(len(data) * 0.9)
        data = data[:at] + planted + data[at + len(planted):]

    ct = CoreTables(dfa, data[:256 << 10])
    print("core: H=%d inner=%s core_ncls=%d" %
          (ct.H, type(ct.inner).__name__, ct.inner.ncls))

    n = len(data)
    t0 = time.perf_counter()
    exp_cnt, exp_st = ct.native.count(data, 0)
    print("native oracle: count=%d (%.1f s)" %
          (exp_cnt, time.perf_counter() - t0))

    prep_s = prepare_auto(static, data, 2048)
    prep_c = prepare_auto(ct.inner, data, 2048)

    def run_static():
        return spec_count_bytes(static, data, prepared=prep_s)

    def run_core():
        return core_count_bytes(ct, data, prepared=prep_c)

    arms = (("core", run_core), ("static", run_static))
    for name, fn in arms:
        t0 = time.perf_counter()
        st, c = fn()
        print("compile+run %s: %.1f s (count=%d state=%d)" %
              (name, time.perf_counter() - t0, c, st))
        assert (c, st) == (exp_cnt, exp_st), (name, c, st, exp_cnt)

    res = {name: [] for name, _ in arms}
    for _ in range(reps):
        for name, fn in arms:
            t0 = time.perf_counter()
            st, c = fn()
            dt = time.perf_counter() - t0
            res[name].append(dt)
            assert (c, st) == (exp_cnt, exp_st), (name, c, st)
    for name, _ in arms:
        ts = res[name]
        print("%s: best %.3f s = %.2f GB/s   (all: %s)" %
              (name, min(ts), n / min(ts) / 1e9,
               " ".join("%.3f" % t for t in ts)))


if __name__ == "__main__":
    main()
