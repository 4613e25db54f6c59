"""In-process interleaved A/B of the exact φ-composition tier
(ops/pallas_phi.py) vs the speculative tier's native-repair
degradation on a corpus NO warmup window can fix: b(?:aa)*b tracks
the parity of each 'a' run — unbounded history — so every chunk
whose entry falls mid-run speculates wrong and repairs natively,
while the φ tier composes exact per-chunk transfer functions with
zero repair.  Both arms must return the exact native count.

Usage: python bench/ab_phi.py [MB] [reps]
Defaults: 256 MB, 3 reps.
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
from sregex_tpu.stream import _build_spec_tables
from sregex_tpu.ops.pallas_scan import spec_count_bytes
from sregex_tpu.ops.pallas_phi import (PhiTables, phi_count_bytes,
                                       _phi_prepare)
from sregex_tpu.ops.prep import prepare_auto


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    ast, _ = parse(rb"b(?:aa)*b")
    dfa = build_dfa(compile_regex(ast), max_states=65536)
    native = NativeDfa(dfa)
    spec = _build_spec_tables(dfa)
    phi = PhiTables(dfa)
    print("S=%d ncls=%d; spec tier %s; phi nseg=%d rows=%d"
          % (dfa.nstates, dfa.nclasses, type(spec).__name__,
             phi.nseg, phi.rows), flush=True)

    rng = np.random.default_rng(0)
    n = mb << 20
    parts = []
    total = 0
    while total < n:
        for r in rng.integers(60, 300, size=4096):
            parts.append(b"a" * int(r))
            parts.append(b"b")
            total += int(r) + 1
        if total >= n:
            break
    data = b"".join(parts)[:n]
    del parts

    t0 = time.time()
    exp_c, exp_st = native.count(data, 0)
    print("native count %d (%.1fs)" % (exp_c, time.time() - t0),
          flush=True)

    print("preparing + compiles...", flush=True)
    spec_prep = prepare_auto(spec, data, 2048)
    phi_prep = _phi_prepare(phi, data, 2048)
    st, c = spec_count_bytes(spec, data, prepared=spec_prep)
    assert (c, st) == (exp_c, exp_st), (c, exp_c)
    print("spec repair: %r" % (spec.last_repair,), flush=True)
    st, c = phi_count_bytes(phi, data, prepared=phi_prep)
    assert (c, st) == (exp_c, exp_st), (c, exp_c)

    ts, tp = [], []
    for rep in range(reps):
        t0 = time.perf_counter()
        st, c = spec_count_bytes(spec, data, prepared=spec_prep)
        ts.append(time.perf_counter() - t0)
        assert (c, st) == (exp_c, exp_st)
        t0 = time.perf_counter()
        st, c = phi_count_bytes(phi, data, prepared=phi_prep)
        tp.append(time.perf_counter() - t0)
        assert (c, st) == (exp_c, exp_st)
        print("rep %d: spec %.2fs  phi %.2fs" % (rep, ts[-1], tp[-1]),
              flush=True)
    print("spec (degradation): %.2fs = %.3f GB/s"
          % (min(ts), n / min(ts) / 1e9))
    print("phi  (exact)      : %.2fs = %.3f GB/s  (%.1fx)"
          % (min(tp), n / min(tp) / 1e9, min(ts) / min(tp)))


if __name__ == "__main__":
    main()
