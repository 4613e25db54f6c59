"""In-process interleaved A/B of the ONE-PASS tagged-DFA device find
(ops/tdfa_scan.py, wide ROWS>1 kernel for mid-size capture machines)
vs the 3-pass path (forward locate + reverse start scan + windowed
Pike) on the same corpus.  Both arms must return the exact-mode Pike
answer.  Relay timings are only honest interleaved in one process
with a value readback inside the timed region (docs/PERFORMANCE.md).

Usage: python bench/ab_tdfa.py [pattern] [MB] [reps] [plant] [alpha]
Default pattern: (GET|POST|PUT)x(HTTP|FTP)  (TDFA rows=2 — past the
narrow 128-entry budget), 64 MB, 3 reps; plant/alpha default to the
default pattern's (pass both when overriding the pattern, e.g.
'2026-08-19T12:34:56.789' 'abc 0123456789-:.T' for the 7-group
byte-code-plane timestamp pattern).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sregex_tpu.stream import compile_pattern
from sregex_tpu.ops.tdfa_scan import TdfaSpecTables, tdfa_spec_find


def main():
    pat = sys.argv[1] if len(sys.argv) > 1 \
        else "(GET|POST|PUT)x(HTTP|FTP)"
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    sc = compile_pattern(pat.encode(), use_device=True)
    t = TdfaSpecTables(sc.program)
    print("pattern %r: TDFA S=%d ncls=%d entries=%d rows=%d" %
          (pat, t.nstates, t.ncls, t.nstates * t.ncls, t.rows))

    rng = np.random.default_rng(0)
    plant = sys.argv[4].encode() if len(sys.argv) > 4 else b"PUTxFTP"
    alphabet = sys.argv[5].encode() if len(sys.argv) > 5 \
        else b"GEPOSTUFHXabc "
    data = bytes(rng.choice(np.frombuffer(alphabet, np.uint8),
                            size=mb << 20))
    at = int(len(data) * 0.9)
    data = data[:at] + plant + data[at + len(plant):]

    exp = None
    sc3 = compile_pattern(pat.encode(), use_device=True)
    sc3._tdfa_spec = None          # 3-pass arm
    sc1 = compile_pattern(pat.encode(), use_device=True)
    sc1._tdfa_spec = t             # one-pass arm

    # warmup (compiles) outside the timed region
    print("warmup (compiles)...", flush=True)
    r1 = sc1.find(data)
    r3 = sc3.find(data)
    assert r1 == r3, (r1, r3)
    exp = r3
    print("answer:", exp, flush=True)

    t1 = []
    t3 = []
    for rep in range(reps):
        t0 = time.perf_counter()
        r = sc1.find(data)
        t1.append(time.perf_counter() - t0)
        assert r == exp
        t0 = time.perf_counter()
        r = sc3.find(data)
        t3.append(time.perf_counter() - t0)
        assert r == exp
        print("rep %d: one-pass %.3fs  three-pass %.3fs"
              % (rep, t1[-1], t3[-1]), flush=True)
    n = len(data)
    print("one-pass  : %.3fs = %.2f GB/s" % (min(t1), n / min(t1) / 1e9))
    print("three-pass: %.3fs = %.2f GB/s" % (min(t3), n / min(t3) / 1e9))


if __name__ == "__main__":
    main()
