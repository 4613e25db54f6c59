"""In-process interleaved A/B/C of the BATCHED multi-document scan
(ops/batch.py, Scanner.count_many) vs the two things a user would
otherwise do with a document set:

  A. host loop        — [sc.count(d) for d in docs] on the native C
                        walker (what sub-threshold docs get today);
  B. per-doc device   — one dispatch per document (threshold forced
                        to 0): the RTT wall this API exists to remove;
  C. batched device   — ONE dispatch for the whole set; reported both
                        cold (pack+upload inside) and warm
                        (prepare_many handle reused — the resident-set
                        production shape, like the headline bench).

All arms must return identical per-document counts.  Relay timings
are only honest interleaved in one process with value readbacks
inside the timed region (docs/PERFORMANCE.md).

Usage: python bench/ab_batch.py [ndocs] [doc_kb] [reps]
Default 256 docs x 512 KB (128 MB total), 3 reps, bench pattern.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sregex_tpu.stream import compile_pattern


def main():
    ndocs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    doc_kb = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    pat = b"(?:a|b)aa(?:aa|bb)cc(?:a|b)"

    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"abc ", np.uint8)
    docs = []
    for i in range(ndocs):
        d = bytearray(rng.choice(alpha, size=doc_kb << 10))
        at = int(len(d) * (0.3 + 0.5 * (i % 7) / 7))
        d[at:at + 8] = b"baaaaccb"        # one planted match per doc
        docs.append(bytes(d))
    total = sum(len(d) for d in docs)
    print("%d docs x %d KB = %d MB" % (ndocs, doc_kb, total >> 20),
          flush=True)

    sc_host = compile_pattern(pat, use_device=False)
    sc_perdoc = compile_pattern(pat, use_device=True)
    sc_perdoc.DEVICE_THRESHOLD = 1     # force per-doc dispatch
    sc_batch = compile_pattern(pat, use_device=True)
    sc_batch.DEVICE_THRESHOLD = 1

    print("warmup (compiles)...", flush=True)
    exp = [sc_host.count(d) for d in docs[:2]]
    assert sc_perdoc.count(docs[0]) == exp[0]
    h = sc_batch.prepare_many(docs)
    got = sc_batch.count_many(docs, prepared=h)
    assert got[:2] == exp, (got[:2], exp)
    expected = got

    tA, tB, tC, tD = [], [], [], []
    for rep in range(reps):
        t0 = time.perf_counter()
        r = [sc_host.count(d) for d in docs]
        tA.append(time.perf_counter() - t0)
        assert r == expected

        t0 = time.perf_counter()
        r = [sc_perdoc.count(d) for d in docs]
        tB.append(time.perf_counter() - t0)
        assert r == expected

        t0 = time.perf_counter()
        r = sc_batch.count_many(docs)          # cold: pack + upload
        tC.append(time.perf_counter() - t0)
        assert r == expected

        t0 = time.perf_counter()
        r = sc_batch.count_many(docs, prepared=h)   # warm: resident
        tD.append(time.perf_counter() - t0)
        assert r == expected
        print("rep %d: host %.3fs  per-doc-device %.3fs  "
              "batch-cold %.3fs  batch-warm %.3fs"
              % (rep, tA[-1], tB[-1], tC[-1], tD[-1]), flush=True)

    def row(name, ts):
        print("%-16s %.3fs = %.2f GB/s" %
              (name, min(ts), total / min(ts) / 1e9))
    row("host loop", tA)
    row("per-doc device", tB)
    row("batch cold", tC)
    row("batch warm", tD)


if __name__ == "__main__":
    main()
