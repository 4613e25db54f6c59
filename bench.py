"""Headline benchmark: DFA scan throughput on the reference bench
corpus, one chip.

Reproduces the reference bench methodology (bench/gen-data.pl:9 corpus
"abccc" x 1M + "aaabbccb"; bench/Makefile:38 pattern
'(?:a|b)aa(?:aa|bb)cc(?:a|b)'), scaled up so the measurement is not
dominated by per-dispatch relay latency, and measures the speculative
Pallas DFA scan (sregex_tpu/ops/pallas_scan.py) end to end: kernel +
result readback + host validation fold.  Host preprocessing (class
mapping/packing) is done once outside the timed region, as corpus
shards would be in production.  Baseline target: 10 GB/s/chip
(BASELINE.md).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    from sregex_tpu import parse, compile_regex
    from sregex_tpu.dfa import build_dfa
    from sregex_tpu.native import NativeDfa
    from sregex_tpu.ops.pallas_scan import (SpecTables, spec_scan_bytes,
                                            _prepare)

    pattern = "(?:a|b)aa(?:aa|bb)cc(?:a|b)"

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    ast, _ = parse(pattern)
    prog = compile_regex(ast)
    dfa = build_dfa(prog)
    tables = SpecTables(dfa)
    native = NativeDfa(dfa)

    # the reference corpus scaled 96x: match-free body, matching tail
    # (gen-data.pl's shape: the only match ends at the very end)
    import os
    mb = int(os.environ.get("SREGEX_BENCH_MB", "1920"))
    corpus = b"abccc" * (1024 * 1024 * (mb // 5)) + b"aaabbccb"
    n = len(corpus)
    K = 2048

    # correctness probe with a planted interior match, same shapes as
    # the timed corpus so the kernel compiles exactly once; doubles as
    # compile warmup
    ofs = len(corpus) // 2 + 37
    probe = corpus[:ofs] + b"xaaabbccb" + corpus[ofs + 9:]
    exp_first, _ = native.scan_first(probe, 0)
    log("bench: preparing probe (%d MB)" % (n >> 20))
    prepared_probe = _prepare(tables, probe, K)
    log("bench: compiling + probing")
    _, got_first = spec_scan_bytes(tables, probe, chunk_len=K,
                                   prepared=prepared_probe)
    del prepared_probe, probe
    if got_first != exp_first:
        print(json.dumps({"metric": "dfa_scan_gbps", "value": 0.0,
                          "unit": "GB/s", "vs_baseline": 0.0,
                          "error": "device %r != native %r"
                                   % (got_first, exp_first)}))
        return 1

    log("bench: preparing timed corpus")
    prepared = _prepare(tables, corpus, K)

    log("bench: timing")
    times = []
    for _ in range(int(os.environ.get("SREGEX_BENCH_REPS", "3"))):
        t0 = time.perf_counter()
        state, first = spec_scan_bytes(tables, corpus, chunk_len=K,
                                       prepared=prepared)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    gbps = n / dt / 1e9

    # sanity: this corpus matches only at EOF
    ok = (first == -1 and bool(tables.match_eof[state]))

    out = {
        "metric": "dfa_scan_gbps",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / 10.0, 3),
    }
    if not ok:
        out["error"] = "unexpected result state=%r first=%r" % (state,
                                                                first)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
