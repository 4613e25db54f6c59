"""Decompose the DRIVER-flow multi-regex count (bench.py bench_multi:
Scanner.count + PreparedCorpus) against the bare core_count_fused call
on the IDENTICAL prepared corpus — same process, arms interleaved
(relay noise is 1.5-2x run-to-run, so separate runs can't be
compared).  VERDICT r4 weak #1: ab_fused measured 14.29 GB/s where
the driver capture recorded 9.77/9.84 on the same construction.

Per rep it reports:
  driver   - sc.count(corpus, prepared=...)  (the bench.py flow)
  bare     - core_count_fused(fct, spec, ...) with the Scanner's OWN
             tables and the same PreparedCorpus entries
  enqueue/readback - the fused dispatch's internal split
             (ct.last_timing: async jit enqueue vs blocking summary
             readback)

Usage: python bench/profile_driver.py [MB] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("SREGEX_TIER_AB", "0")


def log(msg):
    print("profile_driver: %s" % msg, flush=True)


def build_corpus(mb):
    """EXACTLY bench.py's bench_multi corpus construction."""
    import random
    from bench import MULTI_WORDS
    pats = [w.encode() for w in MULTI_WORDS]
    rng = random.Random(1234)
    filler = [w.encode() for w in
              ("alpha bravo delta golf hotel juliet kilo lima mike "
               "november oscar papa quebec romeo sierra tango uniform "
               "victor whiskey xray yankee zulu").split()]
    piece = b" ".join(rng.choice(filler) for _ in range(512)) + b" "
    body = piece * (mb * (1 << 20) // len(piece) + 1)
    out = bytearray(body[:mb << 20])
    step = 64 << 10
    for pos in range(step, len(out) - 64, step):
        w = pats[rng.randrange(len(pats))]
        out[pos:pos + len(w) + 2] = b" " + w + b" "
    return bytes(out), pats


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    import jax
    log("backend: %s" % jax.default_backend())

    from sregex_tpu import parse_multi, compile_regex
    from sregex_tpu.stream import Scanner
    from sregex_tpu.ops.pallas_core import core_count_fused

    corpus, pats = build_corpus(mb)
    n = len(corpus)
    ast, _ = parse_multi(pats)
    prog = compile_regex(ast)
    sc = Scanner(prog, use_device=True, ast=ast)
    log("machine: %d x %d, static %s rows=%r"
        % (sc.dfa.nstates, sc.dfa.nclasses,
           type(sc._spec).__name__, getattr(sc._spec, "rows", None)))

    t0 = time.time()
    k, st_f = sc._native.count(corpus, 0)
    exp = k + int(sc.dfa.match_eof[st_f])
    log("native count: %d (%.1fs)" % (exp, time.time() - t0))

    t0 = time.time()
    prepared = sc.prepare(corpus)
    got = sc.count(corpus, prepared=prepared)
    log("driver first (compile+warmup): %d in %.1fs (tier %s)"
        % (got, time.time() - t0, sc.stats().tier))
    assert got == exp, (got, exp)
    fct = sc._fusedct
    assert fct not in (None, False), "fused tier did not engage"
    spec = sc._spec

    def driver_arm():
        return sc.count(corpus, prepared=prepared)

    def bare_arm():
        st, c = core_count_fused(
            fct, spec, corpus,
            prepared_core=prepared.for_tables(fct.inner),
            prepared_full=prepared.for_tables(spec))
        return c + int(sc.dfa.match_eof[st])

    t0 = time.time()
    g = bare_arm()
    log("bare first: %d in %.1fs" % (g, time.time() - t0))
    assert g == exp, (g, exp)

    td, tb = [], []
    for r in range(reps):
        t0 = time.perf_counter()
        assert driver_arm() == exp
        td.append(time.perf_counter() - t0)
        tm_d = dict(getattr(fct, "last_timing", {}))
        t0 = time.perf_counter()
        assert bare_arm() == exp
        tb.append(time.perf_counter() - t0)
        tm_b = dict(getattr(fct, "last_timing", {}))
        log("rep%d: driver %.3fs (%.2f GB/s; enq %.3f read %.3f)  "
            "bare %.3fs (%.2f GB/s; enq %.3f read %.3f)"
            % (r, td[-1], n / td[-1] / 1e9,
               tm_d.get("enqueue_s", -1), tm_d.get("readback_s", -1),
               tb[-1], n / tb[-1] / 1e9,
               tm_b.get("enqueue_s", -1), tm_b.get("readback_s", -1)))
    log("== BEST driver %.2f GB/s" % (n / min(td) / 1e9))
    log("== BEST bare   %.2f GB/s" % (n / min(tb) / 1e9))


if __name__ == "__main__":
    main()
