"""Profile the bench-multi (90-keyword combined DFA) count on real
hardware: where does the time go, per VERDICT r4 item #2?

Decomposes one Scanner-equivalent core-tier count into:
  - kernel dispatch + summary readback (the device part)
  - per-chunk plane readback (_unpack)
  - fold bookkeeping (numpy)
  - native full-machine chunk repairs

and reports the static wide tier's rate on the same corpus for
comparison.  Interleaved reps (relay noise is 1.5x run-to-run).

Usage: python bench/profile_multi.py [MB]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("SREGEX_TIER_AB", "0")


def log(msg):
    print("profile: %s" % msg, flush=True)


def build_corpus(mb):
    import random
    import bench as _bench
    rng = random.Random(1234)
    pats = [w.encode() for w in _bench.MULTI_WORDS]
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
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(os.environ.get("SREGEX_BENCH_REPS", "3"))
    import jax
    log("backend: %s" % jax.default_backend())

    from sregex_tpu import parse_multi, compile_regex
    from sregex_tpu.stream import Scanner
    from sregex_tpu.ops import pallas_core
    from sregex_tpu.ops.pallas_core import CoreTables, _run, _Fold
    from sregex_tpu.ops.pallas_scan import spec_count_bytes

    corpus, pats = build_corpus(mb)
    n = len(corpus)
    ast, _ = parse_multi(pats)
    prog = compile_regex(ast)
    sc = Scanner(prog, use_device=True, ast=ast)
    log("machine: %d states x %d classes; static tier %s rows=%r"
        % (sc.dfa.nstates, sc.dfa.nclasses,
           type(sc._spec).__name__, getattr(sc._spec, "rows", None)))

    t0 = time.time()
    k, st_f = sc._native.count(corpus, 0)
    exp = k + int(sc.dfa.match_eof[st_f])
    t_native_full = time.time() - t0
    log("native full count: %d in %.2fs (%.2f GB/s)"
        % (exp, t_native_full, n / t_native_full / 1e9))

    t0 = time.time()
    ct = CoreTables(sc.dfa, corpus[:256 << 10],
                    require_fast=False)
    log("CoreTables built in %.2fs: H=%d, inner=%s ncls=%d bits=%d "
        "rows=%r" % (time.time() - t0, ct.H,
                     type(ct.inner).__name__, ct.inner.ncls,
                     ct.inner.bits, getattr(ct.inner, "rows", None)))

    from sregex_tpu.ops.prep import prepare_auto
    t0 = time.time()
    prepared = prepare_auto(ct.inner, corpus, 2048)
    log("core prep+upload: %.2fs" % (time.time() - t0))

    # instrumented core count (mirrors core_count_bytes)
    def timed_count():
        t = {}
        t0 = time.perf_counter()
        summ, packed, raw, C, K, nn = _run(ct, corpus, 2048, 0,
                                           prepared, True)
        t["kernel+summary"] = time.perf_counter() - t0
        if bool(summ[0]):
            t["total"] = t["kernel+summary"]
            return ct.to_full(int(summ[6])), int(summ[7]), t, (0, C)
        t0 = time.perf_counter()
        fold = _Fold(ct, packed, C, K, nn, quiet=False)
        t["unpack+fold"] = time.perf_counter() - t0
        native = ct.native
        total = int(summ[7])
        e_full = ct.to_full(int(summ[2]))
        c = int(summ[1])
        nat = 0
        t_nat = 0.0
        t0 = time.perf_counter()
        while c < C:
            if fold.trusted(c, e_full):
                b = fold.run_end(c)
                total += fold.run_count(c, b)
                e_full = ct.to_full(int(fold.phi[b]))
                c = b + 1
                continue
            lo = c * K
            hi = min(lo + K, nn)
            tn = time.perf_counter()
            kk, st = native.count(raw[lo:hi].tobytes(), e_full)
            t_nat += time.perf_counter() - tn
            total += kk
            e_full = st
            c += 1
            nat += 1
        t["repair-loop"] = time.perf_counter() - t0 - t_nat
        t["native-repairs"] = t_nat
        t["total"] = sum(v for k2, v in t.items() if k2 != "total")
        return e_full, total, t, (nat, C)

    st, got, t, (nat, C) = timed_count()
    got += int(sc.dfa.match_eof[st])
    log("first core count (compile incl.): %d (exp %d)" % (got, exp))
    assert got == exp, (got, exp)

    # static wide tier on the same corpus, own prep
    t0 = time.time()
    prepared_w = prepare_auto(sc._spec, corpus, 2048)
    log("wide prep+upload: %.2fs" % (time.time() - t0))
    t0 = time.time()
    st_w, got_w = spec_count_bytes(sc._spec, corpus,
                                   prepared=prepared_w)
    got_w += int(sc.dfa.match_eof[st_w])
    log("first wide count (compile incl.): %d in %.1fs"
        % (got_w, time.time() - t0))
    assert got_w == exp, (got_w, exp)

    # interleaved timed reps
    core_best, wide_best = None, None
    for r in range(reps):
        st, got, t, (nat, C) = timed_count()
        got += int(sc.dfa.match_eof[st])
        assert got == exp
        gbps = n / t["total"] / 1e9
        log("core rep%d: %.3fs (%.2f GB/s) %s repaired=%d/%d"
            % (r, t["total"], gbps,
               {k2: round(v, 4) for k2, v in t.items()}, nat, C))
        if core_best is None or t["total"] < core_best[0]:
            core_best = (t["total"], t, nat, C)
        t0 = time.perf_counter()
        st_w, got_w = spec_count_bytes(sc._spec, corpus,
                                       prepared=prepared_w)
        dt = time.perf_counter() - t0
        got_w += int(sc.dfa.match_eof[st_w])
        assert got_w == exp
        log("wide rep%d: %.3fs (%.2f GB/s) repaired=%r"
            % (r, dt, n / dt / 1e9, sc._spec.last_repair))
        if wide_best is None or dt < wide_best:
            wide_best = dt

    tt, t, nat, C = core_best
    log("== BEST core: %.2f GB/s  breakdown %s  (repairs %d/%d)"
        % (n / tt / 1e9, {k2: round(v, 4) for k2, v in t.items()},
           nat, C))
    log("== BEST wide: %.2f GB/s" % (n / wide_best / 1e9))


if __name__ == "__main__":
    main()
