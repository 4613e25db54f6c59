"""Headline benchmark: DFA scan throughput on the reference bench
corpus, one chip.

Reproduces the reference bench methodology (bench/gen-data.pl:9 corpus
"abccc" x 1M + tail; bench/Makefile:38 pattern
'(?:a|b)aa(?:aa|bb)cc(?:a|b)'), scaled up so the measurement is not
dominated by per-dispatch relay latency, and measures the speculative
Pallas DFA scan (sregex_tpu/ops/pallas_scan.py) end to end: kernel +
result readback + host validation fold.  A match is planted near the
end of the corpus; every timed repetition must return its exact
offset, so each measurement is also a correctness check against the
native C++ engine.

Preprocessing runs ON DEVICE (ops/prep.py: the host only uploads raw
bytes; class-map, windowing, packing, and tiling are one fused XLA
program) once outside the timed region, as resident corpus shards
would sit in production.  The cold-data path (upload + device prep +
scan) is timed separately and reported on stderr and in
docs/PERFORMANCE.md.  Baseline target: 10 GB/s/chip (BASELINE.md).

Prints one JSON line per metric ({"metric", "value", "unit",
"vs_baseline"}); the headline dfa_scan_gbps line is LAST (the driver
parses the last line).  The second metric, multi_dfa_scan_gbps, is
BASELINE config 5's shape — a ~90-keyword multi-regex set compiled
into ONE combined DFA (the reference's flagship multi-regex API,
README.markdown:70-72) counted over a text corpus through the
Scanner's production tier dispatch (the adaptive core tier: the
static chain bottoms out at the big tier for this machine).
SREGEX_BENCH_MULTI_MB sizes its corpus (default 1920: 512 MB was
dispatch-RTT-bound at ~7.5 GB/s, 1 GB showed 14.3 in the interleaved
A/B but only 9.8 through the driver; 1920 MB halves the fixed-cost
fraction again and stays under the 2^31 device-prep cliff).
"""

import json
import os
import sys
import time

# ~90 distinct keywords: the dictionary-matching production shape
# (log scanning / routing).  Compiled via parse_multi into one
# program; matches report which keyword fired (regex ids).
MULTI_WORDS = """error warning failure timeout retry connect disconnect login logout session
token refresh expired invalid denied granted access request response header
payload buffer overflow underflow socket stream packet frame segment router
gateway proxy cache miss hit evict flush commit rollback begin transaction
deadlock conflict replica shard leader follower election heartbeat snapshot
compact merge split index query plan execute fetch cursor batch queue topic
partition offset consumer producer broker cluster node zone region latency
throughput quota limit throttle backoff jitter circuit breaker fallback
primary secondary standby failover recover restore backup archive purge""".split()


def bench_multi(log):
    """Multi-pattern combined-DFA count over a text corpus; returns
    the metric dict (value 0.0 + error key on mismatch)."""
    import random

    from sregex_tpu import parse_multi, compile_regex
    from sregex_tpu.stream import Scanner

    # 1920 MB (the headline's size): amortizes the fixed dispatch
    # overhead ~2x over the old 1024 default while staying under the
    # 2^31 padded-corpus cliff where device prep falls back to host
    # packing (ops/prep.py prepare_on_device)
    mb = int(os.environ.get("SREGEX_BENCH_MULTI_MB", "1920"))
    reps = int(os.environ.get("SREGEX_BENCH_REPS", "5"))

    pats = [w.encode() for w in MULTI_WORDS]
    ast, _ = parse_multi(pats)
    prog = compile_regex(ast)
    sc = Scanner(prog, use_device=True, ast=ast)
    log("multi: %d patterns -> %d DFA states, %d classes"
        % (len(pats), sc.dfa.nstates, sc.dfa.nclasses))

    # text corpus from a DISJOINT vocabulary with dictionary words
    # planted every ~64 KB (fired chunks exercise the real repair
    # load); the native C++ engine provides the expected count
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
    corpus = bytes(out)
    del body, out
    n = len(corpus)

    # overlap the remote kernel compiles with the host-only oracle
    # count (VERDICT r4 #8): precompile() pushes a zero-filled
    # same-shape stand-in (HBM fill, no upload) through the exact
    # prep + fused-dispatch flow in a worker thread while the native
    # C++ count (ctypes, GIL released) runs here.  SREGEX_PRECOMPILE=0
    # restores the serialized flow.
    pre = {}
    th = None
    if os.environ.get("SREGEX_PRECOMPILE", "1") != "0":
        import threading

        def _warm():
            try:
                pre["s"] = sc.precompile(
                    n, sample=corpus[:sc.CORE_SAMPLE])
            except Exception:            # never let warmup kill the run
                import traceback
                pre["err"] = traceback.format_exc().strip() \
                    .replace("\n", " | ")

        th = threading.Thread(target=_warm, daemon=True)
        th.start()

    t0 = time.time()
    k, st_final = sc._native.count(corpus, 0)
    exp = k + int(sc.dfa.match_eof[st_final])
    log("multi: native count %d (%.1fs)" % (exp, time.time() - t0))
    if th is not None:
        th.join()
        log("multi: precompile %s (overlapped with oracle)"
            % (("%.1fs" % pre["s"]) if "s" in pre
               else pre.get("err", "?")))

    t0 = time.time()
    prepared = sc.prepare(corpus)
    got = sc.count(corpus, prepared=prepared)
    log("multi: compile+warmup %.1fs (tier %s)"
        % (time.time() - t0, sc.stats().tier))
    if got != exp:
        return {"metric": "multi_dfa_scan_gbps", "value": 0.0,
                "unit": "GB/s", "vs_baseline": 0.0,
                "error": "device %r != native %r" % (got, exp)}
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        got = sc.count(corpus, prepared=prepared)
        times.append(time.perf_counter() - t0)
        if got != exp:
            return {"metric": "multi_dfa_scan_gbps", "value": 0.0,
                    "unit": "GB/s", "vs_baseline": 0.0,
                    "error": "rep device %r != native %r" % (got, exp)}
    gbps = n / min(times) / 1e9
    st = sc.stats()
    log("multi: %.2f GB/s (tier %s, %d/%d chunks repaired)"
        % (gbps, st.tier, st.repaired, st.chunks))
    return {"metric": "multi_dfa_scan_gbps", "value": round(gbps, 3),
            "unit": "GB/s", "vs_baseline": round(gbps / 10.0, 3)}


def main():
    # persistent compilation cache: the remote relay compile of the
    # scan kernel costs minutes; priming it here lets the driver's
    # run (same trace) start hot
    try:
        import jax
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/jax_sregex"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          5.0)
    except Exception:
        pass

    from sregex_tpu import parse, compile_regex
    from sregex_tpu.dfa import build_dfa
    from sregex_tpu.native import NativeDfa
    from sregex_tpu.ops.pallas_scan import SpecTables, spec_scan_bytes
    from sregex_tpu.ops.prep import prepare_on_device

    def log(msg):
        print("bench: %s" % msg, file=sys.stderr, flush=True)

    pattern = "(?:a|b)aa(?:aa|bb)cc(?:a|b)"
    mb = int(os.environ.get("SREGEX_BENCH_MB", "1920"))
    reps = int(os.environ.get("SREGEX_BENCH_REPS", "5"))
    K = 2048

    ast, _ = parse(pattern)
    prog = compile_regex(ast)
    dfa = build_dfa(prog)
    tables = SpecTables(dfa)
    native = NativeDfa(dfa)

    # match-free body with one planted match near the end: every timed
    # rep must locate it exactly
    body = b"abccc" * (1024 * 1024 * (mb // 5))
    ofs = (len(body) * 255 // 256) // 5 * 5 + 2
    corpus = body[:ofs] + b"xaaabbccb" + body[ofs + 9:]
    n = len(corpus)
    del body

    t0 = time.time()
    exp_first, _ = native.scan_first(corpus, 0)
    log("native expected offset %d (%.1fs)" % (exp_first, time.time() - t0))
    assert exp_first > 0

    t0 = time.time()
    log("device-preparing %d MB corpus (compile + upload + pack)"
        % (n >> 20))
    prepared = prepare_on_device(tables, corpus, K)
    prep_compile_s = time.time() - t0
    log("device prepare took %.1fs (first call includes compile)"
        % prep_compile_s)

    t0 = time.time()
    log("compiling + warmup")
    _, got = spec_scan_bytes(tables, corpus, chunk_len=K,
                             prepared=prepared)
    log("compile+warmup took %.1fs" % (time.time() - t0))
    if got != exp_first:
        print(json.dumps({"metric": "dfa_scan_gbps", "value": 0.0,
                          "unit": "GB/s", "vs_baseline": 0.0,
                          "error": "device %r != native %r"
                                   % (got, exp_first)}))
        return 1

    log("timing %d reps" % reps)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _, got = spec_scan_bytes(tables, corpus, chunk_len=K,
                                 prepared=prepared)
        times.append(time.perf_counter() - t0)
        if got != exp_first:
            print(json.dumps({"metric": "dfa_scan_gbps", "value": 0.0,
                              "unit": "GB/s", "vs_baseline": 0.0,
                              "error": "rep device %r != native %r"
                                       % (got, exp_first)}))
            return 1
    dt = min(times)
    gbps = n / dt / 1e9

    # cold-data: (a) host->device upload of the raw bytes (relay
    # bandwidth, no compute), (b) device prep + scan from
    # device-resident raw (the production cold path: shards arrive in
    # HBM raw, preprocessing and scan both on chip)
    import numpy as _np
    import jax.numpy as _jnp
    del prepared
    t0 = time.perf_counter()
    raw_dev = _jnp.asarray(_np.frombuffer(corpus, _np.uint8))
    raw_dev.block_until_ready()
    up_dt = time.perf_counter() - t0
    log("raw upload: %.2fs = %.2f GB/s (relay host->HBM)"
        % (up_dt, n / up_dt / 1e9))
    # steady-state cold path: shards arrive raw in HBM, prep + scan
    # run on chip.  One untimed pass first — the device-array input
    # traces a different prep program than the host-bytes path, and
    # a compile inside the timed region would misreport the rate.
    cold_prep = prepare_on_device(tables, raw_dev, K)
    _, got_cold = spec_scan_bytes(tables, corpus, chunk_len=K,
                                  prepared=cold_prep)
    del cold_prep
    t0 = time.perf_counter()
    cold_prep = prepare_on_device(tables, raw_dev, K)
    _, got_cold = spec_scan_bytes(tables, corpus, chunk_len=K,
                                  prepared=cold_prep)
    cold_dt = time.perf_counter() - t0
    log("cold device path (prep+scan from device-resident raw): "
        "%.2fs = %.2f GB/s, match %s"
        % (cold_dt, n / cold_dt / 1e9,
           "ok" if got_cold == exp_first else "WRONG"))
    del cold_prep, raw_dev

    # second metric: multi-pattern combined-DFA scan (never lets a
    # failure there take down the headline line)
    del corpus
    try:
        multi = bench_multi(log)
    except Exception as e:
        multi = {"metric": "multi_dfa_scan_gbps", "value": 0.0,
                 "unit": "GB/s", "vs_baseline": 0.0,
                 "error": repr(e)}
    print(json.dumps(multi), flush=True)

    # headline LAST: the driver parses the final JSON line
    print(json.dumps({
        "metric": "dfa_scan_gbps",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / 10.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
