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

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time


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
    reps = int(os.environ.get("SREGEX_BENCH_REPS", "3"))
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

    print(json.dumps({
        "metric": "dfa_scan_gbps",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / 10.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
