"""Interleaved A/B on real hardware: fused two-phase count
(core kernel + on-device escape redo) vs the static wide tier, on the
bench-multi (90-keyword) machine.  Arms interleave in ONE process
(relay noise is 1.5x run-to-run); per-rep value readback.

Usage: python bench/ab_fused.py [MB] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("SREGEX_TIER_AB", "0")


def log(msg):
    print("ab_fused: %s" % msg, flush=True)


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import jax
    log("backend: %s" % jax.default_backend())

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_multi import build_corpus

    from sregex_tpu import parse_multi, compile_regex
    from sregex_tpu.stream import Scanner
    from sregex_tpu.ops.pallas_core import (CoreTables,
                                            core_count_fused)
    from sregex_tpu.ops.pallas_scan import spec_count_bytes
    from sregex_tpu.ops.prep import prepare_auto

    corpus, pats = build_corpus(mb)
    n = len(corpus)
    ast, _ = parse_multi(pats)
    prog = compile_regex(ast)
    sc = Scanner(prog, use_device=True, ast=ast)
    log("machine: %d x %d, static %s rows=%r"
        % (sc.dfa.nstates, sc.dfa.nclasses,
           type(sc._spec).__name__, getattr(sc._spec, "rows", None)))

    k, st_f = sc._native.count(corpus, 0)
    exp = k + int(sc.dfa.match_eof[st_f])
    log("native count: %d" % exp)

    ct = CoreTables(sc.dfa, corpus[:256 << 10], require_fast=False)
    log("core: H=%d inner=%s rows=%r"
        % (ct.H, type(ct.inner).__name__,
           getattr(ct.inner, "rows", None)))

    t0 = time.time()
    prep_c = prepare_auto(ct.inner, corpus, 2048)
    prep_f = prepare_auto(sc._spec, corpus, 2048)
    log("preps+uploads: %.1fs" % (time.time() - t0))

    def fused_arm():
        st, c = core_count_fused(ct, sc._spec, corpus,
                                 prepared_core=prep_c,
                                 prepared_full=prep_f)
        return c + int(sc.dfa.match_eof[st])

    def static_arm():
        st, c = spec_count_bytes(sc._spec, corpus, prepared=prep_f)
        return c + int(sc.dfa.match_eof[st])

    t0 = time.time()
    g = fused_arm()
    log("fused first (compile incl.): %d in %.1fs (repair %r)"
        % (g, time.time() - t0, ct.last_repair))
    assert g == exp, (g, exp)
    t0 = time.time()
    g = static_arm()
    log("static first (compile incl.): %d in %.1fs" % (g, time.time() - t0))
    assert g == exp, (g, exp)

    tf, ts = [], []
    for r in range(reps):
        t0 = time.perf_counter()
        assert fused_arm() == exp
        tf.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        assert static_arm() == exp
        ts.append(time.perf_counter() - t0)
        log("rep%d: fused %.3fs (%.2f GB/s, repair %r)  "
            "static %.3fs (%.2f GB/s)"
            % (r, tf[-1], n / tf[-1] / 1e9, ct.last_repair,
               ts[-1], n / ts[-1] / 1e9))
    log("== BEST fused  %.2f GB/s" % (n / min(tf) / 1e9))
    log("== BEST static %.2f GB/s" % (n / min(ts) / 1e9))


if __name__ == "__main__":
    main()
