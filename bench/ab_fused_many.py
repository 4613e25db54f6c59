"""Interleaved A/B of the BATCHED multi-document count on the
bench-multi machine (90-keyword combined DFA): the legacy batched
core path (escapes re-walk natively per chunk, largest-fit core) vs
the round-5 FUSED batch path (smallest-fit core + on-device escape
redo, core_count_many_fused).  The serving shape the reference
answers with a host loop per buffer (sre_vm_pike_exec one ctx/buffer).

Both arms run ONE dispatch over the same PreparedBatch-style preps
and must return the exact per-document native counts.

Usage: python bench/ab_fused_many.py [ndocs] [doc_kb] [reps]
Default 256 docs x 1024 KB (256 MB total), 3 reps.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench"))

os.environ.setdefault("SREGEX_TIER_AB", "0")

from profile_driver import build_corpus
from sregex_tpu import parse_multi, compile_regex
from sregex_tpu.stream import Scanner
import sregex_tpu.ops.pallas_core as pc
import sregex_tpu.ops.batch as batch


def main():
    ndocs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    doc_kb = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    mb = max(32, ndocs * doc_kb // 1024 + 1)
    corpus, pats = build_corpus(mb)
    docs = [corpus[i * (doc_kb << 10):(i + 1) * (doc_kb << 10)]
            for i in range(ndocs)]
    n = sum(len(d) for d in docs)
    print("%d docs x %d KB = %d MB" % (ndocs, doc_kb, n >> 20),
          flush=True)

    ast, _ = parse_multi(pats)
    sc = Scanner(compile_regex(ast), use_device=True, ast=ast)
    spec = sc._spec
    t0 = time.time()
    exp = []
    for d in docs:
        k, st = sc._native.count(d, 0)
        exp.append((k, st))
    print("native counts done (%.1fs)" % (time.time() - t0),
          flush=True)
    exp_counts = [k for k, _ in exp]
    exp_finals = [st for _, st in exp]

    sample = b"".join(bytes(d[:1 << 16]) for d in docs[:256])
    legacy = pc.CoreTables(sc.dfa, sample, require_fast=False)
    fused = pc.CoreTables(sc.dfa, sample,
                          max_escape_frac=pc.FUSED_ESCAPE_FRAC,
                          require_fast=False, no_pair=True,
                          prefer_small=True)
    for nm, t in (("legacy", legacy), ("fused", fused)):
        i = t.inner
        print("%s core: %s H=%d rows=%r" %
              (nm, type(i).__name__, t.H, getattr(i, "rows", 1)),
              flush=True)

    K = pc.fused_chunk(fused.inner, spec, 2048)
    pb_leg = batch.batch_prepare(legacy.inner, docs, 2048)
    pb_fc = batch.batch_prepare(fused.inner, docs, K)
    pb_ff = batch.batch_prepare(spec, docs, K)
    print("preps done", flush=True)

    def legacy_arm():
        counts, finals, nat, C = batch.core_count_many(
            legacy, docs, 2048, prepared=pb_leg)
        return counts, finals, nat, C

    def fused_arm():
        r = batch.core_count_many_fused(
            fused, spec, docs, K, prepared_core=pb_fc,
            prepared_full=pb_ff)
        assert r is not None, "fused batch declined"
        return r

    arms = {"legacy": (legacy_arm, []), "fused": (fused_arm, [])}
    for nm, (fn, _) in arms.items():
        t0 = time.time()
        counts, finals, nat, C = fn()
        assert counts == exp_counts and finals == exp_finals, nm
        print("%s first %.1fs (nat %d / %d chunks)"
              % (nm, time.time() - t0, nat, C), flush=True)

    for r in range(reps):
        for nm, (fn, ts) in arms.items():
            t0 = time.perf_counter()
            counts, finals, nat, C = fn()
            ts.append(time.perf_counter() - t0)
            assert counts == exp_counts, (nm, r)
            print("rep%d %s: %.3fs (%.2f GB/s, %d/%d nat)"
                  % (r, nm, ts[-1], n / ts[-1] / 1e9, nat, C),
                  flush=True)
    for nm, (fn, ts) in arms.items():
        print("%s: min %.3fs = %.2f GB/s"
              % (nm, min(ts), n / min(ts) / 1e9), flush=True)


if __name__ == "__main__":
    sys.exit(main())
