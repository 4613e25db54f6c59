"""Interleaved A/B on real hardware: piecewise-affine tier vs the
big-table tier on the branching counted-rep monster (the big-tier
floor class, VERDICT r3 #4).  Arms interleave in ONE process with
per-rep value readback.

Usage: python bench/ab_affine.py [pattern] [MB] [reps]
Default: the 1,102-state conformance-scale monster, 256 MB, 3.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("SREGEX_TIER_AB", "0")


def log(msg):
    print("ab_affine: %s" % msg, flush=True)


def main():
    pat = (sys.argv[1] if len(sys.argv) > 1
           else "(?:a[bc]|de*f|g[hi]j){220,490}z")
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    import jax
    log("backend: %s" % jax.default_backend())

    import random
    from sregex_tpu import parse, compile_regex
    from sregex_tpu.dfa import build_dfa
    from sregex_tpu.native import NativeDfa
    from sregex_tpu.ops.pallas_affine import SpecTablesAffine
    from sregex_tpu.ops.pallas_big import SpecTablesBig
    from sregex_tpu.ops.pallas_scan import spec_count_bytes
    from sregex_tpu.ops.prep import prepare_auto

    ast, _ = parse(pat.encode())
    dfa = build_dfa(compile_regex(ast), max_states=65536)
    log("machine: S=%d ncls=%d entries=%d"
        % (dfa.nstates, dfa.nclasses, dfa.nstates * dfa.nclasses))
    from sregex_tpu.ops.pallas_scan import with_warmup
    aff = SpecTablesAffine(dfa)
    aff = with_warmup(aff, 512) or aff
    log("affine: pieces=%d perm=%s rows=%d W=%d"
        % (aff.pieces, aff.perm is not None, aff.rows, aff.warmup))
    big = SpecTablesBig(dfa)
    big = with_warmup(big, 512) or big
    log("big: rows=%d bits=%d W=%d" % (big.rows, big.bits,
                                       big.warmup))

    # uniform-visiting corpus with CONVERGENT chunks: excursions of
    # 30..160 units (~90-480 bytes) walk deep into the chain but stay
    # under the W=512 speculation window, so the A/B measures KERNEL
    # rates, not the shared native-repair floor (the first run of
    # this bench used 200-490-unit runs: 96% of chunks repaired on
    # BOTH arms and the tiers were indistinguishable at 0.05 GB/s)
    rng = random.Random(7)
    unit = [b"ab", b"ac", b"df", b"def", b"ghj", b"gij"]
    out = bytearray()
    n = mb << 20
    while len(out) < n:
        for _ in range(rng.randrange(30, 160)):
            out += rng.choice(unit)
        out += b"z" if rng.random() < 0.5 else b" "
    corpus = bytes(out[:n])
    del out

    t0 = time.time()
    exp_c, exp_st = NativeDfa(dfa).count(corpus, 0)
    log("native count: %d in %.1fs (%.2f GB/s)"
        % (exp_c, time.time() - t0, n / (time.time() - t0) / 1e9))

    prep_a = prepare_auto(aff, corpus, 2048)
    prep_b = prepare_auto(big, corpus, 2048)

    def arm(t, prep):
        st, c = spec_count_bytes(t, corpus, prepared=prep)
        return c, st

    for name, t, prep in (("affine", aff, prep_a), ("big", big, prep_b)):
        t0 = time.time()
        c, st = arm(t, prep)
        log("%s first (compile incl.): %r in %.1fs (repair %r)"
            % (name, (c, st), time.time() - t0, t.last_repair))
        assert (c, st) == (exp_c, exp_st), (name, c, exp_c)

    ta, tb = [], []
    for r in range(reps):
        t0 = time.perf_counter()
        assert arm(aff, prep_a) == (exp_c, exp_st)
        ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        assert arm(big, prep_b) == (exp_c, exp_st)
        tb.append(time.perf_counter() - t0)
        log("rep%d: affine %.3fs (%.2f GB/s, repair %r)  "
            "big %.3fs (%.2f GB/s)"
            % (r, ta[-1], n / ta[-1] / 1e9, aff.last_repair,
               tb[-1], n / tb[-1] / 1e9))
    log("== BEST affine %.2f GB/s" % (n / min(ta) / 1e9))
    log("== BEST big    %.2f GB/s" % (n / min(tb) / 1e9))


if __name__ == "__main__":
    main()
