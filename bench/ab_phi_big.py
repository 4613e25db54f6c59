"""Interleaved A/B: the BIG φ tier (sublane-group transfer
composition, 128 < S <= 1024) vs the speculative tier's native-repair
floor, on an unbounded-history machine no warmup window can fix:
b(?:a{499})*b tracks the a-run length mod 499 (VERDICT r3 #3 — the
corpus-independent exactness gap past S=128).

Usage: python bench/ab_phi_big.py [MB] [reps]   (defaults 256, 3)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("SREGEX_TIER_AB", "0")


def log(msg):
    print("ab_phi_big: %s" % msg, flush=True)


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import jax
    log("backend: %s" % jax.default_backend())

    from sregex_tpu import parse, compile_regex
    from sregex_tpu.dfa import build_dfa
    from sregex_tpu.native import NativeDfa
    from sregex_tpu.stream import _build_spec_tables
    from sregex_tpu.ops.pallas_scan import spec_count_bytes
    from sregex_tpu.ops.pallas_phi import (PhiTablesBig,
                                           phi_count_bytes,
                                           phi_prepare)
    from sregex_tpu.ops.prep import prepare_auto

    ast, _ = parse(rb"b(?:a{499})*b")
    dfa = build_dfa(compile_regex(ast), max_states=65536)
    native = NativeDfa(dfa)
    spec = _build_spec_tables(dfa)
    phi = PhiTablesBig(dfa)
    log("S=%d ncls=%d; spec tier %s; phi SB=%d CPT=%d rows=%d"
        % (dfa.nstates, dfa.nclasses, type(spec).__name__,
           phi.SB, phi.CPT, phi.rows))

    rng = np.random.default_rng(0)
    n = mb << 20
    parts = []
    total = 0
    while total < n:
        for r in rng.integers(800, 4000, size=1024):
            parts.append(b"a" * int(r))
            parts.append(b"b")
            total += int(r) + 1
        if total >= n:
            break
    data = b"".join(parts)[:n]
    del parts

    t0 = time.time()
    exp_c, exp_st = native.count(data, 0)
    log("native count: %d in %.1fs" % (exp_c, time.time() - t0))

    prep_s = prepare_auto(spec, data, 2048)
    prep_p = phi_prepare(phi, data, 2048)

    def spec_arm():
        st, c = spec_count_bytes(spec, data, prepared=prep_s)
        return c, st

    def phi_arm():
        st, c = phi_count_bytes(phi, data, prepared=prep_p)
        return c, st

    t0 = time.time()
    r = phi_arm()
    log("phi first (compile incl.): %r in %.1fs"
        % (r, time.time() - t0))
    assert r == (exp_c, exp_st), (r, exp_c)
    t0 = time.time()
    r = spec_arm()
    log("spec first (compile incl.): %r in %.1fs (repair %r)"
        % (r, time.time() - t0, spec.last_repair))
    assert r == (exp_c, exp_st), (r, exp_c)

    tp, ts = [], []
    for r_i in range(reps):
        t0 = time.perf_counter()
        assert phi_arm() == (exp_c, exp_st)
        tp.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        assert spec_arm() == (exp_c, exp_st)
        ts.append(time.perf_counter() - t0)
        log("rep%d: phi %.3fs (%.2f GB/s)  spec %.3fs (%.2f GB/s, "
            "repair %r)"
            % (r_i, tp[-1], n / tp[-1] / 1e9, ts[-1],
               n / ts[-1] / 1e9, spec.last_repair))
    log("== BEST phi  %.2f GB/s" % (n / min(tp) / 1e9))
    log("== BEST spec %.2f GB/s" % (n / min(ts) / 1e9))


if __name__ == "__main__":
    main()
