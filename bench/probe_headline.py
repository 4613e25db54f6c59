"""Focused headline-kernel probe: resident-shard spec_count at a
given SREGEX_GROUPS / SREGEX_PACK_BITS config (one config per
process — GROUPS is baked at import).  Prints GB/s over reps with
value readback; compare across runs (relay noise ~1.5x, so prefer
min-of-5 and repeat).

Usage: SREGEX_GROUPS=8 python bench/probe_headline.py [MB] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    import jax
    print("backend:", jax.default_backend(),
          "GROUPS:", os.environ.get("SREGEX_GROUPS", "4"), flush=True)

    from sregex_tpu import parse, compile_regex
    from sregex_tpu.dfa import build_dfa
    from sregex_tpu.native import NativeDfa
    from sregex_tpu.ops.pallas_scan import (SpecTables,
                                            spec_count_bytes)
    from sregex_tpu.ops.prep import prepare_auto

    ast, _ = parse(rb"(?:a|b)aa(?:aa|bb)cc(?:a|b)")
    dfa = build_dfa(compile_regex(ast))
    t = SpecTables(dfa)
    native = NativeDfa(dfa)
    n = mb << 20
    body = b"abccc" * (n // 5 + 1)
    data = bytearray(body[:n])
    data[n // 2:n // 2 + 8] = b"aaabbccb"
    data = bytes(data)
    exp_c, exp_st = native.count(data, 0)
    print("native count:", exp_c, flush=True)

    t0 = time.time()
    prep = prepare_auto(t, data, 2048)
    print("prep+upload %.1fs" % (time.time() - t0), flush=True)
    t0 = time.time()
    st, c = spec_count_bytes(t, data, prepared=prep)
    print("first (compile incl.): %.1fs" % (time.time() - t0),
          flush=True)
    assert (c, st) == (exp_c, exp_st), (c, exp_c)
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        st, c = spec_count_bytes(t, data, prepared=prep)
        ts.append(time.perf_counter() - t0)
        assert (c, st) == (exp_c, exp_st)
        print("rep%d: %.4fs (%.2f GB/s)" % (r, ts[-1],
                                            n / ts[-1] / 1e9),
              flush=True)
    print("== BEST %.2f GB/s" % (n / min(ts) / 1e9), flush=True)


if __name__ == "__main__":
    main()
