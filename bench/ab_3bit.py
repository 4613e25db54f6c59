"""Interleaved 3-bit vs 4-bit packing A/B on the HEADLINE shape
(VERDICT r4 #4 / weak #6): at G=8 the headline kernel sits at the
relay's HBM wall (~22 GB/s of traffic against ~20 GB/s effective
bandwidth), so the 25% traffic cut of 3-bit packing — measured a
wash back at G=4 when the kernel was NOT memory-bound — deserves a
re-probe.  Both arms live in one process (SREGEX_PACK_BITS is read
at SpecTables construction) and interleave rep-by-rep with value
readback, the only honest timing through the relay.

Usage: SREGEX_GROUPS=8 python bench/ab_3bit.py [MB=1920] [reps=5]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    import jax
    print("backend:", jax.default_backend(),
          "GROUPS:", os.environ.get("SREGEX_GROUPS", "8"), flush=True)

    from sregex_tpu import parse, compile_regex
    from sregex_tpu.dfa import build_dfa
    from sregex_tpu.native import NativeDfa
    from sregex_tpu.ops.pallas_scan import SpecTables, spec_count_bytes
    from sregex_tpu.ops.prep import prepare_auto

    ast, _ = parse(rb"(?:a|b)aa(?:aa|bb)cc(?:a|b)")
    dfa = build_dfa(compile_regex(ast))
    t4 = SpecTables(dfa)
    os.environ["SREGEX_PACK_BITS"] = "3"
    try:
        t3 = SpecTables(dfa)
    finally:
        os.environ.pop("SREGEX_PACK_BITS", None)
    assert (t4.bits, t3.bits) == (4, 3), (t4.bits, t3.bits)
    native = NativeDfa(dfa)

    n = mb << 20
    body = b"abccc" * (n // 5 + 1)
    data = bytearray(body[:n])
    data[n // 2:n // 2 + 8] = b"aaabbccb"
    data = bytes(data)
    t0 = time.time()
    exp_c, exp_st = native.count(data, 0)
    print("native count: %d (%.1fs)" % (exp_c, time.time() - t0),
          flush=True)

    arms = {}
    for name, t in (("4bit", t4), ("3bit", t3)):
        t0 = time.time()
        prep = prepare_auto(t, data, 2048)
        print("%s prep+upload %.1fs" % (name, time.time() - t0),
              flush=True)
        t0 = time.time()
        st, c = spec_count_bytes(t, data, prepared=prep)
        print("%s first (compile incl.): %.1fs" % (name,
                                                   time.time() - t0),
              flush=True)
        assert (c, st) == (exp_c, exp_st), (name, c, exp_c)
        arms[name] = (t, prep, [])

    for r in range(reps):
        for name in ("4bit", "3bit"):
            t, prep, ts = arms[name]
            t0 = time.perf_counter()
            st, c = spec_count_bytes(t, data, prepared=prep)
            ts.append(time.perf_counter() - t0)
            assert (c, st) == (exp_c, exp_st), (name, r, c, exp_c)
            print("rep%d %s: %.4fs (%.2f GB/s)"
                  % (r, name, ts[-1], n / ts[-1] / 1e9), flush=True)

    for name in ("4bit", "3bit"):
        ts = arms[name][2]
        print("%s: min %.4fs = %.2f GB/s  (K=%d cpw=%d)"
              % (name, min(ts), n / min(ts) / 1e9,
                 arms[name][1][2], arms[name][0].cpw), flush=True)


if __name__ == "__main__":
    sys.exit(main())
