"""In-process interleaved A/B of the FUSED path's warmup-ladder
escalation (round 5, VERDICT r4 #2) on a long-excursion corpus: a
counted-rep machine in the fused band (static tier wide rows>4;
SREGEX_AFFINE=0 pins the fused path) over 'a' runs of 250..450 bytes
— far past the default 32-byte window, so the un-escalated arm's
merged chain breaks at every mid-excursion chunk and repairs on host,
while the escalated arm (ladder -> W=512 on BOTH machines, threaded
into phase 1 and the phase-2 redo tables) validates clean at device
rate with 0 host repairs.  Both arms must return the exact native
count every rep.

Usage: SREGEX_AFFINE=0 python bench/ab_fused_warm.py [MB] [reps]
Defaults: 256 MB, 3 reps.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("SREGEX_AFFINE", "0")
os.environ.setdefault("SREGEX_TIER_AB", "0")

from sregex_tpu import parse, compile_regex
from sregex_tpu.stream import Scanner
from sregex_tpu.native import NativeDfa


def build_scanner():
    ast, _ = parse(b"a{200,400}b")
    sc = Scanner(compile_regex(ast), use_device=True, ast=ast)
    sc.DEVICE_THRESHOLD = 1 << 12
    return sc


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    sc_base = build_scanner()
    sc_base.WARM_LADDER = ()          # escalation OFF: round-4 state
    sc_warm = build_scanner()
    from sregex_tpu.ops.pallas_scan import SpecTablesWide
    assert isinstance(sc_warm._spec, SpecTablesWide) \
        and sc_warm._spec.rows > 4, "machine left the fused band"
    print("S=%d ncls=%d rows=%d"
          % (sc_warm.dfa.nstates, sc_warm.dfa.nclasses,
             sc_warm._spec.rows), flush=True)

    # benign head feeds the core sample; long excursions follow
    rng = np.random.default_rng(7)
    n = mb << 20
    parts = []
    total = 0
    head = []
    ht = 0
    while ht < sc_warm.CORE_SAMPLE:
        k = int(rng.integers(5, 40))
        head.append(b"a" * k + b" ")
        ht += k + 1
    parts.append(b"".join(head)[:sc_warm.CORE_SAMPLE])
    total = sc_warm.CORE_SAMPLE
    seps = [b"b", b" "]
    while total < n:
        k = int(rng.integers(250, 450))
        s = seps[int(rng.integers(0, 2))]
        j = int(rng.integers(5, 40))
        parts.append(b"a" * k + s + b"a" * j + b" ")
        total += k + j + 2
    data = b"".join(parts)[:n]
    native = NativeDfa(sc_warm.dfa)
    t0 = time.time()
    exp_c, exp_st = native.count(data, 0)
    exp = exp_c + int(sc_warm.dfa.match_eof[exp_st])
    print("native count: %d (%.1fs)" % (exp, time.time() - t0),
          flush=True)

    arms = {}
    for name, sc in (("base-W32", sc_base), ("ladder", sc_warm)):
        prepared = sc.prepare(data)
        t0 = time.time()
        got = sc.count(data, prepared=prepared)
        assert got == exp, (name, got, exp)
        st = sc.stats()
        print("%s first: %.1fs (tier %s, %d/%d repaired)"
              % (name, time.time() - t0, st.tier, st.repaired,
                 st.chunks), flush=True)
        arms[name] = (sc, prepared, [])
    # let the ladder escalate (2 strikes per rung, 2 rungs) and
    # compile its escalated traces outside the timed region
    for _ in range(4):
        got = sc_warm.count(data, prepared=arms["ladder"][1])
        assert got == exp
        st = sc_warm.stats()
        print("ladder warm: W=%s repairs %d/%d"
              % (getattr(sc_warm._spec, "warmup", "?"), st.repaired,
                 st.chunks), flush=True)
        if st.repaired <= 1:
            break

    for r in range(reps):
        for name in ("base-W32", "ladder"):
            sc, prepared, ts = arms[name]
            t0 = time.perf_counter()
            got = sc.count(data, prepared=prepared)
            ts.append(time.perf_counter() - t0)
            assert got == exp, (name, r, got, exp)
            st = sc.stats()
            print("rep%d %s: %.3fs (%.2f GB/s, %d/%d repaired)"
                  % (r, name, ts[-1], n / ts[-1] / 1e9, st.repaired,
                     st.chunks), flush=True)

    for name in ("base-W32", "ladder"):
        ts = arms[name][2]
        sc = arms[name][0]
        st = sc.stats()
        print("%s: min %.3fs = %.2f GB/s (final W=%s, %d/%d repaired)"
              % (name, min(ts), n / min(ts) / 1e9,
                 getattr(sc._spec, "warmup", "?"), st.repaired,
                 st.chunks), flush=True)


if __name__ == "__main__":
    sys.exit(main())
