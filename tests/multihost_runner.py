"""One process of the 2-process jax.distributed scan test.

Usage (spawned twice by tests/test_multihost.py, or by hand):

    python tests/multihost_runner.py <process_id> <port> [seed]

Each process initializes jax.distributed against a localhost
coordinator with 4 virtual CPU devices (global mesh: 8), holds ONLY
its host_slices() byte range of a deterministic corpus, and runs
parallel.multihost.count_multihost.  The result is checked against
the full-corpus native count (computable here only because the test
generator is deterministic; a real deployment never materializes the
full corpus on one host).  Prints MULTIHOST_OK on success.
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    jax.distributed.initialize("localhost:" + port,
                               num_processes=2, process_id=pid)

    import numpy as np
    from jax.sharding import Mesh
    from sregex_tpu import parse, compile_regex
    from sregex_tpu.dfa import build_dfa
    from sregex_tpu.native import NativeDfa
    from sregex_tpu.ops.pallas_scan import SpecTables
    from sregex_tpu.parallel.multihost import (count_multihost,
                                               scan_multihost,
                                               host_slices)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    K = 64
    bb = 4096 * K          # bytes per kernel block

    cases = [
        # (pattern, alphabet, total bytes)  — first is block-exact on
        # both processes, second leaves the last process ragged
        (b"ab", b"aab b", 8 * bb),
        (b"(?:a|b)aa(?:aa|bb)cc(?:a|b)", b"abccc x",
         4 * bb + 3 * bb + bb // 2 + 137),
    ]
    for pat, alpha, n in cases:
        dfa = build_dfa(compile_regex(parse(pat)[0]))
        tables = SpecTables(dfa)
        rng = random.Random(seed)
        full = bytes(rng.choice(alpha) for _ in range(n))
        (lo0, hi0), (lo1, hi1) = host_slices(n, 2, K,
                                             mesh.devices.size)
        lo, hi = (lo0, hi0) if pid == 0 else (lo1, hi1)

        st, cnt = count_multihost(tables, full[lo:hi], mesh, K,
                                  full_len=n)
        exp_cnt, exp_st = NativeDfa(dfa).count(full, 0)
        assert (cnt, st) == (exp_cnt, exp_st), \
            (pat, pid, cnt, exp_cnt, st, exp_st)
        print("pid %d %s: count %d state %d OK" %
              (pid, pat.decode(), cnt, st), flush=True)

    # earliest-match scan: the only match lives deep in process 1's
    # slice (the sequential fold must carry across the host boundary
    # and the byte owner resolves the regex id); then a no-match run
    from sregex_tpu.parser import parse_multi
    ast, _ = parse_multi([b"zzz", b"needle"])
    dfa = build_dfa(compile_regex(ast))
    tables = SpecTables(dfa)
    n = 8 * bb
    rng = random.Random(seed + 1)
    full = bytearray(rng.choice(b"abcdefgh ") for _ in range(n))
    at = int(n * 0.8)
    full[at:at + 6] = b"needle"
    full = bytes(full)
    (lo0, hi0), (lo1, hi1) = host_slices(n, 2, K, mesh.devices.size)
    lo, hi = (lo0, hi0) if pid == 0 else (lo1, hi1)
    nat = NativeDfa(dfa)
    exp_f, exp_rid, exp_st = nat.scan_first_id(full, 0)
    st, end, rid = scan_multihost(tables, full[lo:hi], mesh, K,
                                  full_len=n)
    assert (end, rid, st) == (exp_f, exp_rid, exp_st), \
        (pid, end, exp_f, rid, exp_rid, st, exp_st)
    assert rid == 1 and end == at + 6, (rid, end, at)
    print("pid %d scan: end %d rid %d OK" % (pid, end, rid),
          flush=True)
    calm = full[:at] + b"xxxxxx" + full[at + 6:]
    st, end, rid = scan_multihost(tables, calm[lo:hi], mesh, K,
                                  full_len=n)
    exp_f2, exp_st2 = nat.scan_first(calm, 0)
    assert (end, st) == (exp_f2, exp_st2) and rid == -1, \
        (pid, end, exp_f2, st, exp_st2, rid)
    print("pid %d scan no-match OK" % pid, flush=True)

    # RAGGED first-process slice (arbitrary split, not block-exact):
    # the pad-aware fold path — count, match-in-each-half scan, and
    # the cross-boundary state carry all checked vs the full oracle
    pat = b"(?:a|b)aa(?:aa|bb)cc(?:a|b)"
    dfa = build_dfa(compile_regex(parse(pat)[0]))
    tables = SpecTables(dfa)
    n = 5 * bb + 1234
    rng = random.Random(seed + 2)
    # no 'c' in the random alphabet: the planted strings carry the
    # only possible "cc", so the late-match case below is guaranteed
    # to have its first match past the cut
    full = bytearray(rng.choice(b"abx x") for _ in range(n))
    full[2 * bb + 777:2 * bb + 777 + 8] = b"baaaacca"   # proc 0 half
    full[4 * bb + 99:4 * bb + 99 + 8] = b"baaaacca"     # proc 1 half
    full = bytes(full)
    cut = 2 * bb + 31337
    lo, hi = (0, cut) if pid == 0 else (cut, n)
    nat = NativeDfa(dfa)
    st, cnt = count_multihost(tables, full[lo:hi], mesh, K,
                              full_len=n)
    exp_cnt, exp_st = nat.count(full, 0)
    assert (cnt, st) == (exp_cnt, exp_st), \
        ("ragged", pid, cnt, exp_cnt, st, exp_st)
    st, end, rid = scan_multihost(tables, full[lo:hi], mesh, K,
                                  full_len=n)
    exp_f, exp_rid, exp_s = nat.scan_first_id(full, 0)
    assert (end, rid, st) == (exp_f, exp_rid, exp_s), \
        ("ragged scan", pid, end, exp_f, rid, exp_rid)
    # match strictly in the SECOND half: carry crosses the ragged cut
    late = bytearray(full)
    late[2 * bb + 777:2 * bb + 777 + 8] = b"xxxxxxxx"
    late = bytes(late)
    st, end, rid = scan_multihost(tables, late[lo:hi], mesh, K,
                                  full_len=n)
    exp_f, exp_s = nat.scan_first(late, 0)
    assert (end, st) == (exp_f, exp_s), \
        ("ragged late scan", pid, end, exp_f)
    assert end >= cut, (end, cut)
    print("pid %d ragged slices OK" % pid, flush=True)

    # fuzz mode: N random (pattern, corpus, size) cases, identical on
    # both processes (seeded), count + scan vs the full-corpus native
    # oracle — exercises arbitrary slice boundaries, ragged tails,
    # repair handoffs, and multi-regex ids
    fuzz_n = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    pats = [b"ab", b"a+b", rb"\bword\b", b"^line", b"(?:cat|dog|bird)",
            b"a[^b]{0,20}b", b"x*y"]
    frng = random.Random(seed * 31 + 7)
    for i in range(fuzz_n):
        if frng.random() < 0.3:
            k = frng.randint(2, 3)
            ps = frng.sample(pats, k)
            ast, _ = parse_multi(ps)
        else:
            ast, _ = parse(frng.choice(pats))
        dfa = build_dfa(compile_regex(ast))
        try:
            tables = SpecTables(dfa)
        except ValueError:
            continue
        alpha = b"abxy catdogbird word line\n"
        # 8 blocks total: 4 per process (2*bpp must divide over the
        # 8-device mesh); half the cases shave a ragged tail
        n = 8 * bb - (frng.randrange(bb // 2) if
                      frng.random() < 0.5 else 0)
        full = bytes(frng.choice(alpha) for _ in range(n))
        if frng.random() < 0.5:
            # arbitrary (ragged) split: exercises the pad-aware fold
            cut = frng.randint(1, n - 1)
            sl = [(0, cut), (cut, n)]
        else:
            sl = host_slices(n, 2, K, mesh.devices.size)
        lo, hi = sl[pid]
        nat = NativeDfa(dfa)
        st, cnt = count_multihost(tables, full[lo:hi], mesh, K,
                                  full_len=n)
        exp_cnt, exp_st = nat.count(full, 0)
        assert (cnt, st) == (exp_cnt, exp_st), (i, cnt, exp_cnt)
        st, end, rid = scan_multihost(tables, full[lo:hi], mesh, K,
                                      full_len=n)
        exp_f, exp_rid, exp_s = nat.scan_first_id(full, 0)
        assert (end, st) == (exp_f, exp_s) and \
            (end < 0 or rid == exp_rid), (i, end, exp_f, rid, exp_rid)
    if fuzz_n:
        print("pid %d fuzz: %d cases OK" % (pid, fuzz_n), flush=True)
    print("MULTIHOST_OK", flush=True)


if __name__ == "__main__":
    main()
