"""Curated ON-HARDWARE smoke suite: one pattern per device tier,
each checked against a host oracle on a small corpus.

    python tests/smoke_tpu.py            # runs on the real TPU
    python tests/smoke_tpu.py --cpu      # virtual CPU mesh (debug)

Covers the tier classes that have historically broken only on real
hardware (the round-2 VMEM OOM hit every ncls>16 pattern, invisible
in interpret mode): pair-narrow, byte-narrow, 4-bit wide, 8-bit-packed
wide (ncls>16), big, adaptive core, 3-bit packing, the tagged-DFA
one-pass find, finditer via the reverse index, and the segmented
stream pipeline.  ~10-20 min total on the relay when kernel shapes
are cold; minutes when warm.  Prints one PASS line per case and
SMOKE_OK at the end (exit 0)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import random
import re

import numpy as np


def log(msg):
    print("smoke: %s" % msg, flush=True)


_t0 = None


def case(name):
    global _t0
    _t0 = time.time()
    log("== %s" % name)


def ok(name):
    log("PASS %s (%.1fs)" % (name, time.time() - _t0))


def corpus(rng, alphabet, mb, plants):
    data = bytearray(rng.choice(alphabet)
                     for _ in range(mb << 20))
    for frac, s in plants:
        pos = int(len(data) * frac)
        data[pos:pos + len(s)] = s
    return bytes(data)


def main():
    from sregex_tpu import parse, compile_regex, parse_multi
    from sregex_tpu.dfa import build_dfa
    from sregex_tpu.native import NativeDfa
    from sregex_tpu.stream import Scanner, compile_pattern

    log("backend: %s (%d devices)"
        % (jax.default_backend(), len(jax.devices())))
    rng = random.Random(42)

    def scanner_case(name, pattern, alphabet, plant, mb=16,
                     expect_tier=None, env=None):
        """Scanner count+scan vs the native oracle; asserts the
        expected device tier actually served it."""
        case(name)
        saved = {}
        if env:
            for k, v in env.items():
                saved[k] = os.environ.get(k)
                os.environ[k] = v
        try:
            ast, _ = parse(pattern)
            prog = compile_regex(ast)
            sc = Scanner(prog, use_device=True, ast=ast)
            data = corpus(rng, alphabet, mb, [(0.7, plant)])
            exp_c, exp_st = sc._native.count(data, 0)
            exp_c += int(sc.dfa.match_eof[exp_st])
            got = sc.count(data)
            assert got == exp_c, (name, got, exp_c)
            st = sc.stats()
            log("   tier %s, %d chunks, %d repaired"
                % (st.tier, st.chunks, st.repaired))
            if expect_tier:
                assert st.tier == expect_tier, (name, st.tier,
                                                expect_tier)
            exp_f, _ = sc._native.scan_first(data, 0)
            got_scan = sc.scan(data)
            if exp_f >= 0:
                assert got_scan is not None and got_scan[1] == exp_f, \
                    (name, got_scan, exp_f)
            ok(name)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    # 1. pair-narrow (the production default for tiny automata:
    # S*ncls^2 <= 128)
    scanner_case("pair-narrow", "ab", b"acb x", b"ab",
                 expect_tier="SpecTablesPair")

    # 2. byte-narrow (pair disabled)
    scanner_case("byte-narrow", "(?:a|b)aa(?:aa|bb)cc(?:a|b)",
                 b"abc x", b"baaaacca", expect_tier="SpecTables",
                 env={"SREGEX_PAIR": "0", "SREGEX_CORE": "0"})

    # 3. wide 4-bit (a branching machine the affine tier declines)
    scanner_case("wide-4bit", "(?:ab|ba){8,20}c", b"aabb c",
                 b"c" + b"ab" * 12 + b"c",
                 expect_tier="SpecTablesWide",
                 env={"SREGEX_CORE": "0"})

    # 3b. piecewise-affine tier (counted-rep chain: tiny piece table
    # + static breakpoint compares instead of the row-select chain)
    scanner_case("affine", "a{60,120}b", b"aab x",
                 b"x" + b"a" * 80 + b"b",
                 expect_tier="SpecTablesAffine",
                 env={"SREGEX_CORE": "0"})

    # 4. wide 8-bit packing (ncls > 16 — the round-2 VMEM OOM class)
    case("wide-8bit-multi")
    words = [w.encode() for w in
             ("alpha bravo charlie delta echo foxtrot golf hotel "
              "india juliet kilo lima mike november oscar papa "
              "quebec romeo").split()]
    ast, _ = parse_multi(words)
    prog = compile_regex(ast)
    os.environ["SREGEX_CORE"] = "0"
    try:
        sc = Scanner(prog, use_device=True, ast=ast)
        assert sc.dfa.nclasses > 16, sc.dfa.nclasses
        data = corpus(rng, b"abcdefgh ", 8,
                      [(0.5, b" kilo "), (0.8, b" romeo ")])
        exp_c, exp_st = sc._native.count(data, 0)
        exp_c += int(sc.dfa.match_eof[exp_st])
        got = sc.count(data)
        assert got == exp_c, (got, exp_c)
        st = sc.stats()
        log("   tier %s (8-bit words)" % st.tier)
        assert st.tier in ("SpecTablesWide", "SpecTablesBig"), st.tier
    finally:
        os.environ.pop("SREGEX_CORE", None)
    ok("wide-8bit-multi")

    # 4b. wide 8-bit at the BENCH-MULTI machine size (rows ~ 98): the
    # round-3 hardware bench OOM'd exactly this shape against the
    # scoped-VMEM limit (BENCH_r03.json, VERDICT r3 weak #1) and the
    # old 18-word case was too small to catch it.  Forced through the
    # STATIC wide tier (the kernel that crashed), corpus sized so the
    # grid double-buffers (B >= 2).
    def wide_8bit_bench():
        # hardware-only: interpret mode cannot trace an R~98 select
        # chain — the CPU-mesh analog of this regression is
        # tests/test_pallas_scan.py::test_vmem_chunk_clamp_is_shape_derived
        case("wide-8bit-bench")
        if jax.default_backend() == "cpu":
            log("   SKIP (interpret mode cannot trace R~98 chains)")
            return
        import bench as _bench
        words = [w.encode() for w in _bench.MULTI_WORDS]
        ast, _ = parse_multi(words)
        prog = compile_regex(ast)
        os.environ["SREGEX_CORE"] = "0"
        os.environ["SREGEX_PAIR"] = "0"
        try:
            sc = Scanner(prog, use_device=True, ast=ast)
            from sregex_tpu.ops.pallas_scan import (SpecTablesWide,
                                                    effective_chunk)
            assert isinstance(sc._spec, SpecTablesWide), type(sc._spec)
            assert sc._spec.rows >= 90 and sc._spec.bits == 8, \
                (sc._spec.rows, sc._spec.bits)
            K = effective_chunk(sc._spec, 2048)
            mb = max(16, (2 * 4 * 1024 * K >> 20) + 4)  # B >= 2 blocks
            data = corpus(rng, b"etaoin shrdlu", mb,
                          [(0.3, b" deadlock "), (0.8, b" failover ")])
            exp_c, exp_st = sc._native.count(data, 0)
            exp_c += int(sc.dfa.match_eof[exp_st])
            got = sc.count(data)
            assert got == exp_c, (got, exp_c)
            st = sc.stats()
            log("   tier %s rows=%d K=%d %d chunks, %d repaired"
                % (st.tier, sc._spec.rows, K, st.chunks, st.repaired))
            assert st.tier == "SpecTablesWide", st.tier
        finally:
            os.environ.pop("SREGEX_CORE", None)
            os.environ.pop("SREGEX_PAIR", None)
        ok("wide-8bit-bench")

    wide_8bit_bench()

    # 5. big tier (S*ncls past even the TPU wide cap)
    case("big-tier")
    from sregex_tpu.ops.pallas_big import SpecTablesBig
    from sregex_tpu.ops.pallas_scan import spec_count_bytes
    ast, _ = parse(b"(x|y|z[QW]){1,5}(longish|loquatious)")
    dfa = build_dfa(compile_regex(ast), max_states=65536)
    big = SpecTablesBig(dfa)
    native = NativeDfa(dfa)
    data = corpus(rng, b"xyzQWlong ", 8, [(0.6, b"zQxylongish")])
    exp_c, exp_st = native.count(data, 0)
    st_got, c_got = spec_count_bytes(big, data)
    assert (c_got, st_got) == (exp_c, exp_st), (c_got, exp_c)
    ok("big-tier")

    # 6. adaptive core tier over the same big machine
    case("core-tier")
    from sregex_tpu.ops.pallas_core import CoreTables, core_count_bytes
    ct = CoreTables(dfa, data[: 1 << 20])
    st_got, c_got = core_count_bytes(ct, data)
    assert (c_got, st_got) == (exp_c, exp_st), (c_got, exp_c)
    ok("core-tier")

    # 7. 3-bit packing (<= 8 classes)
    scanner_case("narrow-3bit", "(?:a|b)aa(?:aa|bb)cc(?:a|b)",
                 b"abc x", b"baaaacca", mb=8,
                 env={"SREGEX_PACK_BITS": "3", "SREGEX_PAIR": "0",
                      "SREGEX_CORE": "0"})

    # 8. tagged-DFA one-pass find (captures from device registers)
    case("tdfa-find")
    sc = compile_pattern(rb"(\w+)@(\w+)", use_device=True)
    data = corpus(rng, b"ab @. ", 8, [(0.65, b" user@host ")])
    got = sc.find(data)
    m = re.search(rb"(\w+)@(\w+)", data)
    assert m is not None and got is not None
    rid, ovec = got
    assert (ovec[0], ovec[1]) == (m.start(), m.end()), (ovec, m.span())
    assert (ovec[2], ovec[3]) == m.span(1)
    assert (ovec[4], ovec[5]) == m.span(2)
    ok("tdfa-find")

    # 9. finditer via the reverse index (teleport across gaps)
    case("finditer-index")
    sc = compile_pattern(b"(?:a|b)aa(?:aa|bb)cc(?:a|b)",
                         use_device=True)
    data = corpus(rng, b"ab x", 8,
                  [(0.2, b"baaaacca"), (0.8, b"xaaabbccb")])
    idx = sc.make_index(data)
    spans = [(m[1][0], m[1][1]) for m in sc.finditer(data, index=idx)]
    exp = [m.span() for m in
           re.finditer(rb"(?:a|b)aa(?:aa|bb)cc(?:a|b)", data)]
    assert spans == exp, (spans[:3], exp[:3])
    ok("finditer-index")

    # 10. segmented stream pipeline (uploads overlap kernels)
    case("pipeline-stream")
    sc = compile_pattern(b"(?:a|b)aa(?:aa|bb)cc(?:a|b)",
                         use_device=True)
    data = corpus(rng, b"abc x", 32, [(0.5, b"baaaacca")])
    segs = [data[i:i + (5 << 20)] for i in range(0, len(data),
                                                 5 << 20)]
    exp = sc.count(data)
    got = sc.count_stream(iter(segs))
    assert got == exp, (got, exp)
    log("   stream stats: %r" % (sc.stats().as_dict(),))
    ok("pipeline-stream")

    # 11. exact φ transfer-composition tier (speculation-hostile
    # corpora; round-3).  The escalation LADDER is CPU-tested
    # (test_pallas_phi) — here we validate the kernel on hardware.
    case("phi-exact")
    sc = compile_pattern(rb"b(?:aa)*b", use_device=True)
    data = bytearray(b"a" * (8 << 20))
    data[4 << 20:(4 << 20) + 6] = b"baaaab"
    data = bytes(data)
    exp_c, exp_st = sc._native.count(data, 0)
    exp_c += int(sc.dfa.match_eof[exp_st])
    sc._phi_active = True
    assert sc._phi_tables() is not None
    got = sc.count(data)
    assert got == exp_c, (got, exp_c)
    assert sc.stats().tier == "PhiTables", sc.stats().tier
    ok("phi-exact")

    # 12. wide tagged-DFA find (ROWS > 1 capture kernel; round-3)
    case("tdfa-wide-find")
    pat = rb"(GET|POST|PUT)x(HTTP|FTP)"
    sc = compile_pattern(pat, use_device=True)
    from sregex_tpu.ops.tdfa_scan import TdfaSpecTables
    sc._tdfa_spec = TdfaSpecTables(sc.program)
    assert sc._tdfa_spec.rows > 1
    data = corpus(rng, b"GEPOSTUFH ", 8, [(0.7, b" PUTxFTP ")])
    got = sc.find(data)
    m = re.search(pat, data)
    assert got is not None and m is not None
    assert (got[1][0], got[1][1]) == (m.start(), m.end()), got
    assert (got[1][2], got[1][3]) == m.span(1)
    ok("tdfa-wide-find")

    # 13. tagged-DFA hi nibble plane (>8 regs/tags; round-3)
    case("tdfa-hi-plane")
    pat = rb"([a-z]{2,12})=([0-9]{2,8})"
    sc = compile_pattern(pat, use_device=True)
    sc._tdfa_spec = TdfaSpecTables(sc.program)
    assert sc._tdfa_spec.nregs > 8, sc._tdfa_spec.nregs
    data = corpus(rng, b"xy09=. ", 8, [(0.6, b" key=1234 ")])
    got = sc.find(data)
    m = re.search(pat, data)
    assert got is not None and m is not None
    assert (got[1][0], got[1][1]) == (m.start(), m.end()), got
    assert (got[1][2], got[1][3]) == m.span(1)
    assert (got[1][4], got[1][5]) == m.span(2)
    ok("tdfa-hi-plane")

    # 14. streaming events engine (finditer_stream/sub_stream on the
    # device fire map; round-3) — logs rates vs count_stream for
    # docs/PERFORMANCE.md (relay variance: no hard rate assert)
    case("events-stream")
    pat = rb"ERROR[^\n]*"
    sc = compile_pattern(pat, use_device=True)
    data = corpus(rng, b"log lines go here\n", 32,
                  [(f, b"ERROR boom %d\n" % i)
                   for i, f in enumerate((0.1, 0.4, 0.7, 0.95))])
    segs = [data[i:i + (8 << 20)] for i in range(0, len(data),
                                                 8 << 20)]
    t0 = time.time()
    evs = list(sc.finditer_stream(iter(segs)))
    t_ev = time.time() - t0
    exp = [(m.start(), m.end()) for m in re.finditer(pat, data)]
    assert [(ov[0], ov[1]) for _, ov in evs] == exp, (len(evs),
                                                      len(exp))
    t0 = time.time()
    sc.count_stream(iter(segs))
    t_cs = time.time() - t0
    log("   finditer_stream %.2fs vs count_stream %.2fs (%.1fx)"
        % (t_ev, t_cs, t_ev / max(t_cs, 1e-9)))
    out = b"".join(sc.sub_stream(b"<cut>", iter(segs)))
    assert out == re.sub(pat, b"<cut>", data)
    ok("events-stream")

    # 15. mid-band tier A/B (measurement-driven selection; round-3;
    # production config — SREGEX_TIER_AB unset/on outside pytest)
    case("tier-ab")
    pat = rb"(foo|bar|baz|qux)=[0-9a-f]{2,8}"
    sc = compile_pattern(pat, use_device=True)
    data = corpus(rng, b"0123 456 789 -- ", 8, [])
    exp_c, exp_st = sc._native.count(data, 0)
    exp_c += int(sc.dfa.match_eof[exp_st])
    got = sc.count(data)
    assert got == exp_c, (got, exp_c)
    ab = getattr(sc, "tier_ab", None)
    log("   tier_ab: %r" % (ab,))
    if ab is not None:
        got2 = sc.count(data)
        assert got2 == exp_c
        log("   post-pick tier %s" % sc.stats().tier)
    ok("tier-ab")

    # 16. 8-bit-packed tagged-DFA find (ncls > 16 capture machines;
    # round-3) — the Mosaic compile path for the 8-bit data words
    # (cpw=4, K clamped to 1920) differs from interpret mode, so the
    # case must run on hardware
    case("tdfa-8bit-find")
    pat = rb"(money|parted|fool|kilo|victor|zebra)x([0-9]+)"
    sc = compile_pattern(pat, use_device=True)
    # 693 table entries: inside the TPU budget (2048), past the
    # conservative interpret-mode default (512) — raise it so the
    # case also runs under `make smoke-cpu`
    _save = os.environ.get("SREGEX_TDFA_MAX")
    os.environ["SREGEX_TDFA_MAX"] = "4096"
    try:
        sc._tdfa_spec = TdfaSpecTables(sc.program)
    finally:
        if _save is None:
            del os.environ["SREGEX_TDFA_MAX"]
        else:
            os.environ["SREGEX_TDFA_MAX"] = _save
    assert sc._tdfa_spec.bits == 8, sc._tdfa_spec.bits
    data = corpus(rng, b"abcdefgz 0189 ", 8, [(0.7, b" zebrax77 ")])
    got = sc.find(data)
    m = re.search(pat, data)
    assert got is not None and m is not None
    assert (got[1][0], got[1][1]) == (m.start(), m.end()), got
    assert (got[1][2], got[1][3]) == m.span(1)
    assert (got[1][4], got[1][5]) == m.span(2)
    ok("tdfa-8bit-find")

    # 17. byte-code source planes (>13 regs/tags; round-3) — a
    # 7-group timestamp pattern (16 tags) rides 8-bit source codes
    # (4 stacked planes); the Mosaic path differs from interpret mode
    case("tdfa-bytecode-find")
    pat = rb"(\d+)-(\d+)-(\d+)T(\d+):(\d+):(\d+)\.(\d+)"
    sc = compile_pattern(pat, use_device=True)
    sc._tdfa_spec = TdfaSpecTables(sc.program)
    assert sc._tdfa_spec.code_bits == 8, sc._tdfa_spec.code_bits
    data = corpus(rng, b"abc 0189-:.T ", 8,
                  [(0.7, b" 2026-08-19T12:34:56.789 ")])
    got = sc.find(data)
    m = re.search(pat, data)
    assert got is not None and m is not None
    assert (got[1][0], got[1][1]) == (m.start(), m.end()), got
    for gi in range(1, 8):
        assert (got[1][2 * gi], got[1][2 * gi + 1]) == m.span(gi), gi
    ok("tdfa-bytecode-find")

    # 18. batched multi-document scan (ops/batch.py; round-3) — one
    # dispatch over a document set, per-doc results vs host oracles
    case("batch-many")
    pat = rb"(?:a|b)aa(?:aa|bb)cc(?:a|b)"
    sc = compile_pattern(pat, use_device=True)
    sc.DEVICE_THRESHOLD = 1
    host = compile_pattern(pat, use_device=False)
    pool = corpus(rng, b"abc x", 8, [])
    docs = []
    for i in range(24):
        at = rng.randrange(0, len(pool) - (1 << 18))
        d = bytearray(pool[at:at + (1 << 18)])
        if i % 3 != 2:
            pat_at = rng.randrange(0, len(d) - 10)
            d[pat_at:pat_at + 8] = b"baaaaccb"
        docs.append(bytes(d))
    docs += [b"", b"baaaaccb", b"x" * 2047]
    h = sc.prepare_many(docs)
    got_c = sc.count_many(docs, prepared=h)
    assert got_c == [host.count(d) for d in docs]
    assert sc.stats().api == "count_many", sc.stats()
    got_s = sc.scan_many(docs, prepared=h)
    assert got_s == [host.scan(d) for d in docs]
    # batched captures: one tagged dispatch for the whole set
    fpat = rb"(\w+)@(\w+)"
    scf = compile_pattern(fpat, use_device=True)
    scf.DEVICE_THRESHOLD = 1
    hostf = compile_pattern(fpat, use_device=False)
    fdocs = [bytes(d[:1 << 16]) + (b" ab%d@cd%d " % (i, i)
                                   if i % 2 else b"")
             for i, d in enumerate(docs[:8])]
    assert scf.find_many(fdocs) == [hostf.find(d) for d in fdocs]
    assert scf.stats().api == "find_many", scf.stats()
    ok("batch-many")

    # 19. fused two-phase count (round-4): a long-chain wide machine
    # routes Scanner.count through core kernel + on-device escape
    # redo; must be exact with near-zero host repairs
    case("fused-count")
    words = [w.encode() for w in
             ("epsilon theta lambda omicron upsilon "
              "gamma sigma kappa").split()]
    ast, _ = parse_multi(words)
    prog = compile_regex(ast)
    _ab_save = os.environ.get("SREGEX_TIER_AB")
    os.environ["SREGEX_TIER_AB"] = "0"   # pin: this case asserts the
    try:                                 # fused tier itself, not the A/B
        sc = Scanner(prog, use_device=True, ast=ast)
        from sregex_tpu.ops.pallas_scan import SpecTablesWide as _W
        if isinstance(sc._spec, _W) and sc._spec.rows > 4:
            data = corpus(rng, b"zxqwvu ", 12,
                          [(0.3, b" lambda "), (0.8, b" kappa ")])
            exp_c, exp_st = sc._native.count(data, 0)
            exp_c += int(sc.dfa.match_eof[exp_st])
            got = sc.count(data)
            assert got == exp_c, (got, exp_c)
            assert sc._fusedct not in (None, False), \
                "fused not engaged"
            st = sc.stats()
            log("   fused repaired %d/%d on host" % (st.repaired,
                                                     st.chunks))
            ok("fused-count")
        else:
            log("   SKIP (machine shape below the fused band: %s)"
                % type(sc._spec).__name__)
    finally:
        if _ab_save is None:
            os.environ.pop("SREGEX_TIER_AB", None)
        else:
            os.environ["SREGEX_TIER_AB"] = _ab_save

    # 20. 16-bit tagged-DFA code planes (round-4): a 16-group pattern
    # (34 tags) returns the full capture vector one-pass
    case("tdfa-16bit-find")
    pat = rb"x(a+)(b)(c)(d)(e)(f)(g)(h)(i)(j)(k)(l)(m)(n)(o)(p+)y"
    sc = compile_pattern(pat, use_device=True)
    sc._tdfa_spec = TdfaSpecTables(sc.program)
    assert sc._tdfa_spec.code_bits == 16, sc._tdfa_spec.code_bits
    data = corpus(rng, b"abcdefghijklmnop xy", 4,
                  [(0.6, b"xaaabcdefghijklmnoppy")])
    got = sc.find(data)
    m = re.search(pat, data)
    assert got is not None and m is not None
    assert (got[1][0], got[1][1]) == (m.start(), m.end()), got
    for gi in range(1, 17):
        assert (got[1][2 * gi], got[1][2 * gi + 1]) == m.span(gi), gi
    ok("tdfa-16bit-find")

    # 21. round-5 fused surfaces: batched count/scan over a document
    # set (escapes redo on device inside the one dispatch) and the
    # fused reverse chunk map behind make_index/finditer
    case("fused-many-index")
    words = [w.encode() for w in
             ("epsilon theta lambda omicron upsilon "
              "gamma sigma kappa").split()]
    ast, _ = parse_multi(words)
    prog = compile_regex(ast)
    _ab_save = os.environ.get("SREGEX_TIER_AB")
    os.environ["SREGEX_TIER_AB"] = "0"
    try:
        sc = Scanner(prog, use_device=True, ast=ast)
        host = Scanner(prog, use_device=False, ast=ast)
        from sregex_tpu.ops.pallas_scan import SpecTablesWide as _W2
        if isinstance(sc._spec, _W2) and sc._spec.rows > 4:
            base = corpus(rng, b"zxqwvu ", 8,
                          [(0.1, b" lambda "), (0.35, b" kappa "),
                           (0.6, b" sigma "), (0.85, b" theta ")])
            docs = [base[i << 20:(i << 20) + (1 << 20 | (i * 4097))]
                    for i in range(6)]
            got = sc.count_many(docs)
            exp = [host.count(d) for d in docs]
            assert got == exp, (got, exp)
            assert sc._fusedct not in (None, False), "fused-many off"
            st = sc.stats()
            log("   fused-many repaired %d/%d on host"
                % (st.repaired, st.chunks))
            data = docs[0]
            idx = sc.make_index(data)
            gotf = [m for m in sc.finditer(data, index=idx)]
            expf = [m for m in host.finditer(data)]
            assert gotf == expf, (len(gotf), len(expf))
            if sc._rev_fusedct not in (None, False):
                log("   fused reverse map repaired %d/%d"
                    % sc._rev_fusedct.last_repair)
            ok("fused-many-index")
        else:
            log("   SKIP (machine shape below the fused band: %s)"
                % type(sc._spec).__name__)
    finally:
        if _ab_save is None:
            os.environ.pop("SREGEX_TIER_AB", None)
        else:
            os.environ["SREGEX_TIER_AB"] = _ab_save

    print("SMOKE_OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
