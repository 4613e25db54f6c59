"""Batched multi-document scan (ops/batch.py, Scanner.count_many /
scan_many / match_many): one kernel dispatch over a document set must
return exactly the per-document results, for every tier the static
chain picks and for adversarial document sizes (empty, sub-chunk,
chunk-exact, chunk+1, multi-chunk)."""

import random
import re

from sregex_tpu.stream import compile_pattern


def _docs(rng, alpha, plant, sizes):
    out = []
    for n in sizes:
        d = bytearray(rng.choice(alpha) for _ in range(n))
        if n > 40 and rng.random() < 0.7:
            at = rng.randrange(0, n - len(plant))
            d[at:at + len(plant)] = plant
        out.append(bytes(d))
    return out


SIZES = [0, 1, 13, 2047, 2048, 2049, 6000, 30011, 4096]


def _check(pat, alpha, plant, seed, multi=False, chunk_len=2048):
    rng = random.Random(seed)
    sc = compile_pattern(pat, use_device=True)
    sc.DEVICE_THRESHOLD = 1
    host = compile_pattern(pat, use_device=False)
    docs = _docs(rng, alpha, plant, SIZES)
    want_counts = [host.count(d) for d in docs]
    want_scans = [host.scan(d) for d in docs]
    got_counts = sc.count_many(docs, chunk_len=chunk_len)
    st = sc.stats()
    got_scans = sc.scan_many(docs, chunk_len=chunk_len)
    assert got_counts == want_counts, (pat, got_counts, want_counts)
    assert got_scans == want_scans, (pat, got_scans, want_scans)
    assert sc.match_many(docs) == [s is not None for s in want_scans]
    return st


def test_batch_narrow():
    st = _check(rb"(?:a|b)aa(?:aa|bb)cc(?:a|b)", b"abc x", b"baaaaccb",
                11)
    # the one dispatch must have served the batch (not a host loop)
    assert st is not None and st.api == "count_many", st
    assert st.tier.startswith("SpecTables"), st.tier


def test_batch_wide_rows():
    _check(rb"foo[a-z]{8,18}bar", b"abfor z", b"fooabcdefghijbar", 12)


def test_batch_8bit_classes():
    sc = compile_pattern(rb"alpha|bravo|charlie|delta|echo|foxtrot|"
                         rb"golf|hotel|india|juliet|kilo|lima|mike|"
                         rb"november|oscar|papa|quebec|romeo")
    if sc._spec is not None:
        assert sc._spec.bits == 8     # the point of this case
    _check(rb"alpha|bravo|charlie|delta|echo|foxtrot|golf|hotel|"
           rb"india|juliet|kilo|lima|mike|november|oscar|papa|"
           rb"quebec|romeo", b"abcdefghijklmnopqrstuvwxyz ",
           b" november ", 13)


def test_batch_multi_ids():
    rng = random.Random(14)
    sc = compile_pattern([b"cat", b"dog", b"bird"], use_device=True)
    sc.DEVICE_THRESHOLD = 1
    host = compile_pattern([b"cat", b"dog", b"bird"],
                           use_device=False)
    docs = _docs(rng, b"catdogbir x", b"dog", SIZES)
    assert sc.scan_many(docs) == [host.scan(d) for d in docs]
    assert sc.count_many(docs) == [host.count(d) for d in docs]


def test_batch_small_chunk_small_docs():
    """Sub-2048 documents get device coverage with a lowered
    chunk_len (the packing quantum is 16 bytes)."""
    _check(rb"er+or", b"erox ", b"errror", 15, chunk_len=256)


def test_batch_eof_and_empty():
    """EOF-boundary matches are counted per document; empty docs and
    an empty batch behave."""
    sc = compile_pattern(rb"ab\z", use_device=True)
    sc.DEVICE_THRESHOLD = 1
    host = compile_pattern(rb"ab\z", use_device=False)
    docs = [b"", b"ab", b"xab", b"ab" * 3000, (b"x" * 2046) + b"ab"]
    assert sc.count_many(docs) == [host.count(d) for d in docs]
    assert sc.scan_many(docs) == [host.scan(d) for d in docs]
    assert sc.count_many([]) == []


def test_batch_matches_re_oracle():
    rng = random.Random(16)
    pat = rb"[a-f]+[0-9]{2,5}"
    sc = compile_pattern(pat, use_device=True)
    sc.DEVICE_THRESHOLD = 1
    docs = _docs(rng, b"abcdef012345 xyz", b"abc123", SIZES)
    got = sc.count_many(docs)
    for d, g in zip(docs, got):
        # count() counts match-ENDING boundaries (incl. EOF), not
        # non-overlapping matches: count every boundary via the host
        # scanner as the independent reference, and spot-check
        # presence/absence against re
        assert (g > 0) == (re.search(pat, d) is not None), d[:50]


def test_batch_prepared_reuse():
    """prepare_many() handles skip the pack/upload on reuse and
    return identical results across count_many and scan_many."""
    rng = random.Random(17)
    pat = rb"(?:a|b)aa(?:aa|bb)cc(?:a|b)"
    sc = compile_pattern(pat, use_device=True)
    sc.DEVICE_THRESHOLD = 1
    host = compile_pattern(pat, use_device=False)
    docs = _docs(rng, b"abc x", b"baaaaccb", SIZES)
    h = sc.prepare_many(docs)
    assert h is not None and h.nbytes == sum(len(d) for d in docs)
    assert sc.count_many(docs, prepared=h) \
        == [host.count(d) for d in docs]
    assert sc.scan_many(docs, prepared=h) \
        == [host.scan(d) for d in docs]
    # second reuse (the resident-batch production shape)
    assert sc.count_many(docs, prepared=h) \
        == [host.count(d) for d in docs]


def test_batch_find_many():
    """find_many: per-document leftmost-first captures in one tagged
    dispatch, exactly [sc.find(d) for d in docs]."""
    rng = random.Random(18)
    pat = rb"(\w+)@(\w+)"
    sc = compile_pattern(pat, use_device=True)
    sc.DEVICE_THRESHOLD = 1
    host = compile_pattern(pat, use_device=False)
    docs = _docs(rng, b"abc@12 .,", b"user@host", SIZES)
    got = sc.find_many(docs)
    want = [host.find(d) for d in docs]
    assert got == want, (got, want)
    assert sc.stats().api == "find_many", sc.stats()
    # prepared reuse (tagged packing)
    h = sc.prepare_many(docs, for_find=True)
    assert h is not None
    assert sc.find_many(docs, prepared=h) == want


def test_batch_find_many_bytecode():
    """find_many over a >13-tag machine (byte-code planes) and over
    multi-doc EOF/empty edges."""
    rng = random.Random(19)
    pat = rb"(\d+)-(\d+)-(\d+)T(\d+):(\d+):(\d+)\.(\d+)"
    sc = compile_pattern(pat, use_device=True)
    sc.DEVICE_THRESHOLD = 1
    host = compile_pattern(pat, use_device=False)
    docs = _docs(rng, b"abc 0123456789-:.T", b"2026-08-19T12:34:56.7",
                 [0, 2048, 6000, 30011])
    assert sc.find_many(docs) == [host.find(d) for d in docs]


def test_batch_find_many_isolation():
    """A capture span must never cross a document boundary."""
    sc = compile_pattern(rb"(xy)(zw)", use_device=True)
    sc.DEVICE_THRESHOLD = 1
    docs = [b"a" * 2046 + b"xy", b"zw" + b"b" * 2046,
            b"c" * 1000 + b"xyzw" + b"c" * 3000]
    got = sc.find_many(docs)
    assert got[0] is None and got[1] is None
    rid, ov = got[2]
    assert rid == 0 and ov[0] == 1000 and ov[1] == 1004, ov


def test_batch_mesh():
    """The batched dispatch rides the mesh: shard_map over the block
    dim, per-document folds over the globally ordered planes."""
    import jax
    import pytest
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device (virtual) platform")
    from sregex_tpu.parallel import make_mesh
    rng = random.Random(20)
    pat = rb"(?:a|b)aa(?:aa|bb)cc(?:a|b)"
    sc = compile_pattern(pat, use_device=True, mesh=make_mesh())
    sc.DEVICE_THRESHOLD = 1
    host = compile_pattern(pat, use_device=False)
    docs = _docs(rng, b"abc x", b"baaaaccb", SIZES)
    assert sc.count_many(docs) == [host.count(d) for d in docs]
    assert sc.stats().api == "count_many"
    assert sc.scan_many(docs) == [host.scan(d) for d in docs]


def test_batch_core_tier():
    """Automata past the fast static tiers batch through the ADAPTIVE
    CORE tier: one narrow-kernel dispatch over the sampled hot core,
    full-machine native repair on escapes/ragged tails — exactly the
    per-document results."""
    rng = random.Random(22)
    pat = rb"q[ab]{40,190}z"
    sc = compile_pattern(pat, use_device=True)
    sc.DEVICE_THRESHOLD = 1
    host = compile_pattern(pat, use_device=False)
    plant = b"q" + b"ab" * 30 + b"z"
    docs = _docs(rng, b"ab x", plant, SIZES)
    want_counts = [host.count(d) for d in docs]
    got = sc.count_many(docs)
    assert got == want_counts, (got, want_counts)
    st = sc.stats()
    if sc._coret:                   # the core tier served the batch
        assert st.api == "count_many" and st.tier == "CoreTables", st
    assert sc.scan_many(docs) == [host.scan(d) for d in docs]
    # prepared reuse packs for the core INNER machine
    h = sc.prepare_many(docs)
    if sc._coret:
        assert h is not None
        assert sc.count_many(docs, prepared=h) == want_counts


def test_batch_finditer_many_and_sub_many():
    """finditer_many == [findall(d) per doc]; sub_many == [sub per
    doc]; match-free documents are filtered by the batched dispatch
    and returned untouched."""
    rng = random.Random(21)
    pat = rb"(er+)or"
    sc = compile_pattern(pat, use_device=True)
    sc.DEVICE_THRESHOLD = 1
    host = compile_pattern(pat, use_device=False)
    docs = _docs(rng, b"eorx ", b"errror", SIZES)
    docs += [b"x" * 5000]                      # guaranteed match-free
    got = sc.finditer_many(docs)
    want = [host.findall(d) for d in docs]
    assert got == want, (got[:2], want[:2])
    assert got[-1] == []
    got_sub = sc.sub_many(b"<$1>", docs)
    want_sub = [host.sub(b"<$1>", d) for d in docs]
    assert got_sub == want_sub
    # nullable pattern: the empty match fires everywhere, including
    # on empty documents — the filter must NOT drop them
    scn = compile_pattern(rb"a*", use_device=True)
    scn.DEVICE_THRESHOLD = 1
    hostn = compile_pattern(rb"a*", use_device=False)
    small = [b"", b"b", b"aab"]
    assert scn.finditer_many(small) \
        == [hostn.findall(d) for d in small]


def test_batch_doc_isolation():
    """A match STRADDLING two adjacent documents must not be
    reported: every document restarts at the seed."""
    sc = compile_pattern(rb"xyzw", use_device=True)
    sc.DEVICE_THRESHOLD = 1
    # doc 0 ends with a prefix of the pattern; doc 1 starts with the
    # suffix; sizes chosen chunk-exact so they abut in the packed
    # stream with zero pad between
    docs = [b"a" * 2046 + b"xy", b"zw" + b"b" * 2046]
    assert sc.count_many(docs) == [0, 0]
    assert sc.scan_many(docs) == [None, None]
    assert sc.match_many(docs) == [False, False]


# ---------------------------------------------------------------------
# Fused batched scan (round 5, VERDICT r4 #7): escaped chunks of the
# document stream are redone by the FULL machine's kernel inside the
# one batch dispatch (core_count_many_fused / core_scan_many_fused)
# instead of one native host walk each.
# ---------------------------------------------------------------------

def _kw_scanner(seed=2, nwords=14):
    from sregex_tpu import parse_multi, compile_regex
    from sregex_tpu.stream import Scanner
    rng = random.Random(seed)
    words = list({("".join(rng.choice("abcdefghijklmn")
                           for _ in range(4))).encode()
                  for _ in range(nwords)})
    ast, _ = parse_multi(words)
    sc = Scanner(compile_regex(ast), use_device=True, ast=ast)
    sc.DEVICE_THRESHOLD = 1 << 12
    host = Scanner(compile_regex(ast), use_device=False, ast=ast)
    return sc, host, words


def _kw_docs(words, n_docs=18, plant_every=4096, doc0_plant=False):
    filler = [("".join(random.Random(77 + i).choice("nopqrstuv")
                       for _ in range(5))).encode() for i in range(12)]
    docs = []
    for i in range(n_docs):
        r = random.Random(i)
        n = 3000 + 977 * i
        piece = b" ".join(r.choice(filler) for _ in range(40)) + b" "
        out = bytearray((piece * (n // len(piece) + 1))[:n])
        for pos in range(2048, n - 16, plant_every):
            w = words[r.randrange(len(words))]
            out[pos:pos + len(w) + 2] = b" " + w + b" "
        docs.append(bytes(out))
    if doc0_plant:
        # plant at the very start of a doc: its FIRST chunk escapes,
        # and the phase-2 redo must ride the frozen doc-start j0
        # (warming up over the previous doc's tail would be wrong)
        for i in (0, 3, 7):
            w = words[i % len(words)]
            docs[i] = w + b" " + docs[i][len(w) + 1:]
    return docs + [b"", b"xy"]


def test_batch_fused_count_scan_exact():
    sc, host, words = _kw_scanner()
    docs = _kw_docs(words, doc0_plant=True)
    exp_c = [host.count(d) for d in docs]
    exp_s = [host.scan(d) for d in docs]
    assert sc.count_many(docs) == exp_c
    st = sc.stats()
    assert st.api == "count_many" and st.tier == "CoreTables", st
    # the plants escape the core, yet only ragged tails repair on
    # host (the device redo absorbed the escapes) — the legacy batch
    # core path would repair every planted chunk natively
    ragged = sum(1 for d in docs if len(d) % 512 or not d)
    assert sc._fusedct not in (None, False)
    assert st.repaired <= len(docs), (st.repaired, len(docs))
    assert sc.scan_many(docs) == exp_s
    # prepared-handle reuse (prepare_many builds BOTH layouts)
    h = sc.prepare_many(docs)
    assert h is not None and h.full is not None
    assert sc.count_many(docs, prepared=h) == exp_c
    assert sc.scan_many(docs, prepared=h) == exp_s


def test_batch_fused_overflow_exact(monkeypatch):
    """Overflow fold branch: the device redo cap can't go below one
    phase-2 block (4096 chunks at G=4), far above what a CPU-mesh
    corpus can exceed — so force the overflow flag and assert the
    legacy CORE-plane per-document fold still returns exact results
    (the production path for > FUSED_CAP escapes)."""
    import numpy as np
    import sregex_tpu.ops.pallas_core as pc
    real = pc._fused_batch

    def force_overflow(*a, **k):
        summary, merged, packed, flags = real(*a, **k)
        summary = np.asarray(summary).copy()
        summary[0] = 0                      # not all_ok
        summary[1] = 1 << 30                # n_esc > any cap
        return summary, merged, packed, flags

    monkeypatch.setattr(pc, "_fused_batch", force_overflow)
    sc, host, words = _kw_scanner(seed=5, nwords=10)
    docs = _kw_docs(words, n_docs=10, plant_every=256)
    exp_c = [host.count(d) for d in docs]
    exp_s = [host.scan(d) for d in docs]
    assert sc.count_many(docs, chunk_len=512) == exp_c
    assert sc.scan_many(docs, chunk_len=512) == exp_s


def test_batch_fused_device_summary_fast_path():
    """The fused batch's common case must be served by the ON-DEVICE
    per-document summary (all_ok + dcounts/dfinals exact vs the
    native oracle over each doc's full-chunk region) — the planes
    stay lazy (the ~50 MB/s relay readback was the measured batch
    bottleneck; docs/PERFORMANCE.md round-5)."""
    from sregex_tpu.ops import batch as B
    sc, host, words = _kw_scanner(seed=9)
    docs = _kw_docs(words, n_docs=8, plant_every=4096)
    fct = sc._batch_fused_core(docs)
    assert fct is not None
    spec = sc._spec
    d = B._fused_batch_dispatch(fct, spec, docs, 512, None, None)
    assert d is not None and d["all_ok"], d and d["n_esc"]
    K = d["K"]
    ncls_f = spec.ncls
    native = fct.native
    for i, (c0, cd, nd) in enumerate(d["spans"]):
        fcd = cd - 1 if cd * K > nd else cd
        if fcd <= 0:
            continue
        k, st = native.count(bytes(docs[i][:fcd * K]), 0)
        assert int(d["dcounts"][i]) == k, (i, int(d["dcounts"][i]), k)
        assert int(d["dfinals"][i]) // ncls_f == st, i
