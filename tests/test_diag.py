"""Scan observability (sregex_tpu/diag.py): Scanner.stats() records
which tier served each scan and how much repair it needed; device
degradation warns once (or raises under SREGEX_STRICT_DEVICE=1)
instead of silently serving host-rate scans."""

import random
import warnings

import pytest

from sregex_tpu import parse, compile_regex
from sregex_tpu.stream import Scanner, compile_pattern
from sregex_tpu import diag


def _scanner(pattern, use_device=True):
    ast, _ = parse(pattern)
    prog = compile_regex(ast)
    return Scanner(prog, use_device=use_device, ast=ast)


def test_stats_none_before_any_scan():
    sc = _scanner("ab")
    assert sc.stats() is None


def test_stats_device_count():
    sc = _scanner("(?:a|b)aa(?:aa|bb)cc(?:a|b)")
    sc.DEVICE_THRESHOLD = 1 << 12
    rng = random.Random(3)
    data = bytes(rng.choice(b"abc ") for _ in range(200_000))
    sc.count(data)
    st = sc.stats()
    assert st is not None
    assert st.api == "count"
    assert st.tier.startswith("SpecTables")   # a real device tier
    assert st.nbytes == len(data)
    assert st.chunks > 0
    assert 0 <= st.repaired <= st.chunks
    assert st.elapsed_ms > 0
    d = st.as_dict()
    assert d["api"] == "count" and d["chunks"] == st.chunks


def test_stats_host_fallback_small_corpus():
    sc = _scanner("ab")
    sc.count(b"xxabxx")       # below DEVICE_THRESHOLD -> host engine
    st = sc.stats()
    assert st.tier == "native" and st.api == "count"
    assert st.nbytes == 6 and st.chunks == 0


def test_stats_scan_and_streams():
    sc = _scanner("(?:a|b)aa(?:aa|bb)cc(?:a|b)")
    sc.DEVICE_THRESHOLD = 1 << 12
    rng = random.Random(5)
    data = bytes(rng.choice(b"abc ") for _ in range(100_000))
    sc.scan(data)
    assert sc.stats().api == "scan"
    assert sc.stats().tier.startswith("SpecTables")
    segs = [data[i:i + 9000] for i in range(0, len(data), 9000)]
    sc.count_stream(list(segs))
    st = sc.stats()
    assert st.api == "count_stream"
    assert st.tier.startswith("SpecTables")
    assert st.nbytes == len(data) and st.chunks > 0
    sc.scan_stream(list(segs))
    assert sc.stats().api == "scan_stream"
    # host stream fallback (device off)
    sc2 = _scanner("(?:a|b)aa(?:aa|bb)cc(?:a|b)", use_device=False)
    sc2.count_stream(list(segs))
    assert sc2.stats().tier == "native"
    assert sc2.stats().nbytes == len(data)


def test_degraded_warns_once_then_silent(monkeypatch):
    diag.reset_warned()
    monkeypatch.delenv("SREGEX_STRICT_DEVICE", raising=False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        diag.degraded("test-key", "synthetic failure")
        diag.degraded("test-key", "synthetic failure")
    assert len(w) == 1
    assert issubclass(w[0].category, RuntimeWarning)
    assert "synthetic failure" in str(w[0].message)


def test_strict_device_raises(monkeypatch):
    monkeypatch.setenv("SREGEX_STRICT_DEVICE", "1")
    with pytest.raises(RuntimeError, match="synthetic failure"):
        diag.degraded("other-key", "synthetic failure")


def test_broken_tier_construction_is_loud(monkeypatch):
    """A device backend that explodes at tier-construction time must
    not silently serve host-rate scans."""
    import sregex_tpu.ops.pallas_scan as ps
    import sregex_tpu.ops.pallas_big as pb
    import sregex_tpu.ops.pallas_pair as pp
    diag.reset_warned()

    def boom(*a, **k):
        raise RuntimeError("device backend unavailable")

    monkeypatch.setattr(pp, "SpecTablesPair", boom)
    monkeypatch.setattr(ps, "SpecTables", boom)
    monkeypatch.setattr(ps, "SpecTablesWide", boom)
    monkeypatch.setattr(pb, "SpecTablesBig", boom)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sc = _scanner("ab")
    assert any("tier construction failed" in str(x.message)
               for x in w)
    # the scan API still works (host engines)
    assert sc.count(b"xxabxx") == 1
    # strict mode: same breakage is an error
    monkeypatch.setenv("SREGEX_STRICT_DEVICE", "1")
    with pytest.raises(RuntimeError, match="degradation"):
        _scanner("ab")


def test_recore_events_surface_in_stats():
    """The re-core counter rides stats (cumulative per Scanner)."""
    sc = _scanner("ab")
    sc._coret_rebuilds = 2       # simulate two drift re-cores
    sc.count(b"xxabxx")
    assert sc.stats().recore_events == 2


def test_warmup_escalation_on_hostile_corpus():
    """Bounded-counting automata over long-run corpora defeat the
    32-byte speculation window (most chunks repair natively); two
    consecutive hostile scans escalate the static tier's warmup, after
    which the same corpus scans clean — counts exact throughout."""
    import os
    from sregex_tpu.dfa import build_dfa
    from sregex_tpu.native import NativeDfa

    os.environ["SREGEX_CORE"] = "0"   # pin the static tier
    try:
        ast, _ = parse(b"a{60,120}b")
        prog = compile_regex(ast)
        sc = Scanner(prog, use_device=True, ast=ast)
        sc.DEVICE_THRESHOLD = 1 << 12
        assert sc._spec is not None and sc._spec.warmup == 32
        rng = random.Random(3)
        data = bytearray()
        while len(data) < 400_000:
            data += b"a" * rng.randrange(40, 200) \
                + rng.choice([b"b", b"x", b" "])
        data = bytes(data[:400_000])
        native = NativeDfa(sc.dfa)
        exp_c, exp_st = native.count(data, 0)
        exp = exp_c + int(sc.dfa.match_eof[exp_st])
        assert sc.count(data) == exp
        st1 = sc.stats()
        assert st1.repaired > st1.chunks * 0.25   # hostile indeed
        assert sc.count(data) == exp              # strike 2 escalates
        assert sc._spec.warmup == 128, sc._spec.warmup
        assert sc.count(data) == exp              # now clean
        st3 = sc.stats()
        assert st3.repaired <= 1, st3.as_dict()   # ragged tail only
        assert st3.warm_events == 1
    finally:
        os.environ.pop("SREGEX_CORE", None)
