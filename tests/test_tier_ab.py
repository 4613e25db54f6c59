"""Measurement-driven core-vs-wide tier selection (VERDICT r2 #9,
stream._core_band / Scanner._maybe_tier_ab): the ambiguous mid-band
(2 < wide rows <= 16) builds the core AND measures both arms on the
first production-size scan; the loser is declined for the Scanner's
lifetime.  Exactness never depends on the pick."""

import os

import pytest

from sregex_tpu.stream import Scanner, _core_band, compile_pattern


MIDBAND = rb"(foo|bar|baz|qux)=[0-9a-f]{2,8}"   # wide rows = 4


def _corpus(n=256 << 10):
    # digit/symbol filler that cannot enter the prefix states: the
    # fast core (MAX_ESCAPE_FRAC = 1e-5) only accepts near-match-free
    # samples — the production log-scan shape
    unit = b"0123 456 789 -- 01 2345 "
    return (unit * (n // len(unit) + 1))[:n]


def test_core_band_classification():
    from sregex_tpu.parser import parse
    from sregex_tpu.compiler import compile_regex
    from sregex_tpu.dfa import build_dfa
    from sregex_tpu.ops.pallas_scan import SpecTables, SpecTablesWide
    from sregex_tpu.ops.pallas_big import SpecTablesBig

    root, _ = parse(MIDBAND)
    dfa = build_dfa(compile_regex(root))
    w = SpecTablesWide(dfa)
    assert 2 < w.rows <= 16
    assert _core_band(w) == "ab"
    assert _core_band(None) == "core"

    class _FakeWide(SpecTablesWide):
        def __init__(self, rows):
            self.rows = rows
    assert _core_band(_FakeWide(2)) == "static"
    assert _core_band(_FakeWide(17)) == "core"
    root2, _ = parse(rb"ab")
    assert _core_band(SpecTables(build_dfa(compile_regex(root2)))) \
        == "static"


def test_tier_ab_runs_and_picks(monkeypatch):
    monkeypatch.setenv("SREGEX_TIER_AB", "1")
    data = _corpus()
    expect = compile_pattern(MIDBAND, use_device=False).count(data)
    sc = compile_pattern(MIDBAND, use_device=True)
    sc.DEVICE_THRESHOLD = 1 << 16
    assert sc.count(data) == expect
    ab = getattr(sc, "tier_ab", None)
    if sc._coret is False and ab is None:
        pytest.skip("core declined for this sample; no A/B possible")
    assert ab is not None, "A/B never ran"
    assert ab["winner"] in ("static", "core")
    assert ab["static_s"] > 0 and ab["core_s"] > 0
    # the pick sticks: the next scan is served by the winner
    assert sc.count(data) == expect
    tier = sc.stats().tier
    if ab["winner"] == "static":
        assert sc._coret is False
        assert tier == "SpecTablesWide", tier
    else:
        assert tier == "CoreTables", tier


def test_tier_ab_disabled_keeps_legacy(monkeypatch):
    monkeypatch.setenv("SREGEX_TIER_AB", "0")
    data = _corpus()
    sc = compile_pattern(MIDBAND, use_device=True)
    sc.DEVICE_THRESHOLD = 1 << 16
    sc.count(data)
    # legacy rows>4 heuristic: rows=4 stays static, no A/B scheduled
    assert getattr(sc, "tier_ab", None) is None
    assert not getattr(sc, "_ab_pending", False)
    assert sc.stats().tier == "SpecTablesWide"
