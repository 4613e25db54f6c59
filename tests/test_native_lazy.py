"""Native lazy-DFA walkers (csrc/sre_host.cpp sre_lazy_*): the dense
mirror + resume-on-miss protocol must be byte-equal to the pure-Python
LazyDfa table walk for count/scan_first/scan_last, across streaming
carries and mid-walk budget blows.

VERDICT r2 item 6: lazy-core escapes and LazyDfa repairs at C speed
(the reference analogue: the JIT compiles every program,
sre_vm_thompson_jit.c:39)."""

import random

import pytest

from sregex_tpu.parser import parse
from sregex_tpu.compiler import compile_regex
from sregex_tpu.dfa import LazyDfa
from sregex_tpu.native import get_lib


def _lazy(pattern):
    root, _ = parse(pattern)
    return LazyDfa(compile_regex(root))


def _pure(lazy):
    """Clone with the native path disabled (pure-Python oracle)."""
    out = LazyDfa(lazy.program)
    out._nat = False
    return out


PATTERNS = [
    rb"foo[a-z]{20,40}z",        # past the eager budget (the monster)
    rb"(ab|ba){3,9}x",
    rb"\bword\b",
    rb"a+b+c",
    rb"[0-9]{1,4}-[0-9]{1,4}",
]


def _corpus(rng, n):
    data = bytearray(rng.choice(b"abfoz xyz09-c") for _ in range(n))
    for plant in (b"foo" + b"ab" * 12 + b"z", b"abbaabx",
                  b" word ", b"aabbc", b"12-3456"):
        for _ in range(3):
            i = rng.randrange(0, max(1, n - len(plant)))
            data[i:i + len(plant)] = plant
    return bytes(data)


@pytest.mark.skipif(get_lib() is None, reason="no native lib")
@pytest.mark.parametrize("pat", PATTERNS, ids=repr)
def test_native_lazy_walkers_differential(pat):
    rng = random.Random(hash(pat) & 0xffff)
    for trial in range(4):
        n = rng.randrange(300, 5000)
        data = _corpus(rng, n)
        # fresh instances per trial: lazy state ids depend on
        # materialization order, which the same call sequence makes
        # identical across the native and pure walks
        nat = _lazy(pat)
        pure = _pure(_lazy(pat))
        assert nat.count(data) == pure.count(data), (pat, trial)
        assert nat.scan_first(data) == pure.scan_first(data)
        assert nat.scan_last(data) == pure.scan_last(data)
        # streaming carry: chunked walks must agree with whole-buffer
        cuts = sorted(rng.sample(range(1, n), 5))
        st_n = st_p = 0
        tot_n = tot_p = 0
        lo = 0
        for hi in cuts + [n]:
            kn, st_n = nat.count(data[lo:hi], st_n)
            kp, st_p = pure.count(data[lo:hi], st_p)
            tot_n += kn
            tot_p += kp
            lo = hi
        assert (tot_n, st_n) == (tot_p, st_p), (pat, trial)


@pytest.mark.skipif(get_lib() is None, reason="no native lib")
def test_native_lazy_budget_blow_mid_walk():
    """A dense budget too small for the machine: the walk must fall
    back to Python mid-stream and still return exact results."""
    pat = rb"foo[a-z]{20,40}z"
    rng = random.Random(7)
    data = _corpus(rng, 4000)
    small = _lazy(pat)
    small.MAX_DENSE_BYTES = 1024          # a handful of states only
    oracle = _pure(_lazy(pat))
    assert small.count(data) == oracle.count(data)
    assert small._nat is False            # permanently declined
    assert small._dense is None
    # ...and keeps working afterwards
    assert small.scan_first(data) == oracle.scan_first(data)


@pytest.mark.skipif(get_lib() is None, reason="no native lib")
def test_native_lazy_id_resolution():
    """scan_first's returned state stays id_at-compatible under the
    native walk (multi-regex id never rides the loop)."""
    from sregex_tpu.parser import parse_multi
    root, _ = parse_multi([rb"cat", rb"dog[0-9]"])
    nat = LazyDfa(compile_regex(root))
    data = b"zz dog7 cat zz"
    r, s = nat.scan_first(data)
    assert r >= 0
    assert nat._step(s, int(nat.class_map[data[r]]))[1] == 1  # dog id
