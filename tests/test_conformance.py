"""Conformance suite: runs every reference .t block through our CLI
and asserts the reference harness's exact expectations
(t/SRegex.pm:29-287): all six engine-mode lines must agree, captures
must equal either the block's explicit `--- cap` or Perl's own
m//sm spans (fmt_cap of @-/@+), `--- temp_cap` pins per-chunk pending
output, `--- err`/`--- err_like` pin parser error text.

The .t data files are read from the reference checkout (t/*.t); this
test module skips if that mount is absent.
"""

import io
import os
import re as pyre

import sys

import pytest

from tblocks import REF_T_DIR, iter_suite, resolve_section
from sregex_tpu.cli import main as cli_main

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_T_DIR),
    reason="reference t/ suite not available")


# Blocks whose Perl-oracle expectation changed after Perl 5.16 (the
# suite's baseline): Perl >= 5.34 allows spaces inside {m,n}
# quantifiers, while 5.16 (and sregex) treat such braces as literals.
# Our output is verified byte-exact against the reference binary for
# these blocks (tests/diff_suite.py).
_MODERN_PERL_DIVERGENCES = {
    ("01-sanity-02.t", "TEST 34:"),
    ("01-sanity-02.t", "TEST 36:"),
    ("01-sanity-02.t", "TEST 37:"),
}


def _suite_files():
    import glob
    return sorted(os.path.basename(p)
                  for p in glob.glob(os.path.join(REF_T_DIR, "*.t")))


_RES_LINE = pyre.compile(
    rb"^(thompson|splitted thompson|jitted thompson|"
    rb"splitted jitted thompson|pike|splitted pike) (.*)$", pyre.M)


def parse_res(stdout):
    """Equivalent of SRegex.pm parse_res (:293-441)."""
    res = {}
    for line in stdout.split(b"\n"):
        for key in ("splitted jitted thompson", "jitted thompson",
                    "splitted thompson", "thompson",
                    "splitted pike", "pike"):
            kb = key.encode()
            if line.startswith(kb + b" "):
                val = line[len(kb) + 1:]
                if key in res:
                    break
                if key == "pike" or key == "splitted pike":
                    temp_cap = None
                    if key == "splitted pike":
                        m = pyre.match(
                            rb"^(?:\s*\[(?:\(-?\d+, -?\d+\))+\]"
                            rb"(?:\(-?\d+, -?\d+\))?)+\s*", val)
                        if m:
                            temp_cap = m.group(0).strip()
                            val = val[m.end():]
                        res[key + "_temp_cap"] = temp_cap
                    if val == b"no match":
                        res[key] = 0
                    else:
                        m = pyre.match(rb"^match (\d+) (.*)$", val)
                        if m:
                            res[key] = 1
                            res[key + "_id"] = int(m.group(1))
                            cap = m.group(2)
                            cap = pyre.sub(rb"( \(-1, -1\))+$", b"", cap)
                            res[key + "_cap"] = cap
                else:
                    if val == b"match":
                        res[key] = 1
                    elif val == b"no match":
                        res[key] = 0
                    elif val == b"disabled":
                        res[key] = -1
                    else:
                        res[key] = 0
                break
    return res


def fmt_cap(pairs):
    """SRegex.pm fmt_cap (:444-464): '(f, t) (f, t) ...'."""
    return " ".join("(%d, %d)" % (f, t) for f, t in pairs).encode()


def run_our_cli(argv_tail, stdin):
    out, err = io.BytesIO(), io.BytesIO()
    rc = cli_main(["sregex-cli", "--stdin"] + argv_tail,
                  io.BytesIO(stdin), out, err)
    return out.getvalue(), err.getvalue(), rc


FORCE_MULTI = os.environ.get("SREGEX_FORCE_MULTI") == "1"
_UNMATCHABLE = "^章亦春$".encode("utf-8")


def check_block(block, oracle):
    s = resolve_section(block, "s", oracle)
    re_val = resolve_section(block, "re", oracle)
    assert s is not None and re_val is not None

    flags = resolve_section(block, "flags", oracle)
    is_multi = isinstance(re_val, list)
    # SREGEX_FORCE_MULTI=1: push every single-regex block through the
    # multi-regex machinery by prepending an unmatchable pattern — the
    # analog of TEST_SREGEX_FORCE_MULTI_REGEXES (t/SRegex.pm:20,45-47).
    # The Perl oracle still sees the original scalar regex; ids,
    # captures and error text must be invariant (error text modulo the
    # "regex N:" attribution prefix, stripped like SRegex.pm:92-94).
    forced = FORCE_MULTI and not is_multi

    opts = []
    prefix = b""
    if flags:
        prefix = b"(?" + flags + b")"
        # leading space under forcing: empty flags for the unmatchable
        # pattern, the block's flags for the real regex (sre_cli.c:681)
        opts += [b"--flags", (b" " + flags) if forced else flags]
    if is_multi:
        opts += [b"-n", str(len(re_val)).encode()]
        regexes = list(re_val)
    elif forced:
        opts += [b"-n", b"2"]
        regexes = [_UNMATCHABLE, re_val]
    else:
        regexes = [re_val]

    stdin = b"%d\n%s" % (len(s), s)
    stdout, stderr, rc = run_our_cli(opts + regexes, stdin)
    name = block.name

    err_exp = resolve_section(block, "err", oracle)
    err_like = resolve_section(block, "err_like", oracle)
    if err_exp is not None:
        m = pyre.search(rb"\[error\] .*\n", stderr)
        got = m.group(0) if m else None
        if forced and got is not None:
            got = pyre.sub(rb"regex \d+: ", b"", got)
        assert got == err_exp, \
            "%s: err %r != expected %r" % (name, got, err_exp)
        return
    if err_like is not None:
        m = pyre.search(rb"\[error\] .*\n", stderr)
        got = m.group(0) if m else b""
        if forced:
            got = pyre.sub(rb"regex \d+: ", b"", got)
        pat = err_like if isinstance(err_like, bytes) else err_like[1]
        assert oracle.like(pat.rstrip(b"\n"), got), \
            "%s: err %r !~ %r" % (name, got, pat)
        return
    if rc != 0:
        assert block.has("fatal"), \
            "%s: CLI failed rc=%d stderr=%r" % (name, rc, stderr[:200])
        return

    res = parse_res(stdout)
    assert "thompson" in res and "pike" in res, \
        "%s: missing engine lines in %r" % (name, stdout[:200])

    def check_bool(expect_match):
        for key in ("thompson", "splitted thompson", "pike",
                    "splitted pike"):
            assert res[key] == (1 if expect_match else 0), \
                "%s: %s = %r, expected match=%s\nstdout:\n%s" % (
                    name, key, res[key], expect_match,
                    stdout.decode("latin-1"))
        for key in ("jitted thompson", "splitted jitted thompson"):
            if res.get(key, -1) != -1:
                assert res[key] == (1 if expect_match else 0), \
                    "%s: %s = %r, expected match=%s\nstdout:\n%s" % (
                        name, key, res[key], expect_match,
                        stdout.decode("latin-1"))

    cap_exp = resolve_section(block, "cap", oracle)
    temp_cap_exp = resolve_section(block, "temp_cap", oracle)
    no_match = block.has("no_match")

    if cap_exp is not None or no_match:
        check_bool(not no_match)
        if block.has("match_id"):
            mid = int(resolve_section(block, "match_id", oracle))
            assert res.get("pike_id") == mid, \
                "%s: pike id %r != %d" % (name, res.get("pike_id"), mid)
            assert res.get("splitted pike_id") == mid, \
                "%s: splitted pike id %r != %d" % (
                    name, res.get("splitted pike_id"), mid)
        if cap_exp is not None:
            if isinstance(cap_exp, tuple) and cap_exp[0] == "rx":
                assert oracle.like(cap_exp[1], res.get("pike_cap", b"")), \
                    "%s: pike cap %r !~ %r" % (
                        name, res.get("pike_cap"), cap_exp[1])
            else:
                exp = cap_exp.rstrip(b"\n")
                assert res.get("pike_cap") == exp, \
                    "%s: pike cap %r != %r" % (name, res.get("pike_cap"), exp)
                assert res.get("splitted pike_cap") == exp, \
                    "%s: splitted pike cap %r != %r" % (
                        name, res.get("splitted pike_cap"), exp)
    else:
        if is_multi:
            pytest.skip("multi-regex block without explicit expectations")
        oracle_res = oracle.match(prefix + re_val, s)
        if oracle_res == "error":
            # the block's regex no longer compiles under the system
            # perl (e.g. \C / \c{ removed after 5.16); no ground truth
            pytest.skip("oracle regex not supported by system perl")
        if oracle_res is not None:
            expected_cap = fmt_cap(oracle_res)
            check_bool(True)
            assert res.get("pike_cap") == expected_cap, \
                "%s: pike cap %r != perl %r" % (
                    name, res.get("pike_cap"), expected_cap)
            assert res.get("splitted pike_cap") == expected_cap, \
                "%s: splitted pike cap %r != perl %r" % (
                    name, res.get("splitted pike_cap"), expected_cap)
        else:
            check_bool(False)

    if temp_cap_exp is not None:
        exp = temp_cap_exp.rstrip(b"\n")
        assert res.get("splitted pike_temp_cap") == exp, \
            "%s: temp cap %r != %r" % (
                name, res.get("splitted pike_temp_cap"), exp)


@pytest.mark.parametrize("fname", _suite_files())
def test_suite_file(fname, perl_oracle):
    from tblocks import parse_t_file
    blocks = parse_t_file(os.path.join(REF_T_DIR, fname))
    failures = []
    for block in blocks:
        if block.has("SKIP"):
            continue
        if (fname, block.name) in _MODERN_PERL_DIVERGENCES:
            continue
        try:
            check_block(block, perl_oracle)
        except pytest.skip.Exception:
            continue
        except AssertionError as e:
            failures.append(str(e))
    assert not failures, ("%d block failures in %s:\n%s"
                          % (len(failures), fname,
                             "\n---\n".join(failures[:5])))


def test_fuzz_differential_smoke():
    """Short randomized differential run against the reference binary
    (dev machines; skipped when it is absent)."""
    import subprocess
    if not os.path.exists("/tmp/refbuild/sregex-cli"):
        pytest.skip("reference binary not built")
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__),
                      "fuzz_differential.py"), "120", "5"],
        capture_output=True, timeout=240)
    assert r.returncode == 0, r.stdout.decode()[-2000:]
