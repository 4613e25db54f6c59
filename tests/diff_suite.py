"""Dev tool: run every reference .t block through BOTH the reference
sregex-cli binary (/tmp/refbuild) and our in-process CLI, comparing
stdout/stderr byte-for-byte.  Stronger than the SRegex.pm assertions
(includes AST/bytecode dumps and per-chunk temp captures everywhere).

Usage: python tests/diff_suite.py [glob ...] [--mask-jit] [-v]

SREGEX_FORCE_MULTI=1 rewrites every single-regex block as the
two-pattern multi-regex ['^章亦春$', re] (an unmatchable first pattern),
forcing the whole corpus through the multi-regex path with id
remapping — the analog of TEST_SREGEX_FORCE_MULTI_REGEXES
(t/SRegex.pm:20,45-47).  Outputs must still be byte-identical between
the two CLIs under the knob.
"""

import io
import re
import subprocess
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tblocks import PerlOracle, iter_suite, resolve_section
from sregex_tpu.cli import main as cli_main

REF_CLI = "/tmp/refbuild/sregex-cli"
_JIT_RE = re.compile(rb"^(splitted )?jitted thompson .*$", re.M)
FORCE_MULTI = os.environ.get("SREGEX_FORCE_MULTI") == "1"
_UNMATCHABLE = "^章亦春$".encode("utf-8")


def build_invocation(block, oracle):
    """Build (argv_tail, stdin_frame) per SRegex.pm:49-75."""
    re_val = resolve_section(block, "re", oracle)
    s_val = resolve_section(block, "s", oracle)
    flags = resolve_section(block, "flags", oracle)
    if s_val is None or re_val is None:
        return None
    if isinstance(s_val, tuple):
        return None
    forced = FORCE_MULTI and not isinstance(re_val, list)
    if forced:
        re_val = [_UNMATCHABLE, re_val]
        # per-regex flags are space-separated (sre_cli.c:681-711); a
        # leading space assigns empty flags to the unmatchable pattern
        # and the block's flags to the real one
        if flags:
            flags = b" " + flags
    opts = []
    if flags:
        opts += [b"--flags", flags]
    if isinstance(re_val, list):
        opts += [b"-n", str(len(re_val)).encode()]
        regexes = list(re_val)
    else:
        regexes = [re_val]
    stdin = b"%d\n%s" % (len(s_val), s_val)
    return opts + regexes, stdin


def run_ours(argv_tail, stdin, use_dfa=True):
    out, err = io.BytesIO(), io.BytesIO()
    try:
        rc = cli_main(["sregex-cli", "--stdin"] + argv_tail,
                      io.BytesIO(stdin), out, err, use_dfa=use_dfa)
    except Exception as e:
        import traceback
        return out.getvalue(), (err.getvalue()
                                + traceback.format_exc().encode()), 99
    return out.getvalue(), err.getvalue(), rc


def run_ref(argv_tail, stdin):
    p = subprocess.run([REF_CLI, "--stdin"] + argv_tail, input=stdin,
                       capture_output=True)
    return p.stdout, p.stderr, p.returncode


def main():
    if not os.path.exists(REF_CLI):
        print("reference binary not found at %s; build it first "
              "(see CLAUDE.md)" % REF_CLI)
        return 0
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    mask_jit = "--mask-jit" in sys.argv
    verbose = "-v" in sys.argv
    use_dfa = "--no-dfa" not in sys.argv
    patterns = args or ["*.t"]

    oracle = PerlOracle()
    total = nfail = 0
    for path, blocks in iter_suite(patterns):
        file_fail = 0
        for block in blocks:
            if block.has("SKIP"):
                continue
            inv = build_invocation(block, oracle)
            if inv is None:
                continue
            argv_tail, stdin = inv
            total += 1
            ro, re_, rrc = run_ref(argv_tail, stdin)
            oo, oe, orc = run_ours(argv_tail, stdin, use_dfa)
            if mask_jit or not use_dfa:
                ro = _JIT_RE.sub(b"jit-masked", ro)
                oo = _JIT_RE.sub(b"jit-masked", oo)
            if ro != oo or re_ != oe or rrc != orc:
                nfail += 1
                file_fail += 1
                if verbose or file_fail <= 3:
                    print("FAIL %s [%s]" % (os.path.basename(path),
                                            block.name))
                    print("  argv:", argv_tail, "stdin:", stdin[:80])
                    if ro != oo:
                        for a, b in zip(ro.split(b"\n"), oo.split(b"\n")):
                            if a != b:
                                print("   ref:", a)
                                print("  ours:", b)
                        la, lb = ro.split(b"\n"), oo.split(b"\n")
                        if len(la) != len(lb):
                            print("   (line counts %d vs %d)"
                                  % (len(la), len(lb)))
                    if re_ != oe:
                        print("  stderr ref :", re_[:300])
                        print("  stderr ours:", oe[:300])
                    if rrc != orc:
                        print("  rc ref %d ours %d" % (rrc, orc))
        print("%-28s %4d blocks, %d failures so far"
              % (os.path.basename(path), len(blocks), nfail))
    print("TOTAL: %d blocks, %d failures" % (total, nfail))
    oracle.close()
    return 1 if nfail else 0


if __name__ == "__main__":
    sys.exit(main())
