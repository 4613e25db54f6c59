"""Differential harness: the TDFA engine vs the Pike VM over the full
conformance corpus (every runnable block's regex+subject) and a
randomized fuzz stream.

The ground truth is the Pike VM, itself byte-exact against the
reference CLI on all ~2000 blocks (tests/diff_suite.py).  For each
(pattern set, flags, subject) we compare the FULL final result: matched
regex id and the complete ovector, plus the successive-match stream
(finditer re-arm protocol, including empty-match skips).

Usage: python tests/tdfa_diff.py [--fuzz N] [--find-only] [glob ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tblocks import PerlOracle, iter_suite, resolve_section
from sregex_tpu.parser import parse, parse_multi, ParseError
from sregex_tpu.compiler import compile_regex
from sregex_tpu.pike_vm import PikeCtx
from sregex_tpu.tdfa import Tdfa, TdfaTooLarge, tdfa_find, tdfa_finditer
from sregex_tpu.consts import SRE_REGEX_CASELESS


def bank_slice(prog, rid, bank):
    """Project the full tag vector onto the Pike user-ovector layout
    (the matched regex's slice, -1-filled to ovecsize)."""
    ofs = 0
    for i in range(rid):
        ofs += 2 * (prog.multi_ncaps[i] + 1)
    ns = 2 * (prog.multi_ncaps[rid] + 1)
    return list(bank[ofs:ofs + ns]) + [-1] * (prog.ovecsize - ns)


def pike_find_all(prog, data, limit=50):
    """Successive Pike final matches (the re-arm loop)."""
    ctx = PikeCtx(prog)
    out = []
    pos = 0
    while len(out) < limit:
        rc, _ = ctx.exec(data[pos:], True)
        if rc < 0:
            break
        ov = [int(v) for v in ctx.ovector]
        out.append((rc, ov))
        if ov[1] >= len(data) and ov[0] == ov[1]:
            break
        pos = ov[1]
    return out


def tdfa_find_all(tdfa, prog, data, limit=50):
    out = []
    for rid, bank in tdfa_finditer(tdfa, data):
        out.append((rid, bank_slice(prog, rid, bank)))
        if len(out) >= limit:
            break
    return out


def compile_block(re_val, flags):
    fl = SRE_REGEX_CASELESS if flags and b"i" in flags else 0
    if isinstance(re_val, list):
        ast, _ = parse_multi(re_val, [fl] * len(re_val))
    else:
        ast, _ = parse(re_val, fl)
    return compile_regex(ast)


def check_one(prog, data, find_only, stats):
    try:
        tdfa = Tdfa(prog, max_states=20000)
    except TdfaTooLarge:
        stats["too_large"] += 1
        return None
    try:
        if find_only:
            p = pike_find_all(prog, data, limit=1)
            t0 = tdfa_find(tdfa, data)
            t = ([(t0[0], bank_slice(prog, t0[0], t0[1]))]
                 if t0 is not None else [])
        else:
            p = pike_find_all(prog, data)
            t = tdfa_find_all(tdfa, prog, data)
    except TdfaTooLarge:
        stats["too_large"] += 1
        return None
    if p != t:
        return (p, t)
    stats["ok"] += 1
    return None


def main():
    fuzz = 0
    if "--fuzz" in sys.argv:
        fuzz = int(sys.argv[sys.argv.index("--fuzz") + 1])
    find_only = "--find-only" in sys.argv
    globs = [a for a in sys.argv[1:]
             if not a.startswith("-") and not a.isdigit()]

    stats = {"ok": 0, "too_large": 0}
    nfail = total = 0

    if fuzz:
        import random
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from fuzz_differential import gen_alt, gen_subject
        rng = random.Random(20260817)
        for it in range(fuzz):
            nre = 1 if rng.random() < 0.7 else rng.randint(2, 3)
            regexes = [gen_alt(rng, 0).encode() for _ in range(nre)]
            s = gen_subject(rng)
            try:
                prog = compile_block(regexes if nre > 1 else regexes[0],
                                     None)
            except (ParseError, Exception):
                continue
            total += 1
            bad = check_one(prog, s, find_only, stats)
            if bad:
                nfail += 1
                print("FUZZ FAIL", regexes, s)
                print("  pike:", bad[0])
                print("  tdfa:", bad[1])
                if nfail > 5:
                    break
        print("fuzz: %d cases, %d failures, %d too-large, %d ok"
              % (total, nfail, stats["too_large"], stats["ok"]))
        return 1 if nfail else 0

    oracle = PerlOracle()
    for path, blocks in iter_suite(globs or ["*.t"]):
        for block in blocks:
            if block.has("SKIP"):
                continue
            re_val = resolve_section(block, "re", oracle)
            s_val = resolve_section(block, "s", oracle)
            flags = resolve_section(block, "flags", oracle)
            if re_val is None or s_val is None or isinstance(s_val, tuple):
                continue
            try:
                prog = compile_block(re_val, flags)
            except (ParseError, OverflowError, ValueError):
                continue
            total += 1
            bad = check_one(prog, s_val, find_only, stats)
            if bad:
                nfail += 1
                print("FAIL %s [%s] re=%r s=%r" %
                      (os.path.basename(path), block.name, re_val,
                       s_val[:60]))
                print("  pike:", bad[0])
                print("  tdfa:", bad[1])
        print("%-28s total %d, %d failures, %d too-large"
              % (os.path.basename(path), total, nfail,
                 stats["too_large"]))
    oracle.close()
    print("TOTAL: %d cases, %d failures, %d too-large, %d ok"
          % (total, nfail, stats["too_large"], stats["ok"]))
    return 1 if nfail else 0


if __name__ == "__main__":
    sys.exit(main())
