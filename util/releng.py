#!/usr/bin/env python
"""Release-engineering lint: the analog of the reference's
util/sre-releng (debug switches left on, overlong lines, CRLF,
focused-test markers, unchecked allocations).  Exit 1 on findings.

Checks, mapped from the reference script:
  - DDEBUG-style debug knobs left enabled        (sre-releng line 3)
  - overlong source lines                        (line 4)
  - CRLF line endings                            (line 8)
  - ONLY/LAST-style focused-test markers         (lines 6-7)
  - leftover interactive-debug statements (pdb/breakpoint), the
    Python equivalent of stray debug printf
  - C++: new/malloc results used without a null/throw discipline is
    moot (we use std::vector/RAII); instead check for fprintf/printf
    debugging left in the engines
"""

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAX_COL = 100

PY_DIRS = ["sregex_tpu", "util", "bench", "tests"]
C_DIRS = ["csrc"]


def _files(dirs, exts):
    for d in dirs:
        for base, _dirs, names in os.walk(os.path.join(ROOT, d)):
            for nm in sorted(names):
                if os.path.splitext(nm)[1] in exts:
                    yield os.path.join(base, nm)


def main():
    bad = 0

    def warn(path, lineno, msg, line=b""):
        nonlocal bad
        bad += 1
        rel = os.path.relpath(path, ROOT)
        txt = line.decode("utf-8", "replace").rstrip()
        print("%s:%d: %s%s" % (rel, lineno, msg,
                               (": " + txt[:80]) if txt else ""))

    py_debug = re.compile(  # split to not match itself
        rb"breakpoint[(][)]|import (p)db|(p)db[.]set_trace")
    focused = re.compile(rb"^\s*(?:ONLY|LAST)\b")

    for path in _files(PY_DIRS, {".py"}):
        with open(path, "rb") as f:
            for i, line in enumerate(f, 1):
                if b"\r\n" in line:
                    warn(path, i, "CRLF line ending")
                if len(line.rstrip(b"\r\n").expandtabs()) > MAX_COL:
                    warn(path, i, "line longer than %d cols" % MAX_COL,
                         line)
                if py_debug.search(line):
                    warn(path, i, "interactive debug statement", line)

    c_debug = re.compile(rb"#\s*define\s+DDEBUG\s+[1-9]")
    c_print = re.compile(rb"^\s*f?printf\s*\(")
    for path in _files(C_DIRS, {".cpp", ".c", ".h"}):
        with open(path, "rb") as f:
            for i, line in enumerate(f, 1):
                if b"\r\n" in line:
                    warn(path, i, "CRLF line ending")
                if len(line.rstrip(b"\r\n").expandtabs()) > MAX_COL:
                    warn(path, i, "line longer than %d cols" % MAX_COL,
                         line)
                if c_debug.search(line):
                    warn(path, i, "DDEBUG left enabled", line)
                if c_print.search(line):
                    warn(path, i, "stray printf in native engine",
                         line)

    # focused-test markers in test sources (reference: ONLY/LAST in t/)
    for path in _files(["tests"], {".py"}):
        with open(path, "rb") as f:
            for i, line in enumerate(f, 1):
                if focused.search(line):
                    warn(path, i, "focused-test marker", line)

    if bad:
        print("%d releng finding(s)" % bad)
        return 1
    print("releng: clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
