"""Dev-utility smoke tests: graphviz renderer and corpus generator."""

import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_draw_program_nfa_and_dfa():
    for extra in ([], ["--dfa"]):
        r = subprocess.run(
            [sys.executable, os.path.join(_ROOT, "util",
                                          "draw_program.py")]
            + extra + ["a|(b*c)"],
            capture_output=True, timeout=60)
        assert r.returncode == 0, r.stderr
        out = r.stdout.decode()
        assert out.startswith("digraph") and out.rstrip().endswith("}")
        assert "->" in out


def test_gen_data():
    r = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "bench", "gen_data.py")],
        capture_output=True, timeout=120)
    assert r.returncode == 0
    assert len(r.stdout) == 5 * 1024 * 1024 + 8
    assert r.stdout.startswith(b"abccc") and r.stdout.endswith(b"aaabbccb")
