"""Differential testing helper: compare our parser/compiler dumps (and
later, full CLI output) against the reference sregex-cli binary built in
/tmp/refbuild (if present)."""

import subprocess
import os

REF_CLI = "/tmp/refbuild/sregex-cli"


def have_ref():
    return os.path.exists(REF_CLI)


def ref_dumps(regexes, flags_str=None, subjects=()):
    """Run the reference CLI; return (stdout_bytes, stderr_bytes, rc)."""
    cmd = [REF_CLI]
    if flags_str is not None:
        cmd += ["--flags", flags_str]
    if len(regexes) > 1:
        cmd += ["-n", str(len(regexes))]
    cmd += list(regexes) + list(subjects)
    p = subprocess.run(cmd, capture_output=True)
    return p.stdout, p.stderr, p.returncode


def ref_stdin(regexes, frames, flags_str=None):
    """Run the reference CLI in --stdin mode feeding length-prefixed
    frames; returns (stdout_bytes, stderr_bytes, rc)."""
    cmd = [REF_CLI, "--stdin"]
    if flags_str is not None:
        cmd += ["--flags", flags_str]
    if len(regexes) > 1:
        cmd += ["-n", str(len(regexes))]
    cmd += list(regexes)
    data = b"".join(b"%d\n%s" % (len(f), f) for f in frames)
    p = subprocess.run(cmd, input=data, capture_output=True)
    return p.stdout, p.stderr, p.returncode


def our_dumps(regexes, flags_list=None):
    """Our AST dump + 'captures:' + program dump, same format as the
    reference CLI header output."""
    from sregex_tpu.parser import parse, parse_multi
    from sregex_tpu.ast_nodes import dump_str
    from sregex_tpu.compiler import compile_regex
    from sregex_tpu.bytecode import dump_program

    if len(regexes) == 1:
        ast, ncaps = parse(regexes[0], flags_list[0] if flags_list else 0)
    else:
        ast, ncaps = parse_multi(regexes, flags_list)
    out = dump_str(ast) + "\n"
    out += "captures: %d\n" % ncaps
    prog = compile_regex(ast)
    out += dump_program(prog)
    return out
