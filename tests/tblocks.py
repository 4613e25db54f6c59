"""Parser for the reference's Test::Base .t data files plus a perl
helper for evaluating `--- key eval:` sections and for the Perl match
oracle (the reference harness derives expected captures from Perl's
m//sm, t/SRegex.pm:242-265).

The .t files themselves are read from the reference checkout at test
time (REF_T_DIR); they are data, not code, and stay out of this repo.
"""

import base64
import os
import subprocess

REF_T_DIR = os.environ.get("SREGEX_REF_T", "/root/reference/t")

_PERL_HELPER = r'''
use strict; use warnings;
use MIME::Base64 qw(encode_base64 decode_base64);
no warnings 'regexp'; no warnings 'syntax'; no warnings 'deprecated';
no warnings 'utf8';
$| = 1;
sub b64 {
    my $s = shift;
    utf8::encode($s) if utf8::is_utf8($s);
    my $e = encode_base64($s, "");
    return $e eq "" ? "-" : $e;
}
while (my $line = <STDIN>) {
    chomp $line;
    my ($cmd, @args) = split / /, $line;
    if ($cmd eq "EVAL") {
        my $expr = decode_base64($args[0]);
        my $val = eval $expr;
        if ($@) { print "ERR ", b64($@), "\n"; next; }
        if (ref $val eq "ARRAY") {
            print "ARR ", join(" ", map { b64($_) } @$val), "\n";
        } elsif (ref $val eq "Regexp") {
            print "RX ", b64("$val"), "\n";
        } else {
            $val = "" unless defined $val;
            print "STR ", b64($val), "\n";
        }
    } elsif ($cmd eq "MATCH") {
        my $re = decode_base64($args[0]);
        my $s = $args[1] eq "-" ? "" : decode_base64($args[1]);
        my $matched;
        my @pairs;
        eval {
            $matched = ($s =~ m/$re/sm);
            if ($matched) {
                for (my $i = 0; $i < @-; $i++) {
                    my $f = defined $-[$i] ? $-[$i] : -1;
                    my $t = defined $+[$i] ? $+[$i] : -1;
                    push @pairs, "$f,$t";
                }
            }
        };
        if ($@) { print "ERR ", b64($@), "\n"; next; }
        if (!$matched) { print "NOMATCH\n"; next; }
        print "MATCH ", join(" ", @pairs), "\n";
    } elsif ($cmd eq "LIKE") {
        my $rx = decode_base64($args[0]);
        my $s = $args[1] eq "-" ? "" : decode_base64($args[1]);
        my $m; eval { $m = ($s =~ m/$rx/); };
        print(($m ? "YES" : "NO"), "\n");
    } else {
        print "ERR ", b64("bad cmd"), "\n";
    }
}
'''


class PerlOracle:
    """Long-lived perl subprocess for section evaluation and the
    match oracle."""

    def __init__(self):
        self.proc = subprocess.Popen(
            ["perl", "-e", _PERL_HELPER],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE)

    def _roundtrip(self, line):
        self.proc.stdin.write(line + b"\n")
        self.proc.stdin.flush()
        return self.proc.stdout.readline().rstrip(b"\n")

    @staticmethod
    def _b64(data):
        if isinstance(data, str):
            data = data.encode("utf-8")
        e = base64.b64encode(data)
        return e if e else b"-"

    def eval_section(self, expr):
        """Evaluate a perl expression.  Returns ('str', bytes) |
        ('arr', [bytes]) | ('rx', bytes) | ('err', bytes)."""
        resp = self._roundtrip(b"EVAL " + self._b64(expr))
        kind, _, rest = resp.partition(b" ")
        if kind == b"STR":
            return ("str", base64.b64decode(rest) if rest != b"-" else b"")
        if kind == b"ARR":
            return ("arr", [base64.b64decode(x) if x != b"-" else b""
                            for x in rest.split(b" ") if x])
        if kind == b"RX":
            return ("rx", base64.b64decode(rest))
        return ("err", base64.b64decode(rest) if rest else b"")

    def match(self, regex, subject):
        """m/$regex/sm oracle.  Returns None (no match), 'error', or a
        list of (from, to) pairs (Perl's @-/@+, -1 for unset)."""
        resp = self._roundtrip(b"MATCH " + self._b64(regex) + b" "
                               + self._b64(subject))
        if resp.startswith(b"NOMATCH"):
            return None
        if resp.startswith(b"ERR"):
            return "error"
        pairs = []
        for tok in resp.split(b" ")[1:]:
            f, t = tok.split(b",")
            pairs.append((int(f), int(t)))
        return pairs

    def like(self, rx, s):
        resp = self._roundtrip(b"LIKE " + self._b64(rx) + b" " + self._b64(s))
        return resp == b"YES"

    def close(self):
        try:
            self.proc.stdin.close()
            self.proc.wait(timeout=5)
        except Exception:
            self.proc.kill()


class Block:
    """One `=== TEST` block: name + {key: (filters, raw_value)}."""

    def __init__(self, name, file, index):
        self.name = name
        self.file = file
        self.index = index
        self.sections = {}

    def has(self, key):
        return key in self.sections

    def raw(self, key):
        return self.sections.get(key, (None, None))[1]


def parse_t_file(path):
    """Parse a Test::Base .t file into Blocks (data after __DATA__)."""
    with open(path, "rb") as f:
        text = f.read()
    idx = text.find(b"__DATA__")
    data = text[idx + len(b"__DATA__"):] if idx >= 0 else text
    lines = data.split(b"\n")

    blocks = []
    cur = None
    cur_key = None
    cur_lines = None

    def flush_section():
        # multiline value: content lines with trailing blank lines
        # collapsed to exactly one trailing newline (Test::Base)
        nonlocal cur_key, cur_lines
        if cur is not None and cur_key is not None:
            key, filters = cur_key
            val = b"\n".join(cur_lines).rstrip(b"\n")
            if val:
                val += b"\n"
            cur.sections[key] = (filters, val)
        cur_key = None
        cur_lines = None

    for line in lines:
        if line.startswith(b"=== "):
            flush_section()
            name = line[4:].decode("utf-8", "replace").strip()
            cur = Block(name, path, len(blocks))
            blocks.append(cur)
            continue
        if cur is None:
            continue
        if line.startswith(b"--- "):
            flush_section()
            rest = line[4:]
            colon = rest.find(b":")
            if colon >= 0:
                head = rest[:colon].decode("utf-8", "replace")
                inline = rest[colon + 1:]
                if inline.startswith(b" "):
                    inline = inline[1:]
                parts = head.split()
                key = parts[0] if parts else ""
                filters = parts[1:]
                cur.sections[key] = (filters, inline)
            else:
                head = rest.decode("utf-8", "replace")
                parts = head.split()
                key = parts[0] if parts else ""
                filters = parts[1:]
                cur_key = (key, filters)
                cur_lines = []
            continue
        if cur_key is not None:
            cur_lines.append(line)
    flush_section()
    return blocks


def resolve_section(block, key, oracle):
    """Return the section's value with filters applied: bytes, or a
    list of bytes (arrays), or ('rx', bytes) for qr// values; None if
    the section is absent."""
    if key not in block.sections:
        return None
    filters, val = block.sections[key]
    if "eval" in filters:
        kind, v = oracle.eval_section(val)
        if kind == "str":
            val = v
        elif kind == "arr":
            return v
        elif kind == "rx":
            return ("rx", v)
        else:
            raise RuntimeError("perl eval failed for %s in %s: %r"
                               % (key, block.name, v))
    if "chop" in filters:
        val = val[:-1]
    return val


def iter_suite(patterns=("*.t",)):
    """Yield (path, blocks) for every .t file in the reference suite."""
    import glob
    for pat in patterns:
        for path in sorted(glob.glob(os.path.join(REF_T_DIR, pat))):
            yield path, parse_t_file(path)
