#!/usr/bin/env python
"""Generate the reference bench corpus (bench/gen-data.pl:9):
"abccc" x (1024*1024) + "aaabbccb"  ->  abc.txt (~5 MB).

Usage: python bench/gen_data.py [multiplier] [> abc.txt]
"""

import sys

mult = int(sys.argv[1]) if len(sys.argv) > 1 else 1
sys.stdout.buffer.write(b"abccc" * (1024 * 1024 * mult) + b"aaabbccb")
