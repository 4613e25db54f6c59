"""In-process interleaved A/B of the streaming events engine
(Scanner.finditer_stream / sub_stream over events.py) against the
baselines on the same segmented stream:

  arm A  finditer_stream  — fire-map events (VERDICT r2 #4 target)
  arm B  count_stream     — the pipelined count (the device ceiling
                            for any streaming surface)
  arm C  StreamEditor     — the host Pike replace filter (what the
                            events engine replaces for throughput)

VERDICT r2 #4 "done" = editor-class throughput on a sparse-match
segmented stream within ~2x of count_stream on hardware.  Relay
timings are only honest with the arms interleaved in ONE process and
a value readback in the timed region (docs/PERFORMANCE.md).

Usage: python bench/ab_events.py [pattern] [MB] [reps] [seg_mb] [--cpu]
Defaults: ERROR[^\\n]* (the log-scan shape), 256 MB, 3, 8.
"""

import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_"
                                 "device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

from sregex_tpu.stream import compile_pattern


def main():
    pat = sys.argv[1] if len(sys.argv) > 1 else "ERROR[^\\n]*"
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    seg_mb = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    pb = pat.encode()
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"log lines go here\n", np.uint8)
    data = bytearray(rng.choice(alpha, size=mb << 20).tobytes())
    # sparse matches: one per ~4 MB
    plants = max(2, mb // 4)
    for i in range(plants):
        at = int((i + 0.5) * len(data) / plants)
        s = b"ERROR boom %d\n" % i
        data[at:at + len(s)] = s
    data = bytes(data)
    segs = [data[i:i + (seg_mb << 20)]
            for i in range(0, len(data), seg_mb << 20)]

    sc = compile_pattern(pb, use_device=True)
    expect = [(m.start(), m.end()) for m in re.finditer(pb, data)]
    exp_out_n = len(re.findall(pb, data))
    print("pattern %r: %d MB, %d segments, %d matches"
          % (pat, mb, len(segs), len(expect)))

    def arm_events():
        evs = list(sc.finditer_stream(iter(segs)))
        assert [(ov[0], ov[1]) for _, ov in evs] == expect, len(evs)
        return len(evs)

    def arm_count():
        c = sc.count_stream(iter(segs))
        assert c == len(expect) or c >= len(expect), c
        return c

    def arm_editor():
        ed = sc.editor(b"<cut>")
        n = 0
        for s in segs:
            n += len(ed.feed(s))
        n += len(ed.feed(b"", eof=True))
        assert ed.n_replacements == exp_out_n, ed.n_replacements
        return n

    def arm_sub():
        n = 0
        for piece in sc.sub_stream(b"<cut>", iter(segs)):
            n += len(piece)
        return n

    arms = [("finditer_stream", arm_events),
            ("count_stream", arm_count),
            ("sub_stream", arm_sub),
            ("editor(host)", arm_editor)]
    # warmup (compiles/caches)
    for name, fn in arms:
        fn()
    times = {name: [] for name, _ in arms}
    for r in range(reps):
        for name, fn in arms:
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print("  rep %d %-16s %6.2f s  %6.2f GB/s"
                  % (r, name, dt, len(data) / dt / 1e9), flush=True)
    print()
    base = min(times["count_stream"])
    for name, _ in arms:
        best = min(times[name])
        print("%-16s best %6.2f s  %6.2f GB/s  (%.2fx count_stream)"
              % (name, best, len(data) / best / 1e9, best / base))


if __name__ == "__main__":
    main()
