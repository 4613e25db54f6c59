"""Headline benchmark: DFA scan throughput on the reference bench
corpus, one chip.

Reproduces the reference bench methodology (bench/gen-data.pl:9 corpus
"abccc" x 1M + "aaabbccb"; bench/Makefile:38 pattern
'(?:a|b)aa(?:aa|bb)cc(?:a|b)') and measures the device DFA scan over
the whole corpus.  Baseline target: 10 GB/s/chip (BASELINE.md).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from sregex_tpu import parse, compile_regex
    from sregex_tpu.dfa import build_dfa
    from sregex_tpu.ops.scan import dfa_device_tables, scan_block, _NO_MATCH

    pattern = "(?:a|b)aa(?:aa|bb)cc(?:a|b)"
    corpus = b"abccc" * (1024 * 1024) + b"aaabbccb"
    # scale the corpus up so the measurement isn't launch-bound
    reps_data = 8
    data_np = corpus * reps_data
    n = len(data_np)

    ast, _ = parse(pattern)
    prog = compile_regex(ast)
    dfa = build_dfa(prog)
    tables = dfa_device_tables(dfa)

    K = 2048
    C = -(-n // K)
    padded = np.zeros(C * K, dtype=np.uint8)
    padded[:n] = np.frombuffer(data_np, dtype=np.uint8)
    data = jnp.asarray(padded.reshape(C, K))
    valid = np.full(C, K, dtype=np.int32)
    valid[-1] = n - (C - 1) * K
    valid = jnp.asarray(valid)

    # correctness check vs the host DFA engine on a small slice
    from sregex_tpu.ops.scan import scan_bytes
    probe = corpus[:65536] + b"aaabbccb" + corpus[:100]
    state_d, end_d = scan_bytes(tables, probe, chunk_len=512)
    s = 0
    cls = dfa.class_map[np.frombuffer(probe, dtype=np.uint8)]
    end_h = -1
    for i, c in enumerate(cls):
        if dfa.match[s, c]:
            end_h = i
            break
        s = dfa.trans[s, c]
    if end_d != end_h:
        print(json.dumps({"metric": "dfa_scan_gbps", "value": 0.0,
                          "unit": "GB/s", "vs_baseline": 0.0,
                          "error": "device/host mismatch %r vs %r"
                                   % (end_d, end_h)}))
        return 1

    # warm up / compile
    phi, fm = scan_block(tables["fused_bm"], data, valid, chunk_len=K)
    phi.block_until_ready()

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        phi, fm = scan_block(tables["fused_bm"], data, valid, chunk_len=K)
        phi.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    gbps = n / dt / 1e9

    print(json.dumps({
        "metric": "dfa_scan_gbps",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / 10.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
