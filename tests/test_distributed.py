"""jax.distributed bootstrap helpers (single-process validation; the
multi-host path is the same code with a coordinator)."""

import jax

from sregex_tpu.parallel import distributed as dist


def test_initialize_single_process_noop():
    dist.initialize()          # must not raise without a coordinator
    assert jax.process_count() >= 1


def test_global_mesh_covers_devices():
    mesh = dist.global_mesh()
    assert mesh.devices.size == len(jax.devices())


def test_host_slice_partition():
    # single process: the slice is everything
    lo, hi = dist.host_slice(1000, chunk=64)
    assert (lo, hi) == (0, 1000)
    # the chunk rounding never loses bytes
    lo, hi = dist.host_slice(127, chunk=64)
    assert (lo, hi) == (0, 127)


def test_host_slice_multiproc_math():
    # simulate the per-process math without multiple processes
    import numpy as np
    n, chunk, nproc = 1 << 20, 2048, 8
    units = -(-n // chunk)
    per = -(-units // nproc)
    spans = []
    for p in range(nproc):
        lo = min(p * per * chunk, n)
        hi = min((p + 1) * per * chunk, n)
        spans.append((lo, hi))
    assert spans[0][0] == 0 and spans[-1][1] == n
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b == c
