"""True multi-process (multi-host) sharded scan.

Each process holds only ITS slice of the corpus (dist.host_slice);
the kernel runs ONCE collectively over the global mesh, and the host
validation fold runs identically on every process from the replicated
per-chunk planes, handing the sequential carry across processes with
one tiny allgather per natively-repaired chunk (the owner of the
chunk's raw bytes repairs it and broadcasts the result).

This is the general multi-host protocol of the design (SURVEY.md §5
"distributed backend"): tables replicated, corpus shards data-
parallel, collectives limited to per-scan summaries.  The 2-host
scaling target (BASELINE.md) is structural — the only cross-host
traffic is O(C) bytes of planes + O(repairs) scalars.

Layout contract: the kernel shards the BLOCK dim, and one block is
LANES (= 4096) chunks, so every process except the last must hold
exactly ``B_local * LANES * chunk_len`` bytes (block_bytes()); the
last process may be ragged (its in-block padding sits past the global
chunk count, which the device validation already treats as pad).
``host_slices`` computes compliant ranges.

Tested end-to-end with two real jax.distributed processes on the
virtual CPU mesh (tests/multihost_runner.py; pytest wrapper
tests/test_multihost.py spawns the processes).
"""

import numpy as np

import jax

LANES = 4096          # chunks (stream lanes) per block: G * 8 * 128


def block_bytes(chunk_len):
    """Bytes covered by one kernel block."""
    return LANES * chunk_len


def host_slices(nbytes, nprocs, chunk_len, ndevices):
    """Aligned [lo, hi) corpus ranges per process.

    Layout constraints: every process contributes the same number of
    blocks to the global array (sharding needs nprocs*bpp divisible
    by ndevices), and every process except the LAST must be
    block-exact — partially-filled blocks would interleave pad lanes
    between processes and break the global chunk ordering.  The last
    process's range must still be large enough that its prep yields
    the same block count (> (bpp-1) blocks' worth of bytes)."""
    bb = block_bytes(chunk_len)
    bpp = max(1, -(-nbytes // (bb * nprocs)))
    while (nprocs * bpp) % ndevices:
        bpp += 1
    per = bpp * bb
    assert nbytes > (nprocs - 1) * per + (bpp - 1) * bb, \
        "corpus too small for %d procs x %d blocks of %d bytes" \
        % (nprocs, bpp, bb)
    out = []
    for p in range(nprocs):
        lo = p * per
        hi = (p + 1) * per if p < nprocs - 1 else nbytes
        out.append((lo, hi))
    return out


def _replicated(mesh, arr):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), np.asarray(arr))


def count_multihost(tables, local_bytes, mesh, chunk_len,
                    full_len, entry_state=0, axis="data"):
    """Count match-ending boundaries (0..full_len-1) of the global
    corpus, of which this process holds ``local_bytes`` (its
    host_slices range).  Returns (final_state, count), identical on
    every process.  EOF boundary is the caller's (tables.match_eof).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils as mhu
    from ..native import NativeDfa
    from ..ops.prep import prepare_auto
    from ..ops.pallas_scan import _unpack

    assert not type(tables).__name__.endswith("Pair"), \
        "byte-alphabet tiers only (pair premultiplies by ncls^2)"
    from ..ops.pallas_scan import effective_chunk
    pid = jax.process_index()
    nproc = jax.process_count()
    K = effective_chunk(tables, chunk_len)
    assert K == chunk_len, \
        "chunk_len %d is not prep-exact for these tables (use %d; " \
        "host_slices must be computed with the same value)" \
        % (chunk_len, K)
    ncls = tables.ncls
    W = tables.warmup
    n = full_len
    C = -(-n // K)                       # global real chunks
    bb = block_bytes(K)

    # local prep; non-last processes must be block-exact (a partially
    # filled block would interleave pad lanes between processes and
    # break the global chunk ordering)
    if pid < nproc - 1:
        assert len(local_bytes) % bb == 0, \
            "non-last process slice must be block-exact (host_slices)"
    prepared = prepare_auto(tables, local_bytes, K)
    data, C_loc, _K, J, B_loc = prepared
    if pid < nproc - 1:
        assert B_loc * LANES == C_loc, "prep left pad lanes in-block"

    # every process must contribute the same number of blocks, and
    # the global block count must shard evenly over the mesh
    b_all = mhu.process_allgather(np.array([B_loc]))
    assert int(b_all.min()) == int(b_all.max()), \
        "uneven block counts across processes: %r" % (b_all.ravel(),)
    B_glob = int(b_all.sum())
    assert B_glob % mesh.devices.size == 0, \
        "global blocks (%d) must divide over %d devices (host_slices)" \
        % (B_glob, mesh.devices.size)

    sh = NamedSharding(mesh, P(axis))
    gdata = jax.make_array_from_process_local_data(
        sh, np.asarray(data))
    G = data.shape[2] if data.ndim == 5 else 4
    s0 = np.zeros((B_loc, G, 8, 128), np.int32)
    j0 = np.zeros((B_loc, G, 8, 128), np.int32)
    if pid == 0:
        s0[0, 0, 0, 0] = entry_state * ncls
        j0[0, 0, 0, 0] = W
    gs0 = jax.make_array_from_process_local_data(sh, s0)
    gj0 = jax.make_array_from_process_local_data(sh, j0)

    # replicate the fused tables as a proper global array
    fused_attr = "fused_vec" if hasattr(tables, "fused_vec") \
        else "fused_rows"
    orig = getattr(tables, fused_attr)
    setattr(tables, fused_attr, _replicated(mesh, orig))
    try:
        bad_tail = (C - 1) if C * K > n and (n - (C - 1) * K) != K \
            else -1
        import jax.numpy as jnp
        summary, packed = tables._scan(
            gdata, gs0, gj0, jnp.int32(C), jnp.int32(bad_tail), J, W,
            COUNT=True, mesh=mesh, axis=axis)
    finally:
        setattr(tables, fused_attr, orig)

    # replicate the outputs so every process can read them directly
    rep = jax.jit(lambda x: x,
                  out_shardings=NamedSharding(mesh, P()))
    summ = np.asarray(rep(summary)).astype(np.int64)
    if bool(summ[0]) and n < 2 ** 31:
        return int(summ[6]) // ncls, int(summ[7])
    phi, cnt, swarm = _unpack(np.asarray(rep(packed)), C)

    # replicated fold; the owner of a chunk's bytes repairs it and
    # broadcasts (count, exit state) — every process walks the same
    # control flow, so the collectives stay in lockstep
    raw = np.frombuffer(local_bytes, dtype=np.uint8) \
        if not isinstance(local_bytes, np.ndarray) else local_bytes
    native = NativeDfa(tables.dfa)
    chunks_per_proc = B_loc * LANES
    my_lo = pid * chunks_per_proc            # my first global chunk

    full = np.ones(C, dtype=bool)
    if bad_tail >= 0:
        full[bad_tail] = False
    cont = np.zeros(C, dtype=bool)
    if C > 1:
        cont[:C - 1] = full[1:] & (swarm[1:] == phi[:C - 1])
    breaks = np.flatnonzero(~cont)
    cum = np.cumsum(cnt.astype(np.int64))

    if bool(summ[0]):
        # count overflowed int32 summary: re-sum on host
        return int(summ[6]) // ncls, int(cum[C - 1])

    total = int(summ[7])
    e = int(summ[2])                         # premult entry at fb
    c = int(summ[1])
    while c < C:
        if full[c] and int(swarm[c]) == e:
            b = int(breaks[np.searchsorted(breaks, c)])
            total += int(cum[b] - (cum[c - 1] if c else 0))
            e = int(phi[b])
            c = b + 1
            continue
        owner = min(c // chunks_per_proc, nproc - 1)
        if pid == owner:
            lo = c * K - pid * chunks_per_proc * K
            hi = min(lo + K, len(raw))
            k, st = native.count(raw[lo:hi].tobytes(), e // ncls)
            mine = np.array([k, st * ncls], np.int64)
        else:
            mine = np.zeros(2, np.int64)
        got = mhu.process_allgather(mine)
        k, e = int(got[owner][0]), int(got[owner][1])
        total += k
        c += 1
    return e // ncls, total


def scan_multihost(tables, local_bytes, mesh, chunk_len,
                   full_len, entry_state=0, axis="data"):
    """Earliest match end over the global corpus: returns
    (final_or_boundary_state, end, regex_id), identical on every
    process.  end == -1 means no interior match (the EOF boundary is
    the caller's: tables.match_eof / dfa.match_eof_id of the final
    state).  On a match the state is the state AT the boundary and
    regex_id is resolved by the byte's owner (dfa.id_at needs
    data[end], which only one process holds)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils as mhu
    from ..native import NativeDfa
    from ..ops.prep import prepare_auto
    from ..ops.pallas_scan import _unpack

    assert not type(tables).__name__.endswith("Pair")
    from ..ops.pallas_scan import effective_chunk
    pid = jax.process_index()
    nproc = jax.process_count()
    K = effective_chunk(tables, chunk_len)
    assert K == chunk_len, \
        "chunk_len %d is not prep-exact for these tables (use %d)" \
        % (chunk_len, K)
    ncls = tables.ncls
    W = tables.warmup
    n = full_len
    C = -(-n // K)
    bb = block_bytes(K)

    if pid < nproc - 1:
        assert len(local_bytes) % bb == 0
    prepared = prepare_auto(tables, local_bytes, K)
    data, C_loc, _K, J, B_loc = prepared
    if pid < nproc - 1:
        assert B_loc * LANES == C_loc

    b_all = mhu.process_allgather(np.array([B_loc]))
    assert int(b_all.min()) == int(b_all.max())
    B_glob = int(b_all.sum())
    assert B_glob % mesh.devices.size == 0

    sh = NamedSharding(mesh, P(axis))
    gdata = jax.make_array_from_process_local_data(
        sh, np.asarray(data))
    G = data.shape[2]
    s0 = np.zeros((B_loc, G, 8, 128), np.int32)
    j0 = np.zeros((B_loc, G, 8, 128), np.int32)
    if pid == 0:
        s0[0, 0, 0, 0] = entry_state * ncls
        j0[0, 0, 0, 0] = W
    gs0 = jax.make_array_from_process_local_data(sh, s0)
    gj0 = jax.make_array_from_process_local_data(sh, j0)

    fused_attr = "fused_vec" if hasattr(tables, "fused_vec") \
        else "fused_rows"
    orig = getattr(tables, fused_attr)
    setattr(tables, fused_attr, _replicated(mesh, orig))
    try:
        bad_tail = (C - 1) if C * K > n and (n - (C - 1) * K) != K \
            else -1
        import jax.numpy as jnp
        summary, packed = tables._scan(
            gdata, gs0, gj0, jnp.int32(C), jnp.int32(bad_tail), J, W,
            COUNT=False, mesh=mesh, axis=axis)
    finally:
        setattr(tables, fused_attr, orig)

    rep = jax.jit(lambda x: x,
                  out_shardings=NamedSharding(mesh, P()))
    summ = np.asarray(rep(summary)).astype(np.int64)
    if bool(summ[0]):
        # every chunk validated fire-free: no interior match
        return int(summ[6]) // ncls, -1, -1
    phi, fm, swarm = _unpack(np.asarray(rep(packed)), C)

    raw = np.frombuffer(local_bytes, dtype=np.uint8) \
        if not isinstance(local_bytes, np.ndarray) else local_bytes
    native = NativeDfa(tables.dfa)
    chunks_per_proc = B_loc * LANES

    full = np.ones(C, dtype=bool)
    if bad_tail >= 0:
        full[bad_tail] = False
    quiet = full & (fm == 0)
    cont = np.zeros(C, dtype=bool)
    if C > 1:
        cont[:C - 1] = quiet[1:] & (swarm[1:] == phi[:C - 1])
    breaks = np.flatnonzero(~cont)

    def owner_scan(c, e):
        """Owner re-scans chunk c from premult entry e; broadcasts
        (first fire rel or -1, exit premult, regex id or -1)."""
        owner = min(c // chunks_per_proc, nproc - 1)
        if pid == owner:
            lo = c * K - pid * chunks_per_proc * K
            hi = min(lo + K, len(raw))
            f, st = native.scan_first(raw[lo:hi].tobytes(), e // ncls)
            rid = tables.dfa.id_at(st, raw[lo + f]) if f >= 0 else -1
            mine = np.array([f, st * ncls, rid], np.int64)
        else:
            mine = np.zeros(3, np.int64)
        got = mhu.process_allgather(mine)
        owner_row = got[owner]
        return int(owner_row[0]), int(owner_row[1]), int(owner_row[2])

    e = int(summ[2])
    c = int(summ[1])
    while c < C:
        if quiet[c] and int(swarm[c]) == e:
            b = int(breaks[np.searchsorted(breaks, c)])
            e = int(phi[b])
            c = b + 1
            continue
        f, st, rid = owner_scan(c, e)
        if f >= 0:
            return st // ncls, c * K + f, rid
        e = st
        c += 1
    return e // ncls, -1, -1
