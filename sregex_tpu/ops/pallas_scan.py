"""Speculative Pallas DFA scan — the speed-of-light single-chip path.

Design (data-parallel FSM with prefix speculation, executed as a
Mosaic kernel):

  - the input is class-mapped (byte -> equivalence class, dfa.py),
    cut into C chunks of K bytes, each chunk's window prefixed with W
    warmup bytes from the preceding chunk, and packed 4 classes per
    int32 word so the kernel streams int32 vectors;
  - the DFA table is flattened to a single 128-lane vector
    fused[s*ncls + cls] = (next*ncls) | (match << 20); one per-lane
    dynamic gather (tpu dynamic_gather via take_along_axis) advances
    1024 streams by one byte;
  - the per-tile gather chain is LATENCY-bound (~90ns dependent), so
    the kernel interleaves G=4 independent tiles (4096 streams) whose
    gather chains pipeline against each other (measured ~15ns per
    gather-step), and unrolls over packed words to amortize loop
    overhead;
  - match *positions* are not tracked in the hot loop: an
    OR-accumulator records whether any boundary in the chunk matched,
    and the host fold resolves exact offsets by re-scanning the first
    firing chunk with the native C++ engine (sregex_tpu/native.py);
  - chunks other than the first start their warmup from an arbitrary
    state; DFA convergence makes the state at the end of the warmup
    almost always equal the true entry state.  The kernel records the
    speculative entry (``swarm``) and the host fold validates it
    against the sequentially-known true entry, re-scanning mismatched
    chunks natively.  Exactness is therefore unconditional.

Constraints: S * nclasses <= 128 (one lane row).  Larger automata fall
back to the enumerative XLA path (ops/scan.py) or the host engine.

This replaces the reference's DynASM x86-64 JIT as the "compiled" hot
path (sre_vm_thompson_x64.dasc); the per-byte work is one VPU gather
versus the JIT's per-thread native dispatch loop.
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MATCH_SHIFT = 20
_STATE_MASK = (1 << _MATCH_SHIFT) - 1
_BIG = np.int32(2 ** 30)

WORDS_PER_ITER = 2   # packed words consumed per loop iteration
# Interleaved tiles per block (latency hiding: independent gather
# chains pipeline against each other).  8 is the tuned default since
# round 4: with the raised scoped-VMEM budget K stays 2048 at G=8 and
# the extra chains win ~1.3x (headline 29.1 vs 22.1 GB/s at 1 GB;
# fused multi 9.74 vs 7.69 at 512 MB).  Round 3's G=8 negative was an
# artifact of the old 16 MiB budget forcing K=1024.  SREGEX_GROUPS
# overrides; max_chunk_bytes keeps every block inside the budget for
# any G.  (The CPU-mesh test conftest pins G=4 for interpret speed.)
GROUPS = int(os.environ.get("SREGEX_GROUPS", "8"))
TILE = 1024          # streams per tile (8 sublanes x 128 lanes)
DEFAULT_K = 2048     # nominal chunk length (rounded to the packing)


def vmem_limit_bytes():
    """Scoped-VMEM ceiling requested from the Mosaic compiler for every
    scan kernel (pl.CompilerParams(vmem_limit_bytes=...)).

    The compiler's default scoped limit is 16 MiB; physical VMEM is
    128 MiB/core on v5e (and v4/v5p/v6e are >= 128 MiB).  The round-3
    hardware bench OOM'd the wide 8-bit tier at rows=98 against that
    default (17.01M scoped vs 16M, BENCH_r03.json) — the fix is to
    both RAISE the requested limit (64 MiB leaves half the core for
    the pipeline) and derive every tier's chunk clamp from shapes
    against it (max_chunk_bytes below), so no fused-table size can
    push a kernel over the line again."""
    env = os.environ.get("SREGEX_VMEM_LIMIT_MB")
    if env is not None:
        return int(env) << 20
    return 64 << 20


def compiler_params(needed_bytes=None):
    """Mosaic compiler params for scan-kernel pallas_calls (None in
    CPU interpret mode, where TPU params are meaningless).

    ``needed_bytes``: the kernel's modeled scoped-VMEM footprint.
    Kernels comfortably inside the compiler's 16 MiB default keep the
    default (the raised limit may steer the compiler into different
    windowing/scheduling searches; small kernels have nothing to
    gain); anything near or over the default requests the raised
    ceiling so big fused tables never OOM (the r3 crash class)."""
    if jax.default_backend() == "cpu":
        return None
    if needed_bytes is not None and needed_bytes < (14 << 20):
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes())


def footprint_bytes(jw, rows, extra_bytes=0):
    """Modeled scoped-VMEM footprint (see max_chunk_bytes)."""
    return (2 * jw * GROUPS * 8 * 128 * 4 + rows * 8 * 128 * 4
            + extra_bytes + _VMEM_SLACK)


# Residual scoped-VMEM use beyond the data block and the fused table:
# kernel-internal scratch (G state/macc vregs, unrolled slab copies)
# plus the double-buffered small in/out blocks.  Calibrated from the
# round-3 hardware OOM: 17.01M total at data 2x7.56M + table 0.38M
# leaves ~1.5M residual; 2 MiB adds margin.
_VMEM_SLACK = 2 << 20


def max_chunk_bytes(rows, cpw, warmup_bytes, bpu=1, extra_bytes=0):
    """Shape-derived chunk clamp: the largest K (bytes) such that the
    kernel's scoped-VMEM footprint stays under vmem_limit_bytes().

    Footprint model (see the r3 OOM calibration at _VMEM_SLACK):
      2 * Jw * GROUPS * 4096   double-buffered data block
                               (Jw = (W + K) / (bpu * cpw) words,
                                each word a [G, 8, 128] int32 slice)
      + rows * 4096            fused table tiles (constant index map:
                               single-buffered)
      + extra_bytes            tier-specific extras (the tagged-DFA
                               kernel's code planes + register/bank
                               output blocks)
      + _VMEM_SLACK            scratch + small blocks
    Every tier with a table computes its max_chunk through this —
    never a constant — so growing the automaton shrinks K instead of
    crashing the compile (VERDICT r3 #1a)."""
    budget = (vmem_limit_bytes() - _VMEM_SLACK - rows * 8 * 128 * 4
              - extra_bytes)
    jw = budget // (2 * GROUPS * 8 * 128 * 4)
    k = jw * cpw * bpu - warmup_bytes
    quantum = cpw * WORDS_PER_ITER * bpu
    k = max(quantum, k // quantum * quantum)
    # per-chunk match counts ride 16 bits in the packed planes
    return min(k, ((1 << 16) - 1) // quantum * quantum)


class SpecTables:
    """Host-side preprocessing of a Dfa for the speculative kernel."""

    # repair stats of the last completed no-match scan: (natively
    # repaired chunks, total chunks); None after a matched/early-exit
    # scan.  Feeds Scanner.stats().
    last_repair = None

    def __init__(self, dfa):
        S, ncls = dfa.nstates, dfa.nclasses
        if S * ncls > 128:
            raise ValueError("automaton too large for the 128-lane "
                             "fused table (S*ncls = %d)" % (S * ncls))
        self.dfa = dfa
        self.nstates = S
        self.ncls = ncls
        # packing density: 4-bit classes (8 per word) by default;
        # 3-bit (10 per word, ~25% less HBM traffic) is opt-in via
        # SREGEX_PACK_BITS=3 — its larger unrolled kernel body has
        # pathological compile times on the remote-compile relay.
        # Wide alphabets (16 < ncls <= 128, e.g. many-literal
        # multi-regex hot cores) pack 8-bit like the big tier: half
        # the per-word density, but the scan stays one gather per
        # byte instead of the big tier's bounded row loop.
        import os
        want = int(os.environ.get("SREGEX_PACK_BITS", "4"))
        if ncls > 16:
            self.bits = 8
            self.cpw = 4
        else:
            self.bits = 3 if (want == 3 and ncls <= 8) else 4
            self.cpw = 10 if self.bits == 3 else 8
        self.warmup = 4 * self.cpw
        self.max_chunk = max_chunk_bytes(1, self.cpw, self.warmup)
        fused = np.zeros(128, dtype=np.int32)
        for s in range(S):
            for c in range(ncls):
                nxt = int(dfa.trans[s, c]) * ncls
                m = int(dfa.match[s, c]) << _MATCH_SHIFT
                fused[s * ncls + c] = nxt | m
        self.fused_vec = jnp.asarray(
            np.broadcast_to(fused, (8, 128)).copy())
        self.class_map = dfa.class_map.astype(np.uint8)
        self.match_eof = dfa.match_eof

    def _scan(self, data, state0, j0, C, bad_tail, J, W, COUNT=False,
              mesh=None, axis=None, esc=None):
        return _spec_scan(data, state0, j0, self.fused_vec, C,
                          bad_tail, J=J, W=W, CPW=self.cpw,
                          BITS=self.bits, COUNT=COUNT, mesh=mesh,
                          axis=axis, ESC=esc)


class SpecTablesWide:
    """Like SpecTables but for automata with 128 < S*ncls <= 4096: the
    fused table spans R <= 32 lane rows and the kernel selects the row
    by the index's high bits (R gathers + selects per byte, statically
    unrolled).  Slower per byte than the narrow kernel, but for tables
    this size the unrolled chain still beats the big tier's
    dynamically bounded row loop (measured: the 2,136-entry pattern
    runs 0.36 GB/s on the big tier)."""

    # Platform-aware cap (see _wide_max): interpret-mode CPU can't
    # trace R~100 select chains, so the CPU default stays 4096; on
    # real TPU the chain keeps beating the big tier far beyond it
    # (R=87 measured 2.86 vs 0.15 GB/s at 128 MB, ~20 s one-time
    # compile), so the hardware default is 16384.  SREGEX_WIDE_MAX
    # overrides either.
    MAX_ENTRIES = 4096
    MAX_ENTRIES_TPU = 16384

    last_repair = None   # see SpecTables.last_repair

    def _wide_max(self):
        env = os.environ.get("SREGEX_WIDE_MAX")
        if env is not None:
            return int(env)
        if jax.default_backend() != "cpu":
            return self.MAX_ENTRIES_TPU
        return self.MAX_ENTRIES

    def __init__(self, dfa):
        S, ncls = dfa.nstates, dfa.nclasses
        limit = self._wide_max()
        if ncls > 256:
            raise ValueError("more than 256 byte classes (%d)" % ncls)
        if S * ncls > limit:
            raise ValueError("automaton too large for the wide fused "
                             "table (S*ncls = %d)" % (S * ncls))
        self.dfa = dfa
        self.nstates = S
        self.ncls = ncls
        # wide alphabets (many-literal multi-regex sets: ncls > 16)
        # pack 8-bit like the big tier — the select chain stays, the
        # per-word density halves
        self.bits = 4 if ncls <= 16 else 8
        self.cpw = 8 if self.bits == 4 else 4
        self.warmup = 4 * self.cpw
        self.rows = -(-(S * ncls) // 128)
        # shape-derived VMEM clamp: the r3 hardware bench OOM'd here
        # (rows=98 8-bit at the old constant 1920 clamp)
        self.max_chunk = max_chunk_bytes(self.rows, self.cpw,
                                         self.warmup)
        fused = np.zeros(self.rows * 128, dtype=np.int32)
        for st in range(S):
            for c in range(ncls):
                nxt = int(dfa.trans[st, c]) * ncls
                m = int(dfa.match[st, c]) << _MATCH_SHIFT
                fused[st * ncls + c] = nxt | m
        rows = fused.reshape(self.rows, 128)
        self.fused_rows = jnp.asarray(np.ascontiguousarray(
            np.broadcast_to(rows[:, None, :],
                            (self.rows, 8, 128)).copy()))
        self.class_map = dfa.class_map.astype(np.uint8)
        self.match_eof = dfa.match_eof

    def _scan(self, data, state0, j0, C, bad_tail, J, W, COUNT=False,
              mesh=None, axis=None, esc=None):
        return _spec_scan_wide(data, state0, j0, self.fused_rows, C,
                               bad_tail, J=J, W=W, CPW=self.cpw,
                               BITS=self.bits, COUNT=COUNT,
                               R=self.rows, mesh=mesh, axis=axis,
                               ESC=esc)


def _kernel(data_ref, state0_ref, j0_ref, fused_ref,
            phi_ref, fm_ref, swarm_ref, *, J, W, CPW, BITS,
            COUNT=False):
    """data_ref block: [1, J//CPW, G, 8, 128] int32, CPW BITS-bit
    classes per word."""
    fused = fused_ref[:]                       # [8, 128]
    G = GROUPS
    CMASK = (1 << BITS) - 1

    # phase 1: warmup bytes 0..W with the per-chunk freeze predicate
    def warm_step(wi, states):
        words = [data_ref[0, wi, g] for g in range(G)]
        for b in range(CPW):
            j = wi * CPW + b
            rows = [(words[g] >> (BITS * b)) & CMASK
                    for g in range(G)]
            es = [jnp.take_along_axis(
                fused, (states[g] + rows[g]) & 127, axis=1)
                for g in range(G)]
            states = tuple(
                jnp.where(j >= j0_ref[0, g], es[g] & _STATE_MASK,
                          states[g])
                for g in range(G))
        return states

    states = tuple(state0_ref[0, g] for g in range(G))
    states = lax.fori_loop(0, W // CPW, warm_step, states)
    for g in range(G):
        swarm_ref[0, g] = states[g]            # speculative entries

    # phase 2: the hot loop, G-interleaved and word-unrolled
    WPI = WORDS_PER_ITER

    def step(it, carry):
        states, maccs = carry
        base = W // CPW + it * WPI
        slab = data_ref[0, pl.ds(base, WPI)]   # [WPI, G, 8, 128]
        for w in range(WPI):
            words = [slab[w, g] for g in range(G)]
            for b in range(CPW):
                rows = [(words[g] >> (BITS * b)) & CMASK
                        for g in range(G)]
                # the & 127 mask proves in-bounds lane indices to the
                # compiler, keeping the gather on the fast path
                es = [jnp.take_along_axis(
                    fused, (states[g] + rows[g]) & 127, axis=1)
                    for g in range(G)]
                if COUNT:
                    maccs = tuple(maccs[g] + (es[g] >> _MATCH_SHIFT)
                                  for g in range(G))
                else:
                    maccs = tuple(maccs[g] | es[g] for g in range(G))
                states = tuple(es[g] & _STATE_MASK for g in range(G))
        return states, maccs

    z = jnp.zeros((8, 128), jnp.int32)
    maccs = tuple(z for _ in range(G))
    n_iter = (J - W) // (CPW * WPI)
    states, maccs = lax.fori_loop(0, n_iter, step, (states, maccs))
    for g in range(G):
        phi_ref[0, g] = states[g]
        if COUNT:
            fm_ref[0, g] = maccs[g]               # per-chunk count
        else:
            fm_ref[0, g] = maccs[g] >> _MATCH_SHIFT  # any-match flag


def _kernel_wide(data_ref, state0_ref, j0_ref, fused_ref,
                 phi_ref, fm_ref, swarm_ref, *, J, W, CPW, BITS, R,
                 COUNT=False):
    """Wide-table variant: fused_ref [R, 8, 128]; the gather row is
    selected by the high bits of the (premultiplied state + class)
    index."""
    G = GROUPS
    CMASK = (1 << BITS) - 1
    frows = [fused_ref[r] for r in range(R)]

    def lookup(idx):
        lane = idx & 127
        hi = idx >> 7
        e = jnp.take_along_axis(frows[0], lane, axis=1)
        for r in range(1, R):
            er = jnp.take_along_axis(frows[r], lane, axis=1)
            e = jnp.where(hi == r, er, e)
        return e

    j0 = j0_ref[0]

    def warm_step(wi, states):
        words = [data_ref[0, wi, g] for g in range(G)]
        for b in range(CPW):
            j = wi * CPW + b
            rows = [(words[g] >> (BITS * b)) & CMASK
                    for g in range(G)]
            es = [lookup(states[g] + rows[g]) for g in range(G)]
            states = tuple(
                jnp.where(j >= j0_ref[0, g], es[g] & _STATE_MASK,
                          states[g])
                for g in range(G))
        return states

    states = tuple(state0_ref[0, g] for g in range(G))
    states = lax.fori_loop(0, W // CPW, warm_step, states)
    for g in range(G):
        swarm_ref[0, g] = states[g]

    WPI = WORDS_PER_ITER

    def step(it, carry):
        states, maccs = carry
        base = W // CPW + it * WPI
        slab = data_ref[0, pl.ds(base, WPI)]
        for w in range(WPI):
            words = [slab[w, g] for g in range(G)]
            for b in range(CPW):
                rows = [(words[g] >> (BITS * b)) & CMASK
                        for g in range(G)]
                es = [lookup(states[g] + rows[g]) for g in range(G)]
                if COUNT:
                    maccs = tuple(maccs[g] + (es[g] >> _MATCH_SHIFT)
                                  for g in range(G))
                else:
                    maccs = tuple(maccs[g] | es[g] for g in range(G))
                states = tuple(es[g] & _STATE_MASK for g in range(G))
        return states, maccs

    z = jnp.zeros((8, 128), jnp.int32)
    maccs = tuple(z for _ in range(G))
    n_iter = (J - W) // (CPW * WPI)
    states, maccs = lax.fori_loop(0, n_iter, step, (states, maccs))
    for g in range(G):
        phi_ref[0, g] = states[g]
        if COUNT:
            fm_ref[0, g] = maccs[g]
        else:
            fm_ref[0, g] = maccs[g] >> _MATCH_SHIFT


def _summarize(phi, fm, swarm, state0, C, bad_tail, COUNT, ESC=None):
    """Shared post-kernel summary (see _spec_scan docstring).

    ESC (hot-core tier, ops/pallas_core.py): premultiplied id of the
    sticky escape state.  A chunk whose exit state is ESC left the
    core at some byte — its fm accumulator and exit are garbage past
    that byte, so the chunk must fail validation (the host repairs it
    with the FULL machine).  ESC is sticky, so phi == ESC iff the
    chunk ever escaped."""
    Cp = phi.size
    phi_f = phi.reshape(Cp)
    fm_f = fm.reshape(Cp)
    swarm_f = swarm.reshape(Cp)
    e0 = state0.reshape(Cp)[0]
    entries = jnp.concatenate([e0[None], phi_f[:-1]])
    idx = jnp.arange(Cp, dtype=jnp.int32)
    okv = swarm_f == entries
    if ESC is not None:
        okv = okv & (phi_f != ESC)
    if not COUNT:
        okv = okv & (fm_f == 0)
    okv = (okv | (idx >= C)) & (idx != bad_tail)
    all_ok = jnp.all(okv)
    fb = jnp.argmin(okv.astype(jnp.int32)).astype(jnp.int32)
    fb_eff = jnp.where(all_ok, C, fb)
    prefix_cnt = jnp.sum(jnp.where((idx < fb_eff) & (idx < C), fm_f, 0))
    fire = (fm_f != 0) & (idx < fb_eff) & (idx < C)
    last_fire = jnp.max(jnp.where(fire, idx, -1)).astype(jnp.int32)
    lf = jnp.maximum(last_fire, 0)
    summary = jnp.stack([
        all_ok.astype(jnp.int32), fb, entries[fb], phi_f[fb],
        swarm_f[fb], fm_f[fb], phi_f[C - 1],
        prefix_cnt.astype(jnp.int32), last_fire, entries[lf]])
    packed = jnp.stack([phi.astype(jnp.uint8),
                        (fm & 0xFF).astype(jnp.uint8),
                        swarm.astype(jnp.uint8),
                        ((fm >> 8) & 0xFF).astype(jnp.uint8)])
    return summary, packed



def _dispatch_kernel(kernel, data, state0, j0, fused, fused_spec,
                     mesh, axis):
    """Run the scan kernel single-chip or shard_mapped over a mesh.

    mesh=None: one pallas_call over the whole batch.  With a mesh the
    batch (chunk-block) dim is data-parallel across devices: each chip
    scans its contiguous block range with the SAME speculative kernel
    (tables replicated via P()), and the cross-chip stitch is the
    existing swarm==entries validation chain — the per-chunk planes
    come back in global chunk order, so _summarize needs no
    mesh-awareness at all.  This is the fast multi-chip path (the
    enumerative sharded_scan.py predates it and remains as the
    any-size fallback)."""
    interpret = jax.default_backend() == "cpu"
    G = GROUPS
    small = pl.BlockSpec((1, G, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)

    def run(d, s0, j0_, f):
        B = d.shape[0]
        Jw = d.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Jw, G, 8, 128),
                             lambda i: (i, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                small, small, fused_spec,
            ],
            out_specs=[small, small, small],
            out_shape=[
                jax.ShapeDtypeStruct((B, G, 8, 128), jnp.int32),
                jax.ShapeDtypeStruct((B, G, 8, 128), jnp.int32),
                jax.ShapeDtypeStruct((B, G, 8, 128), jnp.int32),
            ],
            interpret=interpret,
            compiler_params=compiler_params(footprint_bytes(
                Jw, f.shape[0] if f.ndim == 3 else 1)),
        )(d, s0, j0_, f)

    if mesh is None:
        return run(data, state0, j0, fused)
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    return shard_map(
        run, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )(data, state0, j0, fused)


@functools.partial(jax.jit,
                   static_argnames=("J", "W", "CPW", "BITS", "COUNT",
                                    "R", "mesh", "axis", "ESC"))
def _spec_scan_wide(data, state0, j0, fused_rows, C, bad_tail, *, J,
                    W, CPW, BITS, R, COUNT=False, mesh=None,
                    axis=None, ESC=None):
    """Wide-table counterpart of _spec_scan; fused_rows [R, 8, 128].

    Packed format difference: the narrow kernel packs its repair-path
    arrays as 4 uint8 planes [phi, count_lo, swarm, count_hi], which
    assumes states fit 8 bits.  Wide automata have premultiplied states
    up to 1023, so wide mode instead returns THREE full int32 planes
    [phi, count, swarm] (stacked on axis 0).  The repair path is rare
    and wide automata are off the benchmark path, so the 3x readback
    does not matter; _unpack() dispatches on the plane count."""
    kernel = functools.partial(_kernel_wide, J=J, W=W, CPW=CPW,
                               BITS=BITS, R=R, COUNT=COUNT)
    fused_spec = pl.BlockSpec((R, 8, 128), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    phi, fm, swarm = _dispatch_kernel(kernel, data, state0, j0,
                                      fused_rows, fused_spec, mesh,
                                      axis)
    summary, _packed8 = _summarize(phi, fm, swarm, state0, C,
                                   bad_tail, COUNT, ESC=ESC)
    packed = jnp.stack([phi, fm, swarm])   # int32; wide states > 255
    return summary, packed


@functools.partial(jax.jit,
                   static_argnames=("J", "W", "CPW", "BITS", "COUNT",
                                    "R", "kernel_fn", "mesh", "axis",
                                    "ESC"))
def _spec_scan_big_call(data, state0, j0, fused_rows, C, bad_tail, *,
                        J, W, CPW, BITS, R, COUNT=False,
                        kernel_fn=None, mesh=None, axis=None,
                        ESC=None):
    """Shared driver for kernels whose table is [R, 8, 128]
    row-broadcast tiles (the big tier, ops/pallas_big.py).  Same
    contract and 3-int32-plane packed format as _spec_scan_wide."""
    kernel = functools.partial(kernel_fn, J=J, W=W, CPW=CPW,
                               BITS=BITS, R=R, COUNT=COUNT)
    fused_spec = pl.BlockSpec((R, 8, 128), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    phi, fm, swarm = _dispatch_kernel(kernel, data, state0, j0,
                                      fused_rows, fused_spec, mesh,
                                      axis)
    summary, _packed8 = _summarize(phi, fm, swarm, state0, C,
                                   bad_tail, COUNT, ESC=ESC)
    packed = jnp.stack([phi, fm, swarm])
    return summary, packed


@functools.partial(jax.jit,
                   static_argnames=("J", "W", "CPW", "BITS", "COUNT",
                                    "mesh", "axis", "ESC"))
def _spec_scan(data, state0, j0, fused_vec, C, bad_tail, *, J, W, CPW,
               BITS, COUNT=False, mesh=None, axis=None, ESC=None):
    """data: int32 [B, J//CPW, G, 8, 128] packed; state0/j0:
    [B, G, 8, 128]; C = live chunk count (traced scalar); bad_tail =
    index of a ragged tail chunk or -1.

    Returns (summary int32 [8], packed uint8 [4, B, G, 8, 128]).
    The summary performs the speculation-chain validation ON DEVICE so
    the common case reads back ~32 bytes instead of megabytes:
      [0] all_ok  [1] first_bad  [2] entry@first_bad  [3] phi@first_bad
      [4] swarm@first_bad  [5] fm@first_bad  [6] phi@C-1
      [7] sum(fm[0:first_bad])  (the valid-prefix count, COUNT mode)
      [8] last firing chunk in the validated prefix (-1 none)
      [9] entry @ that chunk
    The packed array is the full per-chunk data for the (rare) repair
    path: (phi, fm-lo, swarm, fm-hi)."""
    kernel = functools.partial(_kernel, J=J, W=W, CPW=CPW, BITS=BITS,
                               COUNT=COUNT)
    fused_spec = pl.BlockSpec((8, 128), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    phi, fm, swarm = _dispatch_kernel(kernel, data, state0, j0,
                                      fused_vec, fused_spec, mesh,
                                      axis)
    return _summarize(phi, fm, swarm, state0, C, bad_tail, COUNT,
                      ESC=ESC)


def _unpack(outs, C):
    """Host-side unpack of the repair-path arrays for either packed
    format (narrow uint8 [4,...] with lo/hi count planes, or wide
    int32 [3,...])."""
    outs = np.asarray(outs).astype(np.int64)
    total = outs.shape[1] * outs.shape[2] * outs.shape[3] * outs.shape[4]
    phi = outs[0].reshape(total)[:C]
    swarm = outs[2].reshape(total)[:C]
    if outs.shape[0] == 4:
        fmcnt = (outs[1] | (outs[3] << 8)).reshape(total)[:C]
    else:
        fmcnt = outs[1].reshape(total)[:C]
    return phi, fmcnt, swarm


def with_warmup(tables, W):
    """Tables variant with a LONGER speculation warmup window.

    Bounded-history automata (counted repetitions a{n,m}...: the run
    counter saturates at the max bound) converge through a warmup of
    W >= their history bound on ANY corpus — so a corpus whose run
    lengths defeat the default 32-byte window (measured: 74% of
    chunks repaired natively on a{60,120}b over long-run data) scans
    clean once W exceeds the bound (1 ragged-tail repair).  The copy
    shares every fused table; only the window length (and therefore
    the prep layout and the kernel trace) changes.  Returns None when
    the tables can't host the window: byte-unit tiers only (the pair
    tier's tiny machines are never history-bounded past 32).  The
    copy's VMEM chunk clamp is re-derived for the longer window."""
    import copy
    if getattr(tables, "bpu", 1) != 1 or tables.bits not in (4, 8):
        return None
    if W % tables.cpw or not (tables.warmup < W <= 2048):
        return None
    t = copy.copy(tables)
    t.warmup = int(W)
    t.max_chunk = max_chunk_bytes(getattr(tables, "rows", 1),
                                  tables.cpw, t.warmup)
    if effective_chunk(t, DEFAULT_K) < t.warmup // 2:
        return None     # the window would dwarf the chunk: no gain
    t.last_repair = None
    return t


def effective_chunk(tables, chunk_len):
    """The chunk length the prep actually uses: rounded down to the
    packing quantum and clamped to the tables' VMEM budget
    (max_chunk, derived from shapes via max_chunk_bytes — never a
    constant).  Exposed so chunk-indexed consumers (the finditer
    start locator) agree with the prep about K."""
    CPW = tables.cpw
    bpu = getattr(tables, "bpu", 1)    # bytes per kernel unit
    quantum = CPW * WORDS_PER_ITER * bpu
    chunk_len = min(int(chunk_len),
                    getattr(tables, "max_chunk", 1 << 15))
    K = max(quantum, chunk_len // quantum * quantum)
    if K >= 1 << 16:
        # per-chunk match counts ride 16 bits in the packed planes
        raise ValueError("chunk_len must be < 65536 (got %d)" % K)
    return K


def _prepare(tables, data_np, chunk_len, b_multiple=1,
             prev_tail_cls=None, block=True):
    """Host prep: class-map, overlapping windows, 4-per-word packing,
    tiling into [B, J//4, G, 8, 128].  Vectorized.  b_multiple pads
    the block count so it shards evenly over a mesh.

    prev_tail_cls: optional uint8 [W] of CLASS ids filling chunk 0's
    warmup window (the last W stream bytes before this segment,
    class-mapped) — the pipelined streaming scan (ops/pipeline.py)
    uses it so a non-first segment's chunk 0 speculates over REAL
    bytes instead of the zero-class pad.  block=False skips the
    block_until_ready (the pipeline overlaps uploads with scans)."""
    from numpy.lib.stride_tricks import sliding_window_view

    n = len(data_np)
    CPW = tables.cpw
    bpu = getattr(tables, "bpu", 1)    # bytes per kernel unit
    K = effective_chunk(tables, chunk_len)
    W = tables.warmup
    G = GROUPS
    C = max(1, -(-n // K))
    B = -(-C // (G * TILE))
    B = -(-B // b_multiple) * b_multiple
    Cp = B * G * TILE
    J = W + K

    raw = np.frombuffer(data_np, dtype=np.uint8) \
        if not isinstance(data_np, np.ndarray) else data_np

    if bpu == 2:
        return _prepare_pair(tables, raw, n, K, W, G, C, B, Cp, J,
                             prev_tail_cls=prev_tail_cls, block=block)

    from ..native import get_lib, _u8p, _i32p
    lib = get_lib()
    if tables.bits == 4 and prev_tail_cls is None and lib is not None \
            and hasattr(lib, "sre_pack_prepare"):
        # native single-pass prepare (numpy's strided paths are
        # pathologically slow on large arrays in some environments)
        packed = np.empty((B, J // CPW, GROUPS, 8, 128),
                          dtype=np.int32)
        lib.sre_pack_prepare(_u8p(raw), n, _u8p(tables.class_map),
                             K, W, GROUPS, Cp,
                             _i32p(packed.reshape(-1)))
    else:
        cls = np.frombuffer(
            raw.tobytes().translate(tables.class_map.tobytes()),
            dtype=np.uint8)
        padded = np.zeros(W + Cp * K, dtype=np.uint8)
        if prev_tail_cls is not None:
            padded[:W] = prev_tail_cls
        padded[W:W + n] = cls
        win = sliding_window_view(padded, J)[::K][:Cp]   # [Cp, J] view

        # pack CPW BITS-bit classes/word; chunk c = ((b*G+g)*TILE+t)
        arr = np.ascontiguousarray(win).reshape(B, G, TILE,
                                                J // CPW, CPW)
        if tables.bits == 4:
            nib = (arr[..., 0::2] | (arr[..., 1::2] << 4))
            words = np.ascontiguousarray(nib).view("<u4")[..., 0] \
                .astype(np.int32)
        else:
            # 3-bit (10/word) or 8-bit (4/word, ncls > 16) packing
            words = arr[..., 0].astype(np.int32).copy()
            for k in range(1, CPW):
                words |= arr[..., k].astype(np.int32) \
                    << (tables.bits * k)
        packed = np.ascontiguousarray(words.transpose(0, 3, 1, 2))
        packed = packed.reshape(B, J // CPW, G, 8, 128)
    # commit to the device here so repeated scans skip the upload
    dev = jnp.asarray(packed)
    if block:
        dev.block_until_ready()
    return dev, C, K, J, B


def _prepare_pair(tables, raw, n, K, W, G, C, B, Cp, J,
                  prev_tail_cls=None, block=True):
    """Pair-unit host prep (ops/pallas_pair.py tables): class-map the
    whole stream, combine adjacent classes into pair ids (K and W are
    even, so pairs never straddle a window), then window/pack in pair
    units with the same layout as _prepare."""
    from numpy.lib.stride_tricks import sliding_window_view

    CPW = tables.cpw
    cb = tables.byte_ncls
    cls = np.frombuffer(
        raw.tobytes().translate(tables.class_map.tobytes()),
        dtype=np.uint8)
    padded = np.zeros(W + Cp * K, dtype=np.uint8)
    if prev_tail_cls is not None:
        padded[:W] = prev_tail_cls
    padded[W:W + n] = cls
    pairs = (padded[0::2].astype(np.int16) * cb
             + padded[1::2]).astype(np.uint8)
    K2, W2, J2 = K // 2, W // 2, J // 2
    win = sliding_window_view(pairs, J2)[::K2][:Cp]

    arr = np.ascontiguousarray(win).reshape(B, G, TILE,
                                            J2 // CPW, CPW)
    if tables.bits == 4:
        nib = (arr[..., 0::2] | (arr[..., 1::2] << 4))
        words = np.ascontiguousarray(nib).view("<u4")[..., 0] \
            .astype(np.int32)
    else:
        words = arr[..., 0].astype(np.int32).copy()
        for k in range(1, CPW):
            words |= arr[..., k].astype(np.int32) << (tables.bits * k)
    packed = np.ascontiguousarray(words.transpose(0, 3, 1, 2))
    packed = packed.reshape(B, J2 // CPW, G, 8, 128)
    dev = jnp.asarray(packed)
    if block:
        dev.block_until_ready()
    return dev, C, K, J, B


@functools.partial(jax.jit, static_argnames=("B",))
def _entry_planes(entry_premult, w, *, B):
    """Device-built state0/j0 planes: all streams speculate from the
    premultiplied seed except stream 0, which starts at the true
    entry with its warmup frozen (j0 = W).  Building these on device
    replaces a 2 x B x 4096 x 4-byte host upload per scan (~8 MB at
    2 GiB corpus — ~140 ms through the relay, pure overhead)."""
    G = GROUPS
    s0 = jnp.zeros((B, G, 8, 128), jnp.int32)
    s0 = s0.at[0, 0, 0, 0].set(entry_premult)
    j0 = jnp.zeros((B, G, 8, 128), jnp.int32)
    j0 = j0.at[0, 0, 0, 0].set(w)
    return s0, j0


def spec_scan_bytes(tables, data_np, chunk_len=DEFAULT_K,
                    entry_state=0, prepared=None, mesh=None,
                    axis="data"):
    """Whole-buffer scan.  Returns (final_state, first_match_boundary
    or -1); boundaries 0..n-1 only, the EOF boundary is the caller's
    (tables.match_eof).  Exact: speculation misses and firing chunks
    are re-scanned with the native engine.  On a match the returned
    state is the state AT the match boundary (so the regex id is
    tables.dfa.id_at(state, data[boundary]) — ids never ride the
    device hot loop).

    ``prepared`` may carry the result of a prior _prepare() to skip
    host preprocessing (benchmarks, repeated scans)."""
    from ..native import NativeDfa

    n = len(data_np)
    if n == 0:
        return entry_state, -1
    W = tables.warmup
    if prepared is None:
        from .prep import prepare_auto
        prepared = prepare_auto(tables, data_np, chunk_len,
                                b_multiple=(mesh.devices.size
                                            if mesh is not None else 1))
    data, C, K, J, B = prepared
    ncls = tables.ncls
    G = GROUPS
    topm = getattr(tables, "to_premult", None) or (lambda v: v * ncls)
    frpm = getattr(tables, "from_premult", None) or (lambda v: v // ncls)

    # chunk 0: skip warmup entirely, start from the true entry state
    s0p, j0p = _entry_planes(jnp.int32(topm(entry_state)),
                             jnp.int32(W), B=B)

    bad_tail = (C - 1) if C * K > n and (n - (C - 1) * K) != K else -1
    summary, packed = tables._scan(
        data if isinstance(data, jax.Array) else jnp.asarray(data),
        s0p, j0p,
        jnp.int32(C), jnp.int32(bad_tail), J, W, mesh=mesh,
        axis=axis if mesh is not None else None)
    # common case: ~32-byte readback; the per-chunk arrays stay on
    # device and are pulled only for the repair path
    summ = np.asarray(summary).astype(np.int64)
    all_ok, fb = bool(summ[0]), int(summ[1])
    tables.last_repair = None   # set on completed (no-match) scans
    if all_ok:
        tables.last_repair = (0, C)
        return frpm(int(summ[6])), -1

    raw = np.frombuffer(data_np, dtype=np.uint8) \
        if not isinstance(data_np, np.ndarray) else data_np
    native = NativeDfa(tables.dfa)
    entry_fb, phi_fb, swarm_fb, many_fb = (int(summ[2]), int(summ[3]),
                                           int(summ[4]), int(summ[5]))
    lo = fb * K
    hi = min(lo + K, n)
    if swarm_fb == entry_fb and hi - lo == K and many_fb:
        # validated chunk fired a match: one native re-scan pins it
        f, st = native.scan_first(raw[lo:hi].tobytes(),
                                  frpm(entry_fb))
        return st, lo + f

    # general repair (speculation miss / ragged tail): pull the
    # per-chunk arrays and walk sequentially from the discrepancy
    phi, many, swarm = _unpack(packed, C)
    e = entry_fb
    c = fb
    nat = 0
    while c < C:
        lo = c * K
        hi = min(lo + K, n)
        if swarm[c] == e and hi - lo == K and many[c] == 0:
            e = int(phi[c])
            c += 1
            continue
        f, st = native.scan_first(raw[lo:hi].tobytes(), frpm(e))
        if f >= 0:
            return st, lo + f
        e = topm(st)
        c += 1
        nat += 1
    tables.last_repair = (nat, C)
    return frpm(e), -1


def spec_count_bytes(tables, data_np, chunk_len=DEFAULT_K,
                     entry_state=0, prepared=None, mesh=None,
                     axis="data"):
    """Count every boundary (0..n-1) at which a match ends.  Returns
    (final_state, count); the EOF boundary is the caller's
    (tables.match_eof).  Exact: chunks whose speculation missed are
    re-counted with the native engine."""
    from ..native import NativeDfa

    n = len(data_np)
    if n == 0:
        return entry_state, 0
    W = tables.warmup
    if prepared is None:
        from .prep import prepare_auto
        prepared = prepare_auto(tables, data_np, chunk_len,
                                b_multiple=(mesh.devices.size
                                            if mesh is not None else 1))
    data, C, K, J, B = prepared
    ncls = tables.ncls
    G = GROUPS
    topm = getattr(tables, "to_premult", None) or (lambda v: v * ncls)
    frpm = getattr(tables, "from_premult", None) or (lambda v: v // ncls)

    s0p, j0p = _entry_planes(jnp.int32(topm(entry_state)),
                             jnp.int32(W), B=B)

    bad_tail = (C - 1) if C * K > n and (n - (C - 1) * K) != K else -1
    summary, packed = tables._scan(
        data if isinstance(data, jax.Array) else jnp.asarray(data),
        s0p, j0p,
        jnp.int32(C), jnp.int32(bad_tail), J, W, COUNT=True,
        mesh=mesh, axis=axis if mesh is not None else None)
    summ = np.asarray(summary).astype(np.int64)
    if bool(summ[0]):
        # every chunk validated: in COUNT mode fb saturates past C, so
        # the prefix sum covers the whole corpus.  The device summary
        # accumulates in int32; past 2**31-1 possible boundaries the
        # exact total is re-summed on host in int64 from the per-chunk
        # counts (a ~4*C-byte readback, only for >2 GiB corpora).
        tables.last_repair = (0, C)
        if n < 2 ** 31:
            return frpm(int(summ[6])), int(summ[7])
        _, cnt, _ = _unpack(packed, C)
        return frpm(int(summ[6])), int(np.sum(cnt, dtype=np.int64))

    # repair from the first speculation miss (or ragged tail)
    raw = np.frombuffer(data_np, dtype=np.uint8) \
        if not isinstance(data_np, np.ndarray) else data_np
    fb = int(summ[1])
    total = int(summ[7])          # counts of the validated prefix
    native = NativeDfa(tables.dfa)
    phi, cnt, swarm = _unpack(packed, C)
    e = int(summ[2])
    c = fb
    nat = 0
    while c < C:
        lo = c * K
        hi = min(lo + K, n)
        if swarm[c] == e and hi - lo == K:
            total += int(cnt[c])
            e = int(phi[c])
        else:
            k, st = native.count(raw[lo:hi].tobytes(), frpm(e))
            total += k
            e = topm(st)
            nat += 1
        c += 1
    tables.last_repair = (nat, C)
    return frpm(e), total


def spec_chunk_map(tables, data_np, chunk_len=DEFAULT_K,
                   entry_state=0, prepared=None, mesh=None,
                   axis="data"):
    """Validated per-chunk scan map: (entries [C], counts [C],
    final_state), all exact.

    entries[c] = the DFA state entering chunk c (plain ids), counts[c]
    = the number of match-ending boundaries inside chunk c.  One
    COUNT-mode device pass; chunks whose speculation missed (or the
    ragged tail) are re-counted natively.  This is the building block
    for device-rate finditer: the per-chunk fire map says which chunks
    can contain match boundaries at all, and the entries let the
    caller re-scan any single chunk natively for exact positions.
    """
    from ..native import NativeDfa

    n = len(data_np)
    if n == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                entry_state)
    W = tables.warmup
    if prepared is None:
        from .prep import prepare_auto
        prepared = prepare_auto(tables, data_np, chunk_len,
                                b_multiple=(mesh.devices.size
                                            if mesh is not None else 1))
    data, C, K, J, B = prepared
    ncls = tables.ncls
    G = GROUPS
    topm = getattr(tables, "to_premult", None) or (lambda v: v * ncls)
    frpm = getattr(tables, "from_premult", None) or (lambda v: v // ncls)

    s0p, j0p = _entry_planes(jnp.int32(topm(entry_state)),
                             jnp.int32(W), B=B)

    bad_tail = (C - 1) if C * K > n and (n - (C - 1) * K) != K else -1
    summary, packed = tables._scan(
        data if isinstance(data, jax.Array) else jnp.asarray(data),
        s0p, j0p,
        jnp.int32(C), jnp.int32(bad_tail), J, W, COUNT=True,
        mesh=mesh, axis=axis if mesh is not None else None)
    summ = np.asarray(summary).astype(np.int64)
    raw = np.frombuffer(data_np, dtype=np.uint8) \
        if not isinstance(data_np, np.ndarray) else data_np
    phi, cnt, swarm = _unpack(packed, C)
    entries = np.zeros(C, dtype=np.int64)
    counts = cnt.astype(np.int64).copy()
    native = None
    fb = C if bool(summ[0]) else int(summ[1])
    # validated prefix: the chain is exact as-is
    e = topm(entry_state)
    for c in range(min(fb, C)):
        entries[c] = e
        e = int(phi[c])
    c = fb
    while c < C:
        lo = c * K
        hi = min(lo + K, n)
        entries[c] = e
        if swarm[c] == e and hi - lo == K:
            e = int(phi[c])
        else:
            if native is None:
                native = NativeDfa(tables.dfa)
            k, st = native.count(raw[lo:hi].tobytes(), frpm(e))
            counts[c] = k
            e = topm(st)
        c += 1
    frv = getattr(tables, "from_premult_vec", None)
    ents = entries // ncls if frv is None else frv(entries)
    return ents, counts, frpm(e)


def spec_scan_last_bytes(tables, data_np, chunk_len=DEFAULT_K,
                         entry_state=0, prepared=None, mesh=None,
                         axis="data"):
    """Find the LAST boundary (0..n-1) at which a match ends (used by
    the reverse-scan start locator).  Returns (final_state,
    last_boundary or -1).  Exact via the same speculation validation."""
    from ..native import NativeDfa

    n = len(data_np)
    if n == 0:
        return entry_state, -1
    W = tables.warmup
    if prepared is None:
        from .prep import prepare_auto
        prepared = prepare_auto(tables, data_np, chunk_len,
                                b_multiple=(mesh.devices.size
                                            if mesh is not None else 1))
    data, C, K, J, B = prepared
    ncls = tables.ncls
    G = GROUPS
    topm = getattr(tables, "to_premult", None) or (lambda v: v * ncls)
    frpm = getattr(tables, "from_premult", None) or (lambda v: v // ncls)

    s0p, j0p = _entry_planes(jnp.int32(topm(entry_state)),
                             jnp.int32(W), B=B)

    bad_tail = (C - 1) if C * K > n and (n - (C - 1) * K) != K else -1
    summary, packed = tables._scan(
        data if isinstance(data, jax.Array) else jnp.asarray(data),
        s0p, j0p,
        jnp.int32(C), jnp.int32(bad_tail), J, W, COUNT=True,
        mesh=mesh, axis=axis if mesh is not None else None)
    summ = np.asarray(summary).astype(np.int64)
    raw = np.frombuffer(data_np, dtype=np.uint8) \
        if not isinstance(data_np, np.ndarray) else data_np
    native = NativeDfa(tables.dfa)

    if bool(summ[0]):
        last_fire = int(summ[8])
        if last_fire < 0:
            return frpm(int(summ[6])), -1
        lo = last_fire * K
        r, _ = native.scan_last(raw[lo:lo + K].tobytes(),
                                frpm(int(summ[9])))
        return frpm(int(summ[6])), lo + r

    # repair path: walk from the first discrepancy, tracking the last
    # fire exactly; the device summary covers the validated prefix
    fb = int(summ[1])
    best = -1
    if int(summ[8]) >= 0:
        lo = int(summ[8]) * K
        r, _ = native.scan_last(raw[lo:lo + K].tobytes(),
                                frpm(int(summ[9])))
        best = lo + r
    phi, cnt, swarm = _unpack(packed, C)
    e = int(summ[2])
    c = fb
    while c < C:
        lo = c * K
        hi = min(lo + K, n)
        if swarm[c] == e and hi - lo == K:
            if cnt[c]:
                r, _ = native.scan_last(raw[lo:hi].tobytes(), frpm(e))
                best = lo + r
            e = int(phi[c])
        else:
            r, st = native.scan_last(raw[lo:hi].tobytes(), frpm(e))
            if r >= 0:
                best = lo + r
            e = topm(st)
        c += 1
    return frpm(e), best
