"""Large-automaton speculative Pallas scan (the third kernel tier).

The narrow kernel (ops/pallas_scan.py) needs S*ncls <= 128 (one
lane-gather per byte) and the wide kernel <= 1024 (8 gathers +
selects).  The reference JIT has no such limit — it compiles EVERY
program (sre_vm_thompson_jit.c:39) — so this tier closes the gap for
automata up to S*ncls <= 2**17 (covers every pattern in the reference
conformance corpus; the largest is 57,816 = 4,818 states x 12
classes).

TPU constraint driving the design: Mosaic's only vector gathers are
int32 within ONE vreg — 128 lanes (take_along_axis axis=1) or 8
sublanes (axis=0).  Probed on v5e: [R,128] sublane gathers with R > 8
fail ("Multiple source vregs along gather dimension") and int16/int8
tables lower to byte gathers ("not supported by this TPU
generation").  An arbitrary-size table lookup therefore NEEDS a
select chain over 128-entry rows — cost linear in rows touched.

The trick that makes it fast: per input byte the kernel computes the
MIN and MAX live table row across all stream tiles (two vector
reduces) and runs the row loop with those dynamic bounds.  DFA states
of real scans cluster heavily — counted-repetition automata
(`a{400,499}`-style, the reason big tables exist) move through their
chain one step per byte, so the live-row spread stays tiny even
though the table has hundreds of rows.  Cost per byte is
O(spread + 2 reduces), not O(table rows).

Encoding matches the other tiers: fused[idx] = next*ncls | match<<20
with idx = state*ncls + class premultiplied (regex ids never ride the
device hot loop — the host resolves them at the boundary state, see
dfa.Dfa.id_at).  Automata with ncls > 16 (impossible for the 4-bit
class packing) use 8-bit class packing, 4 classes per int32 word.

Speculation, validation (swarm == entries chain), and the repair path
are shared with the narrow/wide tiers via _summarize; `_scan` has the
same contract, so spec_scan_bytes / spec_count_bytes /
spec_scan_last_bytes drive this tier unchanged.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_scan import (_MATCH_SHIFT, _STATE_MASK, GROUPS,
                          _spec_scan_big_call)

MAX_ENTRIES = 1 << 17      # S*ncls cap: 4 MiB pre-broadcast in VMEM


class SpecTablesBig:
    """Host-side preprocessing of a Dfa for the big-table kernel.

    fused_rows: int32 [R, 8, 128] — row r holds entries
    fused[r*128 : (r+1)*128] replicated across the 8 sublanes, so the
    kernel's per-row work is one VMEM tile load + one lane gather +
    one select.
    """

    last_repair = None   # see pallas_scan.SpecTables.last_repair

    def __init__(self, dfa, fast=None):
        import os
        if fast is None:
            fast = os.environ.get("SREGEX_BIG_FAST", "0") == "1"
        self.fast = bool(fast)
        S, ncls = dfa.nstates, dfa.nclasses
        if S * ncls > MAX_ENTRIES:
            raise ValueError("automaton too large for the big fused "
                             "table (S*ncls = %d)" % (S * ncls))
        if ncls > 256:
            raise ValueError("more than 256 byte classes (%d)" % ncls)
        self.dfa = dfa
        self.nstates = S
        self.ncls = ncls
        # 4-bit class packing when classes fit a nibble, else 8-bit
        self.bits = 4 if ncls <= 16 else 8
        self.cpw = 8 if self.bits == 4 else 4
        # warmup: 32 bytes regardless of packing (big automata do not
        # converge faster than small ones)
        self.warmup = 32
        self.rows = -(-(S * ncls) // 128)
        # shape-derived VMEM clamp (the table alone can reach 4 MiB)
        from .pallas_scan import max_chunk_bytes
        self.max_chunk = max_chunk_bytes(self.rows, self.cpw,
                                         self.warmup)
        fused = np.zeros(self.rows * 128, dtype=np.int32)
        trans = dfa.trans.astype(np.int64)
        match = dfa.match.astype(np.int64)
        fused[:S * ncls] = (
            (trans.reshape(-1) * ncls)
            | (match.reshape(-1) << _MATCH_SHIFT)).astype(np.int32)
        rows = fused.reshape(self.rows, 128)
        self.fused_rows = jnp.asarray(np.ascontiguousarray(
            np.broadcast_to(rows[:, None, :],
                            (self.rows, 8, 128)).copy()))
        self.class_map = dfa.class_map.astype(np.uint8)
        self.match_eof = dfa.match_eof

    def _scan(self, data, state0, j0, C, bad_tail, J, W, COUNT=False,
              mesh=None, axis=None, esc=None):
        return _spec_scan_big_call(
            data, state0, j0, self.fused_rows, C, bad_tail, J=J, W=W,
            CPW=self.cpw, BITS=self.bits, COUNT=COUNT, R=self.rows,
            kernel_fn=functools.partial(_kernel_big, FAST=self.fast),
            mesh=mesh, axis=axis, ESC=esc)


def _lookup_rows(fused_ref, idx, R, fast=True):
    """Arbitrary-size table lookup: min/max-bounded row select chain.
    idx: list of G [8,128] premultiplied indices.  Returns list of G
    [8,128] fused entries.

    fast=True swaps in a straight-line two-row path when the live
    rows span at most 2 table rows (rhi - rlo <= 1), with a cond
    fallback to the loop.  MEASURED NEGATIVE on the v5e relay
    (bench/ab_big.py, 512 MB interleaved A/B on the S*ncls=21,276
    monster: 0.44 GB/s fast vs 0.50 loop): Mosaic's scf.if costs as
    much as a single-iteration dynamic loop, so the per-byte floor is
    the dependent gather chain + the min/max reduces, not loop
    overhead.  Default OFF; the knob (SREGEX_BIG_FAST=1) remains for
    bare-metal re-tuning."""
    G = len(idx)
    lanes = [ix & 127 for ix in idx]
    his = [ix >> 7 for ix in idx]
    lo = his[0]
    hi = his[0]
    for g in range(1, G):
        lo = jnp.minimum(lo, his[g])
        hi = jnp.maximum(hi, his[g])
    rlo = jnp.min(lo)
    rhi = jnp.max(hi)

    def row_step(r, es):
        tile = fused_ref[r]                       # [8, 128] dynamic
        out = []
        for g in range(G):
            v = jnp.take_along_axis(tile, lanes[g], axis=1)
            out.append(jnp.where(his[g] == r, v, es[g]))
        return tuple(out)

    z = jnp.zeros((8, 128), jnp.int32)

    def loop_path(_):
        es = tuple(z for _ in range(G))
        return lax.fori_loop(rlo, rhi + 1, row_step, es)

    if not fast:
        return loop_path(None)

    def fast_path(_):
        # every live row is rlo or rhi (spread <= 1)
        t0 = fused_ref[rlo]
        t1 = fused_ref[rhi]
        out = []
        for g in range(G):
            v0 = jnp.take_along_axis(t0, lanes[g], axis=1)
            v1 = jnp.take_along_axis(t1, lanes[g], axis=1)
            out.append(jnp.where(his[g] == rlo, v0, v1))
        return tuple(out)

    return lax.cond(rhi - rlo <= 1, fast_path, loop_path, 0)


def _kernel_big(data_ref, state0_ref, j0_ref, fused_ref,
                phi_ref, fm_ref, swarm_ref, *, J, W, CPW, BITS, R,
                COUNT=False, FAST=True):
    """Big-table variant: fused_ref [R, 8, 128] (row-broadcast); the
    row loop runs with dynamic bounds = the live rows' min/max."""
    G = GROUPS
    CMASK = (1 << BITS) - 1

    def warm_step(wi, states):
        words = [data_ref[0, wi, g] for g in range(G)]
        for b in range(CPW):
            j = wi * CPW + b
            rows = [(words[g] >> (BITS * b)) & CMASK
                    for g in range(G)]
            es = _lookup_rows(fused_ref,
                              [states[g] + rows[g] for g in range(G)],
                              R, fast=FAST)
            states = tuple(
                jnp.where(j >= j0_ref[0, g], es[g] & _STATE_MASK,
                          states[g])
                for g in range(G))
        return states

    states = tuple(state0_ref[0, g] for g in range(G))
    states = lax.fori_loop(0, W // CPW, warm_step, states)
    for g in range(G):
        swarm_ref[0, g] = states[g]

    def step(it, carry):
        states, maccs = carry
        words = [data_ref[0, W // CPW + it, g] for g in range(G)]
        for b in range(CPW):
            rows = [(words[g] >> (BITS * b)) & CMASK
                    for g in range(G)]
            es = _lookup_rows(fused_ref,
                              [states[g] + rows[g] for g in range(G)],
                              R, fast=FAST)
            if COUNT:
                maccs = tuple(maccs[g] + (es[g] >> _MATCH_SHIFT)
                              for g in range(G))
            else:
                maccs = tuple(maccs[g] | es[g] for g in range(G))
            states = tuple(es[g] & _STATE_MASK for g in range(G))
        return states, maccs

    z = jnp.zeros((8, 128), jnp.int32)
    maccs = tuple(z for _ in range(G))
    n_iter = (J - W) // CPW
    states, maccs = lax.fori_loop(0, n_iter, step, (states, maccs))
    for g in range(G):
        phi_ref[0, g] = states[g]
        if COUNT:
            fm_ref[0, g] = maccs[g]
        else:
            fm_ref[0, g] = maccs[g] >> _MATCH_SHIFT
