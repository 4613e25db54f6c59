"""Pair-step speculative scan: two input bytes per gather.

The narrow kernel's floor is the LATENCY of the dependent gather chain
(~15-21 ns per byte-step with G=4 interleaved chains,
docs/PERFORMANCE.md).  Composing the transition function over byte
PAIRS halves the chain length: the table becomes

    fused2[s*npair + (c1*ncls + c2)] =
        (trans[trans[s,c1],c2] * npair) | (cnt << 20)
    cnt = match[s,c1] + match[trans[s,c1],c2]    (0..2)

and one lookup advances a stream by TWO bytes.  The 2-bit count field
makes COUNT mode exact (the accumulator adds both boundaries) and
keeps the OR-firing flag for scan mode; everything else — chunk
speculation, swarm validation, native repair, the sharded stitch —
is unit-agnostic and reused unchanged (J, W, j0 are simply halved
into pair units before the kernel call).

Pair ids are raw c1*ncls+c2 (no alphabet minimization — a remap
would need a second table pass in prep; minimization is a follow-up
if row count matters).  Budgets: S*ncls^2 <= 128 rides the narrow
1-gather kernel; <= 1024 the wide row-select kernel.  Packing: 4-bit
when ncls^2 <= 16 (2 bits of HBM per input byte), else 8-bit (4
bits/byte — the same traffic as the byte kernels).

Measured on the v5e relay (bench/ab_pair.py, 512 MB interleaved
A/Bs, value readback in the timed region):

  - NARROW pair (S*ncls^2 <= 128, e.g. literal 'abc'): 15.7 GB/s vs
    13.7 byte-narrow — the production default for eligible automata
    (Scanner tries it first);
  - WIDE pair (row-select chain): 4.1-4.2 vs 4.6-5.1 byte —
    NEGATIVE; the extra selects cost more than the halved chain
    saves, so wide automata stay on the byte kernels
    (narrow_only=True gates the production path).
"""

import numpy as np
import jax.numpy as jnp

from .pallas_scan import (_MATCH_SHIFT, _spec_scan, _spec_scan_wide,
                          max_chunk_bytes)


class SpecTablesPair:
    """Pair-composed tables; drop-in for SpecTables in every spec_*
    driver (ncls is the PAIR alphabet size — premultiplied states and
    repair-path conversions stay consistent)."""

    MAX_ENTRIES = 1024

    last_repair = None   # see SpecTables.last_repair

    def __init__(self, dfa, narrow_only=False):
        S, cb = dfa.nstates, dfa.nclasses
        npair = cb * cb
        limit = 128 if narrow_only else self.MAX_ENTRIES
        if S * npair > limit:
            raise ValueError("automaton too large for the pair table "
                             "(S*ncls^2 = %d > %d)" % (S * npair,
                                                       limit))
        if npair > 256:
            raise ValueError("pair alphabet exceeds uint8 (%d)"
                             % npair)
        self.dfa = dfa
        self.nstates = S
        self.byte_ncls = cb
        self.ncls = npair            # pair alphabet (premultiplier)
        self.bpu = 2                 # bytes per kernel unit
        self.bits = 4 if npair <= 16 else 8
        self.cpw = 8 if self.bits == 4 else 4    # pairs per word
        # warmup in BYTES; must be a multiple of bpu*cpw
        self.warmup = 4 * self.cpw * 2
        trans = np.asarray(dfa.trans, dtype=np.int64)    # [S, cb]
        match = np.asarray(dfa.match, dtype=np.int64)
        next2 = trans[trans]                  # [S, cb, cb]
        cnt2 = match[:, :, None] + match[trans]
        fused = ((next2 * npair) | (cnt2 << _MATCH_SHIFT)) \
            .astype(np.int32).reshape(S, npair)
        total = S * npair
        self.rows = -(-total // 128)
        flat = np.zeros(self.rows * 128, dtype=np.int32)
        flat[:total] = fused.reshape(-1)
        if total <= 128:
            self.fused_vec = jnp.asarray(
                np.broadcast_to(flat[:128], (8, 128)).copy())
            self.fused_rows = None
        else:
            rows = flat.reshape(self.rows, 128)
            self.fused_vec = None
            self.fused_rows = jnp.asarray(np.ascontiguousarray(
                np.broadcast_to(rows[:, None, :],
                                (self.rows, 8, 128)).copy()))
        self.class_map = dfa.class_map.astype(np.uint8)
        self.match_eof = dfa.match_eof
        # shape-derived VMEM clamp (pair units halve words per byte,
        # so this only binds for 8-bit pair alphabets)
        self.max_chunk = max_chunk_bytes(self.rows, self.cpw,
                                         self.warmup, bpu=2)

    def _scan(self, data, state0, j0, C, bad_tail, J, W, COUNT=False,
              mesh=None, axis=None, esc=None):
        # J, W, j0 arrive in bytes; the kernel steps in pairs
        J2, W2 = J // 2, W // 2
        j02 = j0 // 2
        if self.fused_vec is not None:
            return _spec_scan(data, state0, j02, self.fused_vec, C,
                              bad_tail, J=J2, W=W2, CPW=self.cpw,
                              BITS=self.bits, COUNT=COUNT, mesh=mesh,
                              axis=axis, ESC=esc)
        return _spec_scan_wide(data, state0, j02, self.fused_rows, C,
                               bad_tail, J=J2, W=W2, CPW=self.cpw,
                               BITS=self.bits, COUNT=COUNT,
                               R=self.rows, mesh=mesh, axis=axis,
                               ESC=esc)
