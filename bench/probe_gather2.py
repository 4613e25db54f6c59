"""Mosaic probe: two-level table lookup — one lane-gather (axis=1)
followed by one sublane-gather (axis=0) resolves a 1024-entry table
in TWO gathers, versus the wide tier's 8 x (gather + select) chain.

Layout: table8 [8,128] holds entries 0..1023 as rows r = idx >> 7
STACKED ON SUBLANES (not row-broadcast like the select chain needs):

    lane = idx & 127; row = (idx >> 7) & 7
    v = take_along_axis(table8, lane, axis=1)   # v[s,i] = t[s, lane[s,i]]
    e = take_along_axis(v, row, axis=0)         # e[s,i] = t[row[s,i], lane[s,i]]

pallas_big.py probed that sublane gathers with >8 SOURCE rows are
rejected; this needs only the single-vreg 8-sublane form, which the
probed facts say exists.  If Mosaic accepts it, every fused-table tier
with R <= 8 rows drops from R gather+selects to 2 gathers per byte,
and R > 8 tiers chain ceil(R/8) two-level blocks with selects —
~3-5x fewer vector ops on the bench-multi machine (rows=98).

Usage: python bench/probe_gather2.py [--cpu]   (correctness + timing)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import numpy as np
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERP = jax.default_backend() == "cpu"


def _kernel_2lvl(idx_ref, tab_ref, out_ref):
    idx = idx_ref[:]
    tab = tab_ref[:]
    lane = idx & 127
    row = (idx >> 7) & 7
    v = jnp.take_along_axis(tab, lane, axis=1)
    e = jnp.take_along_axis(v, row, axis=0)
    out_ref[:] = e


def probe_correctness():
    rng = np.random.default_rng(7)
    tab = rng.integers(0, 1 << 20, size=(8, 128), dtype=np.int32)
    idx = rng.integers(0, 1024, size=(8, 128), dtype=np.int32)
    out = pl.pallas_call(
        _kernel_2lvl,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        interpret=INTERP,
    )(jnp.asarray(idx), jnp.asarray(tab))
    out = np.asarray(out)
    exp = tab.reshape(-1)[idx]
    ok = np.array_equal(out, exp)
    print("two-level gather correctness:", "OK" if ok else "MISMATCH",
          flush=True)
    return ok


def _mk_chain_kernel(R, STEPS, two_level):
    """Scan-like dependent-lookup chain over a R*128-entry table:
    the state feeds the next index (the wide kernel's hot shape)."""

    def kernel(idx_ref, tab_ref, out_ref):
        state = idx_ref[:]
        if two_level:
            blocks = [tab_ref[b] for b in range(R // 8)]

            def step(_, st):
                lane = st & 127
                row = (st >> 7) & 7
                blk = st >> 10
                e = None
                for b, tb in enumerate(blocks):
                    v = jnp.take_along_axis(tb, lane, axis=1)
                    eb = jnp.take_along_axis(v, row, axis=0)
                    e = eb if e is None else jnp.where(blk == b, eb, e)
                return e % (R * 128)

        else:
            rows = [tab_ref[r] for r in range(R)]

            def step(_, st):
                lane = st & 127
                hi = st >> 7
                e = jnp.take_along_axis(rows[0], lane, axis=1)
                for r in range(1, R):
                    er = jnp.take_along_axis(rows[r], lane, axis=1)
                    e = jnp.where(hi == r, er, e)
                return e % (R * 128)

        out_ref[:] = lax.fori_loop(0, STEPS, step, state)

    return kernel


def probe_timing(R=96, STEPS=4096, reps=3):
    """Dependent chain: R-row select chain vs ceil(R/8) two-level
    blocks.  Table values are a permutation so the chain never
    collapses."""
    rng = np.random.default_rng(3)
    n = R * 128
    perm = rng.permutation(n).astype(np.int32)
    # select-chain layout: [R, 8, 128] row-broadcast
    rows = np.broadcast_to(
        perm.reshape(R, 1, 128), (R, 8, 128)).copy()
    # two-level layout: [R//8, 8, 128] rows stacked on sublanes
    stacked = perm.reshape(R // 8, 8, 128).copy()
    idx0 = rng.integers(0, n, size=(8, 128), dtype=np.int32)

    def run(two_level):
        tab = jnp.asarray(stacked if two_level else rows)
        shape = ((R // 8, 8, 128) if two_level else (R, 8, 128))
        f = pl.pallas_call(
            _mk_chain_kernel(R, STEPS, two_level),
            in_specs=[
                pl.BlockSpec((8, 128), lambda: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(shape, lambda: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            interpret=INTERP,
        )
        g = jax.jit(lambda i, t: f(i, t))
        r = g(jnp.asarray(idx0), tab)
        r.block_until_ready()            # compile + correctness ref
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = g(jnp.asarray(idx0), tab)
            out.block_until_ready()
            _ = int(np.asarray(out)[0, 0])   # value readback
            best = min(best, time.perf_counter() - t0)
        return np.asarray(r), best

    r_sel, t_sel = run(False)
    r_two, t_two = run(True)
    same = np.array_equal(r_sel, r_two)
    print("chain R=%d STEPS=%d: select %.4fs  two-level %.4fs "
          "(%.2fx)  agree=%s"
          % (R, STEPS, t_sel, t_two, t_sel / t_two, same), flush=True)


if __name__ == "__main__":
    okc = probe_correctness()
    if okc:
        probe_timing(R=96, STEPS=2048 if INTERP else 16384)
        if not INTERP:
            probe_timing(R=8, STEPS=16384)
            probe_timing(R=16, STEPS=16384)
