#!/usr/bin/env python
"""Quantify the row-DMA gather attack on the fused-SA one-hot floor.

The r2/r3 verdicts proposed replacing the one-hot gather matmul with
per-row indexed DMA copies of `pre`.  The gather is R = S*K random rows
of C1*dsz bytes per batch element (SA1: 16,384 rows x 128 B x B=64 =
1M descriptors per step) — viability is purely a question of DMA
descriptor throughput.  This script measures it directly: a Pallas
kernel issuing `rows` single-row HBM->VMEM copies (a) serialized and
(b) 8-deep pipelined, against the bulk-copy bound.  The fused SA1
kernel spends ~2.9 ms total; the row budget is ~2.8 ns/row — if the
measured per-descriptor cost is >> that (expected: ~100-1000 ns), this
closes the lever as a quantified negative result.

Run on chip:  python scripts/proto_dma_gather.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mm3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mm3d_tpu.utils.profiling import chain_time

N, C1 = 1024, 128          # pre rows x lanes (SA1-ish, f32 = 512 B/row)
ROWS = 4096                # gathered rows per kernel call
DEPTH = 8                  # pipelined in-flight DMAs


def _rowdma_kernel(depth, idx_ref, pre_ref, out_ref):
    """Gather ROWS rows of pre (HBM) into out (VMEM) by row-DMA."""
    def body(scratch, sems):
        def get(j, slot):
            return pltpu.make_async_copy(
                pre_ref.at[pl.ds(idx_ref[j], 1), :],
                scratch.at[pl.ds(slot, 1), :],
                sems.at[slot])

        if depth == 1:
            def step(j, _):
                dma = get(j, 0)
                dma.start()
                dma.wait()
                out_ref[pl.ds(j, 1), :] = scratch[0:1, :]
                return 0
            jax.lax.fori_loop(0, ROWS, step, 0)
        else:
            for j in range(depth):
                get(j, j).start()

            def step(j, _):
                slot = jax.lax.rem(j, depth)
                get(j, slot).wait()
                out_ref[pl.ds(j, 1), :] = scratch[pl.ds(slot, 1), :]

                @pl.when(j + depth < ROWS)
                def _():
                    get(j + depth, slot).start()
                return 0
            jax.lax.fori_loop(0, ROWS, step, 0)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((depth, C1), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((depth,)),
    )


def rowdma(pre, idx, depth):
    return pl.pallas_call(
        functools.partial(_rowdma_kernel, depth),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, C1), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, pre)


def _bulk_kernel(pre_ref, out_ref, sem):
    dma = pltpu.make_async_copy(pre_ref.at[0:ROWS, :], out_ref, sem)
    dma.start()
    dma.wait()


def bulk(pre):
    return pl.pallas_call(
        _bulk_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, C1), jnp.float32),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(pre)


def main():
    r = np.random.RandomState(0)
    # ROWS*2 source rows so idx is genuinely random-access
    pre = jnp.asarray(r.randn(max(N, ROWS * 2), C1).astype(np.float32))
    idx = jnp.asarray(r.randint(0, pre.shape[0], ROWS).astype(np.int32))

    want = np.asarray(pre)[np.asarray(idx)]
    for depth, label in ((1, "serialized"), (DEPTH, f"{DEPTH}-deep")):
        f = jax.jit(functools.partial(rowdma, depth=depth))
        got = np.asarray(f(pre, idx))
        ok = np.array_equal(got, want)

        def chained(p, f=f):
            o = f(p, idx)
            return p + 1e-6 * o.mean()

        t = chain_time(chained, pre, k1=3, k2=13, reps=3)
        per_row = t / ROWS * 1e9
        print(f"row-DMA {label}: {t * 1e3:.3f} ms for {ROWS} rows "
              f"= {per_row:.0f} ns/row, exact={ok}", flush=True)

    def chained_bulk(p):
        o = bulk(p)
        return p + 1e-6 * o.mean()

    tb = chain_time(chained_bulk, pre, k1=3, k2=13, reps=3)
    print(f"bulk copy bound: {tb * 1e3:.3f} ms for {ROWS} rows "
          f"= {tb / ROWS * 1e9:.0f} ns/row", flush=True)
    print("SA1 budget: 2.8 ns/row (16384 rows x B=64 inside ~2.9 ms)",
          flush=True)


if __name__ == "__main__":
    main()
