#!/usr/bin/env python3
"""Minimal repro ladder for the binned-kernel TPU fault: each stage adds
one ingredient. Run with STAGE=1..4.

1: grid (B,P) + scalar-prefetch schedule + HBM->SMEM DMA + scalar read
2: + conditional DMA (pl.when on prefetched scalar)
3: + output revisit accumulation across p steps
4: + SMEM->vector broadcast compute in a while_loop
"""
import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STAGE = int(os.environ.get("STAGE", "1"))
B, P, K, R = 4, 2, 8, 16


def kernel(sched_ref, pages_hbm, x_ref, o_ref, scr, sem, acc):
    b = pl.program_id(0)
    p = pl.program_id(1)
    k = sched_ref[b * P + p]
    valid = k >= 0
    kc = jnp.where(valid, k, 0)

    @pl.when(p == 0)
    def _():
        o_ref[...] = x_ref[...]

    def dma():
        cp = pltpu.make_async_copy(pages_hbm.at[kc], scr, sem)
        cp.start()
        cp.wait()

    if STAGE >= 2:
        pl.when(valid)(dma)
    else:
        dma()

    if STAGE >= 3:
        @pl.when(valid)
        def _():
            o_ref[...] = o_ref[...] + scr[0, 0]
    else:
        @pl.when(valid & (p == 0))
        def _():
            o_ref[...] = o_ref[...] + scr[0, 0]

    if STAGE >= 4:
        @pl.when(valid)
        def _():
            def body(i):
                o_ref[...] = o_ref[...] + scr[i, 1] * 0.0
                return i + 1
            jax.lax.while_loop(lambda i: i < 3, body, jnp.int32(0))


def main():
    print("backend:", jax.default_backend(), "stage:", STAGE, flush=True)
    pages = jnp.asarray(
        np.arange(K * R * 128, dtype=np.float32).reshape(K, R, 128))
    x = jnp.zeros((B * 8, 128), jnp.float32)
    sched = jnp.asarray(
        np.array([[i % K, -1 if i % 2 else (i + 1) % K]
                  for i in range(B)], np.int32).reshape(-1))
    spec = pl.BlockSpec((8, 128), lambda b, p, s: (b, 0))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, P),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), spec],
        out_specs=spec,
        scratch_shapes=[pltpu.SMEM((R, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SMEM((4,), jnp.int32)])
    out = pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((B * 8, 128), jnp.float32))(
        sched, pages, x)
    print("result row means:", np.asarray(out).reshape(B, -1).mean(1),
          flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
