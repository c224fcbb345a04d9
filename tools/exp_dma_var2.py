#!/usr/bin/env python3
"""Round 2 of the DMA matrix.
VAR=blockspec_vmem | blockspec_smem | ds_smem | ds_vmem
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VAR = os.environ.get("VAR", "blockspec_vmem")
K, R, B, P = 8, 16, 4, 2


def main():
    print("backend:", jax.default_backend(), "var:", VAR, flush=True)
    pages = jnp.asarray(
        np.arange(K * R * 128, dtype=np.float32).reshape(K, R, 128))
    x = jnp.zeros((B * 8, 128), jnp.float32)
    sched = jnp.asarray(
        np.array([[(b + 1) % K, (b + 3) % K] for b in range(B)],
                 np.int32).reshape(-1))
    ray_spec = pl.BlockSpec((8, 128), lambda b, p, s: (b, 0))

    if VAR.startswith("blockspec"):
        ms = pltpu.SMEM if VAR.endswith("smem") else pltpu.VMEM
        page_spec = pl.BlockSpec(
            (1, R, 128), lambda b, p, s: (s[b * P + p], 0, 0),
            memory_space=ms)

        def kern(s_ref, page_ref, x_ref, o_ref):
            p = pl.program_id(1)

            @pl.when(p == 0)
            def _():
                o_ref[...] = x_ref[...]
            o_ref[...] = o_ref[...] + page_ref[0, 0, 0]

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, P),
            in_specs=[page_spec, ray_spec], out_specs=ray_spec,
            scratch_shapes=[])
        out = pl.pallas_call(
            kern, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((B * 8, 128), jnp.float32))(
            sched, pages, x)
    else:
        ms = pltpu.SMEM if VAR.endswith("smem") else pltpu.VMEM
        pages2 = pages.reshape(K * R, 128)

        def kern(s_ref, pages_hbm, x_ref, o_ref, scr, sem):
            b = pl.program_id(0)
            p = pl.program_id(1)
            k = s_ref[b * P + p]

            @pl.when(p == 0)
            def _():
                o_ref[...] = x_ref[...]
            cp = pltpu.make_async_copy(
                pages_hbm.at[pl.ds(k * R, R)], scr, sem)
            cp.start()
            cp.wait()
            o_ref[...] = o_ref[...] + scr[0, 0]

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, P),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), ray_spec],
            out_specs=ray_spec,
            scratch_shapes=[ms((R, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())])
        out = pl.pallas_call(
            kern, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((B * 8, 128), jnp.float32))(
            sched, pages2, x)

    got = np.asarray(out).reshape(B, 8, 128)[:, 0, 0]
    exp = np.array([pages.reshape(K, -1)[(b + 1) % K, 0] +
                    pages.reshape(K, -1)[(b + 3) % K, 0]
                    for b in range(B)])
    print("got:", got, "exp:", exp,
          "OK" if np.allclose(got, exp) else "WRONG", flush=True)


if __name__ == "__main__":
    main()
