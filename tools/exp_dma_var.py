#!/usr/bin/env python3
"""DMA variant matrix: which local-copy forms work on this TPU?
VAR=hbm_smem_slice | hbm_vmem_slice | hbm_smem_full | hbm_vmem_full |
    vmem_smem | smem_1d
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

VAR = os.environ.get("VAR", "hbm_vmem_slice")
K, R = 8, 16


def main():
    print("backend:", jax.default_backend(), "var:", VAR, flush=True)
    pages = jnp.asarray(
        np.arange(K * R * 128, dtype=np.float32).reshape(K, R, 128))
    x = jnp.zeros((8, 128), jnp.float32)

    if VAR == "hbm_smem_slice":
        scratch = [pltpu.SMEM((R, 128), jnp.float32)]
        def kern(pages_hbm, x_ref, o_ref, scr, sem):
            cp = pltpu.make_async_copy(pages_hbm.at[2], scr, sem)
            cp.start(); cp.wait()
            o_ref[...] = x_ref[...] + scr[0, 0]
    elif VAR == "hbm_vmem_slice":
        scratch = [pltpu.VMEM((R, 128), jnp.float32)]
        def kern(pages_hbm, x_ref, o_ref, scr, sem):
            cp = pltpu.make_async_copy(pages_hbm.at[2], scr, sem)
            cp.start(); cp.wait()
            o_ref[...] = x_ref[...] + scr[0, 0]
    elif VAR == "hbm_smem_full":
        scratch = [pltpu.SMEM((K, R, 128), jnp.float32)]
        def kern(pages_hbm, x_ref, o_ref, scr, sem):
            cp = pltpu.make_async_copy(pages_hbm, scr, sem)
            cp.start(); cp.wait()
            o_ref[...] = x_ref[...] + scr[2, 0, 0]
    elif VAR == "hbm_vmem_full":
        scratch = [pltpu.VMEM((K, R, 128), jnp.float32)]
        def kern(pages_hbm, x_ref, o_ref, scr, sem):
            cp = pltpu.make_async_copy(pages_hbm, scr, sem)
            cp.start(); cp.wait()
            o_ref[...] = x_ref[...] + scr[2, 0, 0]
    elif VAR == "vmem_smem":
        scratch = [pltpu.VMEM((R, 128), jnp.float32),
                   pltpu.SMEM((R, 128), jnp.float32),
                   pltpu.SemaphoreType.DMA(())]
        def kern(pages_hbm, x_ref, o_ref, v, s, sem2, sem):
            cp = pltpu.make_async_copy(pages_hbm.at[2], v, sem)
            cp.start(); cp.wait()
            cp2 = pltpu.make_async_copy(v, s, sem2)
            cp2.start(); cp2.wait()
            o_ref[...] = x_ref[...] + s[0, 0]
    elif VAR == "smem_1d":
        scratch = [pltpu.SMEM((R * 128,), jnp.float32)]
        pages2 = pages.reshape(K, R * 128)
        def kern(pages_hbm, x_ref, o_ref, scr, sem):
            cp = pltpu.make_async_copy(pages_hbm.at[2], scr, sem)
            cp.start(); cp.wait()
            o_ref[...] = x_ref[...] + scr[0]
        pages = pages2

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((8, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
        scratch_shapes=scratch + [pltpu.SemaphoreType.DMA(())])
    out = pl.pallas_call(
        kern, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(pages, x)
    v = float(np.asarray(out)[0, 0])
    exp = float(pages.reshape(K, -1)[2, 0])
    print("value:", v, "expected:", exp, "OK" if abs(v - exp) < 1e-6
          else "WRONG", flush=True)


if __name__ == "__main__":
    main()
