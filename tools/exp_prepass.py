#!/usr/bin/env python3
"""Prepass (page-entry table) variant timings on the 1M terrain."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.ops import pallas_bvh8 as b8
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from exp_1m import make_terrain, gen_rays

BIG = b8.BIG


def variant_nomap(roots, o3, inv, tm, B, blk):
    lo = roots[:, 0:3]
    hi = roots[:, 3:6]
    tx0 = (lo[None, :, 0] - o3[:, None, 0]) * inv[:, None, 0]
    tx1 = (hi[None, :, 0] - o3[:, None, 0]) * inv[:, None, 0]
    ty0 = (lo[None, :, 1] - o3[:, None, 1]) * inv[:, None, 1]
    ty1 = (hi[None, :, 1] - o3[:, None, 1]) * inv[:, None, 1]
    tz0 = (lo[None, :, 2] - o3[:, None, 2]) * inv[:, None, 2]
    tz1 = (hi[None, :, 2] - o3[:, None, 2]) * inv[:, None, 2]
    tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                 jnp.minimum(ty0, ty1)),
                     jnp.maximum(jnp.minimum(tz0, tz1), 0.0))
    tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                 jnp.maximum(ty0, ty1)),
                     jnp.minimum(jnp.maximum(tz0, tz1), tm[:, None]))
    ent = jnp.where(tn <= tf * 1.0000004, tn, BIG)
    return ent.reshape(B, blk, -1).min(axis=1)


def main():
    print("backend:", jax.default_backend(), flush=True)
    V, F = make_terrain(708)
    p0, p1, p2 = V[F[:, 0]], V[F[:, 1]], V[F[:, 2]]
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    tri = np.concatenate(
        [p0, p1, p2, np.arange(len(F), dtype=np.float32)[:, None]], 1)
    kc = b8.build_bvh8_chunked(lo, hi, tri, budget=409600)
    K = kc.n_chunks
    print("K =", K, flush=True)
    N = 1 << 20
    o, d = gen_rays(V, "raster", N)
    o3, d3 = jnp.asarray(o), jnp.asarray(d)
    tm = jnp.full((N,), 1e30, jnp.float32)
    B, blk = N // 1024, 1024
    roots = kc.nodes_f[:, :6]
    inv = 1.0 / jnp.where(d3 == 0.0, 1e-20, d3)

    for name, G in [("map16", 16), ("map61", 61), ("map122", 122)]:
        fn = jax.jit(lambda t: b8._page_entries(kc, o3, d3, t, B, blk,
                                                group=G))
        e = fn(tm)
        jax.block_until_ready(e)
        t0 = time.perf_counter()
        for _ in range(5):
            e = fn(tm)
        jax.block_until_ready(e)
        print(f"{name}: {(time.perf_counter()-t0)/5*1e3:7.2f} ms "
              f"live={int(jnp.sum(e < BIG))}", flush=True)

    fn = jax.jit(lambda t: variant_nomap(roots, o3, inv, t, B, blk))
    e2 = fn(tm)
    jax.block_until_ready(e2)
    t0 = time.perf_counter()
    for _ in range(5):
        e2 = fn(tm)
    jax.block_until_ready(e2)
    print(f"nomap : {(time.perf_counter()-t0)/5*1e3:7.2f} ms "
          f"live={int(jnp.sum(e2 < BIG))}", flush=True)


if __name__ == "__main__":
    main()
