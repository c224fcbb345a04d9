#!/usr/bin/env python3
"""Targeted TPU microbenchmarks for the wave's structural costs.

One process, every measurement batched (remote compiles through the axon
tunnel cost minutes per program and the compilation cache does not apply
across processes — ROUND4.md). Covers:

  gather        row gather (N,) from a (20482, 27) pool (the meshfield
                closest-hit payload fetch, ops/gather.py pool_lookup)
  gather_t      same data transposed (27, T), take along axis 1
  argsort       the compaction driver's per-depth u32 key sort +
                a representative 30-array state permutation
  bvh8          standalone quantized BVH8 kernel, 262k random rays
                (ROUND3/4 tracked number; measures the tri-loop unroll)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")


def timed(fn, *args, reps=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="gather,gather_t,argsort,bvh8")
    ap.add_argument("--n", type=int, default=163840)
    args = ap.parse_args()
    which = set(args.which.split(","))

    import jax
    import jax.numpy as jnp
    import numpy as np
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    N = args.n

    if "gather" in which or "gather_t" in which:
        T = 20482
        table = jnp.asarray(rng.normal(size=(T, 27)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, T, N).astype(np.int32))
        idx_sorted = jnp.sort(idx)
        if "gather" in which:
            f = jax.jit(lambda t, i: t[i])
            ms = timed(f, table, idx)
            print(f"gather (N={N}) from (20482,27): {ms:.3f} ms", flush=True)
            ms = timed(f, table, idx_sorted)
            print(f"gather sorted idx:              {ms:.3f} ms", flush=True)
        if "gather_t" in which:
            table_t = table.T
            ft = jax.jit(lambda t, i: jnp.take(t, i, axis=1).T)
            ms = timed(ft, table_t, idx)
            print(f"gather_t (27,20482) axis1:      {ms:.3f} ms", flush=True)

    if "argsort" in which:
        keys = jnp.asarray(rng.integers(0, 2**31, N).astype(np.uint32))
        f = jax.jit(jnp.argsort)
        ms = timed(f, keys)
        print(f"argsort u32 (N={N}):            {ms:.3f} ms", flush=True)
        # state permutation: ~30 per-lane arrays re-gathered by the order
        state = [jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
                 for _ in range(24)] + \
                [jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
                 for _ in range(4)] + \
                [jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
                 for _ in range(2)]

        def perm(order, *arrs):
            return [a[order] for a in arrs]
        fp = jax.jit(perm)
        order = jnp.argsort(keys)
        ms = timed(fp, order, *state)
        print(f"state permutation (30 arrays):  {ms:.3f} ms", flush=True)

    if "bvh8" in which:
        from pbrt_tpu.ops import pallas_bvh8 as b8
        Tt = 20482
        # synthetic field of triangles on a grid (same scale class as
        # scenes/meshfield.pbrt)
        g = int(np.sqrt(Tt / 2)) + 1
        y = rng.normal(size=(g, g)).astype(np.float32)
        tris = []
        for i in range(g - 1):
            for j in range(g - 1):
                p = lambda ii, jj: [ii, y[ii, jj], jj]
                tris.append(p(i, j) + p(i + 1, j) + p(i, j + 1) + [0])
                tris.append(p(i + 1, j) + p(i + 1, j + 1) + p(i, j + 1) + [0])
                if len(tris) >= Tt:
                    break
            if len(tris) >= Tt:
                break
        tri_geo = np.asarray(tris[:Tt], np.float32)
        lo = np.minimum(np.minimum(tri_geo[:, 0:3], tri_geo[:, 3:6]),
                        tri_geo[:, 6:9])
        hi = np.maximum(np.maximum(tri_geo[:, 0:3], tri_geo[:, 3:6]),
                        tri_geo[:, 6:9])
        bvh8 = b8.build_bvh8(lo, hi, tri_geo)
        print(f"bvh8 built: {bvh8.n_tris} tris, {bvh8.n_nodes} nodes, "
              f"smem {b8.smem_bytes(bvh8.n_tris, bvh8.n_nodes)//1024} KB",
              flush=True)
        M = 262144
        o = rng.uniform([0, -3, 0], [g, 3, g], (M, 3)).astype(np.float32)
        d = rng.normal(size=(M, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o_j, d_j = jnp.asarray(o), jnp.asarray(d)
        tm = jnp.full((M,), 1e30, jnp.float32)
        f = jax.jit(lambda o, d, t: b8.bvh8_intersect(bvh8, o, d, t)["t"])
        ms = timed(f, o_j, d_j, tm)
        print(f"bvh8 closest 262k random rays:  {ms:.3f} ms "
              f"({M/ms/1e3:.1f} Mray/s)", flush=True)
        fa = jax.jit(lambda o, d, t: b8.bvh8_intersect(
            bvh8, o, d, t, any_hit=True)["hit"])
        ms = timed(fa, o_j, d_j, jnp.full((M,), 30.0, jnp.float32))
        print(f"bvh8 any-hit 262k random rays:  {ms:.3f} ms "
              f"({M/ms/1e3:.1f} Mray/s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
