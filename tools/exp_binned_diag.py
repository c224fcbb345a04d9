#!/usr/bin/env python3
"""Binned-path diagnostics on the 1M terrain: unrolled rounds with
per-round valid-pair counts, prepass timing, kernel timing."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.ops import pallas_bvh8 as b8
from pbrt_tpu import scene_core as sc
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from exp_1m import make_terrain, gen_rays

LANES = b8.LANES
BIG = b8.BIG


def main():
    print("backend:", jax.default_backend(), flush=True)
    V, F = make_terrain(708)
    p0, p1, p2 = V[F[:, 0]], V[F[:, 1]], V[F[:, 2]]
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    tri = np.concatenate(
        [p0, p1, p2, np.arange(len(F), dtype=np.float32)[:, None]], 1)
    budget = int(os.environ.get("BUDGET", 409600))
    ppr = int(os.environ.get("PPR", 4))
    rows = int(os.environ.get("ROWS", b8.BLOCK_ROWS))
    kc = b8.build_bvh8_chunked(lo, hi, tri, budget=budget)
    K = kc.n_chunks
    print(f"K={K} ppr={ppr} rows={rows}", flush=True)

    kind = os.environ.get("KIND", "camera")
    N = 1 << 20
    o, d = gen_rays(V, kind, N)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    wl = jnp.asarray(lo.min(axis=0))
    wh = jnp.asarray(hi.max(axis=0))

    class _S:
        world_lo, world_hi = wl, wh
    order = jnp.argsort(sc._ray_sort_keys(_S, oj, dj))
    oj, dj = oj[order], dj[order]

    blk = rows * LANES
    n_pad = -(-N // blk) * blk
    B = n_pad // blk
    P = min(ppr, K)

    def prep(v, fill):
        return v.reshape(n_pad // LANES, LANES)

    ox, oy, oz = (prep(oj[:, i], 1e9) for i in range(3))
    dx, dy, dz = (prep(dj[:, i], 1.0) for i in range(3))
    tm = prep(jnp.full((N,), 1e30, jnp.float32), -1.0)
    o3 = oj
    d3 = dj
    nf3 = kc.nodes_f.reshape(K, -1, LANES)
    nq3 = kc.nodes_q.reshape(K, -1, LANES)
    tr3 = kc.tris.reshape(K, -1, LANES)
    rowsB = jnp.arange(B)[:, None]

    @jax.jit
    def prepass(t, kf, served):
        ent = b8._page_entries(kc, o3, d3, t.reshape(-1), B, blk)
        return jnp.where(served, BIG, ent)

    @jax.jit
    def schedule(ent):
        idx = jnp.argsort(ent, axis=1)[:, :P]
        entp = jnp.take_along_axis(ent, idx, 1)
        valid = entp < BIG
        cnt = jnp.sum(valid.astype(jnp.int32), axis=1)
        last = jnp.take_along_axis(idx, jnp.maximum(cnt - 1, 0)[:, None], 1)
        sched = jnp.where(valid, idx, last).astype(jnp.int32).reshape(-1)
        return sched, valid.astype(jnp.int32).reshape(-1), idx, valid

    t, kf = tm, jnp.full_like(tm, -1.0)
    b1 = jnp.zeros_like(tm)
    b2 = jnp.zeros_like(tm)
    served = jnp.zeros((B, K), jnp.bool_)

    # warm up compiles
    ent = prepass(t, kf, served)
    jax.block_until_ready(ent)
    t0 = time.perf_counter()
    for _ in range(3):
        ent = prepass(t, kf, served)
    jax.block_until_ready(ent)
    print(f"prepass: {(time.perf_counter()-t0)/3*1e3:.2f} ms", flush=True)

    total_pairs = 0
    r = 0
    while True:
        sched, vmask, idx, valid = schedule(ent)
        nvalid = int(jnp.sum(vmask))
        if nvalid == 0 or r > 80:
            break
        served = served.at[rowsB, idx].set(valid | served[rowsB, idx])
        tks = time.perf_counter()
        t, kf, b1, b2 = b8._run_binned(
            sched, vmask, kc.page_start, nf3, nq3, tr3, ox, oy, oz,
            dx, dy, dz, t, kf, b1, b2, P, False, rows=rows)
        jax.block_until_ready(t)
        tke = time.perf_counter()
        ent = prepass(t, kf, served)
        jax.block_until_ready(ent)
        tpe = time.perf_counter()
        total_pairs += nvalid
        print(f"round {r}: valid={nvalid:7d} kernel={1e3*(tke-tks):7.2f}ms"
              f" prepass={1e3*(tpe-tke):7.2f}ms", flush=True)
        r += 1
    hitfrac = float(jnp.mean(kf.reshape(-1)[:N] >= 0))
    print(f"rounds={r} total_pairs={total_pairs} hit={hitfrac:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
