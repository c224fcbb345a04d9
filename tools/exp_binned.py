#!/usr/bin/env python3
"""Binned-page BVH8 equality + perf harness.

    python tools/exp_binned.py check      # small-scene equality vs chunked
    python tools/exp_binned.py perf       # 1M-tri terrain perf (TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")


def rand_scene(n_tri, seed=0):
    import numpy as np
    rng = np.random.default_rng(seed)
    ctr = rng.random((n_tri, 3)).astype(np.float32) * 10
    e = (rng.random((n_tri, 2, 3)).astype(np.float32) - 0.5) * 0.4
    p0 = ctr
    p1 = ctr + e[:, 0]
    p2 = ctr + e[:, 1]
    tri = np.concatenate(
        [p0, p1, p2, np.arange(n_tri, dtype=np.float32)[:, None]], 1)
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    return lo, hi, tri


def check(on_tpu):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pbrt_tpu.ops import pallas_bvh8 as b8
    interp = not on_tpu
    rng = np.random.default_rng(3)
    configs = [(3000, 4096, 40 * 1024, 4),
               (12000, 8192, 64 * 1024, 3),
               (2000, 2048, 24 * 1024, 2)] if on_tpu else \
              [(300, 1024, 8 * 1024, 2)]
    for n_tri, n_ray, budget, ppr in configs:
        lo, hi, tri = rand_scene(n_tri, seed=n_tri)
        kc = b8.build_bvh8_chunked(lo, hi, tri, budget=budget)
        o = rng.random((n_ray, 3)).astype(np.float32) * 12 - 1
        d = rng.random((n_ray, 3)).astype(np.float32) - 0.5
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        oj, dj = jnp.asarray(o), jnp.asarray(d)
        tmax = jnp.full((n_ray,), 1e30, jnp.float32)
        for any_hit in (False, True):
            ra = b8.chunked_intersect(kc, oj, dj, tmax, any_hit=any_hit,
                                      interpret=interp)
            rb = b8.binned_intersect(
                kc, oj, dj, tmax, any_hit=any_hit, interpret=interp,
                pages_per_round=ppr)
            hit_eq = bool(jnp.all(ra["hit"] == rb["hit"]))
            if any_hit:
                ok = hit_eq
                print(f"n={n_tri} K={kc.n_chunks} any_hit: hit_eq={hit_eq}"
                      f" frac={float(jnp.mean(ra['hit'])):.3f}")
            else:
                t_eq = bool(jnp.all(jnp.where(ra["hit"],
                                              jnp.abs(ra["t"] - rb["t"]),
                                              0.0) < 1e-6))
                pr_eq = float(jnp.mean((ra["prim"] == rb["prim"]) |
                                       ~ra["hit"]))
                ok = hit_eq and t_eq and pr_eq > 0.9999
                print(f"n={n_tri} K={kc.n_chunks} closest: hit_eq={hit_eq}"
                      f" t_eq={t_eq} prim_eq={pr_eq:.5f}"
                      f" frac={float(jnp.mean(ra['hit'])):.3f}")
            assert ok, "MISMATCH"
    print("CHECK OK")


def perf():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pbrt_tpu.ops import pallas_bvh8 as b8
    from pbrt_tpu import scene_core as sc
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from exp_1m import make_terrain, gen_rays
    import argparse
    V, F = make_terrain(708)
    p0, p1, p2 = V[F[:, 0]], V[F[:, 1]], V[F[:, 2]]
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    tri = np.concatenate(
        [p0, p1, p2, np.arange(len(F), dtype=np.float32)[:, None]], 1)
    budget = int(os.environ.get("BUDGET", 960 * 1024))
    ppr = int(os.environ.get("PPR", 16))
    t0 = time.time()
    kc = b8.build_bvh8_chunked(lo, hi, tri, budget=budget)
    print(f"build: {time.time()-t0:.1f}s K={kc.n_chunks} "
          f"page={(kc.nodes_f.shape[1]+kc.nodes_q.shape[1]+kc.tris.shape[1])*4/1024:.0f}KB",
          flush=True)
    N = 1 << 20
    rows = int(os.environ.get("ROWS", "8"))
    kinds = os.environ.get("KINDS", "raster,bounce").split(",")
    for kind in kinds:
        o, d = gen_rays(V, kind, N)
        oj, dj = jnp.asarray(o), jnp.asarray(d)
        wl = jnp.asarray(lo.min(axis=0))
        wh = jnp.asarray(hi.max(axis=0))

        class _S:
            world_lo, world_hi = wl, wh
        order = jnp.argsort(sc._ray_sort_keys(_S, oj, dj))
        oj, dj = oj[order], dj[order]
        tm = jnp.full((N,), 1e30, jnp.float32)
        fn = jax.jit(lambda o, d, tm: b8.binned_intersect(
            kc, o, d, tm, pages_per_round=ppr, rows=rows)["t"])
        out = fn(oj, dj, tm)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = fn(oj, dj, tm)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        hitfrac = float(jnp.mean(jnp.isfinite(out)))
        print(f"binned 1M-tri ({kind}): {ms:8.2f} ms "
              f"{N/ms/1e3:.2f} Mray/s (hit {hitfrac:.2f})", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    import jax
    if os.environ.get("FORCE_CPU"):  # axon plugin ignores JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend(), flush=True)
    if mode == "check":
        check(on_tpu)
    else:
        perf()
