#!/usr/bin/env python3
"""Meshfield follow-ups: (1) full wave after the morton-major sort-key
change, (2) BVH8 kernel block-size (rows) sweep on sorted bounce-like
rays, closest + any-hit.

    python tools/exp_r5f.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")


def timed(fn, *args, reps=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pbrt_tpu import samplers as smp, filters as flt
    from pbrt_tpu import scene_core as sc
    from pbrt_tpu.integrators import path as path_mod
    from pbrt_tpu.scene import parser as pparser
    from pbrt_tpu.ops import pallas_bvh8 as b8

    print("backend:", jax.default_backend(), flush=True)
    desc = pparser.parse_file("scenes/meshfield.pbrt")
    scene, cam = desc.scene, desc.camera

    # --- (1) full wave m=4 with the new sort key -------------------------
    n_pix = 200 * 200
    m = 4
    N = n_pix * m
    sampler = smp.make_sampler("zsobol", spp=32, full_resolution=(200, 200))
    filt = flt.make_filter("gaussian")
    opts = path_mod.PathOptions(max_depth=4)
    pix = jnp.asarray(np.tile(np.arange(n_pix, dtype=np.int32), m))
    lane_s = jnp.arange(N, dtype=jnp.int32) // n_pix
    fn = jax.jit(lambda pix, s: path_mod.render_wave(
        scene, cam, sampler, filt, pix, s, opts)[0])
    ms = timed(fn, pix, lane_s)
    print(f"wave m=4 (morton-major key): {ms:8.2f} ms "
          f"({N/ms/1e3:.2f} Mlane/s)", flush=True)

    # --- (2) kernel rows sweep on SORTED bounce-like surface rays --------
    rng = np.random.default_rng(3)
    Nr = 160 * 1024
    tri = np.asarray(scene.tri_geo)[:, :9].reshape(-1, 3, 3)
    ids = rng.integers(0, len(tri), Nr)
    b1 = rng.random(Nr).astype(np.float32)
    b2 = rng.random(Nr).astype(np.float32)
    over = b1 + b2 > 1
    b1[over], b2[over] = 1 - b1[over], 1 - b2[over]
    t = tri[ids]
    p = (t[:, 0] * (1 - b1 - b2)[:, None] + t[:, 1] * b1[:, None]
         + t[:, 2] * b2[:, None])
    ng = np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0])
    ng /= np.maximum(np.linalg.norm(ng, axis=1, keepdims=True), 1e-20)
    ng[ng[:, 1] < 0] *= -1
    u = rng.random((Nr, 2)).astype(np.float32)
    r = np.sqrt(u[:, 0])
    ph = 2 * np.pi * u[:, 1]
    t1 = np.cross(ng, [0.123, 0.96, 0.25])
    t1 /= np.maximum(np.linalg.norm(t1, axis=1, keepdims=True), 1e-20)
    t2 = np.cross(ng, t1)
    d = ((r * np.cos(ph))[:, None] * t1 + (r * np.sin(ph))[:, None] * t2
         + np.sqrt(np.maximum(1 - u[:, 0], 0))[:, None] * ng)
    o = (p + ng * 1e-4).astype(np.float32)
    d = d.astype(np.float32)
    oj = jnp.asarray(o)
    dj = jnp.asarray(d)
    keys = sc._ray_sort_keys(scene, oj, dj)
    order = jnp.argsort(keys)
    oj, dj = oj[order], dj[order]
    tm = jnp.full((Nr,), 1e30, jnp.float32)
    k8 = scene.bvh8
    assert k8 is not None
    for rows in (8, 16, 32):
        fc = jax.jit(lambda o, d, tm, rows=rows: b8.bvh8_intersect(
            k8, o, d, tm, rows=rows)["t"])
        ms = timed(fc, oj, dj, tm)
        print(f"closest rows={rows:>2}: {ms:8.2f} ms "
              f"({Nr/ms/1e3:.1f} Mray/s)", flush=True)
    for rows in (8, 16):
        fa = jax.jit(lambda o, d, rows=rows: b8.bvh8_intersect(
            k8, o, d, jnp.full((Nr,), 30.0), any_hit=True,
            rows=rows)["hit"])
        ms = timed(fa, oj, dj)
        print(f"any-hit rows={rows:>2}: {ms:8.2f} ms "
              f"({Nr/ms/1e3:.1f} Mray/s)", flush=True)


if __name__ == "__main__":
    main()
