#!/usr/bin/env python3
"""Resolve the meshfield wave-vs-bench discrepancy: exp_r5b measured the
bare render_wave at 0.65 ms (160k lanes) while bench.py's end-to-end
meshfield render implies ~116 ms/wave. Time both in ONE process.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pbrt_tpu import samplers as smp, filters as flt
    from pbrt_tpu.integrators import path as path_mod, render as rdr
    from pbrt_tpu.scene import parser as pparser

    print("backend:", jax.default_backend(), flush=True)
    desc = pparser.parse_file("scenes/meshfield.pbrt")
    scene, cam = desc.scene, desc.camera
    print("use_bvh8:", scene.use_pallas_bvh8, "use_bvh8c:",
          scene.use_pallas_bvh8c, flush=True)
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
    out = fn(pix, lane_s)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = fn(pix, lane_s)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"bare wave m=4: {ms:.2f} ms  "
          f"L mean={float(jnp.mean(out)):.4f}", flush=True)

    # end-to-end render (bench.py's meshfield config)
    rdr.render(scene, cam, sampler=sampler, opts=opts, max_waves=32)
    t0 = time.perf_counter()
    img, st = rdr.render(scene, cam, spp=32, sampler=sampler, opts=opts)
    print(f"end-to-end: {st['seconds']:.3f}s "
          f"{st['paths_per_sec']/1e6:.2f} Mpaths/s "
          f"(img mean {float(np.mean(img)):.4f})", flush=True)
    t0 = time.perf_counter()
    img, st = rdr.render(scene, cam, spp=32, sampler=sampler, opts=opts)
    print(f"end-to-end (2nd): {st['seconds']:.3f}s "
          f"{st['paths_per_sec']/1e6:.2f} Mpaths/s", flush=True)


if __name__ == "__main__":
    main()
