#!/usr/bin/env python3
"""Megakernel BLOCK_ROWS (lanes-per-block) sweep on the cornell wave.

exp_r5d showed the kernel is latency-bound (faking every major stage
still leaves 77% of the time): longer vectors per op hide dependent-chain
latency. rows is a real static arg of megawave._run (not a module
constant), so each sweep point is a genuine recompile.

    python tools/exp_r5e.py [--rows 8,16,32,64]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="8,16,32,64,128")
    args = ap.parse_args()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pbrt_tpu import scenes, samplers as smp, filters as flt
    from pbrt_tpu.integrators import path as path_mod
    from pbrt_tpu.ops import megawave
    from pbrt_tpu.utils import spectrum as spc
    import pbrt_tpu.cameras as cam_mod

    print("backend:", jax.default_backend(), flush=True)
    W = H = 400
    N = W * H
    scene, cam = scenes.make_cornell_box(width=W, height=H)
    sampler = smp.make_sampler("zsobol", spp=64, full_resolution=(W, H))
    filt = flt.make_filter("gaussian")
    pix = jnp.arange(N, dtype=jnp.int32)
    sidx = jnp.zeros((N,), jnp.int32)
    px = pix % W
    py = pix // W
    u_pix = smp.sample_pixel_2d(sampler, px, py, sidx, 0)
    u_time = smp.sample_1d(sampler, px, py, sidx, 2)
    u_lens = smp.sample_2d(sampler, px, py, sidx, 3)
    u_lam = smp.sample_1d(sampler, px, py, sidx, 5)
    swl = spc.sample_visible_wavelengths(u_lam)
    f_off, _fw = flt.sample(filt, u_pix)
    p_film = jnp.stack([px.astype(jnp.float32) + 0.5 + f_off[..., 0],
                        py.astype(jnp.float32) + 0.5 + f_off[..., 1]],
                       axis=-1)
    o, d, _t, _cw = cam_mod.generate_ray_weighted(cam, p_film, u_lens,
                                                  u_time)
    o, d, lam = (jax.device_put(jnp.asarray(v)) for v in (o, d, swl.lam))

    ref = None
    for rows in [int(r) for r in args.rows.split(",")]:
        fn = jax.jit(lambda o, d, lam, rows=rows: megawave.trace(
            scene, sampler, px, py, sidx, o, d, lam,
            max_depth=5, rr_start=1, rows=rows))
        out = fn(o, d, lam)
        jax.block_until_ready(out)
        if ref is None:
            ref = np.asarray(out)
        else:
            diff = float(np.abs(np.asarray(out) - ref).max())
            assert diff == 0.0, f"rows={rows} changed results ({diff})"
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            out = fn(o, d, lam)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"rows={rows:>3}: {ms:7.2f} ms  {N/ms/1e3:8.2f} Mlane/s",
              flush=True)


if __name__ == "__main__":
    main()
