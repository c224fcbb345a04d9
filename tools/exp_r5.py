#!/usr/bin/env python3
"""Round-5 wave experiments: depth-loop unrolling and lane-count scaling
on the cornell flagship wave. One process, fresh jit per variant.

    python tools/exp_r5.py --exp unroll,lanes
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


def run(scene, cam, N, opts, label, reps=10):
    import jax
    import jax.numpy as jnp
    from pbrt_tpu import samplers as smp, filters as flt
    from pbrt_tpu.integrators import path as path_mod

    sampler = smp.make_sampler("zsobol", spp=64, full_resolution=(1024, 1024))
    filt = flt.make_filter("gaussian")
    pix = jnp.arange(N, dtype=jnp.int32) % (cam.width * cam.height)
    sidx = jnp.zeros((N,), jnp.int32)
    fn = jax.jit(lambda pix, sidx: path_mod.render_wave(
        scene, cam, sampler, filt, pix, sidx, opts)[0])
    t0 = time.perf_counter()
    ms = timed(fn, pix, sidx, reps=reps)
    compile_s = time.perf_counter() - t0 - ms * reps / 1e3
    print(f"{label:>32}: {ms:8.2f} ms  {N/ms/1e3:8.2f} Mpaths/s  "
          f"(compile {compile_s:.0f}s)", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="unroll")
    ap.add_argument("--depth", type=int, default=5)
    args = ap.parse_args()

    from pbrt_tpu import scenes
    from pbrt_tpu.integrators import path as path_mod
    scene, cam = scenes.make_cornell_box(width=400, height=400)
    D = args.depth
    exps = args.exp.split(",")

    if "unroll" in exps:
        N = 262144
        run(scene, cam, N, path_mod.PathOptions(max_depth=D),
            "fori_loop (baseline)")
        # compaction driver with start >= max_depth is a pure Python unroll
        run(scene, cam, N, path_mod.PathOptions(
            max_depth=D, compaction=True, compaction_start=D),
            "unrolled depth loop")
        run(scene, cam, N, path_mod.PathOptions(
            max_depth=D, compaction=True, compaction_start=1),
            "unrolled + compaction@1")

    if "lanes" in exps:
        for N in (160000, 524288, 1048576):
            run(scene, cam, N, path_mod.PathOptions(max_depth=D),
                f"fori N={N}")
            run(scene, cam, N, path_mod.PathOptions(
                max_depth=D, compaction=True, compaction_start=D),
                f"unroll N={N}")


if __name__ == "__main__":
    main()
