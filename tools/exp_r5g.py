#!/usr/bin/env python3
"""Cornell end-to-end m-batching sweep with the megakernel: bigger waves
amortize the XLA front-end + film per wave (per-lane kernel state is
in-VMEM, so the fused-wave 256k-lane cap does not apply).

    python tools/exp_r5g.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")


def main():
    import jax
    from pbrt_tpu import scenes, samplers as smp
    from pbrt_tpu.integrators import render as rdr
    from pbrt_tpu.integrators.path import PathOptions

    print("backend:", jax.default_backend(), flush=True)
    W = H = 400
    scene, cam = scenes.make_cornell_box(width=W, height=H)
    sampler = smp.make_sampler("zsobol", spp=64, full_resolution=(W, H))
    opts = PathOptions(max_depth=5)
    for m in (1, 2, 4):
        mrpw = W * H * m
        rdr.render(scene, cam, sampler=sampler, opts=opts, max_waves=32,
                   max_rays_per_wave=mrpw)
        _img, st = rdr.render(scene, cam, spp=64, sampler=sampler,
                              opts=opts, max_rays_per_wave=mrpw)
        print(f"m={m}: {st['paths_per_sec']/1e6:8.2f} Mpaths/s "
              f"({st['seconds']:.3f}s)", flush=True)


if __name__ == "__main__":
    main()
