#!/usr/bin/env python3
"""Benchmark: Cornell box path tracing throughput on the attached accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (MEASURED, see BASELINE.md): the reference pbrt-v4 built CPU-only
from /root/reference renders this exact scene (scenes/cornell.pbrt ==
make_cornell_box, 400x400x64spp depth 5) at 139,121 paths/s on one core of
this machine; the 64-core baseline is the linear extrapolation 8.90 Mpaths/s
(optimistic for the reference). vs_baseline = value / 8.903751e6.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")


def main():
    import jax
    from pbrt_tpu import scenes
    from pbrt_tpu import samplers as smp
    from pbrt_tpu.integrators import render as rdr
    from pbrt_tpu.integrators.path import PathOptions

    width = height = 400
    spp = 64
    scene, cam = scenes.make_cornell_box(width=width, height=height)
    sampler = smp.make_sampler("zsobol", spp=spp, full_resolution=(width, height))
    opts = PathOptions(max_depth=5)

    # warmup (compile) with the IDENTICAL static config as the timed run
    # (8 waves = one fused dispatch, same static k as the timed loop)
    rdr.render(scene, cam, sampler=sampler, opts=opts, max_waves=8)
    # timed run
    img, stats = rdr.render(scene, cam, spp=spp, sampler=sampler, opts=opts)
    value = stats["paths_per_sec"]
    baseline = 8.903751e6  # measured 64-core-extrapolated reference (BASELINE.md)
    print(json.dumps({"metric": "wavefront_paths_per_sec", "value": value,
                      "unit": "paths/s", "vs_baseline": value / baseline}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
