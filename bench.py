#!/usr/bin/env python3
"""Benchmark: path-tracing throughput on the attached accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Primary metric: cornell 400x400x64spp depth 5 (scenes/cornell.pbrt ==
make_cornell_box) wavefront paths/s.  Baseline (MEASURED, BASELINE.md): the
reference pbrt-v4 built CPU-only renders this scene at 139,121 paths/s on
one core of this machine; the 64-core baseline is the linear extrapolation
8.90 Mpaths/s.  vs_baseline = value / 8.903751e6.

Secondary metric (VERDICT r2 #10: "extend the bench matrix"): the
meshfield golden scene (~20k-triangle BVH path, scenes/meshfield.pbrt) at
200x200x32spp, reported as extras.mesh_paths_per_sec.
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

    # warmup (compile) with the IDENTICAL static config as the timed run:
    # 32 waves picks the same (m, k) static pair as the full 64-spp loop
    # (m divides 32 and 64 equally for every m the driver can choose)
    rdr.render(scene, cam, sampler=sampler, opts=opts, max_waves=32)
    # timed run
    img, stats = rdr.render(scene, cam, spp=spp, sampler=sampler, opts=opts)
    value = stats["paths_per_sec"]
    baseline = 8.903751e6  # measured 64-core-extrapolated reference (BASELINE.md)

    # --- secondary: meshfield (~20k-tri BVH scene) ------------------------
    extras = {}
    try:
        from pbrt_tpu.scene import parser as pparser
        desc = pparser.parse_file("scenes/meshfield.pbrt")
        msampler = smp.make_sampler("zsobol", spp=32,
                                    full_resolution=(200, 200))
        mopts = PathOptions(max_depth=4)
        rdr.render(desc.scene, desc.camera, sampler=msampler, opts=mopts,
                   max_waves=32)
        _img, mstats = rdr.render(desc.scene, desc.camera, spp=32,
                                  sampler=msampler, opts=mopts)
        extras["mesh_paths_per_sec"] = mstats["paths_per_sec"]
        extras["mesh_scene"] = "meshfield 200x200x32spp ~20k tris"
    except Exception as e:  # never let the secondary break the bench line
        extras["mesh_error"] = str(e)[:200]

    print(json.dumps({"metric": "wavefront_paths_per_sec", "value": value,
                      "unit": "paths/s", "vs_baseline": value / baseline,
                      **extras}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
