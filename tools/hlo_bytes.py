#!/usr/bin/env python3
"""Compile the cornell/meshfield wave on the attached TPU and report where
the bytes live: per-fusion output shapes from the optimized HLO, sorted by
size. This is the no-profiler substitute for a per-op profile (the axon
tunnel does not forward the jax.profiler service port — ROUND4.md), good
enough to find which buffers a HBM-bandwidth-bound wave is materializing.

Usage: python tools/hlo_bytes.py [--scene cornell|mesh] [--lanes N]
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")


def shape_bytes(shape_str):
    """'f32[262144,4]' -> byte count (handles tuples by summing)."""
    total = 0
    for m in re.finditer(r"(pred|s8|u8|bf16|f16|s16|u16|f32|s32|u32|f64|s64|u64)\[([0-9,]*)\]", shape_str):
        dt, dims = m.groups()
        sz = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2,
              "u16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
              "u64": 8}[dt]
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * sz
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--lanes", type=int, default=0)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--dump", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    print("backend:", jax.default_backend(), flush=True)
    from pbrt_tpu import scenes
    from pbrt_tpu import samplers as smp
    from pbrt_tpu import filters as flt
    from pbrt_tpu import film as film_mod
    from pbrt_tpu.integrators import render as rdr
    from pbrt_tpu.integrators.path import PathOptions

    if args.scene == "cornell":
        scene, cam = scenes.make_cornell_box(width=400, height=400)
        opts = PathOptions(max_depth=5)
        spp = 64
    else:
        from pbrt_tpu.scene import parser as pparser
        desc = pparser.parse_file("scenes/meshfield.pbrt")
        scene, cam = desc.scene, desc.camera
        opts = PathOptions(max_depth=4)
        spp = 32

    n_pix = cam.width * cam.height
    m = 1
    lanes = args.lanes or n_pix
    if args.lanes and args.lanes > n_pix:
        m = args.lanes // n_pix
        lanes = n_pix * m
    sampler = smp.make_sampler("zsobol", spp=spp,
                               full_resolution=(cam.width, cam.height))
    filt = flt.make_filter("gaussian")
    sensor = film_mod.make_pixel_sensor(None)
    film = film_mod.make_film(cam.width, cam.height)
    pix = jnp.asarray(np.tile(np.arange(n_pix, dtype=np.int32), m))
    s0 = jnp.asarray(0, jnp.int32)

    lowered = rdr._render_steps_k.lower(scene, cam, sampler, filt, sensor,
                                        film, pix, s0, opts, 1, m=m)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    print(f"lanes={lanes} flops={ca.get('flops', 0)/1e9:.2f}G "
          f"bytes={ca.get('bytes accessed', 0)/1e9:.3f}GB")
    try:
        mem = compiled.memory_analysis()
        print(f"temp={mem.temp_size_in_bytes/1e6:.1f}MB "
              f"argument={mem.argument_size_in_bytes/1e6:.1f}MB "
              f"output={mem.output_size_in_bytes/1e6:.1f}MB "
              f"peak(gen)={getattr(mem, 'generated_code_size_in_bytes', 0)/1e6:.1f}MB")
    except Exception as e:
        print("memory_analysis unavailable:", e)

    txt = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(txt)
        print(f"dumped {len(txt)/1e6:.1f}MB HLO to {args.dump}")

    # per-instruction output sizes of the top-level computation ops
    # (fusion roots, custom-calls, sorts, gathers...) — these are the
    # buffers XLA actually materializes between fusions
    rows = []
    for line in txt.splitlines():
        ls = line.strip()
        m2 = re.match(r"(?:ROOT )?%?([\w.\-]+) = (\([^)]*\)|[^ ]+) "
                      r"(fusion|custom-call|sort|gather|scatter|"
                      r"dynamic-slice|dynamic-update-slice|copy|transpose|"
                      r"reduce|all-reduce|convert|bitcast-convert|select|"
                      r"while|concatenate|broadcast|iota|dot|pad|reshape)\(",
                      ls)
        if not m2:
            continue
        name, shp, op = m2.groups()
        b = shape_bytes(shp)
        if b >= 1 << 20:
            # annotate with a hint: fused op kinds inside
            hint = ""
            mh = re.search(r'calls=%?([\w.\-]+)', ls)
            if mh:
                hint = mh.group(1)[:60]
            mk = re.search(r'custom_call_target="([^"]+)"', ls)
            if mk:
                hint = mk.group(1)[:60]
            rows.append((b, op, name[:50], shp[:80], hint))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"\n{len(rows)} materialized buffers >=1MB, total {total/1e9:.3f}GB")
    for b, op, name, shp, hint in rows[:args.top]:
        print(f"{b/1e6:9.1f}MB {op:12s} {name:45s} {hint}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
