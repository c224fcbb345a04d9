#!/usr/bin/env python3
"""Ablation profiler for the fused path-tracing wave.

jax.profiler tracing does not work over the axon tunnel (ROUND4.md), so
per-stage cost inside the ONE fused XLA program is measured by ablation:
each variant monkeypatches one hot-path function with a cheap fake BEFORE
tracing, and the drop in fused-wave time is that stage's marginal cost.
Monkeypatching lives entirely in this tool — the integrator has no
diagnostic branches.

Run one variant per process (jit caches by function identity, so patching
inside a live process would time stale executables):

    python tools/ablate_wave.py                 # orchestrate all variants
    python tools/ablate_wave.py --variant full  # one measurement

The fused wave mirrors tools/profile_stages.py FULL_WAVE (render_wave at
N lanes, depth D). Reference role: per-kernel cudaEvent ms table,
gpu/util.cpp:136-183.
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

VARIANTS = [
    "full",           # baseline
    "fake_closest",   # sc.intersect -> synthetic plane hit (no traversal,
    #                   no payload gathers)
    "raw_closest",    # traversal kept, payload assembly faked: the delta
    #                   vs fake_closest is the traversal kernel itself
    "no_shadow",      # sc.intersect_p -> all unoccluded
    "no_sampleli",    # light sampling (sample_light + sample_li) -> consts
    "no_emit",        # area-light Le + its MIS pdf -> consts
    "fake_bsdf_sample",  # bsdf_sample -> cosine hemisphere
    "fake_bsdf_eval",    # bsdf_f/bsdf_pdf (NEE eval) -> lambertian consts
    "fake_mat",       # get_bsdf_params/normal mapping -> const diffuse
    "fake_sampler",   # sample_1d/2d -> one multiply-hash
]


def _apply(variant):
    import jax.numpy as jnp
    from pbrt_tpu import scene_core as sc
    from pbrt_tpu import bxdfs, materials as mtl, lights as lgt
    from pbrt_tpu import lightsamplers as lsamp, samplers as smp

    if variant == "full":
        return

    if variant in ("fake_closest", "raw_closest"):
        real_dispatch = sc._tri_dispatch

        def fake_intersect(scene, o, d, t_max, time=None, presorted=False):
            N = o.shape[0]
            if variant == "raw_closest":
                r = real_dispatch(scene, o, d, t_max, time=time,
                                  presorted=presorted)
                t = r["t"]
                hit = r["hit"]
            else:
                t = jnp.full((N,), 1.0, jnp.float32)
                hit = jnp.ones((N,), bool)
            up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
                                  (N, 3))
            xa = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
                                  (N, 3))
            za = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                                  (N, 3))
            p = o + jnp.where(jnp.isfinite(t), t, 1.0)[..., None] * d
            return dict(hit=hit, t=t, prim=jnp.zeros((N,), jnp.int32),
                        p=p, ng=up, ns=up,
                        uv=jnp.full((N, 2), 0.5, jnp.float32),
                        mat=jnp.zeros((N,), jnp.int32),
                        light=jnp.full((N,), -1, jnp.int32),
                        wo=-d, p0=p - xa, p1=p + xa, p2=p + za,
                        dpdu=xa, dpdv=za,
                        p_err=jnp.full((N, 3), 1e-6, jnp.float32))

        sc.intersect = fake_intersect
        from pbrt_tpu.integrators import path as path_mod
        path_mod.sc.intersect = fake_intersect
        return

    if variant == "no_shadow":
        def fake_p(scene, o, d, t_max, time=None, presorted=False):
            return jnp.zeros((o.shape[0],), bool)
        sc.intersect_p = fake_p
        return

    if variant == "no_sampleli":
        def fake_pick(ls, u, p=None):
            return (jnp.zeros(u.shape, jnp.int32), jnp.ones_like(u), u)

        def fake_li(lights, light_idx, p_ref, n_ref, u2, lam, spectra_pool,
                    tri_geo, scene_radius, env=None, spec_cache=None):
            N = p_ref.shape[0]
            wi = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
                                  (N, 3))
            return dict(wi=wi, L=jnp.ones((N, 4), jnp.float32),
                        pdf=jnp.ones((N,), jnp.float32),
                        p_light=p_ref + wi,
                        is_delta=jnp.zeros((N,), bool),
                        valid=jnp.ones((N,), bool))
        lsamp.sample_light = fake_pick
        lgt.sample_li = fake_li
        return

    if variant == "no_emit":
        def fake_rad(row, ng, wo, lam, spectra_pool, spec_cache=None):
            return jnp.ones(lam.shape, jnp.float32)

        def fake_pdf_tri(row, p_ref, wi, p_hit, tri_rows):
            return jnp.ones(p_ref.shape[:-1], jnp.float32)

        lgt.area_light_radiance = fake_rad
        lgt.pdf_li_area_tri = fake_pdf_tri
        lgt.pdf_li_sphere = lambda row, p_ref: jnp.ones(p_ref.shape[:-1],
                                                        jnp.float32)
        lsamp.light_pmf = lambda ls, light_idx=None, p=None: jnp.ones(
            light_idx.shape, jnp.float32)
        return

    if variant == "fake_bsdf_sample":
        def fake_sample(p, wo, uc, u2):
            import numpy as np
            r = jnp.sqrt(jnp.clip(u2[..., 0], 0.0, 1.0))
            phi = 2.0 * np.pi * u2[..., 1]
            z = jnp.sqrt(jnp.maximum(1.0 - u2[..., 0], 1e-6))
            wi = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
            pdf = z / np.pi
            N = wo.shape[0]
            return dict(wi=wi, f=jnp.full((N, 4), 0.5 / np.pi, jnp.float32),
                        pdf=pdf, specular=jnp.zeros((N,), bool),
                        valid=jnp.ones((N,), bool),
                        dispersed=jnp.zeros((N,), bool),
                        eta_scale=jnp.ones((N,), jnp.float32))
        bxdfs.bsdf_sample = fake_sample
        return

    if variant == "fake_bsdf_eval":
        import numpy as np

        def fake_f(p, wo, wi):
            return jnp.full(wo.shape[:-1] + (4,), 0.5 / np.pi, jnp.float32)

        def fake_pdf(p, wo, wi):
            return jnp.abs(wi[..., 2]) / np.pi
        bxdfs.bsdf_f = fake_f
        bxdfs.bsdf_pdf = fake_pdf
        return

    if variant == "fake_mat":
        def fake_params(pool, mat_idx, lam, spectra_pool, textures=None,
                        uv=None, p_world=None, spec_cache=None,
                        footprint=None, ns=None, prim=None):
            N = mat_idx.shape[0]
            return bxdfs.BSDFParams(
                tag=jnp.full((N,), bxdfs.BXDF_DIFFUSE, jnp.int32),
                albedo=jnp.full((N, 4), 0.5, jnp.float32),
                alpha_x=jnp.full((N,), 0.1, jnp.float32),
                alpha_y=jnp.full((N,), 0.1, jnp.float32),
                eta=jnp.full((N, 4), 1.5, jnp.float32),
                k=jnp.zeros((N, 4), jnp.float32),
                tags_present=(int(bxdfs.BXDF_DIFFUSE),))

        mtl.get_bsdf_params = fake_params
        mtl.resolve_mix = lambda pool, mat_idx, p_world: mat_idx
        mtl.apply_normal_mapping = \
            lambda pool, textures, mat_idx, isect: isect["ns"]
        return

    if variant == "fake_sampler":
        def _hash01(px, py, sidx, dim):
            h = (px.astype(jnp.uint32) * jnp.uint32(9781)
                 + py.astype(jnp.uint32) * jnp.uint32(6271)
                 + sidx.astype(jnp.uint32) * jnp.uint32(26699)
                 + jnp.uint32(dim * 30103 + 17))
            h = h * jnp.uint32(2654435761)
            h = h ^ (h >> jnp.uint32(16))
            h = h * jnp.uint32(2246822519)
            return (h >> jnp.uint32(8)).astype(jnp.float32) * (1.0 / (1 << 24))

        def fake_1d(params, px, py, sample_index, dim):
            return _hash01(px, py, sample_index, dim)

        def fake_2d(params, px, py, sample_index, dim):
            return jnp.stack([_hash01(px, py, sample_index, dim),
                              _hash01(px, py, sample_index, dim + 1)], -1)
        smp.sample_1d = fake_1d
        smp.sample_2d = fake_2d
        return

    raise SystemExit(f"unknown variant {variant}")


def measure(args):
    _apply(args.variant)
    import jax
    import jax.numpy as jnp
    from pbrt_tpu import scenes, samplers as smp, filters as flt
    from pbrt_tpu.integrators import path as path_mod

    if args.scene == "cornell":
        scene, cam = scenes.make_cornell_box(width=400, height=400)
    else:
        from pbrt_tpu.scene import parser as pparser
        desc = pparser.parse_file(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "scenes/meshfield.pbrt"))
        scene, cam = desc.scene, desc.camera

    sampler = smp.make_sampler("zsobol", spp=64,
                               full_resolution=(1024, 1024))
    filt = flt.make_filter("gaussian")
    opts = path_mod.PathOptions(max_depth=args.depth)
    N = args.n
    pix = jnp.arange(N, dtype=jnp.int32) % (cam.width * cam.height)
    sidx = jnp.zeros((N,), jnp.int32)

    fn = jax.jit(lambda pix, sidx: path_mod.render_wave(
        scene, cam, sampler, filt, pix, sidx, opts)[0])
    out = fn(pix, sidx)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = fn(pix, sidx)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / args.reps * 1e3
    print(json.dumps({"variant": args.variant, "ms": round(ms, 3),
                      "mpaths_per_s": round(N / ms / 1e3, 3),
                      "backend": jax.default_backend()}))


def orchestrate(args):
    rows = []
    base = None
    for v in VARIANTS:
        cmd = [sys.executable, os.path.abspath(__file__), "--variant", v,
               "--scene", args.scene, "--n", str(args.n),
               "--depth", str(args.depth), "--reps", str(args.reps)]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(f"{v:>18}: FAILED\n{r.stdout[-500:]}\n{r.stderr[-1000:]}")
            continue
        d = json.loads(line[-1])
        if v == "full":
            base = d["ms"]
        rows.append(d)
        delta = "" if base is None or v == "full" else \
            f"  delta={base - d['ms']:+7.2f} ms ({(base - d['ms']) / base * 100:+5.1f}%)"
        print(f"{v:>18}: {d['ms']:8.2f} ms  {d['mpaths_per_s']:8.2f} Mpaths/s"
              f"{delta}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default=None)
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--n", type=int, default=400 * 400)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    if args.variant:
        measure(args)
    else:
        orchestrate(args)


if __name__ == "__main__":
    main()
