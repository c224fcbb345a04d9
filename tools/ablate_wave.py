#!/usr/bin/env python3
"""Ablation profiler for the fused path-tracing wave.

jax.profiler tracing does not work over the axon tunnel (ROUND4.md), so
per-stage cost inside the ONE fused XLA program is measured by ablation:
each variant monkeypatches one hot-path function with a cheap fake BEFORE
tracing, and the drop in fused-wave time is that stage's marginal cost.
Monkeypatching lives entirely in this tool — the integrator has no
diagnostic branches.

ALL variants run in ONE process: remote compiles through the axon tunnel
take ~4-10 min per program and the persistent compilation cache does not
apply across processes, so the original one-subprocess-per-variant design
never finished a sweep. Each variant applies its patches, traces a FRESH
`jax.jit` wrapper (new function identity -> new trace that sees the
patches), measures, then restores the saved originals.

    python tools/ablate_wave.py                              # all variants
    python tools/ablate_wave.py --variants full,fake_closest # a subset

The fused wave mirrors tools/profile_stages.py FULL_WAVE (render_wave at
N lanes, depth D). Reference role: per-kernel cudaEvent ms table,
gpu/util.cpp:136-183.
"""
import argparse
import json
import os
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
    "gather_arith",   # onehot_lookup builds the one-hot as a f32 clamp
    #                   ramp instead of an int compare (ops/gather.py)
    "gather_plain",   # every pool_lookup is a real XLA gather
    "select8",        # SELECT_MAX_ROWS 2 -> 8: tiny pools (materials K=3
    #                   on cornell) become fused select chains, no dot
    "no_compact",     # compaction driver OFF (per-query sorts back on):
    #                   isolates the driver's sort + bucket-switch cost
    "fake_bigpool",   # pool_lookup on >512-row tables returns row 0
    #                   broadcast: isolates the big-table gather cost
    #                   (meshfield tri_all is (20482, 27))
]


def _patch(module, name, fn, undo):
    undo.append((module, name, getattr(module, name)))
    setattr(module, name, fn)


def _restore(undo):
    for module, name, orig in reversed(undo):
        setattr(module, name, orig)


def _apply(variant):
    """Apply the variant's monkeypatches; returns an undo list."""
    import jax.numpy as jnp
    from pbrt_tpu import scene_core as sc
    from pbrt_tpu import bxdfs, materials as mtl, lights as lgt
    from pbrt_tpu import lightsamplers as lsamp, samplers as smp
    from pbrt_tpu.ops import gather as gth

    undo = []
    if variant == "full":
        return undo

    if variant == "gather_arith":
        _patch(gth, "_ONEHOT_IMPL", "arith", undo)
        return undo

    if variant == "gather_plain":
        _patch(gth, "_FORCE_GATHER", True, undo)
        return undo

    if variant == "select8":
        _patch(gth, "SELECT_MAX_ROWS", 8, undo)
        return undo

    if variant == "no_compact":
        return undo   # handled via PathOptions in measure()

    if variant == "fake_bigpool":
        real = gth.pool_lookup

        def fake_pool(table, idx):
            if table.shape[0] > gth.ONEHOT_MAX_ROWS:
                return jnp.broadcast_to(table[0], idx.shape + table.shape[1:])
            return real(table, idx)
        _patch(gth, "pool_lookup", fake_pool, undo)
        # most call sites import pool_lookup INSIDE functions (module-attr
        # patch suffices); textures.py and media.py bind it at module
        # import time, so patch their copies too
        from pbrt_tpu import textures as ptex, media as pmed
        _patch(ptex, "pool_lookup", fake_pool, undo)
        _patch(pmed, "pool_lookup", fake_pool, undo)
        return undo

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

        _patch(sc, "intersect", fake_intersect, undo)
        return undo

    if variant == "no_shadow":
        def fake_p(scene, o, d, t_max, time=None, presorted=False):
            return jnp.zeros((o.shape[0],), bool)
        _patch(sc, "intersect_p", fake_p, undo)
        return undo

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
        _patch(lsamp, "sample_light", fake_pick, undo)
        _patch(lgt, "sample_li", fake_li, undo)
        return undo

    if variant == "no_emit":
        def fake_rad(row, ng, wo, lam, spectra_pool, spec_cache=None):
            return jnp.ones(lam.shape, jnp.float32)

        def fake_pdf_tri(row, p_ref, wi, p_hit, tri_rows):
            return jnp.ones(p_ref.shape[:-1], jnp.float32)

        _patch(lgt, "area_light_radiance", fake_rad, undo)
        _patch(lgt, "pdf_li_area_tri", fake_pdf_tri, undo)
        _patch(lgt, "pdf_li_sphere",
               lambda row, p_ref: jnp.ones(p_ref.shape[:-1], jnp.float32),
               undo)
        _patch(lsamp, "light_pmf",
               lambda ls, light_idx=None, p=None: jnp.ones(
                   light_idx.shape, jnp.float32), undo)
        return undo

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
        _patch(bxdfs, "bsdf_sample", fake_sample, undo)
        return undo

    if variant == "fake_bsdf_eval":
        import numpy as np

        def fake_f(p, wo, wi):
            return jnp.full(wo.shape[:-1] + (4,), 0.5 / np.pi, jnp.float32)

        def fake_pdf(p, wo, wi):
            return jnp.abs(wi[..., 2]) / np.pi
        _patch(bxdfs, "bsdf_f", fake_f, undo)
        _patch(bxdfs, "bsdf_pdf", fake_pdf, undo)
        return undo

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

        _patch(mtl, "get_bsdf_params", fake_params, undo)
        _patch(mtl, "resolve_mix",
               lambda pool, mat_idx, p_world: mat_idx, undo)
        _patch(mtl, "apply_normal_mapping",
               lambda pool, textures, mat_idx, isect: isect["ns"], undo)
        return undo

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
        _patch(smp, "sample_1d", fake_1d, undo)
        _patch(smp, "sample_2d", fake_2d, undo)
        return undo

    raise SystemExit(f"unknown variant {variant}")


_SCENE_CACHE = {}


def _get_scene(name):
    if name not in _SCENE_CACHE:
        from pbrt_tpu import scenes
        if name == "cornell":
            _SCENE_CACHE[name] = scenes.make_cornell_box(width=400,
                                                         height=400)
        else:
            from pbrt_tpu.scene import parser as pparser
            desc = pparser.parse_file(
                os.path.join(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))), "scenes/meshfield.pbrt"))
            _SCENE_CACHE[name] = (desc.scene, desc.camera)
    return _SCENE_CACHE[name]


def measure(args, variant):
    undo = _apply(variant)
    try:
        import jax
        import jax.numpy as jnp
        from pbrt_tpu import samplers as smp, filters as flt
        from pbrt_tpu.integrators import path as path_mod

        scene, cam = _get_scene(args.scene)
        sampler = smp.make_sampler("zsobol", spp=64,
                                   full_resolution=(1024, 1024))
        filt = flt.make_filter("gaussian")
        opts = path_mod.PathOptions(
            max_depth=args.depth,
            compaction=False if variant == "no_compact" else "auto")
        N = args.n
        pix = jnp.arange(N, dtype=jnp.int32) % (cam.width * cam.height)
        sidx = jnp.zeros((N,), jnp.int32)

        # fresh jit wrapper per variant: new function identity -> new trace
        # that sees this variant's monkeypatches
        fn = jax.jit(lambda pix, sidx: path_mod.render_wave(
            scene, cam, sampler, filt, pix, sidx, opts)[0])
        out = fn(pix, sidx)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(pix, sidx)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        return dict(variant=variant, ms=round(ms, 3),
                    mpaths_per_s=round(N / ms / 1e3, 3),
                    backend=jax.default_backend())
    finally:
        _restore(undo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--n", type=int, default=400 * 400)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    base = None
    for v in args.variants.split(","):
        d = measure(args, v)
        if v == "full" or base is None:
            base = d["ms"] if v == "full" else base
        delta = "" if base is None or v == "full" else \
            f"  delta={base - d['ms']:+7.2f} ms " \
            f"({(base - d['ms']) / base * 100:+5.1f}%)"
        print(f"{v:>18}: {d['ms']:8.2f} ms  {d['mpaths_per_s']:8.2f} "
              f"Mpaths/s{delta}", flush=True)
        print(json.dumps(d), flush=True)


if __name__ == "__main__":
    main()
