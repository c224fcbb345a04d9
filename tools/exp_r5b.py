#!/usr/bin/env python3
"""Round-5b measurements: megakernel/front-end split on cornell + the
meshfield query economics. One process, every timing batched (tunnel
compiles are minutes each; see .claude/skills/verify).

    python tools/exp_r5b.py --exp split,mesh
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


def report(label, ms, n):
    print(f"{label:>40}: {ms:8.2f} ms  {n/ms/1e3:8.2f} Mlane/s", flush=True)


def exp_split():
    """Cornell 400x400 (160k lanes): megakernel-only vs render_wave vs
    full film dispatch — where do the 9 ms go?"""
    import jax
    import jax.numpy as jnp
    from pbrt_tpu import scenes, samplers as smp, filters as flt
    from pbrt_tpu import film as film_mod
    from pbrt_tpu.integrators import path as path_mod, render as rdr
    from pbrt_tpu.ops import megawave
    from pbrt_tpu.utils import spectrum as spc

    W = H = 400
    N = W * H
    scene, cam = scenes.make_cornell_box(width=W, height=H)
    sampler = smp.make_sampler("zsobol", spp=64, full_resolution=(W, H))
    filt = flt.make_filter("gaussian")
    sensor = film_mod.make_pixel_sensor()
    opts = path_mod.PathOptions(max_depth=5)
    pix = jnp.arange(N, dtype=jnp.int32)
    sidx = jnp.zeros((N,), jnp.int32)

    # (a) full render_wave (front-end + kernel, no film)
    fn_wave = jax.jit(lambda pix, sidx: path_mod.render_wave(
        scene, cam, sampler, filt, pix, sidx, opts)[0])
    report("render_wave (front+kernel)", timed(fn_wave, pix, sidx), N)

    # (b) kernel only: pre-build camera rays + lam + mi outside the timer
    import pbrt_tpu.cameras as cam_mod
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

    fn_kern = jax.jit(lambda o, d, lam: megawave.trace(
        scene, sampler, px, py, sidx, o, d, lam, max_depth=5, rr_start=1))
    report("megakernel only (rays prebuilt)", timed(fn_kern, o, d, lam), N)

    # (c) full film dispatch k=8 (bench inner loop)
    film = film_mod.make_film(W, H)
    fn_disp = jax.jit(
        lambda film: rdr._render_steps_k_impl(
            scene, cam, sampler, filt, sensor, film, pix,
            jnp.asarray(0, jnp.int32), opts, 8, m=1, identity_pix=True))
    msd = timed(fn_disp, film, reps=4)
    report("film dispatch k=8 (per wave)", msd / 8, N)


def exp_mesh():
    """Meshfield: per-query in-wave cost + full wave at m=4 vs m=8."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pbrt_tpu import samplers as smp, filters as flt
    from pbrt_tpu import scene_core as sc
    from pbrt_tpu.integrators import path as path_mod
    from pbrt_tpu.scene import parser as pparser

    desc = pparser.parse_file("scenes/meshfield.pbrt")
    scene = desc.scene
    cam = desc.camera
    n_pix = 200 * 200

    for m in (4, 8):
        N = n_pix * m
        sampler = smp.make_sampler("zsobol", spp=32,
                                   full_resolution=(200, 200))
        filt = flt.make_filter("gaussian")
        opts = path_mod.PathOptions(max_depth=4)
        pix = jnp.asarray(np.tile(np.arange(n_pix, dtype=np.int32), m))
        lane_s = jnp.arange(N, dtype=jnp.int32) // n_pix
        fn = jax.jit(lambda pix, s: path_mod.render_wave(
            scene, cam, sampler, filt, pix, s, opts)[0])
        ms = timed(fn, pix, lane_s, reps=5)
        report(f"meshfield wave m={m} ({N//1000}k lanes)", ms, N)

    # per-query cost on surface-origin hemisphere rays (bounce-like), sorted
    rng = np.random.default_rng(1)
    N = 160 * 1024
    lo = np.asarray(scene.world_lo)
    hi = np.asarray(scene.world_hi)
    o_np = rng.uniform(lo, hi, (N, 3)).astype(np.float32)
    o_np[:, 1] = lo[1] + 0.05 * (hi[1] - lo[1])   # near the field surface
    d_np = rng.normal(size=(N, 3)).astype(np.float32)
    d_np[:, 1] = np.abs(d_np[:, 1])               # upward hemisphere
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = jnp.asarray(o_np)
    d = jnp.asarray(d_np)
    tm = jnp.full((N,), 1e30, jnp.float32)

    fn_c = jax.jit(lambda o, d, tm: sc.intersect(scene, o, d, tm)["t"])
    report("meshfield closest (surface rays)", timed(fn_c, o, d, tm), N)
    fn_s = jax.jit(lambda o, d: sc.intersect_p(scene, o, d,
                                               jnp.full((N,), 30.0)))
    report("meshfield any-hit (surface rays)", timed(fn_s, o, d), N)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="split,mesh")
    args = ap.parse_args()
    import jax
    print("backend:", jax.default_backend(), flush=True)
    for e in args.exp.split(","):
        print(f"=== {e} ===", flush=True)
        {"split": exp_split, "mesh": exp_mesh}[e]()


if __name__ == "__main__":
    main()
